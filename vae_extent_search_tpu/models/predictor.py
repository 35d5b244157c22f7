"""Latent cost predictor over the VAE encoder (TPU-native).

Parity target: ``VAECostPredictor`` (reference vae_extent_search.py:515-702):
the VAE encoder (3x Linear+ReLU -> fc_mu/fc_logvar) + an MLP cost head with
inter-layer dropout; pretrained encoder weights loaded by key prefix;
MC-dropout ``mc_predict`` for epistemic variance; training loss
  total = l_reg * reg + l_pair * margin-rank(all pairs) + gamma * smooth
          + beta * KL
(vae_extent_search.py:708-806 compute_total_loss) with AdamW, grad-clip 1.0
and dual learning rates (encoder 1e-5, head 1e-4; :1389-1398).

TPU-first: the entire phase training run is a jax.lax.scan over epochs of a
fused step; MC-dropout is a vmap over a [T] key axis instead of a Python
loop.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .modules import dense, dense_init, dropout, mlp_apply, mlp_init
from .vae import kld_loss, reparameterize


def init_predictor_params(key, input_dim: int, hidden_dim: int = 256,
                          latent_dim: int = 64, predictor_hidden: int = 256,
                          predictor_layers: int = 2) -> Dict:
    keys = jax.random.split(key, 4)
    dims = [latent_dim] + [predictor_hidden] * predictor_layers + [1]
    return {
        "encoder": mlp_init(keys[0], [input_dim, hidden_dim, hidden_dim, hidden_dim]),
        "fc_mu": dense_init(keys[1], hidden_dim, latent_dim),
        "fc_logvar": dense_init(keys[2], hidden_dim, latent_dim),
        "cost_predictor": mlp_init(keys[3], dims),
    }


def load_pretrained_encoder(pred_params: Dict, vae_params: Dict) -> Dict:
    """Copy encoder/fc_mu/fc_logvar from a pretrained VAE (the reference
    matches state-dict keys by prefix, :645-663)."""
    out = dict(pred_params)
    for k in ("encoder", "fc_mu", "fc_logvar"):
        out[k] = jax.tree_util.tree_map(lambda x: x, vae_params[k])
    return out


def pred_encode(params: Dict, x: jnp.ndarray):
    h = mlp_apply(params["encoder"], x, final_activation=True)
    return dense(params["fc_mu"], h), jnp.clip(
        dense(params["fc_logvar"], h), -10.0, 10.0)


def predict_cost(params: Dict, z: jnp.ndarray, dropout_key=None,
                 dropout_rate: float = 0.1) -> jnp.ndarray:
    """Cost head: [Linear, ReLU, Dropout]*(L-1), [Linear, ReLU], Linear."""
    layers = params["cost_predictor"]
    n = len(layers)
    keys = (
        jax.random.split(dropout_key, n) if dropout_key is not None else None
    )
    h = z
    for i, layer in enumerate(layers):
        h = dense(layer, h)
        if i < n - 1:
            h = jax.nn.relu(h)
            # dropout between hidden layers only (reference puts Identity
            # after the last hidden layer)
            if i < n - 2 and keys is not None:
                h = dropout(keys[i], h, dropout_rate)
    return h.squeeze(-1)


def pred_forward(params: Dict, x: jnp.ndarray, key=None, use_mean=True,
                 dropout_key=None, dropout_rate: float = 0.1):
    mu, logvar = pred_encode(params, x)
    z = mu if use_mean or key is None else reparameterize(key, mu, logvar)
    cost = predict_cost(params, z, dropout_key, dropout_rate)
    return cost, mu, logvar, z


def mc_predict(params: Dict, x: jnp.ndarray, key, T: int = 20,
               dropout_rate: float = 0.1, mu=None):
    """MC-dropout epistemic mean/variance — one vmapped forward with a [T]
    key axis (reference loops T times on GPU, :670-702). Pass a
    precomputed ``mu`` to skip re-encoding (the encoder has no dropout,
    so the T samples share it)."""
    if mu is None:
        mu, _ = pred_encode(params, x)

    def one(k):
        return predict_cost(params, mu, k, dropout_rate)

    preds = jax.vmap(one)(jax.random.split(key, T))  # [T, N]
    # stats in f32: bf16 variance of near-equal samples cancels badly
    preds = preds.astype(jnp.float32)
    return preds.mean(axis=0), preds.var(axis=0, ddof=1)


# ---------------------------------------------------------------------------
# Losses (reference vae_extent_search.py:708-806)
# ---------------------------------------------------------------------------


def pair_loss(cost_pred: jnp.ndarray, cost_true: jnp.ndarray,
              margin: float = 0.1,
              sample_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """All-pairs margin ranking loss over the upper triangle (optionally
    restricted to rows where sample_mask)."""
    n = cost_pred.shape[0]
    pi = cost_pred[:, None] - cost_pred[None, :]  # pred_i - pred_j
    labels = jnp.sign(cost_true[None, :] - cost_true[:, None])  # sign(tj - ti)
    # margin_ranking_loss(x1=pred_j, x2=pred_i, y): max(0, -y*(x1-x2)+margin)
    losses = jnp.maximum(0.0, labels * pi + margin)
    mask = jnp.triu(jnp.ones((n, n), bool), k=1)
    if sample_mask is not None:
        mask = mask & sample_mask[:, None] & sample_mask[None, :]
    return jnp.sum(losses * mask) / jnp.maximum(mask.sum(), 1)


def smooth_loss(params: Dict, z: jnp.ndarray, key, noise_std: float = 0.1,
                sample_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    z_noisy = z + noise_std * jax.random.normal(key, z.shape, z.dtype)
    c0 = predict_cost(params, z, None)
    c1 = predict_cost(params, z_noisy, None)
    sq = (c0 - c1) ** 2
    if sample_mask is None:
        return jnp.mean(sq)
    return jnp.sum(jnp.where(sample_mask, sq, 0.0)) / jnp.maximum(
        sample_mask.sum(), 1
    )


def compute_total_loss(params: Dict, x: jnp.ndarray, labels: jnp.ndarray,
                       key, config: Dict,
                       sample_mask: Optional[jnp.ndarray] = None):
    """total = l_reg*reg + l_pair*pair + gamma*smooth + beta*KL, optionally
    over a masked subset of rows (fixed-shape training on TPU: the full
    candidate matrix stays resident, the measured set is a boolean mask)."""
    k_smooth, k_drop, k_z = jax.random.split(key, 3)
    # stochastic_z: the VIB arm samples z by reparameterization during
    # training (reference model_mid/vib_mlp_*_v1.ipynb — the bottleneck
    # is variational, there is no decoder/pretrain)
    stochastic = bool(config.get("stochastic_z", False))
    cost_pred, mu, logvar, z = pred_forward(
        params, x, key=k_z if stochastic else None,
        use_mean=not stochastic, dropout_key=k_drop,
        dropout_rate=config.get("dropout", 0.1),
    )
    if config.get("huber_reg", False):
        # VIB arm: smooth-L1 regression term
        # (variational_bottleneck_loss in the vib notebooks)
        delta = config.get("huber_delta", 1.0)
        d = jnp.abs(cost_pred - labels)
        errs = jnp.where(d < delta, 0.5 * d**2, delta * (d - 0.5 * delta))
    else:
        errs = (cost_pred - labels) ** 2
    if sample_mask is None:
        denom = cost_pred.shape[0]
        reg = jnp.mean(errs)
        kld = kld_loss(mu, logvar)
        smooth_w = None
    else:
        denom = jnp.maximum(sample_mask.sum(), 1)
        reg = jnp.sum(jnp.where(sample_mask, errs, 0.0)) / denom
        kl_terms = -0.5 * (1.0 + logvar - mu**2 - jnp.exp(logvar))
        kld = jnp.sum(jnp.where(sample_mask[:, None], kl_terms, 0.0)) / (
            denom * mu.shape[-1]
        )
        smooth_w = sample_mask
    pair = pair_loss(cost_pred, labels, config.get("margin", 0.1), sample_mask)
    smooth = smooth_loss(params, z, k_smooth, config.get("noise_std", 0.1),
                         smooth_w)
    total = (
        config.get("lambda_reg", 0.01) * reg
        + config.get("lambda_pair", 3.0) * pair
        + config.get("gamma", 0.01) * smooth
        + config.get("beta", 0.01) * kld
    )
    return total, {"reg": reg, "pair": pair, "smooth": smooth, "kld": kld,
                   "pred": cost_pred}


class PredictorConfig(NamedTuple):
    """Hashable hyperparameter bundle (defaults = reference
    vae_extent_search.py:1741-1757,1389-1398)."""

    lambda_reg: float = 0.01
    lambda_pair: float = 3.0
    gamma: float = 0.01
    beta: float = 0.01
    margin: float = 0.1
    noise_std: float = 0.001
    dropout: float = 0.1
    encoder_lr: float = 1e-5
    head_lr: float = 1e-4
    weight_decay: float = 1e-5
    grad_clip: float = 1.0
    # linear warm-up of the pair-ranking weight over the first N epochs:
    # lambda_pair(e) = lambda_pair * min(e, N) / N (reference
    # lambda_pair_warmup, vae_extent_search.py:1406-1410, applied per
    # epoch in train_regression :1433 with warmup_epochs=200; the hyper
    # grid key is rank_warmup_epochs :1612)
    rank_warmup_epochs: int = 200
    # --- lineage-variant knobs (reference notebook corpus; all off by
    # default = the VAECostPredictor arm) ---
    # VIB arm (model_mid/vib_mlp_{feature,sch_param}_v1.ipynb): train the
    # encoder+head jointly from scratch (no VAE pretrain/decoder) with a
    # sampled z, a Huber regression term, and a KL weight following
    # cosine_annealing_with_warmup over (kld_beta_start, beta) with
    # kld_warmup_epochs of linear warm-up.
    stochastic_z: bool = False
    huber_reg: bool = False
    huber_delta: float = 1.0
    kld_cosine_warmup: bool = False
    kld_beta_start: float = 0.0
    kld_warmup_epochs: int = 50

    def as_dict(self) -> Dict:
        return self._asdict()


class PredictorTrainState(NamedTuple):
    params: Dict
    opt_state: optax.OptState
    key: jax.Array


def make_predictor_optimizer(encoder_lr: float = 1e-5, head_lr: float = 1e-4,
                             weight_decay: float = 1e-5,
                             grad_clip: float = 1.0):
    """Dual-LR AdamW with global-norm clipping (reference :1389-1398)."""

    def label_fn(params):
        return {
            k: ("encoder" if k in ("encoder", "fc_mu", "fc_logvar") else "head")
            for k in params
        }

    tx = optax.multi_transform(
        {
            "encoder": optax.adamw(encoder_lr, weight_decay=weight_decay),
            "head": optax.adamw(head_lr, weight_decay=weight_decay),
        },
        label_fn,
    )
    return optax.chain(optax.clip_by_global_norm(grad_clip), tx)


@functools.partial(jax.jit, static_argnames=("config", "epochs"))
def fit_predictor(params: Dict, X: jnp.ndarray, y: jnp.ndarray,
                  sample_mask: jnp.ndarray, key,
                  config: PredictorConfig = PredictorConfig(),
                  epochs: int = 1000):
    """Phase retraining of the cost predictor, entirely on device.

    The reference retrains for up to 1000 epochs with a Python minibatch
    loop (train_regression, vae_extent_search.py:1416-1484). Here the whole
    run is ONE compiled program: full-batch steps over the fixed-shape
    candidate matrix (the measured set is ``sample_mask``), scanned over
    epochs, tracking the best-loss params in carry. Fixed shapes mean the
    program compiles once per pool size and is reused across phases and
    hyperparameter rows.
    """
    optimizer = make_predictor_optimizer(
        config.encoder_lr, config.head_lr, config.weight_decay,
        config.grad_clip,
    )
    cfg_dict = config.as_dict()
    opt_state = optimizer.init(params)

    warmup = int(cfg_dict.pop("rank_warmup_epochs", 0))
    lambda_pair_max = cfg_dict["lambda_pair"]
    beta_max = cfg_dict["beta"]

    def epoch_step(carry, epoch):
        params, opt_state, key, best_loss, best_params = carry
        key, sub = jax.random.split(key)
        # linear lambda_pair warm-up; reference epochs are 1-based
        if warmup > 0:
            lam = lambda_pair_max * jnp.minimum(epoch + 1.0, warmup) / warmup
        else:
            lam = lambda_pair_max
        cfg_e = {**cfg_dict, "lambda_pair": lam}
        if config.kld_cosine_warmup:
            # VIB arm's cosine_annealing_with_warmup (0-based epochs):
            # linear beta_start->beta over the warm-up, then cosine decay
            # beta->0 floored at beta_start
            w, b0 = config.kld_warmup_epochs, config.kld_beta_start
            lin = b0 + (beta_max - b0) * (epoch / max(w, 1))
            progress = (epoch - w) / max(epochs - w, 1)
            cos = jnp.maximum(
                beta_max * 0.5 * (1.0 + jnp.cos(jnp.pi * progress)), b0
            )
            cfg_e["beta"] = jnp.where(epoch < w, lin, cos)
        (loss, aux), grads = jax.value_and_grad(
            compute_total_loss, has_aux=True
        )(params, X, y, sub, cfg_e, sample_mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # best-checkpoint selection must compare epochs on FIXED loss
        # weights: the per-epoch warm-up loss is incomparable across
        # epochs (a tiny early lambda_pair would make near-init params
        # look "best" forever)
        fixed_loss = (
            cfg_dict.get("lambda_reg", 0.01) * aux["reg"]
            + lambda_pair_max * aux["pair"]
            + cfg_dict.get("gamma", 0.01) * aux["smooth"]
            + cfg_dict.get("beta", 0.01) * aux["kld"]
        )
        loss = fixed_loss
        better = loss < best_loss
        best_params = jax.tree_util.tree_map(
            lambda b, p: jnp.where(better, p, b), best_params, params
        )
        best_loss = jnp.where(better, loss, best_loss)
        return (params, opt_state, key, best_loss, best_params), loss

    init = (params, opt_state, key, jnp.inf, params)
    (params, _, _, best_loss, best_params), losses = jax.lax.scan(
        epoch_step, init, jnp.arange(epochs, dtype=jnp.float32)
    )
    return best_params, {"best_loss": best_loss, "losses": losses}


def train_predictor(key, params: Dict, X: jnp.ndarray, y: jnp.ndarray,
                    config=None, epochs: int = 1000, sample_mask=None,
                    **_ignored):
    """Convenience wrapper over fit_predictor."""
    if config is None:
        config = PredictorConfig()
    elif isinstance(config, dict):
        config = PredictorConfig(**config)
    if sample_mask is None:
        sample_mask = jnp.ones(X.shape[0], bool)
    return fit_predictor(params, X, y, sample_mask, key, config, epochs)

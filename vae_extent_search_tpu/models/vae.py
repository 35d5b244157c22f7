"""VAE over extent feature vectors (TPU-native).

Parity target: the reference's ``VAE_feature_head``
(scripts/pre_experiments/model_myself/utils/model.py:6-81 /
vae_extent_search.py:258-339): 3x(Linear+ReLU) encoder -> fc_mu/fc_logvar,
symmetric decoder, optional feature-predictor head from z; loss =
alpha_recon * MSE + beta * KL (+ alpha_feat * feature MSE); trained with
Adam, early stopping on val loss.

Everything is a pure function over a param pytree; the train step is one
jitted function, so a 500-epoch run is 500 device dispatches of a fused
XLA program (the reference runs a Python-side minibatch loop per epoch).
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .modules import dense, dense_init, mlp_apply, mlp_init


def init_vae_params(key, input_dim: int, latent_dim: int = 16,
                    hidden_dim: int = 128,
                    feature_dim: Optional[int] = None) -> Dict:
    keys = jax.random.split(key, 5)
    params = {
        "encoder": mlp_init(keys[0], [input_dim, hidden_dim, hidden_dim, hidden_dim]),
        "fc_mu": dense_init(keys[1], hidden_dim, latent_dim),
        "fc_logvar": dense_init(keys[2], hidden_dim, latent_dim),
        "decoder": mlp_init(
            keys[3], [latent_dim, hidden_dim, hidden_dim, hidden_dim, input_dim]
        ),
    }
    if feature_dim is not None:
        params["feature_predictor"] = mlp_init(
            keys[4], [latent_dim, hidden_dim, hidden_dim, feature_dim]
        )
    return params


def vae_encode(params: Dict, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    h = mlp_apply(params["encoder"], x, final_activation=True)
    # clamp logvar for numerical stability of exp() under long scans
    return dense(params["fc_mu"], h), jnp.clip(dense(params["fc_logvar"], h), -10.0, 10.0)


def vae_decode(params: Dict, z: jnp.ndarray) -> jnp.ndarray:
    return mlp_apply(params["decoder"], z, final_activation=False)


def reparameterize(key, mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, std.shape, std.dtype)
    return mu + eps * std


def vae_forward(params: Dict, x: jnp.ndarray, key=None, use_mean: bool = True):
    mu, logvar = vae_encode(params, x)
    z = mu if use_mean or key is None else reparameterize(key, mu, logvar)
    x_recon = vae_decode(params, z)
    feature_pred = None
    if "feature_predictor" in params:
        feature_pred = mlp_apply(params["feature_predictor"], z)
    return x_recon, mu, logvar, z, feature_pred


def kld_loss(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """-0.5 * mean(1 + logvar - mu^2 - exp(logvar))
    (reference vae_extent_search.py:765-770 kld_loss_fn)."""
    return -0.5 * jnp.mean(1.0 + logvar - mu**2 - jnp.exp(logvar))


def vae_loss(params: Dict, x: jnp.ndarray, key, beta: float = 0.01,
             alpha_recon: float = 1.0, alpha_feat: float = 0.0,
             features: Optional[jnp.ndarray] = None, use_mean: bool = False):
    x_recon, mu, logvar, z, feature_pred = vae_forward(
        params, x, key, use_mean=use_mean
    )
    recon = jnp.mean((x_recon - x) ** 2)
    kld = kld_loss(mu, logvar)
    total = alpha_recon * recon + beta * kld
    if alpha_feat and feature_pred is not None and features is not None:
        total = total + alpha_feat * jnp.mean((feature_pred - features) ** 2)
    return total, {"recon": recon, "kld": kld}


def masked_vae_loss(params: Dict, x: jnp.ndarray, row_mask, key,
                    beta: float, alpha_recon: float,
                    deterministic: bool = False):
    """VAE loss over valid rows only (padding rows masked out).

    ``deterministic=True`` encodes z = mu with no sampling — the plain
    autoencoder of the reference's AE ablation arm
    (pre_experiments/for_ablation/ae_reg_feature.ipynb SegmentAE:
    reconstruction-only pretraining, no reparameterization; pass
    beta=0 to drop the KL term as that arm does)."""
    x_recon, mu, logvar, z, _ = vae_forward(
        params, x, key, use_mean=deterministic)
    denom = jnp.maximum(row_mask.sum(), 1)
    recon = jnp.sum(
        jnp.where(row_mask[:, None], (x_recon - x) ** 2, 0.0)
    ) / (denom * x.shape[-1])
    kl_terms = -0.5 * (1.0 + logvar - mu**2 - jnp.exp(logvar))
    kld = jnp.sum(jnp.where(row_mask[:, None], kl_terms, 0.0)) / (
        denom * mu.shape[-1]
    )
    return alpha_recon * recon + beta * kld, (recon, kld)


@functools.partial(
    jax.jit,
    static_argnames=("beta", "alpha_recon", "lr", "epochs", "deterministic"),
)
def fit_vae(params: Dict, X_batches: jnp.ndarray, batch_masks: jnp.ndarray,
            X_val: jnp.ndarray, key, beta: float = 0.01,
            alpha_recon: float = 1.0, lr: float = 1e-3, epochs: int = 500,
            X_val_mask: Optional[jnp.ndarray] = None,
            deterministic: bool = False):
    """VAE pretraining as ONE compiled program: scan over epochs of a scan
    over fixed minibatches, tracking best-val params in carry (the
    reference runs a Python loop with early stopping on val loss,
    vae_extent_search.py:430-509 — best-val tracking subsumes it)."""
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    def batch_step(carry, xm):
        params, opt_state, key = carry
        x, m = xm
        key, sub = jax.random.split(key)
        (loss, _), grads = jax.value_and_grad(masked_vae_loss, has_aux=True)(
            params, x, m, sub, beta, alpha_recon, deterministic
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, key), loss

    def epoch_step(carry, _):
        params, opt_state, key, best_val, best_params = carry
        (params, opt_state, key), losses = jax.lax.scan(
            batch_step, (params, opt_state, key), (X_batches, batch_masks)
        )
        val, _ = masked_vae_loss(
            params, X_val,
            jnp.ones(X_val.shape[0], bool) if X_val_mask is None
            else X_val_mask,
            None, beta, alpha_recon, deterministic,
        ) if X_val.shape[0] else (jnp.float32(0.0), None)
        better = val < best_val
        best_params = jax.tree_util.tree_map(
            lambda b, p: jnp.where(better, p, b), best_params, params
        )
        best_val = jnp.where(better, val, best_val)
        return (params, opt_state, key, best_val, best_params), (
            losses.mean(), val,
        )

    init = (params, opt_state, key, jnp.inf, params)
    (params, _, _, best_val, best_params), history = jax.lax.scan(
        epoch_step, init, None, length=epochs
    )
    return best_params, best_val, history


def batchify(X: jnp.ndarray, batch_size: int, n_valid=None):
    """Pad to a multiple of batch_size and reshape to [nb, B, D] + masks.
    ``n_valid`` treats trailing rows beyond it as padding too (bucketed
    inputs)."""
    n, d = X.shape
    nb = max(1, -(-n // batch_size))
    pad = nb * batch_size - n
    Xp = jnp.concatenate([X, jnp.zeros((pad, d), X.dtype)]) if pad else X
    mask = jnp.arange(nb * batch_size) < (n if n_valid is None else
                                          min(n, n_valid))
    return Xp.reshape(nb, batch_size, d), mask.reshape(nb, batch_size)


def train_vae(key, X_train: jnp.ndarray, X_val: jnp.ndarray,
              latent_dim: int = 64, hidden_dim: int = 256, lr: float = 1e-3,
              beta: float = 0.01, alpha_recon: float = 1.0,
              epochs: int = 500, batch_size: int = 512, patience: int = 30,
              feature_dim=None, features_train=None, verbose: bool = False,
              n_train_valid: Optional[int] = None,
              X_val_mask=None, deterministic: bool = False):
    """Full VAE pretraining (one device program; see fit_vae).

    ``n_train_valid`` marks trailing rows of a shape-bucketed X_train as
    padding (masked out of the loss); ``X_val_mask`` likewise for X_val —
    fixed bucketed shapes let one compiled program serve every task of a
    multi-task sweep."""
    input_dim = X_train.shape[-1]
    pkey, tkey = jax.random.split(key)
    params = init_vae_params(pkey, input_dim, latent_dim, hidden_dim,
                             feature_dim)
    Xb, mb = batchify(jnp.asarray(X_train), batch_size,
                      n_valid=n_train_valid)
    best_params, best_val, history = fit_vae(
        params, Xb, mb, jnp.asarray(X_val), tkey, beta=beta,
        alpha_recon=alpha_recon, lr=lr, epochs=epochs,
        X_val_mask=X_val_mask, deterministic=deterministic,
    )
    return best_params, {"best_val": float(best_val), "history": history}

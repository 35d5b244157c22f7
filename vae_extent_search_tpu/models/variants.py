"""Alternative cost-model architectures over per-store feature sequences.

Parity targets:
- LSTM variant (reference cost_model/mlp_model.py:223-271 LSTMModuel):
  row encoder -> LSTM over each program's store rows -> last hidden ->
  decoder
- MHA variant (mlp_model.py:273-339): row encoder -> multi-head
  self-attention within a program's rows -> masked mean-pool -> residual
  blocks -> decoder
- TabNet (cost_model/tabnet_model.py:30-770 + sparsemax.py): the full
  SegmentSumMLPModule flow — per-store rows through a 7-step TabNet
  encoder (entmax-1.5 attentive masks with prior, shared+independent
  GLU stacks with sqrt(0.5) residuals, ghost batch-norm vb=512),
  encodings segment-summed per program, two residual relu layers,
  decoder

TPU-first: programs are padded to [S, T, D] (segments x max rows) with a
row mask; the LSTM is a lax.scan, attention/sparsemax are fused XLA ops.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .modules import dense, dense_init, mlp_apply, mlp_init


def pad_segments(features_list, max_rows: Optional[int] = None):
    """Ragged [n_i, D] arrays -> ([S, T, D] padded, [S, T] mask)."""
    S = len(features_list)
    T = max_rows or max((len(f) for f in features_list), default=1)
    D = features_list[0].shape[1] if S else 0
    out = np.zeros((S, T, D), np.float32)
    mask = np.zeros((S, T), bool)
    for i, f in enumerate(features_list):
        k = min(len(f), T)
        out[i, :k] = f[:k]
        mask[i, :k] = True
    return jnp.asarray(out), jnp.asarray(mask)


# ---------------------------------------------------------------------------
# LSTM variant
# ---------------------------------------------------------------------------


def init_lstm_params(key, in_dim: int, hidden_dim: int = 256) -> Dict:
    keys = jax.random.split(key, 4)
    return {
        "segment_encoder": mlp_init(keys[0], [in_dim, hidden_dim, hidden_dim]),
        "lstm_x": dense_init(keys[1], hidden_dim, 4 * hidden_dim),
        "lstm_h": dense_init(keys[2], hidden_dim, 4 * hidden_dim),
        "decoder": mlp_init(keys[3], [hidden_dim, hidden_dim, 1]),
    }


def lstm_forward(params: Dict, feats: jnp.ndarray,
                 mask: jnp.ndarray) -> jnp.ndarray:
    """feats [S, T, D], mask [S, T] -> scores [S]."""
    h0 = mlp_apply(params["segment_encoder"], feats, final_activation=True)
    S, T, H = h0.shape

    def cell(carry, xm):
        h, c = carry
        x, m = xm  # [S, H], [S]
        gates = dense(params["lstm_x"], x) + dense(params["lstm_h"], h)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
        g = jnp.tanh(g)
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        keep = m[:, None]
        return (jnp.where(keep, h_new, h), jnp.where(keep, c_new, c)), None

    init = (jnp.zeros((S, H)), jnp.zeros((S, H)))
    (h_last, _), _ = jax.lax.scan(
        cell, init, (h0.transpose(1, 0, 2), mask.T)
    )
    return mlp_apply(params["decoder"], h_last).squeeze(-1)


# ---------------------------------------------------------------------------
# MHA variant
# ---------------------------------------------------------------------------


def init_mha_params(key, in_dim: int, hidden_dim: int = 256,
                    n_heads: int = 8) -> Dict:
    keys = jax.random.split(key, 7)
    return {
        "segment_encoder": mlp_init(keys[0], [in_dim, hidden_dim, hidden_dim]),
        "q": dense_init(keys[1], hidden_dim, hidden_dim),
        "k": dense_init(keys[2], hidden_dim, hidden_dim),
        "v": dense_init(keys[3], hidden_dim, hidden_dim),
        "o": dense_init(keys[4], hidden_dim, hidden_dim),
        "l0": mlp_init(keys[5], [hidden_dim, hidden_dim]),
        "decoder": dense_init(keys[6], hidden_dim, 1),
    }


def mha_forward(params: Dict, feats: jnp.ndarray, mask: jnp.ndarray,
                n_heads: int = 8) -> jnp.ndarray:
    h = mlp_apply(params["segment_encoder"], feats, final_activation=True)
    S, T, H = h.shape
    nh = n_heads
    hd = H // nh

    def split_heads(x):
        return x.reshape(S, T, nh, hd).transpose(0, 2, 1, 3)  # [S,nh,T,hd]

    q = split_heads(dense(params["q"], h))
    k = split_heads(dense(params["k"], h))
    v = split_heads(dense(params["v"], h))
    logits = jnp.einsum("shtd,shud->shtu", q, k) / jnp.sqrt(float(hd))
    neg = jnp.float32(-1e9)
    logits = jnp.where(mask[:, None, None, :], logits, neg)
    attn = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum("shtu,shud->shtd", attn, v)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(S, T, H)
    out = dense(params["o"], ctx) + h
    # masked mean pool over rows
    denom = jnp.maximum(mask.sum(axis=1, keepdims=True), 1)
    pooled = jnp.sum(jnp.where(mask[..., None], out, 0.0), axis=1) / denom
    pooled = mlp_apply(params["l0"], pooled, final_activation=True) + pooled
    return dense(params["decoder"], pooled).squeeze(-1)


# ---------------------------------------------------------------------------
# TabNet
# ---------------------------------------------------------------------------


def sparsemax(z: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Sparse softmax projection onto the simplex (reference
    cost_model/sparsemax.py; Martins & Astudillo 2016)."""
    if axis != -1 and axis != z.ndim - 1:
        zt = jnp.moveaxis(z, axis, -1)
        return jnp.moveaxis(sparsemax(zt, axis=-1), -1, axis)
    z_sorted = jnp.sort(z, axis=-1)[..., ::-1]
    k = jnp.arange(1, z.shape[-1] + 1, dtype=z.dtype)
    z_cumsum = jnp.cumsum(z_sorted, axis=-1)
    support = 1.0 + k * z_sorted > z_cumsum
    k_z = jnp.sum(support, axis=-1, keepdims=True).astype(z.dtype)
    tau = (jnp.take_along_axis(
        z_cumsum, k_z.astype(jnp.int32) - 1, axis=-1) - 1.0) / k_z
    return jnp.maximum(z - tau, 0.0)


def entmax15(z: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Exact 1.5-entmax (Peters, Niculae & Martins 2019) — the mask the
    reference's TabNet uses (tabnet_model.py mask_type="entmax",
    SegmentSumMLPModule:719). Closed form via the sorted-moments
    threshold; outputs p_i = max(z_i/2 - tau, 0)^2 summing to 1."""
    if axis != -1 and axis != z.ndim - 1:
        zt = jnp.moveaxis(z, axis, -1)
        return jnp.moveaxis(entmax15(zt, axis=-1), -1, axis)
    zh = z / 2.0
    zs = jnp.sort(zh, axis=-1)[..., ::-1]
    k = jnp.arange(1, z.shape[axis] + 1, dtype=z.dtype)
    mean = jnp.cumsum(zs, axis=axis) / k
    meansq = jnp.cumsum(zs * zs, axis=axis) / k
    ss = k * (meansq - mean * mean)
    delta = (1.0 - ss) / k
    # safe sqrt: d/dx sqrt(x) at the clamp point is inf -> NaN grads
    pos = delta > 0.0
    tau = mean - jnp.sqrt(jnp.where(pos, delta, 1.0)) * pos
    support = (tau <= zs) & (delta >= 0.0)
    k_star = jnp.maximum(
        jnp.sum(support, axis=axis, keepdims=True), 1)
    tau_star = jnp.take_along_axis(tau, k_star.astype(jnp.int32) - 1,
                                   axis=axis)
    p = jnp.square(jnp.maximum(zh - tau_star, 0.0))
    # exact tau makes p sum to 1; normalize to absorb fp round-off
    return p / jnp.maximum(p.sum(axis=axis, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# Faithful TabNet encoder (reference tabnet_model.py:30-588 +
# SegmentSumMLPModule:703-770): per-store rows run through the TabNet
# encoder FIRST, encodings segment-sum per program, then two residual
# relu layers + decoder. Config mirrors SegmentSumMLPModule:709-719
# (n_d = n_a = 64, n_steps = 7, gamma = 1.3, 2 shared + 2 independent
# GLU layers, ghost batch-norm with virtual batch 512, entmax masks).
# ---------------------------------------------------------------------------

_TABNET_VB = 512
_TABNET_BN_MOM = 0.02


def _xavier_normal(key, shape, gain):
    std = gain * np.sqrt(2.0 / (shape[0] + shape[1]))
    return jax.random.normal(key, shape, jnp.float32) * std


def _glu_fc_init(key, in_dim, out2):
    # initialize_glu: gain = sqrt((in + out2) / sqrt(in)); no bias
    return _xavier_normal(key, (in_dim, out2),
                          np.sqrt((in_dim + out2) / np.sqrt(in_dim)))


def _non_glu_fc_init(key, in_dim, out):
    return _xavier_normal(key, (in_dim, out),
                          np.sqrt((in_dim + out) / np.sqrt(4 * in_dim)))


def _bn_init(dim):
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def _bn_state_init(dim):
    return {"mean": jnp.zeros((dim,)), "var": jnp.ones((dim,))}


def _gbn_apply(p, st, x, training, momentum=_TABNET_BN_MOM,
               virtual_batch=_TABNET_VB):
    """Ghost batch norm (tabnet_model.py GBN:226-243): at train time each
    virtual batch normalizes with its own statistics; running stats feed
    eval. Rows pad to a virtual-batch multiple with the batch mean so
    padding cannot skew chunk statistics."""
    if not training:
        inv = jax.lax.rsqrt(st["var"] + 1e-5)
        return (x - st["mean"]) * inv * p["scale"] + p["bias"], st
    n, d = x.shape
    vb = min(virtual_batch, max(n, 1))
    nchunk = -(-n // vb)
    pad = nchunk * vb - n
    full_mean = x.mean(axis=0)
    xp = jnp.concatenate(
        [x, jnp.broadcast_to(full_mean, (pad, d))]) if pad else x
    xc = xp.reshape(nchunk, vb, d)
    mu = xc.mean(axis=1, keepdims=True)
    var = xc.var(axis=1, keepdims=True)
    y = (xc - mu) * jax.lax.rsqrt(var + 1e-5)
    y = (y.reshape(-1, d)[:n]) * p["scale"] + p["bias"]
    batch_mean = mu.mean(axis=(0, 1))
    batch_var = var.mean(axis=(0, 1))
    new_st = {
        "mean": (1 - momentum) * st["mean"] + momentum * batch_mean,
        "var": (1 - momentum) * st["var"] + momentum * batch_var,
    }
    return y, new_st


class TabNetConfig(NamedTuple):
    n_d: int = 64
    n_a: int = 64
    n_steps: int = 7
    gamma: float = 1.3
    n_shared: int = 2
    n_independent: int = 2


def init_tabnet_params(key, in_dim: int, hidden_dim: int = 128,
                       cfg: TabNetConfig = TabNetConfig()):
    """(params, bn_state) for the full encoder + segment head."""
    nda = cfg.n_d + cfg.n_a
    keys = iter(jax.random.split(key, 64))
    params = {"initial_bn": _bn_init(in_dim)}
    state = {"initial_bn": _bn_state_init(in_dim)}
    # shared GLU FCs (first maps in_dim, rest nda)
    params["shared_fcs"] = [
        _glu_fc_init(next(keys), in_dim if i == 0 else nda, 2 * nda)
        for i in range(cfg.n_shared)
    ]

    def ft_init(tag):
        # per-FeatTransformer: a GBN per shared layer + independent GLUs
        params[tag] = {
            "shared_bns": [_bn_init(2 * nda)
                           for _ in range(cfg.n_shared)],
            "indep": [
                {"fc": _glu_fc_init(next(keys), nda, 2 * nda),
                 "bn": _bn_init(2 * nda)}
                for _ in range(cfg.n_independent)
            ],
        }
        state[tag] = {
            "shared_bns": [_bn_state_init(2 * nda)
                           for _ in range(cfg.n_shared)],
            "indep": [_bn_state_init(2 * nda)
                      for _ in range(cfg.n_independent)],
        }

    ft_init("splitter")
    for s in range(cfg.n_steps):
        ft_init(f"ft_{s}")
        params[f"att_{s}"] = {
            "fc": _non_glu_fc_init(next(keys), cfg.n_a, in_dim),
            "bn": _bn_init(in_dim),
        }
        state[f"att_{s}"] = _bn_state_init(in_dim)
    params["final"] = _non_glu_fc_init(next(keys), cfg.n_d, hidden_dim)
    params["l0"] = dense_init(next(keys), hidden_dim, hidden_dim)
    params["l1"] = dense_init(next(keys), hidden_dim, hidden_dim)
    params["decoder"] = dense_init(next(keys), hidden_dim, 1)
    return params, state


def _feat_transformer(params, shared_fcs, st, x, training):
    """Shared GLU block (first layer unscaled) + independent GLU block,
    residuals scaled by sqrt(0.5) (tabnet_model.py GLU_Block:146-187)."""
    scale = np.sqrt(0.5).astype(np.float32)
    new_st = {"shared_bns": [], "indep": []}
    h = x
    for i, fc in enumerate(shared_fcs):
        g = h @ fc
        g, bst = _gbn_apply(params["shared_bns"][i],
                            st["shared_bns"][i], g, training)
        new_st["shared_bns"].append(bst)
        half = g.shape[-1] // 2
        glu = g[:, :half] * jax.nn.sigmoid(g[:, half:])
        h = glu if i == 0 else (h + glu) * scale
    for i, lay in enumerate(params["indep"]):
        g = h @ lay["fc"]
        g, bst = _gbn_apply(lay["bn"], st["indep"][i], g, training)
        new_st["indep"].append(bst)
        half = g.shape[-1] // 2
        glu = g[:, :half] * jax.nn.sigmoid(g[:, half:])
        h = (h + glu) * scale if (shared_fcs or i > 0) else glu
    return h, new_st


def tabnet_encode(params, state, x, training=False,
                  cfg: TabNetConfig = TabNetConfig()):
    """Per-row TabNet encoding [N, in_dim] -> [N, hidden]
    (TabNetEncoder.forward:353-380 + final_mapping:567-582)."""
    new_state = {}
    x, new_state["initial_bn"] = _gbn_apply(
        params["initial_bn"], state["initial_bn"], x, training,
        momentum=0.01, virtual_batch=1 << 30)  # plain BN on input
    prior = jnp.ones_like(x)
    h, new_state["splitter"] = _feat_transformer(
        params["splitter"], params["shared_fcs"], state["splitter"], x,
        training)
    att = h[:, cfg.n_d:]
    res = 0.0
    for s in range(cfg.n_steps):
        a = att @ params[f"att_{s}"]["fc"]
        a, new_state[f"att_{s}"] = _gbn_apply(
            params[f"att_{s}"]["bn"], state[f"att_{s}"], a, training)
        mask = entmax15(a * prior)
        prior = (cfg.gamma - mask) * prior
        h, new_state[f"ft_{s}"] = _feat_transformer(
            params[f"ft_{s}"], params["shared_fcs"], state[f"ft_{s}"],
            mask * x, training)
        res = res + jax.nn.relu(h[:, :cfg.n_d])
        att = h[:, cfg.n_d:]
    return res @ params["final"], new_state


def tabnet_forward(params, state, feats, mask, training=False,
                   cfg: TabNetConfig = TabNetConfig()):
    """[S, T, D] padded rows -> per-program scores [S]
    (SegmentSumMLPModule.forward:740-770: encode rows, segment-sum
    encodings, two residual relu layers, decoder)."""
    S, T, D = feats.shape
    rows = feats.reshape(S * T, D)
    enc, new_state = tabnet_encode(params, state, rows, training, cfg)
    enc = enc.reshape(S, T, -1)
    seg = jnp.sum(jnp.where(mask[..., None], enc, 0.0), axis=1)
    h = jax.nn.relu(dense(params["l0"], seg)) + seg
    h = jax.nn.relu(dense(params["l1"], h)) + h
    return dense(params["decoder"], h).squeeze(-1), new_state


# ---------------------------------------------------------------------------
# A shared model wrapper with the MLPModelInternal surface
# ---------------------------------------------------------------------------


class SequenceModelInternal:
    """fit_base/predict/save/load for the LSTM/MHA/TabNet variants."""

    def __init__(self, arch: str = "lstm", in_dim: int = 164,
                 hidden_dim: int = 256, lr: float = 7e-4,
                 n_epoch: int = 100, batch_rows: int = 64, seed: int = 0):
        assert arch in ("lstm", "mha", "tabnet")
        self.arch = arch
        self.in_dim = in_dim
        self.hidden_dim = hidden_dim if arch != "tabnet" else 128
        self.lr = lr
        self.n_epoch = n_epoch
        self.batch_rows = batch_rows
        self.seed = seed
        self.params = None
        self.fea_norm_vec = None

    def _init(self, key):
        if self.arch == "lstm":
            return init_lstm_params(key, self.in_dim, self.hidden_dim)
        if self.arch == "mha":
            return init_mha_params(key, self.in_dim, self.hidden_dim)
        params, self.bn_state = init_tabnet_params(
            key, self.in_dim, self.hidden_dim)
        return params

    def _forward(self, params, feats, mask, training=False):
        if self.arch == "lstm":
            return lstm_forward(params, feats, mask)
        if self.arch == "mha":
            return mha_forward(params, feats, mask)
        preds, new_state = tabnet_forward(params, self.bn_state, feats,
                                          mask, training=training)
        if training:
            return preds, new_state
        return preds

    def fit_base(self, features_list, labels, verbose=False):
        from .segment import compute_fea_norm_vec

        self.fea_norm_vec = compute_fea_norm_vec(features_list)
        feats, mask = pad_segments(
            [f / self.fea_norm_vec for f in features_list]
        )
        labels = jnp.asarray(np.asarray(labels, np.float32))

        key = jax.random.PRNGKey(self.seed)
        self.params = self._init(key)
        tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(self.lr))
        opt_state = tx.init(self.params)

        if self.arch == "tabnet":
            bn_state = self.bn_state

            @jax.jit
            def step_t(params, bn_state, opt_state):
                def loss(params):
                    (preds, new_state) = tabnet_forward(
                        params, bn_state, feats, mask, training=True)
                    return jnp.sqrt(jnp.mean((preds - labels) ** 2)), \
                        new_state
                (l, new_state), grads = jax.value_and_grad(
                    loss, has_aux=True)(params)
                updates, opt_state2 = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), new_state,
                        opt_state2, l)

            for epoch in range(self.n_epoch):
                self.params, bn_state, opt_state, l = step_t(
                    self.params, bn_state, opt_state)
                if verbose and epoch % 20 == 0:
                    print(f"tabnet epoch {epoch}: rmse {float(l):.4f}")
            self.bn_state = bn_state
            return self

        forward = self._forward

        @jax.jit
        def step(params, opt_state):
            def loss(params):
                preds = forward(params, feats, mask)
                return jnp.sqrt(jnp.mean((preds - labels) ** 2))

            l, grads = jax.value_and_grad(loss)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, l

        for epoch in range(self.n_epoch):
            self.params, opt_state, l = step(self.params, opt_state)
            if verbose and epoch % 20 == 0:
                print(f"{self.arch} epoch {epoch}: rmse {float(l):.4f}")
        return self

    def predict_on_features(self, features_list):
        feats, mask = pad_segments(
            [np.asarray(f, np.float32) / self.fea_norm_vec
             for f in features_list]
        )
        preds = np.asarray(self._forward(self.params, feats, mask))
        from .gbdt import _invalid_rows_mask

        for i, bad in enumerate(_invalid_rows_mask(self, features_list)):
            if bad:
                preds[i] = -np.inf
        return preds

    def save(self, path):
        import pickle

        with open(path, "wb") as f:
            pickle.dump({
                "arch": self.arch, "in_dim": self.in_dim,
                "hidden_dim": self.hidden_dim, "lr": self.lr,
                "n_epoch": self.n_epoch,
                "params": jax.tree_util.tree_map(
                    lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                    self.params,
                ),
                "bn_state": jax.tree_util.tree_map(
                    lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                    getattr(self, "bn_state", None),
                ),
                "fea_norm_vec": self.fea_norm_vec,
                "use_workload_embedding": getattr(
                    self, "use_workload_embedding", False),
                "workload_embed_total_dim": getattr(
                    self, "workload_embed_total_dim", 10),
            }, f)

    @classmethod
    def load(cls, path):
        import pickle

        with open(path, "rb") as f:
            blob = pickle.load(f)
        m = cls(blob["arch"], blob["in_dim"], blob["hidden_dim"],
                blob["lr"], blob["n_epoch"])
        m.params = blob["params"]
        m.bn_state = blob.get("bn_state")
        m.fea_norm_vec = blob["fea_norm_vec"]
        m.use_workload_embedding = blob.get("use_workload_embedding", False)
        m.workload_embed_total_dim = blob.get("workload_embed_total_dim", 10)
        return m

"""Alternative cost-model architectures over per-store feature sequences.

Parity targets:
- LSTM variant (reference cost_model/mlp_model.py:223-271 LSTMModuel):
  row encoder -> LSTM over each program's store rows -> last hidden ->
  decoder
- MHA variant (mlp_model.py:273-339): row encoder -> multi-head
  self-attention within a program's rows -> masked mean-pool -> residual
  blocks -> decoder
- TabNet (cost_model/tabnet_model.py:246-588 + sparsemax.py): n_steps of
  attentive feature masking (sparsemax) + GLU feature transformers over
  the segment-summed feature vector

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
    z_sorted = jnp.sort(z, axis=axis)[..., ::-1]
    k = jnp.arange(1, z.shape[axis] + 1, dtype=z.dtype)
    z_cumsum = jnp.cumsum(z_sorted, axis=axis)
    support = 1.0 + k * z_sorted > z_cumsum
    k_z = jnp.sum(support, axis=axis, keepdims=True).astype(z.dtype)
    tau = (jnp.take_along_axis(
        z_cumsum, k_z.astype(jnp.int32) - 1, axis=axis) - 1.0) / k_z
    return jnp.maximum(z - tau, 0.0)


def _glu_block(params, x):
    h = dense(params, x)
    a, b = jnp.split(h, 2, axis=-1)
    return a * jax.nn.sigmoid(b)


def init_tabnet_params(key, in_dim: int, hidden_dim: int = 128,
                       n_steps: int = 3) -> Dict:
    keys = jax.random.split(key, 2 * n_steps + 3)
    p = {
        "shared": dense_init(keys[0], in_dim, 2 * hidden_dim),
        "decoder": dense_init(keys[1], hidden_dim, 1),
    }
    for s in range(n_steps):
        p[f"att_{s}"] = dense_init(keys[2 + 2 * s], hidden_dim, in_dim)
        p[f"ft_{s}"] = dense_init(keys[3 + 2 * s], in_dim, 2 * hidden_dim)
    return p


def tabnet_forward(params: Dict, x: jnp.ndarray,
                   n_steps: int = 3) -> jnp.ndarray:
    """x [S, in_dim] (segment-summed features) -> scores [S].
    n_steps of: attentive sparsemax feature mask -> masked features ->
    GLU feature transformer; step outputs accumulate (reference
    tabnet_model.py TabNetEncoder flow)."""
    prior = jnp.ones_like(x)
    h = _glu_block(params["shared"], x)
    agg = jnp.zeros_like(h)
    for s in range(n_steps):
        att = dense(params[f"att_{s}"], h) * prior
        mask = sparsemax(att)
        prior = prior * (1.25 - mask)
        masked_x = x * mask
        h = _glu_block(params[f"ft_{s}"], masked_x)
        agg = agg + jax.nn.relu(h)
    return dense(params["decoder"], agg).squeeze(-1)


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
        return init_tabnet_params(key, self.in_dim, self.hidden_dim)

    def _forward(self, params, feats, mask):
        if self.arch == "lstm":
            return lstm_forward(params, feats, mask)
        if self.arch == "mha":
            return mha_forward(params, feats, mask)
        seg_sum = jnp.sum(jnp.where(mask[..., None], feats, 0.0), axis=1)
        return tabnet_forward(params, seg_sum)

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
        m.fea_norm_vec = blob["fea_norm_vec"]
        m.use_workload_embedding = blob.get("use_workload_embedding", False)
        m.workload_embed_total_dim = blob.get("workload_embed_total_dim", 10)
        return m

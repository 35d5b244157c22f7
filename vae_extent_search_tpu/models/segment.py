"""Segment-sum cost models over ragged per-store features (TPU-native).

Parity targets:
- SegmentSumMLPModule (reference cost_model/mlp_model.py:147-221):
  2x(Linear+ReLU) per-row encoder -> segment-sum over each program's store
  rows -> two residual (Linear+ReLU) blocks -> linear decoder (+ optional
  sigmoid).
- ranking losses rmse / rankNet / lambdaRank / listNet
  (mlp_model.py:863-944).
- SegmentVAE (vae_experiments/models/vae.py:16-137): same segment encoder,
  normalized segment-sum -> fc_mean/fc_logvar -> decoder reconstructing
  the segment-sum vector.

TPU-first: ragged programs are flattened to a fixed [n_rows, in_dim]
matrix + an int segment-id vector; the sum is jax.ops.segment_sum with a
static segment count (padding rows carry segment id == n_seg and fall off
the end). Everything jits with static shapes; bucketing happens in the
data loader.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .modules import dense, dense_init, mlp_init, mlp_apply


def init_segment_mlp_params(key, in_dim: int, hidden_dim: int = 256,
                            out_dim: int = 1) -> Dict:
    keys = jax.random.split(key, 4)
    return {
        "segment_encoder": mlp_init(keys[0], [in_dim, hidden_dim, hidden_dim]),
        "l0": mlp_init(keys[1], [hidden_dim, hidden_dim]),
        "l1": mlp_init(keys[2], [hidden_dim, hidden_dim]),
        "decoder": dense_init(keys[3], hidden_dim, out_dim),
    }


def segment_sum_rows(h: jnp.ndarray, segment_ids: jnp.ndarray,
                     n_seg: int, via: Optional[str] = None) -> jnp.ndarray:
    """Sum rows of h [R, H] into n_seg buckets (id == n_seg drops).

    On accelerators this is a one-hot matmul: XLA lowers
    jax.ops.segment_sum to a scatter-add that underperforms badly on
    TPU at training shapes (the same pathology models/boost_tpu.py hit
    with histogram scatters in round 2). The [n_seg, R] one-hot
    contraction runs on the MXU and differentiates as a plain matmul.
    CPU keeps the scatter (fast there; the one-hot would be n_seg x R
    extra work). ``via`` forces a path ("scatter"/"matmul") for tests."""
    if via is None:
        via = "scatter" if jax.default_backend() == "cpu" else "matmul"
    if via == "scatter":
        return jax.ops.segment_sum(h, segment_ids,
                                   num_segments=n_seg + 1)[:n_seg]
    oh = (segment_ids[None, :]
          == jnp.arange(n_seg, dtype=segment_ids.dtype)[:, None])
    return oh.astype(h.dtype) @ h


def segment_mlp_forward(params: Dict, features: jnp.ndarray,
                        segment_ids: jnp.ndarray, n_seg: int,
                        add_sigmoid: bool = False) -> jnp.ndarray:
    """features [R, in_dim], segment_ids [R] (id == n_seg for padding)."""
    h = mlp_apply(params["segment_encoder"], features, final_activation=True)
    seg = segment_sum_rows(h, segment_ids, n_seg)
    out = seg
    out = mlp_apply(params["l0"], out, final_activation=True) + out
    out = mlp_apply(params["l1"], out, final_activation=True) + out
    out = dense(params["decoder"], out).squeeze(-1)
    if add_sigmoid:
        out = jax.nn.sigmoid(out)
    return out


# ---------------------------------------------------------------------------
# Ranking losses (mlp_model.py:863-944)
# ---------------------------------------------------------------------------


def rmse_loss(preds, labels, valid_mask=None):
    sq = (preds - labels) ** 2
    if valid_mask is None:
        return jnp.sqrt(jnp.mean(sq))
    return jnp.sqrt(jnp.sum(jnp.where(valid_mask, sq, 0.0))
                    / jnp.maximum(valid_mask.sum(), 1))


def rank_net_loss(preds, labels, valid_mask=None):
    s_ij = preds - preds[:, None]
    p_ij = 1.0 / (jnp.exp(s_ij) + 1.0)
    label_p = (labels[:, None] > labels[None, :]).astype(preds.dtype)
    n = preds.shape[0]
    tri = jnp.triu(jnp.ones((n, n), bool), k=1)
    if valid_mask is not None:
        tri = tri & valid_mask[:, None] & valid_mask[None, :]
    eps = 1e-7
    p = jnp.clip(p_ij, eps, 1 - eps)
    bce = -(label_p * jnp.log(p) + (1 - label_p) * jnp.log(1 - p))
    return jnp.sum(jnp.where(tri, bce, 0.0)) / jnp.maximum(tri.sum(), 1)


def lambda_rank_loss(preds, labels, valid_mask=None, eps=1e-10, sigma=1.0):
    """NDCG-weighted pairwise loss (mlp_model.py:879-926)."""
    if valid_mask is not None:
        neg = jnp.float32(-1e9)
        preds = jnp.where(valid_mask, preds, neg)
        labels = jnp.where(valid_mask, labels, neg)
    n = preds.shape[0]
    idx_pred = jnp.argsort(-preds)
    y_pred_sorted = preds[idx_pred]
    y_true_sorted = jnp.sort(labels)[::-1]
    true_by_pred = labels[idx_pred]

    true_diffs = true_by_pred[:, None] - true_by_pred[None, :]
    pairs_mask = jnp.isfinite(true_diffs) & (true_diffs > 0)
    if valid_mask is not None:
        v = valid_mask[idx_pred]
        pairs_mask = pairs_mask & v[:, None] & v[None, :]

    true_by_pred = jnp.maximum(true_by_pred, 0.0)
    y_true_sorted = jnp.maximum(y_true_sorted, 0.0)

    pos = jnp.arange(1, n + 1, dtype=preds.dtype)
    D = jnp.log2(1.0 + pos)
    maxDCG = jnp.maximum(jnp.sum((2.0**y_true_sorted - 1.0) / D), eps)
    G = (2.0**true_by_pred - 1.0) / maxDCG

    weights = jnp.abs(1.0 / D[:, None] - 1.0 / D[None, :]) * jnp.abs(
        G[:, None] - G[None, :]
    )
    scores_diffs = jnp.clip(
        y_pred_sorted[:, None] - y_pred_sorted[None, :], -1e8, 1e8
    )
    probas = jnp.clip(
        jnp.clip(jax.nn.sigmoid(sigma * scores_diffs), eps, None) ** weights,
        eps, None,
    )
    losses = jnp.log2(probas)
    return -jnp.sum(jnp.where(pairs_mask, losses, 0.0))


def list_net_loss(preds, labels, valid_mask=None, eps=1e-10):
    if valid_mask is not None:
        neg = jnp.float32(-1e9)
        preds = jnp.where(valid_mask, preds, neg)
        labels = jnp.where(valid_mask, labels, neg)
    p = jax.nn.softmax(preds)
    t = jax.nn.softmax(labels)
    return -jnp.sum(t * jnp.log(p + eps))


LOSS_FNS = {
    "rmse": rmse_loss,
    "rankNet": rank_net_loss,
    "lambdaRank": lambda_rank_loss,
    "listNet": list_net_loss,
}


# ---------------------------------------------------------------------------
# The trainable model (MLPModelInternal parity, mlp_model.py:340-846)
# ---------------------------------------------------------------------------


class SegmentBatch(NamedTuple):
    """One fixed-shape flattened batch of ragged programs."""

    features: jnp.ndarray  # [R, in_dim] (padded)
    segment_ids: jnp.ndarray  # [R]; == n_seg for padding rows
    labels: jnp.ndarray  # [n_seg]
    valid: jnp.ndarray  # [n_seg] bool


def make_segment_batches(features_list, labels, batch_size: int = 512,
                         fea_norm_vec=None, shuffle_rng=None,
                         stacked: bool = False, feature_dtype=np.float32):
    """Flatten ragged [n_i, D] feature arrays into fixed-shape batches
    (SegmentDataLoader semantics, mlp_model.py:26-144). Rows are padded to
    the max rows-per-batch bucket; per-column max normalization optional.

    ``stacked``: return ONE SegmentBatch of [n_batches, ...] device
    arrays instead of a per-batch list. The batch axes are built on the
    host and uploaded in one transfer each — at pretraining scale the
    per-batch list costs a second device-side jnp.stack that transiently
    doubles HBM (and the corpus is multiple GB). Byte-identical to
    jnp.stack over the list form. ``feature_dtype`` (stacked path only)
    stores features in bf16 to halve HBM + upload when the f32 corpus
    would not fit on one chip; the forward upcasts to f32 before the
    matmul (mixed precision, same accumulation dtype as f32 storage)."""
    n = len(features_list)
    order = np.arange(n)
    if shuffle_rng is not None:
        shuffle_rng.shuffle(order)
    D = features_list[0].shape[1] if n else 0
    if not n:
        return []
    # fully vectorized pack (a per-program python loop costs ~60 s at a
    # 539k-row corpus and scales linearly — this is the pretraining-
    # scale loader): one concatenate + one fancy-index scatter
    bs = batch_size
    labels = np.asarray(labels, np.float32)
    sizes = np.fromiter((features_list[i].shape[0] for i in order),
                        np.int64, n)
    n_batches = -(-n // bs)
    cum = np.zeros(n + 1, np.int64)
    np.cumsum(sizes, out=cum[1:])
    b_start = cum[np.minimum(np.arange(n_batches) * bs, n)]
    b_end = cum[np.minimum((np.arange(n_batches) + 1) * bs, n)]
    max_rows = int((b_end - b_start).max()) if n_batches else 0
    pos = np.arange(n)                       # program position in order
    batch_of = pos // bs
    within_start = cum[:-1] - b_start[batch_of]
    total = int(cum[-1])
    prog_of_row = np.repeat(pos, sizes)
    row_in_prog = np.arange(total) - np.repeat(cum[:-1], sizes)
    dest = (batch_of[prog_of_row] * max_rows
            + within_start[prog_of_row] + row_in_prog)
    all_feats = (np.concatenate([features_list[i] for i in order], axis=0)
                 .astype(np.float32, copy=False)
                 if total else np.zeros((0, D), np.float32))
    feats = np.zeros((n_batches * max_rows, D), np.float32)
    feats[dest] = all_feats
    if fea_norm_vec is not None:
        feats /= fea_norm_vec
    seg_ids = np.full(n_batches * max_rows, bs, np.int32)
    seg_ids[dest] = (prog_of_row % bs).astype(np.int32)
    labs = np.zeros(n_batches * bs, np.float32)
    labs[:n] = labels[order]
    valid = np.zeros(n_batches * bs, bool)
    valid[:n] = True
    feats = feats.reshape(n_batches, max_rows, D)
    seg_ids = seg_ids.reshape(n_batches, max_rows)
    labs = labs.reshape(n_batches, bs)
    valid = valid.reshape(n_batches, bs)
    if stacked:
        if np.dtype(feature_dtype) != np.float32:
            import ml_dtypes  # ships with jax

            feats = feats.astype(ml_dtypes.bfloat16)
        return SegmentBatch(jnp.asarray(feats), jnp.asarray(seg_ids),
                            jnp.asarray(labs), jnp.asarray(valid))
    return [
        SegmentBatch(jnp.asarray(feats[b]), jnp.asarray(seg_ids[b]),
                     jnp.asarray(labs[b]), jnp.asarray(valid[b]))
        for b in range(n_batches)
    ]


def compute_fea_norm_vec(features_list) -> np.ndarray:
    """Per-column max over the training set (mlp_model.py:95-105)."""
    D = features_list[0].shape[1]
    mx = np.zeros(D, np.float32)
    for f in features_list:
        if len(f):
            mx = np.maximum(mx, np.abs(f).max(axis=0))
    mx[mx == 0] = 1.0
    return mx


# past this many per-store rows on an accelerator, fit_base "auto"
# trains all epochs as one compiled scan (no per-batch dispatches)
_SCAN_FIT_MIN_ROWS = 200_000


@functools.lru_cache(maxsize=None)
def _scan_fit_program(loss_type: str, add_sigmoid: bool, bs: int,
                      patience: int, n_epoch: int, lr: float,
                      grad_clip: float, has_val: bool):
    """Build the jitted whole-training program for _fit_scan. Cached by
    hyperparameter config; the stacked batch arrays are ARGUMENTS, so
    jit's own shape cache handles geometry and nothing corpus-sized is
    baked into the executable."""
    optimizer = optax.chain(
        optax.clip_by_global_norm(grad_clip), optax.adam(lr)
    )
    loss_fn = LOSS_FNS[loss_type]

    def batch_loss(params, feats, segs, labs, valid):
        # bf16-stored corpora upcast per batch slice (storage-only bf16)
        preds = segment_mlp_forward(params, feats.astype(jnp.float32),
                                    segs, bs, add_sigmoid)
        return loss_fn(preds, labs, valid)

    def val_rmse(params, feats, segs, labs, valid):
        preds = segment_mlp_forward(params, feats.astype(jnp.float32),
                                    segs, bs, add_sigmoid)
        return rmse_loss(preds, labs, valid)

    def frozen_where(stop, old, new):
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(stop, a, b), old, new)

    def run(params, TR, VA):
        def epoch_step(carry, _):
            params, opt_state, best_val, best_params, bad, stopped = carry

            def one_batch(c, b):
                p, o = c
                l, grads = jax.value_and_grad(batch_loss)(p, *b)
                updates, o = optimizer.update(grads, o, p)
                p = optax.apply_updates(p, updates)
                return (p, o), l

            (new_p, new_o), ls = jax.lax.scan(
                one_batch, (params, opt_state), TR)
            params = frozen_where(stopped, params, new_p)
            opt_state = frozen_where(stopped, opt_state, new_o)
            if has_val:
                val = jax.vmap(
                    lambda f, s, l, v: val_rmse(params, f, s, l, v)
                )(*VA).mean()
            else:
                val = ls.sum()
            improved = (~stopped) & (val < best_val - 1e-7)
            best_params = frozen_where(~improved, best_params, params)
            best_val = jnp.where(improved, val, best_val)
            bad = jnp.where(stopped, bad,
                            jnp.where(improved, 0, bad + 1))
            stopped = stopped | (bad >= patience)
            return (params, opt_state, best_val, best_params, bad,
                    stopped), val

        carry0 = (params, optimizer.init(params), jnp.float32(np.inf),
                  params, jnp.int32(0), jnp.bool_(False))
        (_, _, _, best_params, _, _), vals = jax.lax.scan(
            epoch_step, carry0, None, length=n_epoch)
        return best_params, vals

    return jax.jit(run)


class MLPModelInternal:
    """Cost model: fit_base / predict / save / load
    (mlp_model.py MLPModelInternal; default loss lambdaRank, hidden 256,
    Adam lr 7e-4, grad clip 0.5, early stop n/6)."""

    def __init__(self, in_dim: int = 164, hidden_dim: int = 256,
                 loss_type: str = "lambdaRank", lr: float = 7e-4,
                 batch_size: int = 512, grad_clip: float = 0.5,
                 n_epoch: int = 150, seed: int = 0,
                 fit_mode: str = "auto"):
        # fit_mode: "host" = one jitted step per batch (the reference's
        # loop shape, mlp_model.py:560-600); "scan" = ALL epochs as one
        # compiled lax.scan over stacked batches (pretraining-scale
        # path: no per-batch dispatch, which over the tunneled chip
        # costs ~1-6 ms each); "auto" = scan past _SCAN_FIT_MIN_ROWS
        # per-store rows on an accelerator backend.
        self.in_dim = in_dim
        self.hidden_dim = hidden_dim
        self.loss_type = loss_type
        self.lr = lr
        self.batch_size = batch_size
        self.grad_clip = grad_clip
        self.n_epoch = n_epoch
        self.seed = seed
        self.fit_mode = fit_mode
        self.params = None
        self.fea_norm_vec = None
        self._add_sigmoid = loss_type == "rmse"

    def _make_step(self):
        optimizer = optax.chain(
            optax.clip_by_global_norm(self.grad_clip), optax.adam(self.lr)
        )
        loss_fn = LOSS_FNS[self.loss_type]
        add_sigmoid = self._add_sigmoid
        bs = self.batch_size

        @jax.jit
        def step(params, opt_state, batch: SegmentBatch):
            def loss(params):
                preds = segment_mlp_forward(
                    params, batch.features, batch.segment_ids, bs,
                    add_sigmoid,
                )
                return loss_fn(preds, batch.labels, batch.valid)

            l, grads = jax.value_and_grad(loss)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, l

        return optimizer, step

    def fit_base(self, features_list, labels, valid_split: float = 0.1,
                 verbose: bool = False, keep_norm: bool = False,
                 checkpoint_path: str = None, checkpoint_every: int = 25):
        # checkpoint_path: per-epoch crash-resume snapshot, the analogue of
        # the reference's unconditional `self.save("tmp_mlp.pkl")` each
        # epoch (mlp_model.py:598). Our epochs are sub-ms jitted scans, so
        # an every-epoch pickle would dominate wall time; checkpoint_every
        # thins it while keeping the same resume contract (load() restores
        # params + fea_norm_vec mid-fit).
        # keep_norm: reuse the existing normalization vector (fine-tune /
        # meta-learning adaptation must share the base model's scaling)
        if not keep_norm or self.fea_norm_vec is None:
            self.fea_norm_vec = compute_fea_norm_vec(features_list)
        rng = np.random.default_rng(self.seed)
        n = len(features_list)
        perm = rng.permutation(n)
        n_val = max(1, int(n * valid_split)) if n > 4 else 0
        tr = [int(i) for i in perm[n_val:]]
        va = [int(i) for i in perm[:n_val]]

        key = jax.random.PRNGKey(self.seed)
        if self.params is None:
            self.params = init_segment_mlp_params(key, self.in_dim,
                                                  self.hidden_dim)
        optimizer, step = self._make_step()
        opt_state = optimizer.init(self.params)

        labels = np.asarray(labels, np.float32)
        total_rows = sum(len(f) for f in features_list)
        mode = getattr(self, "fit_mode", "auto")  # old-pickle safe
        if mode == "auto":
            import jax as _jax

            mode = ("scan" if total_rows >= _SCAN_FIT_MIN_ROWS
                    and _jax.default_backend() != "cpu" else "host")

        if mode == "scan":
            # single-upload stacked batches; past ~8M rows the f32
            # corpus (rows x in_dim x 4B + padding) crowds a 16 GB chip,
            # so store features bf16 on device (forward upcasts to f32)
            fdt = getattr(self, "scan_feature_dtype", "auto")
            if fdt == "auto":
                fdt = ("bfloat16"
                       if total_rows * self.in_dim * 4 > 6e9 else
                       "float32")
            if fdt == "bfloat16":
                import ml_dtypes

                fdt = ml_dtypes.bfloat16
            else:
                fdt = np.float32
            tr_batches = make_segment_batches(
                [features_list[i] for i in tr], labels[tr],
                self.batch_size, self.fea_norm_vec, stacked=True,
                feature_dtype=fdt,
            )
            va_batches = make_segment_batches(
                [features_list[i] for i in va], labels[va],
                self.batch_size, self.fea_norm_vec, stacked=True,
                feature_dtype=fdt,
            ) if va else []
        else:
            tr_batches = make_segment_batches(
                [features_list[i] for i in tr], labels[tr],
                self.batch_size, self.fea_norm_vec, shuffle_rng=None,
            )
            va_batches = make_segment_batches(
                [features_list[i] for i in va], labels[va],
                self.batch_size, self.fea_norm_vec,
            ) if va else []

        if mode == "scan" and (isinstance(tr_batches, SegmentBatch)
                               or tr_batches):
            self._fit_scan(tr_batches, va_batches, verbose)
            if checkpoint_path:
                self.save(checkpoint_path)
            return self

        best_val = float("inf")
        best_params = self.params
        patience = max(5, self.n_epoch // 6)
        bad = 0
        for epoch in range(self.n_epoch):
            ep = 0.0
            for b in tr_batches:
                self.params, opt_state, l = step(self.params, opt_state, b)
                ep += float(l)
            if va_batches:
                val = float(np.mean([
                    float(rmse_loss(
                        segment_mlp_forward(self.params, b.features,
                                            b.segment_ids, self.batch_size,
                                            self._add_sigmoid),
                        b.labels, b.valid))
                    for b in va_batches
                ]))
            else:
                val = ep
            if val < best_val - 1e-7:
                best_val, best_params, bad = val, self.params, 0
            else:
                bad += 1
                if bad >= patience:
                    break
            if verbose and epoch % 10 == 0:
                print(f"epoch {epoch}: train {ep:.4f} val {val:.4f}")
            if checkpoint_path and epoch % checkpoint_every == 0:
                self.save(checkpoint_path)
        self.params = best_params
        if checkpoint_path:
            self.save(checkpoint_path)
        return self

    def _fit_scan(self, tr_batches, va_batches, verbose=False):
        """All epochs as ONE compiled program: lax.scan over epochs,
        inner scan over the stacked fixed-shape batches. Early stopping
        reproduces the host loop's patience semantics on device (a
        `stopped` flag freezes params/best once bad >= patience —
        identical selection, the post-stop epochs are just dead
        compute). This is the pretraining-scale path: at millions of
        per-store rows the host loop pays one dispatch per batch per
        epoch (~1-6 ms each over the tunneled chip), the scan pays
        one. The compiled program is cached module-level by hyperparam
        config (batches are ARGUMENTS, not traced constants), so
        repeated fits at the same geometry skip compilation."""
        patience = max(5, self.n_epoch // 6)
        has_val = (isinstance(va_batches, SegmentBatch)
                   or bool(va_batches))

        if isinstance(tr_batches, SegmentBatch):
            # stacked loader output: already [n_batches, ...] device
            # arrays, uploaded once — no device-side stack transient
            TR = tuple(tr_batches)
            VA = tuple(va_batches) if has_val else None
        else:
            # jnp.stack, NOT np.stack: the loader's batches are already
            # device-resident; a host stack would device_get ~the corpus
            # bytes and re-upload them over the (tunneled) link per fit
            TR = tuple(jnp.stack([getattr(b, f) for b in tr_batches])
                       for f in SegmentBatch._fields)
            VA = tuple(jnp.stack([getattr(b, f) for b in va_batches])
                       for f in SegmentBatch._fields) if has_val else None

        run = _scan_fit_program(self.loss_type, self._add_sigmoid,
                                self.batch_size, patience, self.n_epoch,
                                self.lr, self.grad_clip, has_val)
        best_params, vals = run(self.params, TR, VA)
        self.params = jax.device_get(best_params)
        if verbose:
            vals = np.asarray(jax.device_get(vals))
            for e in range(0, len(vals), 10):
                print(f"epoch {e}: val {vals[e]:.4f}")
        return self

    def predict_on_features(self, features_list) -> np.ndarray:
        """Scores for ragged feature arrays; all-zero rows (unlowerable
        states) score -inf (mlp_model.py:842-845)."""
        if not features_list:
            return np.zeros(0, np.float32)
        preds = np.empty(len(features_list), np.float32)
        batches = make_segment_batches(
            features_list, np.zeros(len(features_list), np.float32),
            self.batch_size, self.fea_norm_vec,
        )
        pos = 0
        for b in batches:
            out = np.asarray(segment_mlp_forward(
                self.params, b.features, b.segment_ids, self.batch_size,
                self._add_sigmoid,
            ))
            k = int(np.asarray(b.valid).sum())
            preds[pos:pos + k] = out[:k]
            pos += k
        from .gbdt import _invalid_rows_mask

        for i, bad in enumerate(_invalid_rows_mask(self, features_list)):
            if bad:
                preds[i] = -np.inf
        return preds

    def save(self, path: str):
        import pickle

        with open(path, "wb") as f:
            pickle.dump(
                {
                    "config": {
                        "in_dim": self.in_dim, "hidden_dim": self.hidden_dim,
                        "loss_type": self.loss_type, "lr": self.lr,
                        "batch_size": self.batch_size,
                        "grad_clip": self.grad_clip, "n_epoch": self.n_epoch,
                    },
                    "params": jax.tree_util.tree_map(np.asarray, self.params),
                    "fea_norm_vec": self.fea_norm_vec,
                    # whether fit-time features carried the tiled 10-dim
                    # workload embedding (models/embedding.py) — consumers
                    # must featurize predictions the same way
                    "use_workload_embedding": getattr(
                        self, "use_workload_embedding", False),
                    "workload_embed_total_dim": getattr(
                        self, "workload_embed_total_dim", 10),
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "MLPModelInternal":
        import pickle

        with open(path, "rb") as f:
            blob = pickle.load(f)
        model = cls(**blob["config"])
        model.params = jax.tree_util.tree_map(jnp.asarray, blob["params"])
        model.fea_norm_vec = blob["fea_norm_vec"]
        model.use_workload_embedding = blob.get(
            "use_workload_embedding", False)
        model.workload_embed_total_dim = blob.get(
            "workload_embed_total_dim", 10)
        return model


# ---------------------------------------------------------------------------
# SegmentVAE (vae_experiments/models/vae.py:16-137)
# ---------------------------------------------------------------------------


def init_segment_vae_params(key, in_dim: int, hidden_dim: int = 256,
                            latent_dim: int = 64) -> Dict:
    keys = jax.random.split(key, 6)
    return {
        "segment_encoder": mlp_init(keys[0], [in_dim, hidden_dim, hidden_dim]),
        "l0": mlp_init(keys[1], [hidden_dim, hidden_dim]),
        "l1": mlp_init(keys[2], [hidden_dim, hidden_dim]),
        "fc_mean": dense_init(keys[3], hidden_dim, latent_dim),
        "fc_logvar": dense_init(keys[4], hidden_dim, latent_dim),
        "decoder": mlp_init(
            keys[5], [latent_dim, hidden_dim, hidden_dim, hidden_dim]
        ),
    }


def segment_vae_encode(params, features, segment_ids, n_seg,
                       stats_valid=None, norm_stats=None):
    """Returns (mu, logvar, segment_sum_target).

    Batch-standardization of the segment sums (BatchNorm1d equivalent):
    by default train-mode full-batch statistics (the reference trains and
    predicts on one fixed candidate pool, so the stats are consistent).
    ``stats_valid`` restricts the statistics to real segments when the
    batch carries padding rows; ``norm_stats=(mean, var)`` applies frozen
    statistics instead — BatchNorm eval semantics for models that predict
    on batches other than the one they were fit on."""
    h = mlp_apply(params["segment_encoder"], features, final_activation=True)
    seg = jax.ops.segment_sum(h, segment_ids, num_segments=n_seg + 1)[:n_seg]
    if norm_stats is not None:
        mean, var = norm_stats
    elif stats_valid is not None:
        mean, var = _masked_moments(seg, stats_valid)
    else:
        mean = seg.mean(axis=0, keepdims=True)
        var = seg.var(axis=0, keepdims=True)
    # sqrt(var + eps) keeps the gradient finite on constant channels
    # (one-hot feature columns)
    normed = (seg - mean) * jax.lax.rsqrt(var + 1e-5)
    out = mlp_apply(params["l0"], normed, final_activation=True) + normed
    out = mlp_apply(params["l1"], out, final_activation=True) + out
    logvar = jnp.clip(dense(params["fc_logvar"], out), -10.0, 10.0)
    return dense(params["fc_mean"], out), logvar, normed


def segment_vae_loss(params, features, segment_ids, n_seg, valid, key,
                     beta: float = 1e-4, stats_valid=None):
    mu, logvar, target = segment_vae_encode(params, features, segment_ids,
                                            n_seg, stats_valid=stats_valid)
    std = jnp.exp(0.5 * logvar)
    z = mu + std * jax.random.normal(key, mu.shape, mu.dtype)
    recon = mlp_apply(params["decoder"], z, final_activation=False)
    denom = jnp.maximum(valid.sum(), 1)
    recon_l = jnp.sum(
        jnp.where(valid[:, None], (recon - target) ** 2, 0.0)
    ) / (denom * target.shape[-1])
    kl_terms = -0.5 * (1.0 + logvar - mu**2 - jnp.exp(logvar))
    kld = jnp.sum(jnp.where(valid[:, None], kl_terms, 0.0)) / (
        denom * mu.shape[-1]
    )
    return recon_l + beta * kld, (recon_l, kld)


# ---------------------------------------------------------------------------
# Segment-aware latent cost predictor
# (vae_experiments/models/regression.py:11-173 parity)
# ---------------------------------------------------------------------------


def init_segment_predictor_params(key, in_dim: int, hidden_dim: int = 256,
                                  latent_dim: int = 64,
                                  predictor_hidden: int = 256,
                                  predictor_layers: int = 2) -> Dict:
    keys = jax.random.split(key, 7)
    dims = [latent_dim] + [predictor_hidden] * predictor_layers + [1]
    return {
        "segment_encoder": mlp_init(keys[0], [in_dim, hidden_dim, hidden_dim]),
        "l0": mlp_init(keys[1], [hidden_dim, hidden_dim]),
        "l1": mlp_init(keys[2], [hidden_dim, hidden_dim]),
        "fc_mean": dense_init(keys[3], hidden_dim, latent_dim),
        "fc_logvar": dense_init(keys[4], hidden_dim, latent_dim),
        "cost_predictor": mlp_init(keys[5], dims),
    }


def load_pretrained_segment_encoder(pred_params: Dict,
                                    vae_params: Dict) -> Dict:
    """Copy segment encoder + latent heads from a pretrained SegmentVAE
    (reference regression.py load_pretrained_encoder: key-prefix match)."""
    out = dict(pred_params)
    for k in ("segment_encoder", "l0", "l1", "fc_mean", "fc_logvar"):
        if k in vae_params:
            out[k] = jax.tree_util.tree_map(lambda x: x, vae_params[k])
    return out


def segment_predictor_encode(params, features, segment_ids, n_seg,
                             stats_valid=None, norm_stats=None):
    return segment_vae_encode(
        {
            "segment_encoder": params["segment_encoder"],
            "l0": params["l0"], "l1": params["l1"],
            "fc_mean": params["fc_mean"], "fc_logvar": params["fc_logvar"],
        },
        features, segment_ids, n_seg,
        stats_valid=stats_valid, norm_stats=norm_stats,
    )


def segment_predict_cost(params, z, dropout_key=None,
                         dropout_rate: float = 0.1):
    from .modules import dropout as _dropout

    layers = params["cost_predictor"]
    n = len(layers)
    keys = jax.random.split(dropout_key, n) if dropout_key is not None else None
    h = z
    for i, layer in enumerate(layers):
        h = dense(layer, h)
        if i < n - 1:
            h = jax.nn.relu(h)
            if i < n - 2 and keys is not None:
                h = _dropout(keys[i], h, dropout_rate)
    return h.squeeze(-1)


def segment_predictor_loss(params, features, segment_ids, n_seg, labels,
                           valid, key, config: Dict, stats_valid=None):
    """reg + pair + smooth + KL phase loss over segment encodings
    (vae_experiments/trainer.py:298-568 Regression_Trainer)."""
    from .predictor import pair_loss

    k_smooth, k_drop = jax.random.split(key)
    mu, logvar, _ = segment_predictor_encode(params, features, segment_ids,
                                             n_seg, stats_valid=stats_valid)
    cost = segment_predict_cost(params, mu, k_drop,
                                config.get("dropout", 0.1))
    denom = jnp.maximum(valid.sum(), 1)
    reg = jnp.sum(jnp.where(valid, (cost - labels) ** 2, 0.0)) / denom
    pair = pair_loss(cost, labels, config.get("margin", 0.1), valid)
    noise = config.get("noise_std", 0.001) * jax.random.normal(
        k_smooth, mu.shape, mu.dtype
    )
    smooth = jnp.sum(
        jnp.where(
            valid,
            (segment_predict_cost(params, mu)
             - segment_predict_cost(params, mu + noise)) ** 2,
            0.0,
        )
    ) / denom
    kl_terms = -0.5 * (1.0 + logvar - mu**2 - jnp.exp(logvar))
    kld = jnp.sum(jnp.where(valid[:, None], kl_terms, 0.0)) / (
        denom * mu.shape[-1]
    )
    total = (
        config.get("lambda_reg", 0.01) * reg
        + config.get("lambda_pair", 3.0) * pair
        + config.get("gamma", 0.01) * smooth
        + config.get("beta", 0.01) * kld
    )
    return total, {"reg": reg, "pair": pair, "smooth": smooth, "kld": kld}


@functools.partial(jax.jit, static_argnames=("n_seg", "epochs"))
def fit_segment_predictor(params, features, segment_ids, labels, valid, key,
                          n_seg: int, epochs: int = 300,
                          encoder_lr: float = 1e-5, head_lr: float = 1e-4,
                          stats_valid=None):
    """Full phase training as one compiled scan (same design as
    fit_predictor)."""
    enc_keys = ("segment_encoder", "l0", "l1", "fc_mean", "fc_logvar")

    def label_fn(params):
        return {k: ("enc" if k in enc_keys else "head") for k in params}

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.multi_transform(
            {"enc": optax.adamw(encoder_lr, weight_decay=1e-5),
             "head": optax.adamw(head_lr, weight_decay=1e-5)},
            label_fn,
        ),
    )
    opt_state = tx.init(params)
    cfg = {}

    def step(carry, _):
        params, opt_state, key, best_loss, best_params = carry
        key, sub = jax.random.split(key)
        (loss, aux), grads = jax.value_and_grad(
            segment_predictor_loss, has_aux=True
        )(params, features, segment_ids, n_seg, labels, valid, sub, cfg,
          stats_valid)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        better = loss < best_loss
        best_params = jax.tree_util.tree_map(
            lambda b, p: jnp.where(better, p, b), best_params, params
        )
        best_loss = jnp.where(better, loss, best_loss)
        return (params, opt_state, key, best_loss, best_params), loss

    init = (params, opt_state, key, jnp.inf, params)
    (_, _, _, best_loss, best_params), losses = jax.lax.scan(
        step, init, None, length=epochs
    )
    return best_params, {"best_loss": best_loss, "losses": losses}


def _sgdr_schedule(lr: float, epochs: int, t0: int = 30, t_mult: int = 2):
    """CosineAnnealingWarmRestarts(T_0=30, T_mult=2) equivalent
    (reference vae_experiments/trainer.py:43): cosine cycles of length
    30, 60, 120, ... stepped once per epoch."""
    cycles = []
    t = t0
    total = 0
    while total < epochs:
        cycles.append({"init_value": lr, "peak_value": lr,
                       "decay_steps": t, "warmup_steps": 0,
                       "end_value": 0.0})
        total += t
        t *= t_mult
    return optax.sgdr_schedule(cycles)


@functools.partial(jax.jit, static_argnames=("n_seg", "epochs", "lr"))
def fit_segment_vae(params, features, segment_ids, valid, key, n_seg: int,
                    epochs: int = 200, lr: float = 2e-4, beta: float = 1e-4,
                    stats_valid=None):
    """SegmentVAE pretraining as one compiled scan (reference
    VAE_Trainer.train_vae defaults: 200 epochs, lr 2e-4, beta 1e-4,
    AdamW with cosine-warm-restart LR cycles)."""
    tx = optax.adamw(_sgdr_schedule(lr, epochs))
    opt_state = tx.init(params)

    def step(carry, _):
        params, opt_state, key = carry
        key, sub = jax.random.split(key)
        (loss, aux), grads = jax.value_and_grad(
            segment_vae_loss, has_aux=True
        )(params, features, segment_ids, n_seg, valid, sub, beta,
          stats_valid)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, key), loss

    (params, _, _), losses = jax.lax.scan(
        step, (params, opt_state, key), None, length=epochs
    )
    return params, losses


def eval_segment_vae(params, features, segment_ids, valid, n_seg: int):
    """(reconstruction R^2, KL per latent dim) on the mean latent."""
    mu, logvar, target = segment_vae_encode(
        params, features, segment_ids, n_seg
    )
    recon = mlp_apply(params["decoder"], mu, final_activation=False)
    v = valid[:, None]
    denom = jnp.maximum(valid.sum(), 1)
    err = jnp.sum(jnp.where(v, (recon - target) ** 2, 0.0))
    mean_t = jnp.sum(jnp.where(v, target, 0.0)) / (
        denom * target.shape[-1]
    )
    var_t = jnp.sum(jnp.where(v, (target - mean_t) ** 2, 0.0))
    r2 = 1.0 - err / jnp.maximum(var_t, 1e-8)
    kl_terms = -0.5 * (1.0 + logvar - mu**2 - jnp.exp(logvar))
    kl_per_dim = jnp.sum(jnp.where(v, kl_terms, 0.0)) / (
        denom * mu.shape[-1]
    )
    return float(r2), float(kl_per_dim)


DEFAULT_VAE_SEARCH_CONFIGS = [
    # reference trainer.py:148-156 (hand-picked subset of the full grid)
    {"hidden_dim": 256, "latent_dim": 64, "beta": 1e-4, "lr": 1e-3},
    {"hidden_dim": 256, "latent_dim": 64, "beta": 1e-4, "lr": 2e-4},
    {"hidden_dim": 256, "latent_dim": 64, "beta": 2e-4, "lr": 1e-3},
    {"hidden_dim": 256, "latent_dim": 128, "beta": 5e-5, "lr": 1e-3},
    {"hidden_dim": 256, "latent_dim": 128, "beta": 5e-5, "lr": 5e-4},
    {"hidden_dim": 256, "latent_dim": 128, "beta": 5e-5, "lr": 2e-4},
    {"hidden_dim": 256, "latent_dim": 128, "beta": 1e-4, "lr": 2e-4},
    {"hidden_dim": 256, "latent_dim": 128, "beta": 1e-3, "lr": 2e-4},
]


def search_segment_vae_hyperparams(features, segment_ids, valid, n_seg: int,
                                   in_dim: int, configs=None,
                                   target_kl_range=(0.05, 0.2),
                                   epochs: int = 200, seed: int = 0,
                                   verbose: bool = False):
    """VAE hyperparameter search targeting a healthy KL/dim band
    (reference VAE_Trainer.hyperparameter_search, trainer.py:124-267):
    per config train + evaluate (recon R^2, KL/dim); score = R^2 with up
    to a 10% penalty proportional to the KL/dim distance outside
    ``target_kl_range`` (avoids posterior collapse / blown-up codes).
    Returns (best_params, best_config, results sorted by score)."""
    configs = configs or DEFAULT_VAE_SEARCH_CONFIGS
    kl_min, kl_max = target_kl_range
    results = []
    best = None
    for ci, cfg in enumerate(configs):
        key = jax.random.PRNGKey(seed + ci)
        params = init_segment_vae_params(
            key, in_dim, hidden_dim=cfg["hidden_dim"],
            latent_dim=cfg["latent_dim"],
        )
        params, _ = fit_segment_vae(
            params, features, segment_ids, valid, key, n_seg,
            epochs=epochs, lr=cfg["lr"], beta=cfg["beta"],
        )
        r2, kl_per_dim = eval_segment_vae(
            params, features, segment_ids, valid, n_seg
        )
        if kl_min <= kl_per_dim <= kl_max:
            score = r2
        elif kl_per_dim < kl_min:
            score = r2 - 0.1 * (kl_min - kl_per_dim) / kl_min
        else:
            score = r2 - 0.1 * (kl_per_dim - kl_max) / kl_max
        row = dict(cfg, recon_r2=r2, kl_per_dim=kl_per_dim, score=score,
                   in_kl_range=kl_min <= kl_per_dim <= kl_max)
        results.append((row, params))
        if verbose:
            print(f"[{ci + 1}/{len(configs)}] {cfg} -> R2={r2:.4f} "
                  f"KL/dim={kl_per_dim:.4f} score={score:.4f}")
        if best is None or score > best[0]["score"]:
            best = (row, params)
    results.sort(key=lambda rp: -rp[0]["score"])
    return best[1], best[0], [r for r, _ in results]


@functools.partial(jax.jit, static_argnames=("n_seg",))
def _segment_predictor_scores(params, features, segment_ids, n_seg,
                              norm_stats=None):
    mu, _, _ = segment_predictor_encode(params, features, segment_ids, n_seg,
                                        norm_stats=norm_stats)
    return segment_predict_cost(params, mu)


def _masked_moments(seg, valid):
    """Biased per-channel (mean, var) over valid rows — the single
    definition shared by train-time batch standardization and the
    frozen predict-time statistics (they must agree numerically)."""
    denom = jnp.maximum(valid.sum(), 1)
    v = valid[:, None]
    mean = jnp.sum(jnp.where(v, seg, 0.0), axis=0, keepdims=True) / denom
    var = jnp.sum(
        jnp.where(v, (seg - mean) ** 2, 0.0), axis=0, keepdims=True
    ) / denom
    return mean, var


@functools.partial(jax.jit, static_argnames=("n_seg",))
def _segment_norm_stats(params, features, segment_ids, valid, n_seg):
    """Frozen batch-norm statistics over the fit set's valid segments
    (BatchNorm1d running-stats / eval-mode equivalent)."""
    h = mlp_apply(params["segment_encoder"], features, final_activation=True)
    seg = jax.ops.segment_sum(h, segment_ids, num_segments=n_seg + 1)[:n_seg]
    return _masked_moments(seg, valid)


def _flatten_programs(features_list, labels, fea_norm_vec,
                      seg_bucket: int = 256, row_bucket: int = 4096):
    """Flatten ragged per-program feature matrices into one fixed-shape
    (features, segment_ids, labels, valid) tuple, bucketing both the
    program axis and the row axis so a growing measured set reuses a
    handful of compiled programs instead of recompiling every round."""
    n = len(features_list)
    D = features_list[0].shape[1] if n else 0
    rows = int(sum(len(f) for f in features_list))
    n_seg = max(seg_bucket, -(-n // seg_bucket) * seg_bucket)
    R = max(row_bucket, -(-rows // row_bucket) * row_bucket)
    feats = np.zeros((R, D), np.float32)
    seg_ids = np.full((R,), n_seg, np.int32)  # padding rows -> dropped seg
    labs = np.zeros((n_seg,), np.float32)
    valid = np.zeros((n_seg,), bool)
    r = 0
    for j, f in enumerate(features_list):
        feats[r:r + len(f)] = f
        seg_ids[r:r + len(f)] = j
        labs[j] = labels[j] if labels is not None else 0.0
        valid[j] = True
        r += len(f)
    feats /= fea_norm_vec
    return (jnp.asarray(feats), jnp.asarray(seg_ids), jnp.asarray(labs),
            jnp.asarray(valid), n_seg)


class SegmentVAEModelInternal:
    """VAE-pretrained latent cost model behind the fit/predict interface —
    the reference's for_inference lineage (vae_reg_feature_ansor*.ipynb /
    e2e_vae_reg_feature.ipynb plug the scripts/vae_experiments SegmentVAE
    + Regression pipeline in as the cost model inside Ansor's search;
    tune_vae.py:94-166 is the same flow driven phase-by-phase).

    fit_base = SegmentVAE pretrain on the measured rows (first fit only;
    fit_segment_vae) -> encoder transfer (load_pretrained_segment_encoder)
    -> reg+pair+smooth+KL predictor fit (fit_segment_predictor). Predict
    scores the mean latent through the cost head; all-zero feature rows
    (unlowerable states) score -inf like every other backend."""

    def __init__(self, in_dim: int = 164, hidden_dim: int = 256,
                 latent_dim: int = 64, vae_epochs: int = 200,
                 vae_lr: float = 2e-4, vae_beta: float = 1e-4,
                 reg_epochs: int = 300, encoder_lr: float = 1e-5,
                 head_lr: float = 1e-4, seed: int = 0):
        self.in_dim = in_dim
        self.hidden_dim = hidden_dim
        self.latent_dim = latent_dim
        self.vae_epochs = vae_epochs
        self.vae_lr = vae_lr
        self.vae_beta = vae_beta
        self.reg_epochs = reg_epochs
        self.encoder_lr = encoder_lr
        self.head_lr = head_lr
        self.seed = seed
        self.vae_params = None
        self.params = None
        self.fea_norm_vec = None
        self.norm_stats = None

    def fit_base(self, features_list, labels, valid_split: float = 0.1,
                 verbose: bool = False, keep_norm: bool = False):
        if not keep_norm or self.fea_norm_vec is None:
            self.fea_norm_vec = compute_fea_norm_vec(features_list)
        labels = np.asarray(labels, np.float32)
        feats, seg_ids, labs, valid, n_seg = _flatten_programs(
            features_list, labels, self.fea_norm_vec
        )
        key = jax.random.PRNGKey(self.seed)
        k_vae, k_pred, k_fit = jax.random.split(key, 3)
        # batch-norm statistics are restricted to the real (non-padding)
        # segments during fit and FROZEN afterwards for prediction —
        # this model predicts on batches other than its fit set (GA
        # generations), so train-mode batch stats would shift between
        # fit and predict (BatchNorm eval semantics instead)
        if self.vae_params is None:
            # pretrain once per search (reference tune_vae.py:100-110:
            # the SegmentVAE trains on the initial pool, later phases
            # retrain only the regression model on all measured)
            self.vae_params = init_segment_vae_params(
                k_vae, self.in_dim, self.hidden_dim, self.latent_dim
            )
            self.vae_params, _ = fit_segment_vae(
                self.vae_params, feats, seg_ids, valid, k_vae, n_seg,
                epochs=self.vae_epochs, lr=self.vae_lr, beta=self.vae_beta,
                stats_valid=valid,
            )
        params = init_segment_predictor_params(
            k_pred, self.in_dim, self.hidden_dim, self.latent_dim
        )
        params = load_pretrained_segment_encoder(params, self.vae_params)
        self.params, _ = fit_segment_predictor(
            params, feats, seg_ids, labs, valid, k_fit, n_seg,
            epochs=self.reg_epochs, encoder_lr=self.encoder_lr,
            head_lr=self.head_lr, stats_valid=valid,
        )
        self.norm_stats = _segment_norm_stats(
            self.params, feats, seg_ids, valid, n_seg
        )
        return self

    def predict_on_features(self, features_list) -> np.ndarray:
        if not len(features_list):
            return np.zeros(0, np.float32)
        feats, seg_ids, _, _, n_seg = _flatten_programs(
            features_list, None, self.fea_norm_vec
        )
        scores = np.asarray(_segment_predictor_scores(
            self.params, feats, seg_ids, n_seg, self.norm_stats
        ))[: len(features_list)].astype(np.float32)
        from .gbdt import _invalid_rows_mask

        for i, bad in enumerate(_invalid_rows_mask(self, features_list)):
            if bad:
                scores[i] = -np.inf
        return scores

    def save(self, path: str):
        import pickle

        to_np = functools.partial(jax.tree_util.tree_map, np.asarray)
        with open(path, "wb") as f:
            pickle.dump(
                {
                    "config": {
                        "in_dim": self.in_dim,
                        "hidden_dim": self.hidden_dim,
                        "latent_dim": self.latent_dim,
                        "vae_epochs": self.vae_epochs,
                        "vae_lr": self.vae_lr, "vae_beta": self.vae_beta,
                        "reg_epochs": self.reg_epochs,
                        "encoder_lr": self.encoder_lr,
                        "head_lr": self.head_lr, "seed": self.seed,
                    },
                    "vae_params": to_np(self.vae_params),
                    "params": to_np(self.params),
                    "norm_stats": to_np(self.norm_stats),
                    "fea_norm_vec": self.fea_norm_vec,
                    "use_workload_embedding": getattr(
                        self, "use_workload_embedding", False),
                    "workload_embed_total_dim": getattr(
                        self, "workload_embed_total_dim", 10),
                },
                f,
            )

    @classmethod
    def load(cls, path: str) -> "SegmentVAEModelInternal":
        import pickle

        with open(path, "rb") as f:
            blob = pickle.load(f)
        model = cls(**blob["config"])
        to_j = functools.partial(jax.tree_util.tree_map, jnp.asarray)
        model.vae_params = to_j(blob["vae_params"])
        model.params = to_j(blob["params"])
        model.norm_stats = to_j(blob.get("norm_stats"))
        model.fea_norm_vec = blob["fea_norm_vec"]
        model.use_workload_embedding = blob.get(
            "use_workload_embedding", False)
        model.workload_embed_total_dim = blob.get(
            "workload_embed_total_dim", 10)
        return model


def few_shot_fit(base_cls, features_by_task, labels_by_task,
                 mode: str = "base_only", in_dim: int = 164,
                 fine_tune_epochs: int = 30, **model_kw):
    """Few-shot training modes over per-task datasets (reference
    mlp_model.py:422-510,683-786: base_only / local_only_mix_task /
    fine_tune_mix_task / plus_mix_task).

    Returns {task: model-like with predict_on_features} plus a "__base__"
    entry when a shared base model exists.
    """
    all_feats, all_labels = [], []
    for t in features_by_task:
        all_feats.extend(features_by_task[t])
        all_labels.extend(labels_by_task[t])

    models = {}
    if mode in ("base_only", "fine_tune", "plus", "maml"):
        base = base_cls(in_dim=in_dim, **model_kw)
        base.fit_base(all_feats, np.asarray(all_labels, np.float32))
        models["__base__"] = base
        if mode == "base_only":
            for t in features_by_task:
                models[t] = base
            return models

    if mode == "maml":
        # first-order meta-learning of the initialization (the reference's
        # MAML few-shot mode, mlp_model.py:683-786; we use the Reptile
        # first-order update: adapt a copy on one task for a few epochs,
        # then move the meta-parameters toward the adapted ones)
        import copy as _copy

        import jax

        meta = models["__base__"]
        tasks = list(features_by_task)
        rng = np.random.default_rng(getattr(meta, "seed", 0))
        meta_rounds = 3 * len(tasks)
        step_size = 0.2
        for _ in range(meta_rounds):
            t = tasks[int(rng.integers(len(tasks)))]
            inner = _copy.copy(meta)
            inner.params = meta.params
            inner.n_epoch = max(5, fine_tune_epochs // 3)
            inner.fit_base(
                features_by_task[t],
                np.asarray(labels_by_task[t], np.float32),
                keep_norm=True,
            )
            meta.params = jax.tree_util.tree_map(
                lambda a, b: a + step_size * (b - a), meta.params,
                inner.params,
            )
        models["__base__"] = meta

    for t in features_by_task:
        feats = features_by_task[t]
        labels = np.asarray(labels_by_task[t], np.float32)
        if mode == "local":
            local = base_cls(in_dim=in_dim, **model_kw)
            local.fit_base(feats, labels)
            models[t] = local
        elif mode in ("fine_tune", "maml"):
            import copy

            ft = copy.copy(models["__base__"])
            ft.n_epoch = fine_tune_epochs
            # warm-start from the base parameters, keep its normalization
            ft.params = models["__base__"].params
            ft.fea_norm_vec = models["__base__"].fea_norm_vec
            ft.fit_base(feats, labels, keep_norm=True)
            models[t] = ft
        elif mode == "plus":
            base = models["__base__"]
            residual = base_cls(in_dim=in_dim, **model_kw)
            base_pred = base.predict_on_features(feats)
            base_pred = np.where(np.isfinite(base_pred), base_pred, 0.0)
            residual.fit_base(feats, labels - base_pred)

            class _Plus:
                def __init__(self, b, r):
                    self.b, self.r = b, r

                def predict_on_features(self, fl):
                    pb = self.b.predict_on_features(fl)
                    pr = self.r.predict_on_features(fl)
                    return np.where(
                        np.isfinite(pb) & np.isfinite(pr), pb + pr, -np.inf
                    )

            models[t] = _Plus(base, residual)
        else:
            raise ValueError(f"unknown few-shot mode {mode}")
    return models

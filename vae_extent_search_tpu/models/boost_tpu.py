"""TPU histogram gradient boosting — the pack-sum training protocol at
TenSet-pretraining scale.

models/boost.py runs the reference's xgb training protocol
(pack_sum_square_error objective + pack_sum_rmse / a-peak@N eval
callbacks + best-iteration early stopping, reference
cost_model/xgb_model.py:120-250,470-745) on a pure-numpy histogram
booster, which is sized for the search loop (10^2-10^5 rows). The
reference's *other* GBDT use is pretraining on millions of TenSet
rows (README.md:20-27: 51M records; docs/try_pretrained_models
RMSE 0.0809 on a 500-file corpus) — a scale the numpy tree grower
cannot reach. This module runs the same protocol with the per-round
work as XLA programs on the accelerator:

- trees grow LEVEL-WISE over a complete binary tree of static depth:
  per level, 256-bin (grad, hess) histograms per (feature, node) via
  ``jax.ops.segment_sum`` over chunked feature keys, XGBoost split
  gain ``0.5[G_L^2/(H_L+lam) + G_R^2/(H_R+lam) - G^2/(H+lam)] - gamma``
  via cumulative sums, one flattened argmax per node;
- a node that does not split (gain <= 0, H < 2*min_child_weight,
  or < 2 rows) becomes "dead": its split bin is set past the last
  real bin so every row routes down the LEFT spine, which makes the
  eventual depth-D leaf value equal the early-leaf Newton step
  ``-eta * G/(H + lambda)`` the numpy grower would have emitted;
- the pack-sum objective is a device ``segment_sum`` + gather, so a
  full boosting round never leaves the chip; only the every-25-round
  eval callbacks pull predictions to the host;
- splits compare ``bin <= k`` exactly like boost._grow_tree, and the
  finished ensemble is converted back to ``boost.Booster``/``_Tree``
  (float thresholds ``edges[k]``), so prediction, pickling, and the
  GBDTModelInternal save/load format are unchanged.

Tie-breaking matches the numpy grower: gains are laid out
feature-major / bin-minor and argmax takes the first maximum, which
reproduces "first max bin within a feature, strictly-greater across
features". The one intended divergence: histograms accumulate in f32
on device (numpy uses f64), so exact-tie gains can split differently
on adversarial data; the parity test uses continuous features where
this does not occur.
"""

from __future__ import annotations

import functools
import logging
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from . import boost
from .boost import Booster, DMatrix, _Tree

logger = logging.getLogger("vae_extent_search_tpu.boost_tpu")

_FEATURE_CHUNK = 32


# ---------------------------------------------------------------------------
# Device tree growth
# ---------------------------------------------------------------------------


def _level_histograms(binned, node, grad, hess, m: int, nb: int):
    """(grad, hess) histograms per (feature, node, bin) -> [d, m, nb].

    TPU scatters serialize, so the histogram is computed as one-hot
    MATMULS on the MXU instead: per feature,
    ``hist[bin, (node, g|h)] = onehot(bins_f)^T @ B`` where
    ``B[row] = onehot(node_row) * (g_row, h_row)``. One-hot values are
    exact in f32, so this is bit-for-bit the scatter result up to f32
    summation order. ``lax.map`` over features keeps the transient
    one-hot at [n, nb]."""
    n, d = binned.shape
    nodeoh = jax.nn.one_hot(node, m, dtype=jnp.float32)        # [n, m]
    B = jnp.concatenate(
        [nodeoh * grad[:, None], nodeoh * hess[:, None]], axis=1)

    def one_feature(bcol):
        A = jax.nn.one_hot(bcol.astype(jnp.int32), nb,
                           dtype=jnp.float32)                  # [n, nb]
        return jax.lax.dot_general(
            A, B, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                # [nb, 2m]

    H = jax.lax.map(one_feature, binned.T)                     # [d, nb, 2m]
    ghist = jnp.moveaxis(H[:, :, :m], 1, 2)                    # [d, m, nb]
    hhist = jnp.moveaxis(H[:, :, m:], 1, 2)
    return ghist, hhist


def _plan_tiers_env(ne: np.ndarray, n_rows: int = 0):
    """Tier plan for the histogram kernel, honoring VES_BOOST_TIER:
    "0" = flat full-width (A/B control), "2" = binary tier only (the
    round-2 configuration), a comma list like "2,16,64" = explicit
    window widths, unset = a self-tuned ladder for this (rows, census)
    shape from the process kernel library (scripts/tune_kernel_suite.py
    gbdthist family), else the default ladder. min_features=4 per tier
    (each tier is one extra kernel launch per level)."""
    import os

    from ..ops.hist_pallas import plan_tiers_multi

    env = os.environ.get("VES_BOOST_TIER", "")
    if env == "0":
        return [], np.arange(len(ne))
    if env:
        sws = tuple(int(x) for x in env.split(","))
    else:
        sws = None
        if n_rows:
            from ..ops.kernel_library import tuned_hist_ladder

            nbins = ne + 1  # plan_tiers_multi's window criterion
            census = (int((nbins <= 2).sum()),
                      int(((nbins > 2) & (nbins <= 16)).sum()),
                      int(((nbins > 16) & (nbins <= 64)).sum()),
                      int(((nbins > 64) & (nbins <= 128)).sum()))
            tuned = tuned_hist_ladder(int(n_rows), len(ne), *census)
            if tuned is not None:
                if not tuned:
                    return [], np.arange(len(ne))  # tuned: flat wins
                sws = tuple(tuned)
        if sws is None:
            sws = (2, 16, 64, 128)
    mf = (16,) + (4,) * (len(sws) - 1)
    return plan_tiers_multi(ne, sws=sws, min_features=mf)


def _grow_tree_device(hist_input, binned_T, n_edges, grad, hess, *,
                      max_depth: int, nb: int, eta: float,
                      reg_lambda: float, gamma: float,
                      min_child_weight: float, hist_engine: str = "xla",
                      axis_name=None, valid=None, hist_meta: tuple = ()):
    """One tree as a complete binary heap of static depth.

    Returns (feat [2^D-1], bin_thr [2^D-1], split [2^D-1] bool,
    leafval [2^D], row_update [n]) where level ``l`` occupies heap
    slots [2^l - 1, 2^(l+1) - 1).

    ``hist_engine="pallas"`` builds the level histograms with the
    fused VMEM one-hot kernel (ops/hist_pallas.py) — ``hist_input`` is
    then the pre-packed ``pack_bins_host`` tensor; for the XLA matmul
    formulation it is row-major [n, d]. Per-node grad/hess totals come
    free as the bin-axis sum of feature 0's histogram (every row lands
    in exactly one bin). Row routing reads each split node's feature
    as one contiguous dynamic row slice of ``binned_T`` [d, n] — TPU
    gathers serialize like scatters, and the masked [n, d] reduction
    tried first cost ~30 ms/level at 400k rows; the m-slice loop is
    ~20x cheaper.

    Multi-chip (``axis_name`` set, under shard_map with rows sharded
    over that mesh axis): histograms and per-node stats accumulate
    locally and ``psum`` — the collective moves the [d, 2m, nb]
    histogram (megabytes) instead of any row-sized tensor; split
    selection is then replicated on every chip and routing stays
    local. ``valid`` masks padding rows out of the row-count check
    (their grad/hess are already zeroed by weight-0 padding)."""
    d, n = binned_T.shape
    node = jnp.zeros(n, jnp.int32)
    feat_lv, bin_lv, split_lv = [], [], []
    bin_pos = jnp.arange(nb - 1, dtype=jnp.int32)

    def _allsum(x):
        return jax.lax.psum(x, axis_name) if axis_name else x

    real = jnp.float32(1.0) if valid is None else valid.astype(jnp.float32)

    def _tier_best(ghist, hhist, Gn, Hn, n_edges_t, feat_ids_t, nbt):
        """Best split per node within one histogram tier -> (gain [m],
        orig-order flat index [m]) where the flat index is
        f_orig*(nb-1)+k — comparing it reproduces the global
        first-maximum tie-break in ORIGINAL feature order (features
        within a tier keep ascending original order)."""
        gl = jnp.cumsum(ghist, axis=2)[:, :, :-1]   # [d_t, m, nbt-1]
        hl = jnp.cumsum(hhist, axis=2)[:, :, :-1]
        gr = Gn[None, :, None] - gl
        hr = Hn[None, :, None] - hl
        parent = (Gn * Gn / (Hn + reg_lambda))[None, :, None]
        pos = jnp.arange(nbt - 1, dtype=jnp.int32)
        ok = ((hl >= min_child_weight) & (hr >= min_child_weight)
              & (pos[None, None, :] < n_edges_t[:, None, None]))
        gain = 0.5 * (gl * gl / (hl + reg_lambda)
                      + gr * gr / (hr + reg_lambda) - parent) - gamma
        gain = jnp.where(ok, gain, -jnp.inf)
        d_t = ghist.shape[0]
        flat = jnp.moveaxis(gain, 1, 0).reshape(-1, d_t * (nbt - 1))
        best = jnp.argmax(flat, axis=1)
        best_gain = jnp.take_along_axis(flat, best[:, None], 1)[:, 0]
        f_orig = feat_ids_t[(best // (nbt - 1)).astype(jnp.int32)]
        k = (best % (nbt - 1)).astype(jnp.int32)
        return best_gain, f_orig * (nb - 1) + k

    for level in range(max_depth):
        m = 1 << level
        tiers = []   # (gain [m], orig_flat [m]) candidates to merge
        if hist_engine.startswith("pallas"):
            from ..ops.hist_pallas import hist_pallas_packed, kron_plan
            interp = hist_engine.startswith("pallas_interpret")
            kron = hist_engine.endswith("+kron")
            if hist_meta:
                tier_plan, d_big = hist_meta
                parts = hist_input
                packed_big, ids_big, ne_big = parts[0], parts[1], parts[2]
                nb_pad = -(-nb // 128) * 128
                # kron mode appends the lane-major bins of the big tier
                # as the final part (pack layout otherwise unchanged)
                lm_big = (parts[3 + 3 * len(tier_plan)]
                          if kron and d_big else None)
                khc = kron_plan(m, nb_pad) if lm_big is not None else 0
                off = 3
                Gn = Hn = None
                for (sw, d_t) in tier_plan:
                    packed_t, ids_t, ne_t = parts[off:off + 3]
                    off += 3
                    fpd = nb_pad // sw
                    n_dots = -(-d_t // fpd)
                    gs, hs = hist_pallas_packed(
                        packed_t, node, grad, hess, d=n_dots, m=m,
                        nb=nb_pad, fg=1, sw=sw, interpret=interp)
                    # [n_dots, m, nb_pad] -> per-feature windows
                    gs = jnp.moveaxis(
                        gs.reshape(n_dots, m, fpd, sw), 2, 1
                    ).reshape(n_dots * fpd, m, sw)[:d_t]
                    hs = jnp.moveaxis(
                        hs.reshape(n_dots, m, fpd, sw), 2, 1
                    ).reshape(n_dots * fpd, m, sw)[:d_t]
                    if axis_name:
                        gs, hs = _allsum(gs), _allsum(hs)
                    if Gn is None:
                        Gn = gs[0].sum(axis=-1)
                        Hn = hs[0].sum(axis=-1)
                    tiers.append(_tier_best(gs, hs, Gn, Hn, ne_t,
                                            ids_t, sw))
                if d_big:
                    gb, hb = hist_pallas_packed(
                        packed_big, node, grad, hess, d=d_big, m=m,
                        nb=nb, interpret=interp, kron_hc=khc,
                        bins_lm=lm_big if khc else None)
                    if axis_name:
                        gb, hb = _allsum(gb), _allsum(hb)
                    if Gn is None:
                        Gn = gb[0].sum(axis=-1)
                        Hn = hb[0].sum(axis=-1)
                    tiers.append(_tier_best(gb, hb, Gn, Hn, ne_big,
                                            ids_big, nb))
            else:
                ghist, hhist = hist_pallas_packed(
                    hist_input, node, grad, hess, d=d, m=m, nb=nb,
                    interpret=interp)
        else:
            ghist, hhist = _level_histograms(hist_input, node, grad,
                                             hess, m, nb)
        if not tiers:
            if axis_name:
                ghist, hhist = _allsum(ghist), _allsum(hhist)
            Gn = ghist[0].sum(axis=-1)
            Hn = hhist[0].sum(axis=-1)
            tiers.append(_tier_best(
                ghist, hhist, Gn, Hn, n_edges,
                jnp.arange(d, dtype=jnp.int32), nb))
        Cn = jnp.zeros(m, jnp.float32)
        for c in range(m):
            Cn = Cn.at[c].set(
                jnp.sum((node == c).astype(jnp.float32) * real))
        Cn = _allsum(Cn)
        best_gain, best_flat = tiers[0]
        for g2, fl2 in tiers[1:]:
            take2 = (g2 > best_gain) | ((g2 == best_gain)
                                        & (fl2 < best_flat))
            best_gain = jnp.where(take2, g2, best_gain)
            best_flat = jnp.where(take2, fl2, best_flat)
        can_split = ((best_gain > 0.0) & (Hn >= 2 * min_child_weight)
                     & (Cn >= 2))
        f_best = jnp.where(can_split,
                           (best_flat // (nb - 1)).astype(jnp.int32), 0)
        k_best = jnp.where(can_split,
                           (best_flat % (nb - 1)).astype(jnp.int32),
                           nb - 1)  # dead: every bin <= nb-1 -> all left
        feat_lv.append(f_best)
        bin_lv.append(k_best)
        split_lv.append(can_split)
        # route: per split node, its feature's bins are one contiguous
        # row of binned_T (dynamic slice, traced row index)
        goes_right = jnp.zeros(n, jnp.bool_)
        for c in range(m):
            col = jax.lax.dynamic_slice(
                binned_T, (f_best[c], 0), (1, n))[0].astype(jnp.int32)
            goes_right = jnp.where((node == c) & (col > k_best[c]),
                                   True, goes_right)
        node = 2 * node + goes_right.astype(jnp.int32)
    m = 1 << max_depth
    # final-leaf Newton steps + per-row prediction update, loop-wise
    # (m reductions beat [n, m] one-hot materializations on TPU)
    G = jnp.zeros(m, jnp.float32)
    H = jnp.zeros(m, jnp.float32)
    for c in range(m):
        in_c = node == c
        G = G.at[c].set(jnp.sum(jnp.where(in_c, grad, 0.0)))
        H = H.at[c].set(jnp.sum(jnp.where(in_c, hess, 0.0)))
    G, H = _allsum(G), _allsum(H)
    leafval = -eta * G / (H + reg_lambda)
    row_update = jnp.zeros(n, jnp.float32)
    for c in range(m):
        row_update = jnp.where(node == c, leafval[c], row_update)
    return (jnp.concatenate(feat_lv), jnp.concatenate(bin_lv),
            jnp.concatenate(split_lv), leafval, row_update)


def _descend_device(binned, feat, bin_thr, max_depth: int):
    """Leaf index of each (pre-binned) row under a heap-layout tree."""
    n = binned.shape[0]
    node = jnp.zeros(n, jnp.int32)
    off = 0
    for level in range(max_depth):
        fb = feat[off + node]
        kb = bin_thr[off + node]
        rowbin = jnp.take_along_axis(
            binned, fb[:, None].astype(jnp.int32), axis=1)[:, 0]
        node = 2 * node + (rowbin > kb).astype(jnp.int32)
        off += 1 << level
    return node


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "nb", "n_packs", "eta", "reg_lambda",
                     "gamma", "min_child_weight", "weighted",
                     "hist_engine", "sorted_packs", "hist_meta"))
def _pack_sum_round(hist_input, binned_T, n_edges, pack_ids, label_row,
                    row_weight, preds, *, max_depth: int, nb: int,
                    n_packs: int, eta: float, reg_lambda: float,
                    gamma: float, min_child_weight: float, weighted: bool,
                    hist_engine: str = "xla", sorted_packs: bool = False,
                    hist_meta: tuple = ()):
    """One full boosting round under the pack-sum objective, on device:
    grad/hess from per-pack summed predictions (boost.py
    pack_sum_square_error), tree growth, and the train-set prediction
    update (leaf value of each row's final node). ``label_row`` is the
    per-row label (rows of a pack carry the pack's label), so only the
    prediction sums need a per-round expansion."""
    sums = jax.ops.segment_sum(preds, pack_ids, num_segments=n_packs,
                               indices_are_sorted=sorted_packs)
    grad = jnp.take(sums, pack_ids, indices_are_sorted=sorted_packs
                    ) - label_row
    hess = jnp.ones_like(grad)
    if weighted:
        grad = grad * row_weight
        hess = hess * row_weight
    feat, bin_thr, split, leafval, row_update = _grow_tree_device(
        hist_input, binned_T, n_edges, grad, hess, max_depth=max_depth,
        nb=nb, eta=eta, reg_lambda=reg_lambda, gamma=gamma,
        min_child_weight=min_child_weight, hist_engine=hist_engine,
        hist_meta=hist_meta)
    preds = preds + row_update
    return preds, feat, bin_thr, split, leafval


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "nb", "eta", "reg_lambda", "gamma",
                     "min_child_weight", "hist_engine", "hist_meta"))
def _plain_round(hist_input, binned_T, n_edges, grad, hess, preds, *,
                 max_depth: int, nb: int, eta: float, reg_lambda: float,
                 gamma: float, min_child_weight: float,
                 hist_engine: str = "xla", hist_meta: tuple = ()):
    """One round with host-supplied (grad, hess) — the generic custom
    objective path (one device round-trip per round)."""
    feat, bin_thr, split, leafval, row_update = _grow_tree_device(
        hist_input, binned_T, n_edges, grad, hess, max_depth=max_depth,
        nb=nb, eta=eta, reg_lambda=reg_lambda, gamma=gamma,
        min_child_weight=min_child_weight, hist_engine=hist_engine,
        hist_meta=hist_meta)
    preds = preds + row_update
    return preds, feat, bin_thr, split, leafval


@functools.partial(jax.jit, static_argnames=("max_depth",))
def _eval_update(binned_ev, preds_ev, feat, bin_thr, leafval, *,
                 max_depth: int):
    leaf = _descend_device(binned_ev, feat, bin_thr, max_depth)
    return preds_ev + leafval[leaf]


# ---------------------------------------------------------------------------
# Host-side conversion + training loop
# ---------------------------------------------------------------------------


def _to_numpy_tree(feat, bin_thr, split, leafval, thresholds,
                   max_depth: int) -> _Tree:
    """Heap-layout device tree -> boost._Tree (float thresholds), same
    node-visit order as the numpy grower's stack (so repr-level
    comparisons line up too)."""
    feat = np.asarray(feat)
    bin_thr = np.asarray(bin_thr)
    split = np.asarray(split)
    leafval = np.asarray(leafval, np.float32)
    offs = np.cumsum([0] + [1 << l for l in range(max_depth)])
    tree = _Tree()

    def rec(level: int, idx: int) -> int:
        me = tree._new_node()
        if level < max_depth and split[offs[level] + idx]:
            j = int(feat[offs[level] + idx])
            k = int(bin_thr[offs[level] + idx])
            tree.feature[me] = j
            tree.threshold[me] = float(thresholds[j][k])
            # numpy stack pops right child first after pushing
            # (left, right); visit order does not affect predictions,
            # build left-first for readability
            tree.left[me] = rec(level + 1, 2 * idx)
            tree.right[me] = rec(level + 1, 2 * idx + 1)
        else:
            # dead/bottom node: all rows flowed down the left spine
            tree.value[me] = float(leafval[idx << (max_depth - level)])
        return me

    rec(0, 0)
    return tree


def _bin_against(dmat: DMatrix, thresholds: List[np.ndarray]) -> np.ndarray:
    """Bin a foreign eval matrix with the train-set thresholds so the
    device descent (bin <= k) equals the float compare x <= edges[k]."""
    n, d = dmat.data.shape
    out = np.zeros((n, d), np.int32)
    for j in range(d):
        if len(thresholds[j]):
            # side="left": bin(x) <= k  <=>  x <= edges[k]
            out[:, j] = np.searchsorted(
                thresholds[j], dmat.data[:, j], side="left")
    return out


def train(params: dict, dtrain: DMatrix, num_boost_round: int = 300,
          obj: Optional[Callable] = None,
          fevals: Sequence[Callable] = (),
          evals: Sequence[Tuple[DMatrix, str]] = (),
          metric: Optional[str] = None, maximize: bool = False,
          stopping_rounds: Optional[int] = None,
          verbose_eval: int = 25, skip_every: int = 5,
          log_file: Optional[str] = None,
          mesh=None, data_axis: str = "data") -> Booster:
    """Drop-in for boost.train with device-resident rounds.

    ``obj is boost.pack_sum_square_error`` (or the string "pack_sum")
    selects the fully on-device objective: no host transfer inside a
    round. Any other callable still works — predictions are pulled to
    the host, the objective runs in numpy, and (grad, hess) are pushed
    back (one round-trip per round). Eval callbacks, early stopping,
    and printing reproduce boost.train / reference
    xgb_model.py custom_callback:629-745 semantics.

    ``mesh``: a jax.sharding.Mesh for data-parallel training — rows
    shard over ``data_axis``, per-level histograms psum over ICI, and
    every chip grows identical trees (applies to the scan fast path;
    other configurations fall back to single-device)."""
    if params.get("grow_policy") == "lossguide":
        # leaf-wise growth keeps a dynamic splittable-leaf pool — a
        # data-dependent control structure the static-heap device tree
        # cannot express; run the host lossguide grower instead
        from .boost import train as _host_train
        return _host_train(params, dtrain, num_boost_round, obj=obj,
                           fevals=fevals, evals=evals, metric=metric,
                           maximize=maximize,
                           stopping_rounds=stopping_rounds,
                           verbose_eval=verbose_eval,
                           skip_every=skip_every, log_file=log_file)
    max_depth = int(params.get("max_depth", 6))
    eta = float(params.get("eta", 0.3))
    reg_lambda = float(params.get("lambda", 1.0))
    gamma = float(params.get("gamma", 0.0))
    min_child_weight = float(params.get("min_child_weight", 1.0))
    base_score = float(params.get("base_score", 0.0))

    dtrain._ensure_binned()
    thresholds = dtrain._thresholds
    nb = max(2, max(len(e) for e in thresholds) + 1)
    n = len(dtrain)
    # the fused VMEM histogram kernel on real accelerators; the XLA
    # matmul formulation elsewhere (and under VES_BOOST_HIST=xla)
    import os
    hist_engine = os.environ.get("VES_BOOST_HIST")
    if hist_engine not in ("xla", "pallas", "pallas_interpret"):
        # the VMEM kernel is written for TPU Mosaic semantics
        # (MXU-oriented dots, revisited-output accumulation) — on any
        # other accelerator fall back to the portable XLA matmul path
        hist_engine = ("pallas" if jax.default_backend() == "tpu"
                       else "xla")
    if (hist_engine.startswith("pallas")
            and os.environ.get("VES_BOOST_KRON", "0") == "1"):
        # kron decomposition of full-width one-hots at shallow levels
        # (ops/hist_pallas.py kron_plan); bit-identical histograms,
        # less VPU compare work. Opt-in pending chip A/B.
        hist_engine += "+kron"
    def _packed_inputs():
        """(binned_T, hist_input, hist_meta) for single-device round
        work, built lazily — the mesh scan path packs shard-wise in
        its own runner and must not pay the single-device packing.
        Host packing of a 1M-row corpus costs seconds, so the HOST
        pack caches on the DMatrix per engine; device transfers are
        re-done per train() call so no HBM stays pinned to the
        DMatrix after train returns (~2x corpus bytes otherwise)."""
        cache = getattr(dtrain, "_ves_pack_cache", None)
        if cache is None:
            cache = dtrain._ves_pack_cache = {}
        # key on the tier env too: re-training one DMatrix under a
        # different VES_BOOST_TIER must not silently reuse the old plan
        cache_key = (hist_engine, os.environ.get("VES_BOOST_TIER", ""))
        if cache_key in cache:
            host_input, hist_meta = cache[cache_key]
            binned_T = jnp.asarray(dtrain._binned)
            if isinstance(host_input, tuple):
                return binned_T, tuple(jnp.asarray(a) for a in
                                       host_input), hist_meta
            return binned_T, jnp.asarray(host_input), hist_meta
        binned_T = jnp.asarray(dtrain._binned)
        hist_meta: tuple = ()
        if hist_engine.startswith("pallas"):
            from ..ops.hist_pallas import (pack_bins_host,
                                           pack_bins_host_compact,
                                           pack_bins_lane_major,
                                           plan_tiers_multi)
            kron = hist_engine.endswith("+kron")
            nb_pad = -(-nb // 128) * 128
            ne = np.asarray([len(e) for e in thresholds], np.int32)
            # windowed tiers only pay off when enough columns are
            # low/mid-cardinality — real per-store corpora have ~98/164
            # binary + ~18 under 64 bins. VES_BOOST_TIER: "0" disables
            # (flat full-width), "2" = binary tier only (round-2
            # behavior), default = multi-tier {2, 16, 64}; all for A/B
            # timing marginals.
            tier_plan, idx_big = _plan_tiers_env(ne, len(dtrain))
            if sum(len(i) for _, i in tier_plan) >= 16:
                packed_big = (pack_bins_host(dtrain._binned[idx_big])
                              if len(idx_big)
                              else np.zeros((1, 1, 1), np.uint8))  # d_big=0
                parts = [packed_big, idx_big.astype(np.int32),
                         ne[idx_big]]
                for sw, idx in tier_plan:
                    # compact pack for every tier: 1 B/row/feature of
                    # HBM traffic per level; the in-VMEM expander dot
                    # is MXU work the VPU-bound kernel gets for free
                    # (A/B vs the lane-expanded sw=2 pack: compact is
                    # ~100 ms/round FASTER at 1M rows — bandwidth wins)
                    parts += [
                        pack_bins_host_compact(dtrain._binned[idx],
                                               sw=sw, nb=nb_pad),
                        idx.astype(np.int32), ne[idx]]
                if kron and len(idx_big):
                    parts.append(
                        pack_bins_lane_major(dtrain._binned[idx_big]))
                host_input = tuple(parts)
                hist_meta = (tuple((sw, len(idx))
                                   for sw, idx in tier_plan),
                             len(idx_big))
            elif kron:
                # no windowed tiers: express the whole matrix as one
                # "big tier" so the grower finds the lane-major pack
                d_all = dtrain._binned.shape[0]
                host_input = (pack_bins_host(dtrain._binned),
                              np.arange(d_all, dtype=np.int32), ne,
                              pack_bins_lane_major(dtrain._binned))
                hist_meta = ((), d_all)
            else:
                host_input = pack_bins_host(dtrain._binned)
        else:
            host_input = np.ascontiguousarray(dtrain._binned.T)  # [n, d]
        # keep only the latest (engine, tier) pack: cross-engine A/Bs
        # use one DMatrix per arm anyway (docs/NEXT.md), and retaining
        # every historical key would grow host RAM by ~a corpus-sized
        # pack per distinct engine/tier combination
        cache.clear()
        cache[cache_key] = (host_input, hist_meta)
        if isinstance(host_input, tuple):
            return binned_T, tuple(jnp.asarray(a) for a in
                                   host_input), hist_meta
        return binned_T, jnp.asarray(host_input), hist_meta

    n_edges = jnp.asarray(
        np.asarray([len(e) for e in thresholds], np.int32))

    pack_fast = (obj is boost.pack_sum_square_error or obj == "pack_sum")
    if pack_fast:
        pack_ids_np = dtrain.pack_ids
        n_packs = int(pack_ids_np.max()) + 1 if len(pack_ids_np) else 1
        sorted_packs = bool(np.all(np.diff(pack_ids_np) >= 0))
        pack_ids = jnp.asarray(pack_ids_np.astype(np.int32))
        # rows of a pack carry the pack's label, so the per-row label
        # needs no per-round expansion
        label_row = jnp.asarray(dtrain.get_label().astype(np.float32))
        w = dtrain.get_weight()
        weighted = len(w) > 0
        row_weight = jnp.asarray(w.astype(np.float32)) if weighted \
            else jnp.ones(n, jnp.float32)  # unused when weighted=False

    preds = jnp.full(n, base_score, jnp.float32)
    # eval sets: dtrain shares the train predictions; foreign sets get
    # binned against the train thresholds and accumulated per round
    eval_state = []   # dicts: {dm, tag, binned (None = train), preds}
    for dm, tag in evals:
        if dm is dtrain:
            eval_state.append(dict(dm=dm, tag=tag, binned=None, preds=None))
        else:
            eval_state.append(dict(
                dm=dm, tag=tag,
                binned=jnp.asarray(_bin_against(dm, thresholds)),
                preds=jnp.full(len(dm), base_score, jnp.float32)))

    bst = Booster(base_score)
    best_score = -np.inf if maximize else np.inf
    best_iteration = 0
    kw = dict(max_depth=max_depth, nb=nb, eta=eta, reg_lambda=reg_lambda,
              gamma=gamma, min_child_weight=min_child_weight,
              hist_engine=hist_engine)

    def _callback_step(i, eval_res):
        """Reference custom_callback semantics for one round's eval
        results: sort, print every verbose_eval, track best, return
        True when early stopping should truncate + stop."""
        nonlocal best_score, best_iteration
        if metric and eval_res:
            short = metric.split("-")[1]
            eval_res.sort(key=lambda x: x[0] if short not in x[0]
                          else "a" + x[0])
        if verbose_eval and eval_res and i % verbose_eval == 0:
            infos = ["XGB iter: %3d" % i]
            infos += ["%s: %.6f" % kv for kv in eval_res]
            line = "\t".join(infos)
            logger.debug(line)
            print(line)
            if log_file:
                with open(log_file, "a") as f:
                    f.write(line + "\n")
        if metric and stopping_rounds:
            score = dict(eval_res).get(metric)
            if score is not None:
                better = score > best_score if maximize \
                    else score < best_score
                if better:
                    best_score, best_iteration = score, i
                    bst.set_attr(best_score=best_score,
                                 best_iteration=best_iteration)
                elif i - best_iteration >= stopping_rounds:
                    logger.debug("XGB stopped. Best iteration: %d",
                                 best_iteration)
                    return True
        return False

    # -- scan fast path: the full protocol in round chunks -------------
    # One dispatch per chunk instead of per round (a tunneled device
    # pays a ~6-30 ms host round-trip per dispatch), with the standard
    # protocol fevals computed ON DEVICE per round and the callback /
    # early-stop semantics replayed on the returned metric series —
    # exact, because stopping only truncates trees and the training
    # trajectory never depends on the metric.
    metric_kinds = _device_feval_kinds(fevals, dtrain)
    scannable = (pack_fast and metric_kinds is not None
                 and all(s["binned"] is None for s in eval_state))
    if scannable:
        tags = [s["tag"] for s in eval_state]
        cnt = np.bincount(pack_ids_np, minlength=n_packs).astype(np.float32)
        lp = np.bincount(pack_ids_np, weights=dtrain.get_label(),
                         minlength=n_packs).astype(np.float32)
        label_pack = jnp.asarray(lp / np.maximum(cnt, 1.0))
        present = jnp.asarray(cnt > 0)
        num_present = float((cnt > 0).sum())
        scan_kw = dict(n_packs=n_packs, weighted=weighted,
                       sorted_packs=sorted_packs,
                       metric_kinds=metric_kinds,
                       num_present=num_present, **kw)
        if mesh is None:
            binned_T, hist_input, hist_meta = _packed_inputs()

            def run_chunk(k, preds):
                return _pack_sum_scan(
                    hist_input, binned_T, n_edges, pack_ids, label_row,
                    row_weight, preds, label_pack, present, k=k,
                    hist_meta=hist_meta, **scan_kw)
        else:
            # the runner pads + packs shard-wise itself; the
            # single-device packing is never built for this path
            run_chunk = _make_sharded_chunk_runner(
                dtrain, mesh, data_axis, hist_engine, pack_ids_np,
                n_packs, base_score, scan_kw,
                np.asarray(row_weight) if weighted else None,
                label_pack, present)
            preds = None  # the runner owns the (padded, sharded) preds
        chunk = 50
        i = 0
        stopped = False
        while i < num_boost_round and not stopped:
            k = min(chunk, num_boost_round - i)
            preds, ys = run_chunk(k, preds)
            feats, bins_, splits, leafs, mets = jax.device_get(ys)
            for j in range(k):
                bst.trees.append(_to_numpy_tree(
                    feats[j], bins_[j], splits[j], leafs[j], thresholds,
                    max_depth))
                ii = i + j
                if ii % skip_every == 1:
                    continue
                eval_res = []
                for mi, (kind, N) in enumerate(metric_kinds):
                    name = "rmse" if kind == "rmse" else f"a-peak@{N}"
                    for tag in tags:
                        eval_res.append((f"{tag}-{name}",
                                         float(mets[j][mi])))
                if _callback_step(ii, eval_res):
                    del bst.trees[best_iteration + 1:]
                    stopped = True
                    break
            i += k
        return bst

    # -- general path: one dispatch per round --------------------------
    # per-round tree arrays stay device-resident (futures in this
    # list); they convert to numpy trees in ONE transfer at the end
    binned_T, hist_input, hist_meta = _packed_inputs()
    kw = dict(kw, hist_meta=hist_meta)
    pending: List[tuple] = []

    def _flush_trees():
        if not pending:
            return
        for feat, bin_thr, split, leafval in jax.device_get(pending):
            bst.trees.append(_to_numpy_tree(feat, bin_thr, split, leafval,
                                            thresholds, max_depth))
        pending.clear()

    for i in range(num_boost_round):
        if pack_fast:
            preds, feat, bin_thr, split, leafval = _pack_sum_round(
                hist_input, binned_T, n_edges, pack_ids, label_row,
                row_weight, preds, n_packs=n_packs, weighted=weighted,
                sorted_packs=sorted_packs, **kw)
        else:
            if obj is not None:
                g, h = obj(np.asarray(preds), dtrain)
            else:
                g = np.asarray(preds) - dtrain.label
                h = np.ones_like(g)
                w = dtrain.get_weight()
                if len(w):
                    g, h = g * w, h * w
            preds, feat, bin_thr, split, leafval = _plain_round(
                hist_input, binned_T, n_edges, jnp.asarray(g, jnp.float32),
                jnp.asarray(h, jnp.float32), preds, **kw)
        pending.append((feat, bin_thr, split, leafval))
        for s in eval_state:
            if s["binned"] is not None:
                s["preds"] = _eval_update(s["binned"], s["preds"], feat,
                                          bin_thr, leafval,
                                          max_depth=max_depth)

        if i % skip_every == 1:   # reference custom_callback:676
            continue
        need_eval = (fevals and (verbose_eval and i % verbose_eval == 0
                                 or (metric and stopping_rounds)))
        if not need_eval:
            continue
        eval_res = []
        pred_tr_np = None
        for feval in fevals:
            for s in eval_state:
                if s["binned"] is None:
                    if pred_tr_np is None:
                        pred_tr_np = np.asarray(preds)
                    name, score = feval(pred_tr_np, dtrain)
                else:
                    name, score = feval(np.asarray(s["preds"]), s["dm"])
                eval_res.append((f"{s['tag']}-{name}", score))
        if _callback_step(i, eval_res):
            _flush_trees()
            del bst.trees[best_iteration + 1:]
            break
    _flush_trees()
    return bst


def _make_sharded_chunk_runner(dtrain, mesh, data_axis, hist_engine,
                               pack_ids_np, n_packs, base_score, scan_kw,
                               row_weight_np, label_pack, present):
    """Data-parallel chunk runner: rows padded to shards x row-block
    and sharded over ``data_axis``; padding rows carry weight 0 and
    valid=False so they are inert in histograms, pack sums, and row
    counts. Every shard emits identical trees (histograms psum)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..ops.hist_pallas import (_DEF_BLK, pack_bins_host,
                                   pack_bins_host_compact,
                                   pack_bins_lane_major)

    n = len(dtrain)
    nsh = mesh.shape[data_axis]
    unit = nsh * (_DEF_BLK if hist_engine.startswith("pallas") else 1)
    n_pad = -(-n // unit) * unit
    pad = n_pad - n
    binned_dn = np.pad(dtrain._binned, ((0, 0), (0, pad)))
    ne = np.asarray([len(e) for e in dtrain._thresholds], np.int32)
    hist_meta: tuple = ()

    def shard(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    if hist_engine.startswith("pallas"):
        kron = hist_engine.endswith("+kron")
        nb = max(2, int(ne.max()) + 1)
        nb_pad = -(-nb // 128) * 128
        tier_plan, idx_big = _plan_tiers_env(ne, len(dtrain))
        if sum(len(i) for _, i in tier_plan) >= 16:
            # same tiering as single-device, packed shard-row-wise
            if len(idx_big):
                p_big = shard(pack_bins_host(binned_dn[idx_big]),
                              P(None, data_axis, None))
                big_spec = P(None, data_axis, None)
            else:
                p_big = jnp.zeros((1, 1, 1), jnp.uint8)  # unused: d_big=0
                big_spec = P()
            hist_in = [p_big, jnp.asarray(idx_big.astype(np.int32)),
                       jnp.asarray(ne[idx_big])]
            hist_spec = [big_spec, P(), P()]
            for sw, idx in tier_plan:
                # compact pack for every tier, as single-device
                hist_in += [
                    shard(pack_bins_host_compact(binned_dn[idx],
                                                 sw=sw, nb=nb_pad),
                          P(None, data_axis, None)),
                    jnp.asarray(idx.astype(np.int32)),
                    jnp.asarray(ne[idx])]
                hist_spec += [P(None, data_axis, None), P(), P()]
            if kron and len(idx_big):
                hist_in.append(shard(
                    pack_bins_lane_major(binned_dn[idx_big]),
                    P(None, data_axis)))
                hist_spec.append(P(None, data_axis))
            hist_in = tuple(hist_in)
            hist_spec = tuple(hist_spec)
            hist_meta = (tuple((sw, len(idx)) for sw, idx in tier_plan),
                         len(idx_big))
        elif kron:
            d_all = binned_dn.shape[0]
            hist_in = (shard(pack_bins_host(binned_dn),
                             P(None, data_axis, None)),
                       jnp.asarray(np.arange(d_all, dtype=np.int32)),
                       jnp.asarray(ne),
                       shard(pack_bins_lane_major(binned_dn),
                             P(None, data_axis)))
            hist_spec = (P(None, data_axis, None), P(), P(),
                         P(None, data_axis))
            hist_meta = ((), d_all)
        else:
            hist_in = shard(pack_bins_host(binned_dn),
                            P(None, data_axis, None))
            hist_spec = P(None, data_axis, None)
    else:
        hist_in = shard(np.ascontiguousarray(binned_dn.T),
                        P(data_axis, None))
        hist_spec = P(data_axis, None)

    last = pack_ids_np[-1] if len(pack_ids_np) else 0
    args = (
        hist_in,
        shard(binned_dn, P(None, data_axis)),
        jnp.asarray(ne),
        shard(np.pad(pack_ids_np.astype(np.int32), (0, pad),
                     constant_values=last), P(data_axis)),
        shard(np.pad(dtrain.get_label().astype(np.float32), (0, pad)),
              P(data_axis)),
        shard(np.pad((row_weight_np if row_weight_np is not None
                      else np.ones(n)).astype(np.float32), (0, pad)),
              P(data_axis)),
    )
    valid = shard(np.arange(n_pad) < n, P(data_axis))
    preds0 = shard(np.full(n_pad, base_score, np.float32), P(data_axis))
    # the runner packs its own hist input (tiered like single-device)
    skw = dict(scan_kw, weighted=True, hist_meta=hist_meta)

    fns = {}

    def run_chunk(k, preds):
        if preds is None:
            preds = preds0
        if k not in fns:
            fns[k] = jax.jit(jax.shard_map(
                functools.partial(_pack_sum_scan, k=k,
                                  axis_name=data_axis, **skw),
                mesh=mesh,
                in_specs=(hist_spec, P(None, data_axis), P(),
                          P(data_axis), P(data_axis), P(data_axis),
                          P(data_axis), P(), P(), P(data_axis)),
                out_specs=(P(data_axis), (P(), P(), P(), P(), P())),
                check_vma=False))
        return fns[k](*args[:6], preds, label_pack, present, valid)

    return run_chunk


def _device_feval_kinds(fevals, dtrain):
    """Map the standard protocol fevals to on-device metric specs:
    -> tuple of ("rmse", 0) / ("apeak", N), or None when any feval has
    no device equivalent (or needs multi-group a-peak, which the scan
    path does not model)."""
    kinds = []
    single_group = (not dtrain.group_sizes) or len(dtrain.group_sizes) == 1
    for feval in fevals:
        if feval is boost.pack_sum_rmse:
            kinds.append(("rmse", 0))
            continue
        N = getattr(feval, "apeak_n", None)
        if N is not None and single_group:
            kinds.append(("apeak", int(N)))
            continue
        return None
    return tuple(kinds)


@functools.partial(
    jax.jit,
    static_argnames=("max_depth", "nb", "n_packs", "eta", "reg_lambda",
                     "gamma", "min_child_weight", "weighted",
                     "hist_engine", "sorted_packs", "k", "metric_kinds",
                     "num_present", "axis_name", "hist_meta"))
def _pack_sum_scan(hist_input, binned_T, n_edges, pack_ids, label_row,
                   row_weight, preds, label_pack, present, valid=None, *,
                   k: int, max_depth: int, nb: int, n_packs: int,
                   eta: float, reg_lambda: float, gamma: float,
                   min_child_weight: float, weighted: bool,
                   hist_engine: str, sorted_packs: bool,
                   metric_kinds: tuple, num_present: float,
                   axis_name=None, hist_meta: tuple = ()):
    """k pack-sum boosting rounds as ONE compiled scan, emitting the
    per-round tree arrays plus the device-computed protocol metrics
    (pack_sum_rmse / a-peak@N over per-pack summed predictions of the
    post-update ensemble, exactly like the host fevals).

    Under shard_map (``axis_name``, rows sharded), pack sums psum
    across shards — packs may straddle shard boundaries — and
    ``valid`` keeps row-padding out of them; tree arrays and metrics
    come out replicated."""

    def _pack_sums(preds):
        p = preds if valid is None else jnp.where(valid, preds, 0.0)
        s = jax.ops.segment_sum(p, pack_ids, num_segments=n_packs,
                                indices_are_sorted=sorted_packs)
        return jax.lax.psum(s, axis_name) if axis_name else s

    def body(preds, _):
        sums = _pack_sums(preds)
        grad = jnp.take(sums, pack_ids, indices_are_sorted=sorted_packs
                        ) - label_row
        hess = jnp.ones_like(grad)
        if weighted:
            grad = grad * row_weight
            hess = hess * row_weight
        feat, bin_thr, split, leafval, row_update = _grow_tree_device(
            hist_input, binned_T, n_edges, grad, hess,
            max_depth=max_depth, nb=nb, eta=eta, reg_lambda=reg_lambda,
            gamma=gamma, min_child_weight=min_child_weight,
            hist_engine=hist_engine, axis_name=axis_name, valid=valid,
            hist_meta=hist_meta)
        preds = preds + row_update
        mets = []
        if metric_kinds:
            sums_new = _pack_sums(preds)
            max_label = jnp.max(jnp.where(present, label_pack, -jnp.inf))
            for kind, N in metric_kinds:
                if kind == "rmse":
                    err = jnp.where(present, sums_new - label_pack, 0.0)
                    mets.append(jnp.sqrt(jnp.sum(err * err) / num_present))
                else:
                    masked = jnp.where(present, sums_new, -jnp.inf)
                    # np.argsort(sums)[::-1] breaks ties toward the
                    # LARGEST pack index; lax.top_k toward the
                    # smallest — reverse to match the host feval.
                    # Clamp N like the host's [:N] slice does: trials
                    # never include absent packs (label 0 would
                    # deflate the curve) and top_k cannot exceed the
                    # axis size.
                    k_eff = min(N, n_packs, int(num_present))
                    _, idx_r = jax.lax.top_k(masked[::-1], k_eff)
                    idx = n_packs - 1 - idx_r
                    curve = jax.lax.cummax(label_pack[idx]) / max_label
                    mets.append(jnp.mean(curve))
        met_vec = (jnp.stack(mets) if mets
                   else jnp.zeros(0, jnp.float32))
        return preds, (feat, bin_thr, split, leafval, met_vec)

    return jax.lax.scan(body, preds, None, length=k)

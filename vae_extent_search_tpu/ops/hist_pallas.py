"""Pallas TPU kernel: gradient/hessian bin histograms for GBDT growth.

The histogram step of level-wise tree growth needs, per (feature f,
tree-node c, bin b):

    H[f, c, b] = sum over rows r in node c with bins[r, f] == b
                 of (grad[r], hess[r])

TPU scatters serialize, so models/boost_tpu.py first reformulated this
as one-hot matmuls in XLA — but XLA must materialize each [n, nb]
one-hot in HBM, which makes the step memory-bound (~820 MB of traffic
per feature at 400k rows). This kernel generates both one-hots INSIDE
VMEM and contracts on the MXU:

    A_f = (bins[:, f] == iota_nb)                   [blk, nb]   (VMEM)
    Bt  = [[nodeoh_t * g], [nodeoh_t * h]]          [2m, blk]   (VMEM)
    H_f += Bt @ A_f                                 [2m, nb]

Both operands are built in their MXU-native orientations — Bt is
``[M, K]`` (node/g/h arrive lane-major as [1, n] rows), A is ``[K, N]``
(bins arrive sublane-major from the feature-grouped pack) — so Mosaic
inserts no transposes; an earlier [blk, 2m] B layout paid a per-step
relayout that flattened throughput to ~80 ms/level regardless of m.
The bin axis (nb, padded to full lanes) rides the MXU lane dimension.

HBM sees the raw inputs once per level: bins (1 B/row/feature), node +
g + h (12 B/row, re-read per feature group). ``fg`` features share one
grid step (one Bt build, fg small dots) to amortize grid overhead;
accumulation uses the standard revisited-output pattern (row-block
innermost, output block resident in VMEM across the row sweep).

Rows with g = h = 0 contribute nothing (their Bt column is zero), so
padding n with zeros is safe regardless of the padded rows' bin/node
values. Per-node grad/hess totals are the bin-axis sum of any
feature's histogram (every row lands in exactly one bin) — the tree
grower uses that instead of a separate segment_sum.

The caller pre-packs bins ONCE per fit (host-side; DMatrix already
holds [d, n]) into ``binned3 [ceil(d/fg), n, fg]`` via
``pack_bins_host`` — the feature-group axis is the (full) last dim so
the block shape satisfies Mosaic's lane-divisibility rule.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

import numpy as np

_DEF_BLK = 4096
_DEF_FG = 8


def pack_bins_host(binned_dn: np.ndarray, fg: int = _DEF_FG,
                   blk: int = _DEF_BLK):
    """[d, n] uint8 (DMatrix._binned) -> [ceil(d/fg), n_pad, fg] uint8,
    rows padded to the row-block size (inert: the kernel's g/h padding
    zeroes their contribution)."""
    d, n = binned_dn.shape
    d_pad = -(-d // fg) * fg
    n_pad = -(-n // blk) * blk
    out = np.zeros((d_pad // fg, n_pad, fg), np.uint8)
    for g in range(d_pad // fg):
        chunk = binned_dn[g * fg:(g + 1) * fg]
        out[g, :n, :chunk.shape[0]] = chunk.T
    return out


def plan_tiers(n_edges: np.ndarray, sw: int = 2):
    """Split features into a low-cardinality tier (n_bins <= sw: the
    per-store one-hot/enum columns — 98 of 164 on real corpora) that
    packs nb//sw features per MXU dot, and the full-width remainder.

    Returns (idx_small, idx_big, inv_perm): inv_perm restores the
    ORIGINAL feature order from concat(small, big) so split-gain
    tie-breaking is unchanged."""
    n_edges = np.asarray(n_edges)
    small = np.where(n_edges + 1 <= sw)[0]
    big = np.where(n_edges + 1 > sw)[0]
    order = np.concatenate([small, big])
    inv = np.empty(len(n_edges), np.int64)
    inv[order] = np.arange(len(n_edges))
    return small, big, inv


def plan_tiers_multi(n_edges: np.ndarray, sws=(2, 16, 64),
                     min_features=(16, 4, 4)):
    """Assign each feature to the narrowest window tier whose width
    holds its bin count; tiers with fewer than ``min_features`` members
    fold into the next tier / full-width remainder (each tier costs an
    extra kernel launch per level). Real per-store corpora: ~98/164
    columns fit sw=2 and ~18 more fit sw<=64 (tools/bin_cardinality.py).

    Returns ``([(sw, idx), ...], idx_big)`` with idx arrays in ascending
    original order (keeps the global first-maximum tie-break)."""
    n_edges = np.asarray(n_edges)
    nbins = n_edges + 1
    taken = np.zeros(len(n_edges), bool)
    tiers = []
    for sw, mf in zip(sws, min_features):
        idx = np.where((~taken) & (nbins <= sw))[0]
        if len(idx) >= mf:
            tiers.append((int(sw), idx))
            taken[idx] = True
    return tiers, np.where(~taken)[0]


def pack_bins_host_expanded(binned_dn: np.ndarray, sw: int, nb: int,
                            fg: int = 1, blk: int = _DEF_BLK):
    """Lane-expanded pack for a low-cardinality tier: feature j of a
    dot occupies lanes [j*sw, (j+1)*sw) and its bin value is replicated
    across that window, so the kernel's single ``== iota % sw`` lights
    all nb//sw features' one-hots at once.

    [d_t, n] uint8 -> [ceil(G/fg), n_pad, fg*nb] uint8 where
    G = ceil(d_t / (nb//sw)) dots."""
    d_t, n = binned_dn.shape
    fpd = nb // sw                   # features per dot
    G = max(1, -(-d_t // fpd))
    g_pad = -(-G // fg) * fg
    n_pad = -(-n // blk) * blk
    out = np.zeros((g_pad // fg, n_pad, fg * nb), np.uint8)
    # value sw (never == iota%sw in [0, sw)) keeps padding windows dark
    out[:, :, :] = sw
    for j in range(d_t):
        dot, slot = divmod(j, fpd)
        chunk, f = divmod(dot, fg)
        lane0 = f * nb + slot * sw
        col = binned_dn[j][:, None]                      # [n, 1]
        out[chunk, :n, lane0:lane0 + sw] = col
    return out


def pack_bins_lane_major(binned_dn: np.ndarray, fg: int = _DEF_FG,
                         blk: int = _DEF_BLK):
    """[d, n] uint8 -> [d_pad, n_pad] uint8, feature-major (rows = lane
    axis inside the kernel). The kron mode reads each feature's bin
    column in BOTH orientations: sublane-major from ``pack_bins_host``
    (the lo one-hot) and lane-major from this array (the hi masks that
    multiply Bt [2m, blk] — relayouting the packed column in-kernel
    would cost more than the extra 1 B/row/feature of HBM traffic)."""
    d, n = binned_dn.shape
    d_pad = -(-d // fg) * fg
    n_pad = -(-n // blk) * blk
    out = np.zeros((d_pad, n_pad), np.uint8)
    out[:d, :n] = binned_dn
    return out


def kron_plan(m: int, nb_pad: int) -> int:
    """Pick the hi-group count for the kron one-hot decomposition of a
    full-width (nb_pad-bin) histogram dot at node count ``m``, or 0 to
    stay flat.

    The kernel is VPU-bound on one-hot generation (docs/NEXT.md): flat
    costs ~nb_pad compare-lanes per row per feature. Decomposing
    bin = hi*lw + lo costs hc lane-major hi compares + lw lo-one-hot
    lanes + hc Bt-mask multiplies (each >= a full (8,128) register in
    sublanes) per row. Two hard lessons from the first chip A/B:
    keep lw at full MXU lanes (128) so the hc dots cost the same MXU
    passes as the flat dot's nb_pad/128 N-tiles (smaller lw multiplied
    MXU work 4x and lost outright), and charge the Bt masks their
    sublane-padded width max(2m, 8). Flat wins past the modeled 10%
    margin (m >= 32 at nb_pad 256)."""
    hc = nb_pad // 128
    if hc < 2:
        return 0
    cost = hc + 128 + hc * max(2 * m, 8)
    return hc if cost < 0.9 * nb_pad else 0


def pack_bins_host_compact(binned_dn: np.ndarray, sw: int, nb: int,
                           fg: int = 1, blk: int = _DEF_BLK):
    """Compact pack for a low/mid-cardinality tier: nb//sw features per
    dot at ONE byte per row per feature — the kernel replicates each
    feature's bin column over its sw-lane window in VMEM (the expanded
    pack stores the replication in HBM: sw bytes/row/feature, which is
    untenable for sw >= 16 at pretraining row counts).

    [d_t, n] uint8 -> [ceil(G/fg), n_pad, fg*fpd] uint8 where
    fpd = nb // sw and G = ceil(d_t / fpd). Padding slots hold ``sw``
    (never equal to iota % sw in [0, sw)), keeping their windows dark."""
    d_t, n = binned_dn.shape
    fpd = nb // sw
    G = max(1, -(-d_t // fpd))
    g_pad = -(-G // fg) * fg
    n_pad = -(-n // blk) * blk
    out = np.full((g_pad // fg, n_pad, fg * fpd), sw, np.uint8)
    for j in range(d_t):
        dot, slot = divmod(j, fpd)
        chunk, f = divmod(dot, fg)
        out[chunk, :n, f * fpd + slot] = binned_dn[j]
    return out


def _body(bins_ref, node_ref, g_ref, h_ref, out_ref, *, m: int, nb: int,
          fg: int, sw: int, compact: bool, kron_hc: int = 0,
          bins_lm_ref=None):
    from jax.experimental import pallas as pl

    f32 = jnp.float32
    rb = pl.program_id(1)
    node = node_ref[...]                                   # [1, blk] i32
    nodeoh_t = (node == jax.lax.broadcasted_iota(
        jnp.int32, (m, 1), 0)).astype(f32)                 # [m, blk]
    Bt = jnp.concatenate(
        [nodeoh_t * g_ref[...], nodeoh_t * h_ref[...]], axis=0)  # [2m, blk]
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (1, nb), 1)
    bins = bins_ref[0]                         # [blk, fg(*nb|*fpd)]
    blk = bins.shape[0]
    fpd = nb // sw
    for f in range(fg):
        if sw == nb and kron_hc >= 2:
            # kron decomposition of the full-width one-hot:
            # bin = hi*lw + lo, so H[c, hi*lw+lo] factorizes into hc
            # dots of (Bt masked by hi == i) against the lw-lane lo
            # one-hot. VPU work drops from nb compare-lanes/row to
            # hc + lw + 2m*hc (kron_plan picks hc; a win at small m,
            # i.e. the shallow tree levels where most levels live).
            # The hi masks need the bin column LANE-major ([1, blk],
            # to combine with Bt) while the lo one-hot needs it
            # sublane-major — hence the second, lane-major bins input.
            lw = nb // kron_hc
            shift = lw.bit_length() - 1
            assert lw == 1 << shift, (nb, kron_hc)
            colv = bins[:, f][:, None].astype(jnp.int32)   # [blk, 1]
            iota_lw = jax.lax.broadcasted_iota(jnp.int32, (1, lw), 1)
            Alo = ((colv & (lw - 1)) == iota_lw).astype(f32)  # [blk, lw]
            hi_row = jax.lax.shift_right_logical(
                bins_lm_ref[f, :][None, :].astype(jnp.int32),
                shift)                                     # [1, blk]
            accs = []
            for i in range(kron_hc):
                Bti = Bt * (hi_row == i).astype(f32)       # [2m, blk]
                accs.append(jax.lax.dot_general(
                    Bti, Alo, (((1,), (0,)), ((), ())),
                    preferred_element_type=f32))           # [2m, lw]
            acc = jnp.concatenate(accs, axis=1)            # [2m, nb]

            @pl.when(rb == 0)
            def _init_k():
                out_ref[f] = acc

            @pl.when(rb != 0)
            def _accum_k():
                out_ref[f] += acc

            continue
        if sw == nb:
            # one feature per dot: full-width one-hot of its bin column
            A = (bins[:, f][:, None].astype(jnp.int32)
                 == iota_b).astype(f32)                    # [blk, nb]
        elif compact:
            # nb//sw features per dot, COMPACT pack (1 B/row/feature in
            # HBM): replicate each feature's bin column over its
            # sw-lane window inside VMEM via an MXU dot with a constant
            # [fpd, nb] window expander (Mosaic rejects the equivalent
            # minor-dims broadcast+reshape), then the same modular-iota
            # compare as the expanded mode lights every window at once.
            # The expander dot adds blk*fpd*nb MACs — bounded by the
            # main dot at 2m >= fpd and irrelevant anyway: the kernel
            # is VPU-bound on one-hot generation (docs/NEXT.md).
            # Mosaic has no uint8 -> f32 cast; hop through int32
            cols = (bins[:, f * fpd:(f + 1) * fpd]
                    .astype(jnp.int32).astype(f32))
            expander = (jax.lax.broadcasted_iota(
                jnp.int32, (fpd, nb), 0)
                == iota_b // sw).astype(f32)               # [fpd, nb]
            rep = jax.lax.dot_general(
                cols, expander, (((1,), (0,)), ((), ())),
                preferred_element_type=f32)                # [blk, nb]
            A = (rep == (iota_b % sw).astype(f32)).astype(f32)
        else:
            # nb//sw features per dot: bins arrive lane-EXPANDED (each
            # feature's bin value replicated over its sw-lane window),
            # so a single modular-iota compare lights every feature's
            # one-hot window at once
            A = (bins[:, f * nb:(f + 1) * nb].astype(jnp.int32)
                 == iota_b % sw).astype(f32)               # [blk, nb]
        acc = jax.lax.dot_general(
            Bt, A, (((1,), (0,)), ((), ())),
            preferred_element_type=f32)                    # [2m, nb]

        @pl.when(rb == 0)
        def _init():
            out_ref[f] = acc

        @pl.when(rb != 0)
        def _accum():
            out_ref[f] += acc


@functools.partial(
    jax.jit,
    static_argnames=("d", "m", "nb", "blk", "fg", "sw", "interpret",
                     "kron_hc"))
def hist_pallas_packed(binned3, node, grad, hess, *, d: int, m: int,
                       nb: int, blk: int = _DEF_BLK, fg: int = _DEF_FG,
                       sw: int = 0, interpret: bool = False,
                       kron_hc: int = 0, bins_lm=None):
    """-> (ghist, hhist), each [d, m, nb] f32 (plain mode) or
    [d_dots, m, nb_pad] (windowed modes, caller reshapes windows).

    binned3: [ceil(d/fg), n_pad, fg] uint8 from ``pack_bins_host``
    (plain, sw=0), [ceil(G/fg), n_pad, fg*nb_pad] from
    ``pack_bins_host_expanded``, or [ceil(G/fg), n_pad, fg*(nb_pad//sw)]
    from ``pack_bins_host_compact`` (sw>0: nb//sw features per dot; the
    pack flavor is inferred from the last-dim size);
    node: [n] int32 in [0, m); grad/hess: [n] f32 (padded internally to
    n_pad with inert zeros).

    kron_hc >= 2 (plain mode only, with ``bins_lm`` the lane-major pack
    from ``pack_bins_lane_major``): build each full-width one-hot as a
    kron product — hc hi-group masks on Bt x a (nb/hc)-lane lo one-hot.
    Sums exactly the same products as the flat dot (masks/one-hots are
    exact 0.0/1.0; only the dot's internal accumulation blocking may
    differ), cheaper on the VPU at small m."""
    from jax.experimental import pallas as pl

    n_groups, n_pad, last = binned3.shape
    nb_pad = -(-nb // 128) * 128       # full MXU lanes; extra bins stay 0
    expanded = sw > 0
    compact = expanded and last == fg * (nb_pad // sw)
    if expanded and not compact:
        assert last == fg * nb_pad, (last, fg, nb_pad)
    if kron_hc >= 2:
        assert not expanded and bins_lm is not None \
            and nb_pad % kron_hc == 0, (kron_hc, sw, nb_pad)
        assert bins_lm.shape == (n_groups * fg, n_pad), \
            (bins_lm.shape, n_groups, fg, n_pad)
    n = node.shape[0]
    if n_pad != n:
        node = jnp.pad(node, (0, n_pad - n))
        grad = jnp.pad(grad, (0, n_pad - n))
        hess = jnp.pad(hess, (0, n_pad - n))
    grid = (n_groups, n_pad // blk)
    in_specs = [
        pl.BlockSpec((1, blk, last), lambda fgi, rb: (fgi, rb, 0)),
        pl.BlockSpec((1, blk), lambda fgi, rb: (0, rb)),
        pl.BlockSpec((1, blk), lambda fgi, rb: (0, rb)),
        pl.BlockSpec((1, blk), lambda fgi, rb: (0, rb)),
    ]
    operands = [binned3, node[None, :].astype(jnp.int32),
                grad[None, :].astype(jnp.float32),
                hess[None, :].astype(jnp.float32)]
    if kron_hc >= 2:
        in_specs.append(pl.BlockSpec((fg, blk),
                                     lambda fgi, rb: (fgi, rb)))
        operands.append(bins_lm)

        def kernel(bins_ref, node_ref, g_ref, h_ref, lm_ref, out_ref):
            _body(bins_ref, node_ref, g_ref, h_ref, out_ref, m=m,
                  nb=nb_pad, fg=fg, sw=nb_pad, compact=False,
                  kron_hc=kron_hc, bins_lm_ref=lm_ref)
    else:
        kernel = functools.partial(_body, m=m, nb=nb_pad, fg=fg,
                                   sw=sw if expanded else nb_pad,
                                   compact=compact)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((fg, 2 * m, nb_pad),
                               lambda fgi, rb: (fgi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n_groups * fg, 2 * m, nb_pad),
                                       jnp.float32),
        interpret=interpret,
    )(*operands)
    if expanded:
        out = out[:d]                               # d = dot count here
        return out[:, :m, :], out[:, m:, :]
    out = out[:d, :, :nb]
    return out[:, :m, :], out[:, m:, :]


def hist_pallas(binned, node, grad, hess, *, m: int, nb: int,
                blk: int = _DEF_BLK, fg: int = _DEF_FG,
                interpret: bool = False):
    """Convenience wrapper over row-major [n, d] bins (packs on the
    host per call — tests and one-off use; the training loop pre-packs
    once via ``pack_bins_host``)."""
    n, d = binned.shape
    binned3 = jnp.asarray(
        pack_bins_host(np.asarray(binned).T, fg=fg, blk=blk))
    return hist_pallas_packed(binned3, node, grad, hess, d=d, m=m, nb=nb,
                              blk=blk, fg=fg, interpret=interpret)

"""Pallas TPU kernel: ragged per-program segment sum.

The segment-sum over each program's store-feature rows is the core
reduction of every per-store cost model (SegmentSumMLP / SegmentVAE —
reference mlp_model.py:195-208 scatter_add). XLA lowers
``jax.ops.segment_sum`` through sort/scatter machinery; with the
contiguous-rows layout our loaders produce (rows of one program are
adjacent), the sum is a gather-free streaming reduction:

grid = one kernel step per 8 segments (the fp32 sublane tile); each step
DMAs the 8 segments' contiguous row span HBM->VMEM via scalar-prefetched
offsets (PrefetchScalarGridSpec), then computes the 8 masked row-sums as
one one-hot [8, span] x [span, H] MXU matmul.

Measured on v5e-1: ~20-28us for [32k, 256] (vs XLA's ~26us) — both at
HBM bandwidth — with exact fp32 results. Odd feature widths (the raw
164-dim vectors) are column-padded to the 128-lane tile inside the
wrapper: exact, but on v5e the kernel's HBM DMA degrades ~1000x when its
operand derives from a non-tile-aligned array inside the same program
(layout propagation; optimization_barrier does not isolate it) — for
full throughput at odd widths, pre-pad columns host-side so the kernel
sees a naturally aligned array. Kept as the explicit-kernel path (and
the template for fused variants); the default model code uses
jax.ops.segment_sum.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

SEG_TILE = 8  # segments per grid step == fp32 sublane count


def _kernel(offs_ref, feat_ref, out_ref, scratch, sem, *, max_rows):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    base = offs_ref[i * SEG_TILE]
    # HBM slices must start on a sublane-tile boundary: align down by 8
    # and widen the span; per-segment bounds shift accordingly
    aligned = pl.multiple_of((base // 8) * 8, 8)
    span = SEG_TILE * max_rows + 8
    dma = pltpu.make_async_copy(
        feat_ref.at[pl.ds(aligned, span)], scratch, sem
    )
    dma.start()
    dma.wait()
    # one-hot segment-membership matrix [SEG_TILE, span] -> the 8 masked
    # row-sums become a single MXU matmul against the row block
    rows = jax.lax.broadcasted_iota(jnp.int32, (SEG_TILE, span), 1)
    lo = jnp.stack(
        [offs_ref[i * SEG_TILE + j] - aligned for j in range(SEG_TILE)]
    )[:, None]
    hi = jnp.stack(
        [offs_ref[i * SEG_TILE + j + 1] - aligned for j in range(SEG_TILE)]
    )[:, None]
    member = ((rows >= lo) & (rows < hi)).astype(scratch.dtype)
    out_ref[:] = jnp.dot(member, scratch[:],
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=("n_seg", "max_rows",
                                             "interpret"))
def segment_sum_pallas(features: jnp.ndarray, offsets: jnp.ndarray,
                       n_seg: int, max_rows: int = 32,
                       interpret: bool = False) -> jnp.ndarray:
    """features [R, H] with contiguous segments, offsets [n_seg+1] int32
    (offsets[i]..offsets[i+1] = segment i's rows, each span <= max_rows).
    ``n_seg`` must be a multiple of 8 and ``features`` padded with
    8*max_rows trailing zero rows. Returns [n_seg, H]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n_seg % SEG_TILE == 0, "pad n_seg to a multiple of 8"
    H = features.shape[1]
    # Mosaic requires the sliced trailing dim to be lane-tile (128)
    # aligned; zero-pad odd feature widths (e.g. the raw 164-dim
    # per-store vectors) and slice the result back
    Hp = -(-H // 128) * 128
    if Hp == H:
        feats = features
    else:
        # the barrier keeps XLA from fusing the pad into the kernel's
        # operand path, which degrades the DMA grid ~1000x on v5e
        feats = jax.lax.optimization_barrier(
            jnp.pad(features, ((0, 0), (0, Hp - H)))
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_seg // SEG_TILE,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((SEG_TILE, Hp), lambda i, offs: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((SEG_TILE * max_rows + 8, Hp), features.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, max_rows=max_rows),
        out_shape=jax.ShapeDtypeStruct((n_seg, Hp), features.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(offsets.astype(jnp.int32), feats)
    if Hp != H:
        # barrier on both sides: fusing the pad or the slice into the
        # kernel's operand/result path degrades the DMA grid ~1000x
        out = jax.lax.optimization_barrier(out)[:, :H]
    return out


def segment_ids_to_offsets(segment_ids: np.ndarray, n_seg: int) -> np.ndarray:
    """Contiguous segment ids -> offsets [n_seg+1] (padding rows carry
    id >= n_seg and are excluded)."""
    counts = np.bincount(
        np.asarray(segment_ids), minlength=n_seg + 1
    )[:n_seg]
    offs = np.zeros(n_seg + 1, np.int32)
    np.cumsum(counts, out=offs[1:])
    return offs


def pad_for_pallas(features: np.ndarray, offsets: np.ndarray,
                   max_rows: int = 32):
    """Pad (features, offsets) to the kernel's contract: n_seg multiple of
    8, 8*max_rows trailing zero rows."""
    n_seg = len(offsets) - 1
    pad_seg = (-n_seg) % SEG_TILE
    if pad_seg:
        offsets = np.concatenate(
            [offsets, np.full(pad_seg, offsets[-1], offsets.dtype)]
        )
    features = np.concatenate(
        [features,
         np.zeros((SEG_TILE * max_rows + 8, features.shape[1]),
                  features.dtype)]
    )
    return features, offsets, n_seg + pad_seg

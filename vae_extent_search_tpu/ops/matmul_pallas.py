"""Parameterized blocked Pallas matmul — the self-tuning target kernel.

The reference framework tunes kernels for the machine it runs on (Ansor
generates CPU/GPU schedules, measures them on that hardware, and learns a
cost model — tune_network.py / tune_vae.py).  The TPU-native analogue of
"tune a kernel for the machine under your feet" is tuning a *Pallas* kernel
for the TPU itself.  This module provides that target: a blocked MXU matmul
whose block configuration ``(bm, bn, bk)`` is the schedule decision the
framework's active-learning search optimizes with *real on-chip
measurements* (see search/pallas_tuner.py and scripts/tune_pallas_kernel.py).

Design (pallas_guide.md):
- grid = (M/bm, N/bn, K/bk), dimension semantics (parallel, parallel,
  arbitrary) — the k axis is innermost and sequential so a VMEM f32
  scratch accumulator is valid across k steps.
- inputs in any dtype (bf16 by default: MXU-native), accumulation always
  f32 (``preferred_element_type``), output f32.
- block shapes need not be (8,128)-aligned — Mosaic pads — so the search
  space is every exact factorization of (M, N, K); *bad* shapes are the
  search's problem, not a validity error.  Validity = divisibility + the
  double-buffered VMEM footprint fitting the ~16 MB budget.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# VMEM budget for validity: 16 MB physical minus compiler slack. Inputs are
# double-buffered by the pipeline; the out block + acc scratch are resident.
VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def matmul_vmem_bytes(bm: int, bn: int, bk: int, itemsize: int) -> int:
    """Pipeline VMEM footprint of one grid step (double-buffered inputs,
    double-buffered f32 out block, f32 acc scratch)."""
    return 2 * (bm * bk + bk * bn) * itemsize + 3 * bm * bn * 4


def snap_config_to_hw(M: int, N: int, K: int, bm: int, bn: int, bk: int,
                      dtype=jnp.bfloat16) -> Tuple[int, int, int]:
    """Snap a raw (bm, bn, bk) onto the Mosaic-legal lattice.

    The TPU lowering requires each block's last two dims divisible by
    (sublane, 128) — or equal to the full array dim (pallas_guide.md
    tiling constraints; verified empirically: interpret mode accepts any
    shape, the chip rejects e.g. (64, 96, 4) on a 1536^2 operand).  Block
    roles: A=[bm, bk], B=[bk, bn], out=[bm, bn] ⇒ bm is a sublane dim,
    bn and bk are lane dims.  Each value snaps UP to the smallest divisor
    of its axis that satisfies its alignment, falling back to the full
    dim (always legal)."""
    sublane = 16 if jnp.dtype(dtype).itemsize < 4 else 8

    def snap(v: int, dim: int, align: int) -> int:
        cands = [d for d in range(1, dim + 1)
                 if dim % d == 0 and d % align == 0 and d >= v]
        return min(cands) if cands else dim

    return (snap(bm, M, sublane), snap(bn, N, 128), snap(bk, K, 128))


def config_is_valid(M: int, N: int, K: int, bm: int, bn: int, bk: int,
                    dtype=jnp.bfloat16) -> Tuple[bool, Optional[str]]:
    for v, d, nm in ((bm, M, "bm"), (bn, N, "bn"), (bk, K, "bk")):
        if v < 1 or v > d:
            return False, f"{nm}={v} out of range (dim {d})"
        if d % v:
            return False, f"{nm}={v} does not divide {d}"
    vmem = matmul_vmem_bytes(bm, bn, bk, jnp.dtype(dtype).itemsize)
    if vmem > VMEM_BUDGET_BYTES:
        return False, f"VMEM {vmem/2**20:.1f} MB exceeds budget"
    return True, None


def _kernel(a_ref, b_ref, o_ref, acc_ref, *, nk: int):
    from jax.experimental import pallas as pl

    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(a_ref[:], b_ref[:],
                          preferred_element_type=jnp.float32)

    @pl.when(k == nk - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.lru_cache(maxsize=None)
def make_matmul(M: int, N: int, K: int, bm: int, bn: int, bk: int,
                dtype_name: str = "bfloat16", interpret: bool = False):
    """Compile-ready ``f(a[M,K], b[K,N]) -> c[M,N] f32`` for one block
    config. Raises ValueError on invalid configs (caller pre-checks with
    config_is_valid for a soft failure path)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    ok, why = config_is_valid(M, N, K, bm, bn, bk, dtype)
    if not ok:
        raise ValueError(why)
    nm, nn, nk = M // bm, N // bn, K // bk

    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))

    call = pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        grid=(nm, nn, nk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(M * K + K * N) * dtype.itemsize + M * N * 4,
            transcendentals=0,
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )

    def mm(a, b):
        return call(a.astype(dtype), b.astype(dtype))

    return mm


def predicted_seconds(M: int, N: int, K: int, bm: int, bn: int, bk: int,
                      dtype=jnp.bfloat16,
                      peak_flops: float = 2.0e14,
                      hbm_bw: float = 8.0e11,
                      grid_step_s: float = 1.5e-6) -> float:
    """Coarse roofline + grid-overhead estimate, used only to pick the
    timing loop length and to reject configs that would run for seconds
    (tiny blocks make the grid enormous). Not a cost model — the whole
    point is to *measure*."""
    itemsize = jnp.dtype(dtype).itemsize
    grid = (M // bm) * (N // bn) * (K // bk)
    flops_t = 2.0 * M * N * K / peak_flops
    # bytes moved: every grid step streams its a/b blocks from HBM
    bytes_moved = grid * (bm * bk + bk * bn) * itemsize + M * N * 4
    return max(flops_t, bytes_moved / hbm_bw, grid * grid_step_s)

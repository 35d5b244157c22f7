"""Parameterized implicit-GEMM Pallas conv2d — the second self-tuning target.

conv2d is the reference's flagship workload family (the tutorial task
``tune_conv2d_layer_cuda.py``, the TenSet corpora, the 20-seed replication
arm).  The matmul self-tuning demo (ops/matmul_pallas.py,
search/pallas_tuner.py) closes the Ansor measure-on-your-own-machine loop
for matmuls; this module extends the target-kernel family to conv2d+bias+
relu, the exact workload ``conv2d_layer`` computes
(records/workload_library.py:141, mirroring the reference tutorial
tutorials/auto_scheduler/tune_conv2d_layer_cuda.py:56-62).

Design — implicit GEMM with shifted-window input blocks (pallas_guide.md):

- Layout is TPU-native NHWC/HWIO (the schedule pool is NCHW Ansor
  states; only their tile *sizes* are quotiented onto this kernel —
  see search/pallas_tuner.py::state_to_conv_config).
- The input is spatially pre-padded; for stride 1 the GEMM's A-block for
  output rows ``(n, oh0:oh0+boh, 0:OW)`` at reduction step ``(kh, kw,
  ci0)`` is the *rectangle* ``x_pad[n, oh0+kh : oh0+kh+boh, kw : kw+OW,
  ci0 : ci0+bci]`` — expressed directly with ``pl.Element`` block dims
  (elementwise start offsets), so no im2col materialization and no
  gather: the pipeline streams shifted windows from HBM.
- grid = (N*OH/boh, CO/bco, KH*KW*CI/bci), dimension semantics
  (parallel, parallel, arbitrary): the reduction axis is innermost and
  sequential so the f32 VMEM accumulator is valid across its steps.
- Per step the kernel contracts ``[boh, OW, bci] x [bci, bco]`` on the
  MXU (a 3D dot_general — Mosaic collapses the leading dims); the last
  reduction step fuses the epilogue ``max(acc + bias, 0)``.
- Block config ``(boh, bco, bci)`` is the schedule decision the active
  search tunes with real on-chip measurements.  Lane/sublane legality
  (snap_conv_config_to_hw): bco and bci sit on a lane axis of some
  block, so each must be a multiple of 128 or the full dimension; boh
  is a leading dim — any divisor of OH.  OW is always taken whole (it
  is the sublane axis of the A/out blocks; full-dim is always legal).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .matmul_pallas import VMEM_BUDGET_BYTES


def conv_out_size(H: int, KH: int, stride: int, pad: int) -> int:
    return (H + 2 * pad - KH) // stride + 1


def conv_vmem_bytes(boh: int, bco: int, bci: int, OW: int,
                    itemsize: int, KW: int = 1) -> int:
    """Pipeline VMEM footprint: double-buffered x window (OW+KW-1 cols
    — the kw shift happens in-kernel) and w block (all KW taps), the
    bias block, double-buffered f32 out block + f32 acc scratch."""
    return (2 * (boh * (OW + KW - 1) * bci + KW * bci * bco) * itemsize
            + bco * 4
            + 3 * boh * OW * bco * 4)


def conv_config_is_valid(N: int, H: int, W: int, CO: int, CI: int,
                         KH: int, KW: int, stride: int, pad: int,
                         boh: int, bco: int, bci: int,
                         dtype=jnp.bfloat16) -> Tuple[bool, Optional[str]]:
    if stride != 1:
        return False, f"stride {stride} unsupported (shifted-window blocks)"
    OH = conv_out_size(H, KH, stride, pad)
    OW = conv_out_size(W, KW, stride, pad)
    if OH < 1 or OW < 1:
        return False, "degenerate output"
    for v, d, nm in ((boh, OH, "boh"), (bco, CO, "bco"), (bci, CI, "bci")):
        if v < 1 or v > d:
            return False, f"{nm}={v} out of range (dim {d})"
        if d % v:
            return False, f"{nm}={v} does not divide {d}"
    # lane-axis legality (see module docstring)
    for v, d, nm in ((bco, CO, "bco"), (bci, CI, "bci")):
        if v != d and v % 128:
            return False, f"{nm}={v} not 128-aligned nor full dim {d}"
    vmem = conv_vmem_bytes(boh, bco, bci, OW, jnp.dtype(dtype).itemsize,
                           KW)
    if vmem > VMEM_BUDGET_BYTES:
        return False, f"VMEM {vmem/2**20:.1f} MB exceeds budget"
    return True, None


def snap_conv_config_to_hw(N: int, H: int, W: int, CO: int, CI: int,
                           KH: int, KW: int, stride: int, pad: int,
                           boh: int, bco: int, bci: int,
                           dtype=jnp.bfloat16) -> Tuple[int, int, int]:
    """Snap a raw (boh, bco, bci) onto the legal lattice: each value
    moves UP to the smallest legal divisor >= it, falling back to the
    full dimension (always legal)."""
    OH = conv_out_size(H, KH, stride, pad)

    def snap(v: int, dim: int, lane: bool) -> int:
        cands = [d for d in range(1, dim + 1)
                 if dim % d == 0 and d >= v
                 and (not lane or d % 128 == 0 or d == dim)]
        return min(cands) if cands else dim

    return (snap(boh, OH, False), snap(bco, CO, True), snap(bci, CI, True))


def _kernel(x_ref, w_ref, b_ref, o_ref, acc_ref, *, gs: int, KW: int,
            OW: int):
    from jax.experimental import pallas as pl

    s = pl.program_id(2)

    @pl.when(s == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    a = x_ref[0]        # [boh, OW + KW - 1, bci]
    for kw in range(KW):
        # static kw slice in VMEM replaces the old per-kw grid pass:
        # the x window is read once per (kh, ci-block) instead of KW
        # times, and every Element start stays tile-aligned (Mosaic
        # rejects unaligned Element offsets on the tiled W dim)
        acc_ref[:] += jax.lax.dot_general(
            a[:, kw:kw + OW, :], w_ref[0, kw],
            (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(s == gs - 1)
    def _():
        o_ref[0] = jnp.maximum(acc_ref[:] + b_ref[0][None, None, :], 0.0)


@functools.lru_cache(maxsize=None)
def make_conv2d(N: int, H: int, W: int, CO: int, CI: int,
                KH: int, KW: int, stride: int, pad: int,
                boh: int, bco: int, bci: int,
                dtype_name: str = "bfloat16", interpret: bool = False):
    """Compile-ready ``f(x[N,H,W,CI], w[KH,KW,CI,CO], bias[CO]) ->
    relu(conv2d(x, w) + bias)  [N,OH,OW,CO] f32`` for one block config.
    Spatial padding happens inside (part of the measured work, as in the
    XLA baseline). Raises ValueError on invalid configs."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    dtype = jnp.dtype(dtype_name)
    ok, why = conv_config_is_valid(N, H, W, CO, CI, KH, KW, stride, pad,
                                   boh, bco, bci, dtype)
    if not ok:
        raise ValueError(why)
    OH = conv_out_size(H, KH, stride, pad)
    OW = conv_out_size(W, KW, stride, pad)
    n_ci = CI // bci
    n_oh = OH // boh
    gs = KH * n_ci

    def x_map(i, j, s):
        kh = s // n_ci
        cib = s % n_ci
        # ALL dims Element (element-offset indexing): Mosaic's real
        # lowering rejects mixed Blocked/Element specs ("All block
        # dimensions must be Elements or none of them can be
        # Elements"), and Element starts on the tiled W dim must be
        # tile-aligned — so the kw shift lives inside the kernel (the
        # window is OW+KW-1 cols from aligned start 0) and only the
        # untiled H dim carries the +kh offset. Interpret mode
        # accepted the old mixed spec, which is why this only
        # surfaced on chip (advisor r3 finding).
        return (i // n_oh, (i % n_oh) * boh + kh, 0, cib * bci)

    def w_map(i, j, s):
        return (s // n_ci, 0, s % n_ci, j)

    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"))

    call = pl.pallas_call(
        functools.partial(_kernel, gs=gs, KW=KW, OW=OW),
        grid=(N * n_oh, CO // bco, gs),
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(boh),
                          pl.Element(OW + KW - 1), pl.Element(bci)), x_map),
            pl.BlockSpec((1, KW, bci, bco), w_map),
            pl.BlockSpec((1, bco), lambda i, j, s: (0, j)),
        ],
        out_specs=pl.BlockSpec(
            (1, boh, OW, bco),
            lambda i, j, s: (i // n_oh, i % n_oh, 0, j)),
        out_shape=jax.ShapeDtypeStruct((N, OH, OW, CO), jnp.float32),
        scratch_shapes=[pltpu.VMEM((boh, OW, bco), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * OH * OW * CO * KH * KW * CI,
            bytes_accessed=(N * H * W * CI + KH * KW * CI * CO) *
            dtype.itemsize + N * OH * OW * CO * 4,
            transcendentals=0,
        ),
        compiler_params=compiler_params,
        interpret=interpret,
    )

    def conv(x, w, bias):
        xp = jnp.pad(x.astype(dtype),
                     ((0, 0), (pad, pad), (pad, pad), (0, 0)))
        return call(xp, w.astype(dtype), bias.reshape(1, CO))

    return conv


def xla_conv2d_reference(N: int, H: int, W: int, CO: int, CI: int,
                         KH: int, KW: int, stride: int, pad: int,
                         dtype_name: str = "bfloat16"):
    """XLA's own conv at the same shapes/dtype/epilogue — the baseline
    the tuned kernel is judged against (f32 accumulation either way)."""
    dtype = jnp.dtype(dtype_name)

    def conv(x, w, bias):
        out = jax.lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype), (stride, stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.maximum(out + bias[None, None, None, :], 0.0)

    return conv


def predicted_conv_seconds(N: int, H: int, W: int, CO: int, CI: int,
                           KH: int, KW: int, stride: int, pad: int,
                           boh: int, bco: int, bci: int,
                           dtype=jnp.bfloat16,
                           peak_flops: float = 2.0e14,
                           hbm_bw: float = 8.0e11,
                           grid_step_s: float = 1.5e-6) -> float:
    """Coarse roofline + grid-overhead estimate (loop-length pick and
    pathological-config rejection only; the point is to measure)."""
    itemsize = jnp.dtype(dtype).itemsize
    OH = conv_out_size(H, KH, stride, pad)
    OW = conv_out_size(W, KW, stride, pad)
    grid = (N * OH // boh) * (CO // bco) * (KH * KW * CI // bci)
    flops_t = 2.0 * N * OH * OW * CO * KH * KW * CI / peak_flops
    bytes_moved = (grid * (boh * OW * bci + bci * bco) * itemsize
                   + N * OH * OW * CO * 4)
    return max(flops_t, bytes_moved / hbm_bw, grid * grid_step_s)

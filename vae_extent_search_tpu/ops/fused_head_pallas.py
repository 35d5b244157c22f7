"""Pallas TPU kernel: fused cost-head statistics for candidate selection.

The per-phase scoring path of ``select_programs`` (reference
vae_extent_search.py:1210-1309) needs, for every candidate latent ``z``:

  1. the deterministic predicted cost            head(z)
  2. the z-gradient norm                         ||d head(z) / d z||
  3. MC-dropout mean/variance over T passes      (select_topk_* inputs)

The straightforward XLA lowering materializes ``[T, N, H]`` hidden
activations in HBM and generates ``T * N * H`` dropout uniforms with
threefry on the VPU — at N=262k, T=10 that is ~2.7 GB of HBM traffic and
~670M threefry draws, ~19 ms/phase on v5e-1 (measured; the MXU work is
only ~0.4 GFLOP/candidate ≈ 2 ms). This kernel fuses the whole head:

  * grid over candidate blocks; each block keeps every activation
    entirely in VMEM — HBM sees only the input once (in) and five
    output vectors/matrices (out);
  * dropout masks come from the TPU hardware PRNG
    (``pltpu.prng_random_bits``), seeded per block, instead of threefry;
  * the deterministic forward, the hand-derived backward (2-hidden-layer
    ReLU MLP), and the T dropout forwards share one weight load; the T
    passes run as stacked matmuls (chunked to fit the 16 MB scoped-VMEM
    budget in any compute dtype);
  * matmuls run in the input dtype (bf16 in the bench path) with f32
    accumulation (``preferred_element_type``); statistics accumulate in
    f32 centered on the deterministic cost for variance stability.

Layout: candidates live on the LANE axis — activations are
``[features, B]`` and every per-candidate scalar is a natural lane-major
``[1, B]`` row. The row-major formulation (candidates on sublanes) pays
a sublane->lane relayout for each scalar store and measured ~30% slower
on the deterministic path. In this orientation the backward is the
mirror image of the forward: forward contracts with ``W^T`` (stored
``[out, in]``), backward with ``W`` (stored ``[in, out]``) — both
orientations ship to the kernel so no in-kernel transpose exists.

Head structure matched (models/predictor.py::predict_cost with
``predictor_layers == 2``):  z @ W0 + b0 → relu → dropout → @ W1 + b1 →
relu → @ w2 + b2.  The variance is the sample variance (ddof=1) exactly
as ``mc_predict``.

For CPU testing (Pallas interpret mode has no TPU PRNG lowering) the
kernel optionally takes precomputed mask *bits* ``[T, N, H]`` uint32; the
arithmetic path is identical, so interpret-mode tests pin the math and
the on-chip path only swaps the bit source.

Scope: single-device executable (the per-chip fast path). Under a
device mesh, GSPMD has no partitioning rule for the custom call and
would all-gather the candidate axis — mesh-sharded selection uses the
XLA path instead (search/select.py gates this); a shard_map wrapper
running this kernel per shard is the route to pod-scale fusion.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

_LANE = 128


def _body(*refs, T: int, tc: int, rate: float, use_prng: bool, n_enc: int,
          want_mu: bool):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    seed_or_bits_ref, xt_ref = refs[0], refs[1]
    enc_refs = refs[2:2 + 2 * n_enc]
    # head weights, both orientations: *t = [out, in] (forward side in
    # this layout), plain = [in, out] (backward side); w2c = [H, 1]
    # column, b2 f32 (Mosaic cannot extract bf16 scalars)
    (w0t_ref, b0_ref, w1t_ref, b1_ref, w2r_ref, b2_ref, w0_ref, w1_ref,
     w2c_ref) = refs[2 + 2 * n_enc:11 + 2 * n_enc]
    out_refs = refs[11 + 2 * n_enc:]
    if n_enc and want_mu:
        mu_ref, cost_ref, gnorm_ref, mean_ref, var_ref = out_refs
    else:
        cost_ref, gnorm_ref, mean_ref, var_ref = out_refs

    ct = w0t_ref.dtype

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32)

    if n_enc:
        # fused encoder: x^T -> relu MLP -> fc_mu (no dropout in the
        # encoder, so mu is shared by every downstream pass)
        h = xt_ref[:]                              # [D, B]
        for j in range(n_enc - 1):
            wt, b = enc_refs[2 * j][:], enc_refs[2 * j + 1][:]
            h = jnp.maximum(mm(wt, h) + b.astype(f32), 0.0).astype(ct)
        wmu, bmu = enc_refs[-2][:], enc_refs[-1][:]
        z = (mm(wmu, h) + bmu.astype(f32)).astype(ct)  # [L, B]
        if want_mu:
            mu_ref[:] = z.astype(f32)
    else:
        z = xt_ref[:]                              # [L, B]

    # deterministic forward
    b2 = b2_ref[0, 0]
    a0 = mm(w0t_ref[:], z) + b0_ref[:].astype(f32)     # [H, B] f32
    h0 = jnp.maximum(a0, 0.0)
    a1 = mm(w1t_ref[:], h0.astype(ct)) + b1_ref[:].astype(f32)
    h1 = jnp.maximum(a1, 0.0)
    cc = mm(w2r_ref[:], h1.astype(ct)) + b2            # [1, B] f32
    cost_ref[:] = cc

    # backward to z (pure ReLU-MLP chain rule, mirror orientation):
    # g1 = 1[a1>0] * w2 ; g0 = (W1 g1) * 1[a0>0] ; gz = W0 g0
    g1 = jnp.where(a1 > 0.0, w2c_ref[:].astype(f32), 0.0)   # [H, B]
    g0 = jnp.where(a0 > 0.0, mm(w1_ref[:], g1.astype(ct)), 0.0)
    gz = mm(w0_ref[:], g0.astype(ct))                  # [L, B]
    gnorm_ref[:] = jnp.sqrt(jnp.sum(gz * gz, axis=0, keepdims=True))

    # T MC-dropout forwards, masks on h0 only (predict_cost applies
    # dropout after the first hidden layer's relu only). The T passes
    # are independent given h0, so they run as stacked [H, tc*B] matmuls
    # (tc passes per chunk) instead of T sequential [H, B] ones —
    # tc-fold larger MXU tiles with no serial dependency chain. The
    # chunk size is capped by the wrapper so the stacked activations fit
    # v5e's 16 MB scoped-VMEM budget in any compute dtype.
    if use_prng:
        pltpu.prng_seed(seed_or_bits_ref[0] + pl.program_id(0))
    keep = 1.0 - rate
    # drop when bits < rate * 2^32  <=>  keep with prob (1 - rate)
    thresh = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    scale = jnp.asarray(1.0 / keep, f32)
    h_dim, b_cols = h0.shape
    # the [H, tc*B] elementwise chain is the kernel's VPU hot spot —
    # keep it in the compute dtype (half the lane-bytes of f32 when bf16)
    h0s = (h0 * scale).astype(ct)
    s = jnp.zeros(cc.shape, f32)
    s2 = jnp.zeros(cc.shape, f32)
    for t0 in range(0, T, tc):
        tcur = min(tc, T - t0)
        if use_prng:
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((h_dim, tcur * b_cols)), jnp.uint32)
        else:
            # injected mask bits arrive candidate-major [B, H]; the
            # transpose only exists on the interpret/test path
            bits = jnp.concatenate(
                [seed_or_bits_ref[t0 + t].T for t in range(tcur)], axis=1)
        h0_rep = (h0s if tcur == 1
                  else jnp.concatenate([h0s] * tcur, axis=1))
        h0d = jnp.where(bits >= thresh, h0_rep, jnp.zeros((), ct))
        a1t = mm(w1t_ref[:], h0d) + b1_ref[:].astype(f32)  # [H, tc*B]
        h1t = jnp.maximum(a1t, 0.0).astype(ct)
        ct_all = mm(w2r_ref[:], h1t) + b2                  # [1, tc*B]
        for t in range(tcur):
            dt = ct_all[:, t * b_cols:(t + 1) * b_cols] - cc  # centered
            s = s + dt
            s2 = s2 + dt * dt
    mean_ref[:] = cc + s / T
    # sample variance (ddof=1), shift-invariant so centering is exact
    var_ref[:] = (s2 - s * s / T) / (T - 1) if T > 1 else s2 * 0.0


def snap_fused_config(N: int, D: int, H: int, L: int, T: int,
                      block: int, mc_chunk: int,
                      dtype=jnp.bfloat16) -> Tuple[int, int]:
    """Snap a raw tuner config onto the lattice ``fused_head_stats``
    actually executes: lane-aligned block within [128, 4096] (bounded
    by the padded candidate count), then the kernel's own VMEM shrink
    rules (wide-input block cap, stacked-MC cols cap) so distinct raw
    configs that the kernel would coerce to the same (block, tc) share
    one measurement — the same quotienting matmul configs get from
    snap_config_to_hw."""
    itemsize = jnp.dtype(dtype).itemsize
    n_cap = max(_LANE, -(-N // _LANE) * _LANE)
    block = max(_LANE, min(int(block), 4096, n_cap))
    block = (block // _LANE) * _LANE
    while block > _LANE and D * block * itemsize > 2_097_152:
        block = max(_LANE, (block // 2) // _LANE * _LANE)
    cols_cap = 5_242_880 // max(1, H * itemsize)
    tc = max(1, min(int(mc_chunk), T, max(1, cols_cap // block)))
    return block, tc


def _wb(layer: Dict, dtype, transposed: bool, f32_bias: bool = False):
    w = layer["w"]
    w = (w.T if transposed else w).astype(dtype)
    b = layer["b"].astype(jnp.float32 if f32_bias else dtype)
    return w, b.reshape(-1, 1)


@functools.partial(
    jax.jit,
    static_argnames=("T", "rate", "block", "interpret", "mu_layout",
                     "parallel_grid", "mc_chunk"),
)
def fused_head_stats(head_layers: List[Dict], z: jnp.ndarray, seed,
                     T: int = 10, rate: float = 0.1, block: int = 1024,
                     interpret: bool = False,
                     mask_bits: Optional[jnp.ndarray] = None,
                     encoder: Optional[Tuple] = None,
                     mu_layout: str = "nl",
                     parallel_grid: bool = True,
                     mc_chunk: Optional[int] = None):
    """cost, gnorm, mc_mean, mc_var — all [N] f32 — for a 2-hidden-layer
    ReLU cost head over latents ``z`` [N, L].

    ``seed``: int32 scalar seeding the on-chip PRNG (ignored when
    ``mask_bits`` [T, N, H] uint32 is supplied, the interpret-test path).

    ``mu_layout="none"`` skips the mu output entirely (first returned
    element is None). The selection paths re-encode the few hundred
    gathered rows they need, so materializing the full [L, N] latent
    matrix to HBM (~67 MB at 262k candidates) would be pure wasted
    bandwidth — Pallas custom-call outputs are not DCE'd by XLA.

    With ``encoder=(encoder_layers, fc_mu)`` the input is the raw feature
    matrix instead of latents: the VAE encoder runs inside the kernel
    (it has no dropout, so one pass feeds everything) and ``mu`` f32 is
    returned as a fifth output — HBM never sees the [N, H] hidden
    activations at all. ``mu_layout``: "nl" returns mu [N, L];
    "ln" returns the kernel-native [L, N] (candidates on lanes) and
    skips the [L, N]->[N, L] transpose, which at 262k candidates is a
    ~2 ms lane->sublane relayout the selection path does not need (it
    only gathers a few hundred columns).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d_in = z.shape
    l, h = head_layers[0]["w"].shape
    assert len(head_layers) == 3, "kernel is specialized to 2 hidden layers"
    assert h % _LANE == 0 and l % 8 == 0, (l, h)
    assert block % _LANE == 0, block
    # wide inputs (e.g. the per-store feature mode: D = n_stores * 164)
    # make the [D, block] input block a major scoped-VMEM consumer on
    # top of the stacked MC activations — at D=820, block=1024, f32 the
    # whole kernel overflows the 16 MB budget by ~0.9 MB. Halve the
    # block until the input block fits in ~2 MB; the MC chunking below
    # adapts (tc = cols_cap // block) so the stacked footprint is
    # unchanged.
    in_itemsize = jnp.dtype(z.dtype).itemsize
    while block > _LANE and d_in * block * in_itemsize > 2_097_152:
        block = max(_LANE, (block // 2) // _LANE * _LANE)
    # injected dropout bits add a [T, block, H] u32 input block to the
    # scoped-VMEM footprint that the hardware-PRNG path never pays
    # (10.5 MB at T=10, block=1024, H=256 — measured 4.1 MB over the
    # 16 MB budget on v5e next to the activations). Shrink the
    # candidate block until the bits block fits in ~5 MB.
    if mask_bits is not None:
        while block > _LANE and T * block * h * 4 > 5_242_880:
            block = max(_LANE, (block // 2) // _LANE * _LANE)
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        z = jnp.concatenate([z, jnp.zeros((pad, d_in), z.dtype)])
        if mask_bits is not None:
            mask_bits = jnp.concatenate(
                [mask_bits, jnp.zeros((T, pad, h), jnp.uint32)], axis=1)
    n_pad = nb * block
    zt = z.T  # [D, N]: candidates on lanes

    full = lambda i: (0, 0)
    w0t, b0 = _wb(head_layers[0], z.dtype, transposed=True)
    w1t, b1 = _wb(head_layers[1], z.dtype, transposed=True)
    # b2 stays f32 end to end (Mosaic cannot extract bf16 scalars, and a
    # bf16 round-trip would offset every cost output)
    w2r, b2 = _wb(head_layers[2], z.dtype, transposed=True, f32_bias=True)
    w0 = head_layers[0]["w"].astype(z.dtype)
    w1 = head_layers[1]["w"].astype(z.dtype)
    w2c = head_layers[2]["w"].astype(z.dtype)          # [H, 1] column

    enc_arrays, enc_specs = [], []
    n_enc = 0
    if encoder is not None:
        enc_layers, fc_mu = encoder
        stack = list(enc_layers) + [fc_mu]
        n_enc = len(stack)
        for layer in stack:
            wt, b = _wb(layer, z.dtype, transposed=True)
            enc_arrays += [wt, b]
            enc_specs += [
                pl.BlockSpec(wt.shape, full),
                pl.BlockSpec(b.shape, full),
            ]

    use_prng = mask_bits is None
    head_arrays = [w0t, b0, w1t, b1, w2r, b2, w0, w1, w2c]
    in_specs = [
        pl.BlockSpec((d_in, block), lambda i: (0, i)),
        *enc_specs,
        *[pl.BlockSpec(a.shape, full) for a in head_arrays],
    ]
    if use_prng:
        first = jnp.asarray(seed, jnp.int32).reshape(1)
        first_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    else:
        first = mask_bits
        first_spec = pl.BlockSpec((T, block, h), lambda i: (0, i, 0))
    want_mu = mu_layout != "none"
    out_shape = [jax.ShapeDtypeStruct((1, n_pad), jnp.float32)] * 4
    out_specs = [pl.BlockSpec((1, block), lambda i: (0, i))] * 4
    if n_enc and want_mu:
        out_shape = [jax.ShapeDtypeStruct((l, n_pad), jnp.float32)] \
            + out_shape
        out_specs = [pl.BlockSpec((l, block), lambda i: (0, i))] + out_specs
    # cap the stacked MC chunk so its [H, tc*block] activations fit the
    # 16 MB scoped-VMEM budget. Empirical bound: 10240 stacked bf16
    # candidates at H=256 fit (5.2 MB per stacked buffer) while the same
    # f32 footprint does not, so cap cols*H*itemsize at ~5.2 MB.
    itemsize = jnp.dtype(z.dtype).itemsize
    cols_cap = 5_242_880 // max(1, h * itemsize)
    tc = max(1, min(T, cols_cap // block))
    if mc_chunk is not None:
        # tuner override (scripts/tune_kernel_suite.py fusedhead family):
        # a smaller MC chunk trades stacked-activation VMEM for more
        # sequential T passes; the VMEM cap above stays the hard bound
        tc = max(1, min(tc, int(mc_chunk)))
    # candidate blocks are fully independent (each seeds its own PRNG
    # stream), so the grid axis is declared parallel — Mosaic may then
    # software-pipeline/reorder blocks instead of running them as a
    # sequential loop
    compiler_params = None
    if parallel_grid and not interpret:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel",))
    outs = pl.pallas_call(
        functools.partial(_body, T=T, tc=tc, rate=rate, use_prng=use_prng,
                          n_enc=n_enc, want_mu=want_mu),
        grid=(nb,),
        in_specs=[first_spec] + in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=compiler_params,
    )(first, zt, *enc_arrays, *head_arrays)
    if n_enc:
        if not want_mu:
            return (None,) + tuple(o[0, :n] for o in outs)
        mu = outs[0][:, :n] if mu_layout == "ln" else outs[0].T[:n]
        return (mu,) + tuple(o[0, :n] for o in outs[1:])
    return tuple(o[0, :n] for o in outs)

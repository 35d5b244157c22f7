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

  * grid over row blocks; each block keeps ``h0``/``h1`` and all T
    dropout passes entirely in VMEM — HBM sees only ``z`` once (in) and
    four ``[N]`` f32 vectors (out);
  * dropout masks come from the TPU hardware PRNG
    (``pltpu.prng_random_bits``), seeded per block, instead of threefry;
  * the deterministic forward, the hand-derived backward (2-hidden-layer
    ReLU MLP), and the T dropout forwards share one weight load;
  * matmuls run in the input dtype (bf16 in the bench path) with f32
    accumulation (``preferred_element_type``); statistics accumulate in
    f32 centered on the deterministic cost for variance stability.

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
XLA path instead (search/active_loop.py gates this); a shard_map
wrapper running this kernel per shard is the route to pod-scale fusion.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

_LANE = 128


def _body(*refs, T: int, tc: int, rate: float, use_prng: bool, n_enc: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    f32 = jnp.float32
    seed_or_bits_ref, z_ref = refs[0], refs[1]
    enc_refs = refs[2:2 + 2 * n_enc]
    (w0_ref, b0_ref, w1_ref, b1_ref, w2_ref, b2_ref, w0t_ref, w1t_ref,
     w2r_ref) = refs[2 + 2 * n_enc:11 + 2 * n_enc]
    out_refs = refs[11 + 2 * n_enc:]
    if n_enc:
        mu_ref, cost_ref, gnorm_ref, mean_ref, var_ref = out_refs
    else:
        cost_ref, gnorm_ref, mean_ref, var_ref = out_refs

    w0, w1 = w0_ref[:], w1_ref[:]                  # [L, H], [H, H]
    b0, b1 = b0_ref[:], b1_ref[:]                  # [1, H]
    w2 = w2_ref[:]                                 # [H, 1]
    b2 = b2_ref[0, 0]                              # f32 (bf16 scalar
    # extracts are unsupported by Mosaic; the wrapper passes b2 as f32)
    ct = w0.dtype

    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=f32)

    if n_enc:
        # fused encoder: x -> relu MLP -> fc_mu (no dropout in the
        # encoder, so mu is shared by every downstream pass)
        h = z_ref[:]
        for j in range(n_enc - 1):
            wj, bj = enc_refs[2 * j][:], enc_refs[2 * j + 1][:]
            h = jnp.maximum(mm(h, wj) + bj.astype(f32), 0.0).astype(ct)
        wmu, bmu = enc_refs[-2][:], enc_refs[-1][:]
        z = (mm(h, wmu) + bmu.astype(f32)).astype(ct)  # [B, L]
        mu_ref[:] = z.astype(mu_ref.dtype)
    else:
        z = z_ref[:]                               # [B, L]

    # deterministic forward
    a0 = mm(z, w0) + b0.astype(f32)                # [B, H] f32
    h0 = jnp.maximum(a0, 0.0)
    h0c = h0.astype(ct)
    a1 = mm(h0c, w1) + b1.astype(f32)              # [B, H] f32
    h1 = jnp.maximum(a1, 0.0)
    # per-candidate scalars stay [B, 1] columns end to end: storing them
    # as 1-D lane-major vectors would relayout sublanes->lanes per store
    # (measured ~0.5 ms/phase at 262k candidates); the wrapper strips
    # the trailing axis outside the kernel
    cc = mm(h1.astype(ct), w2) + b2.astype(f32)          # [B, 1] f32
    c = cc[:, 0]
    cost_ref[:] = cc

    # backward to z: g1 = 1[a1>0] * w2^T ; g0 = (g1 @ W1^T) * 1[a0>0] ;
    # gz = g0 @ W0^T  (pure ReLU-MLP chain rule). The transposed weights
    # come in pre-transposed (w1t/w0t) and w2 as a row vector (w2r) so
    # every contraction is the natural (1),(0) layout — in-kernel
    # transposes would relayout across lanes per grid step
    g1 = jnp.where(a1 > 0.0, w2r_ref[:].astype(f32), 0.0)
    g0 = jnp.where(a0 > 0.0, mm(g1.astype(ct), w1t_ref[:]), 0.0)
    gz = mm(g0.astype(ct), w0t_ref[:])             # [B, L]
    gnorm_ref[:] = jnp.sqrt(jnp.sum(gz * gz, axis=1, keepdims=True))

    # T MC-dropout forwards, masks on h0 only (predict_cost applies
    # dropout after the first hidden layer's relu only). The T passes are
    # independent given h0, so they run as stacked [tc*B, H] matmuls
    # (tc passes per chunk) instead of T sequential [B, H] ones —
    # tc-fold larger MXU tiles with no serial dependency chain. The
    # chunk size is capped by the wrapper so the stacked activations fit
    # v5e's 16 MB scoped VMEM in any compute dtype (f32 at T=10 blew it
    # by 4% unchunked).
    if use_prng:
        pltpu.prng_seed(seed_or_bits_ref[0] + pl.program_id(0))
    keep = 1.0 - rate
    # drop when bits < rate * 2^32  <=>  keep with prob (1 - rate)
    thresh = jnp.uint32(min(int(rate * 4294967296.0), 4294967295))
    scale = jnp.asarray(1.0 / keep, f32)
    b_rows, h_dim = h0.shape
    # the [tc*B, H] elementwise chain is the kernel's VPU hot spot — keep
    # it in the compute dtype (half the lanes-bytes of f32 when bf16)
    h0s = (h0 * scale).astype(ct)
    s = jnp.zeros(cc.shape, f32)
    s2 = jnp.zeros(cc.shape, f32)
    for t0 in range(0, T, tc):
        tcur = min(tc, T - t0)
        if use_prng:
            bits = pltpu.bitcast(
                pltpu.prng_random_bits((tcur * b_rows, h_dim)), jnp.uint32)
        else:
            bits = jnp.concatenate(
                [seed_or_bits_ref[t0 + t] for t in range(tcur)], axis=0)
        h0_rep = (h0s if tcur == 1
                  else jnp.concatenate([h0s] * tcur, axis=0))
        h0d = jnp.where(bits >= thresh, h0_rep, jnp.zeros((), ct))
        a1t = mm(h0d, w1) + b1.astype(f32)         # [tc*B, H]
        h1t = jnp.maximum(a1t, 0.0).astype(ct)
        for t in range(tcur):
            h1_t = h1t[t * b_rows:(t + 1) * b_rows]  # static row slice
            dt = mm(h1_t, w2) + b2.astype(f32) - cc  # [B,1], centered
            s = s + dt
            s2 = s2 + dt * dt
    mean_ref[:] = cc + s / T
    # sample variance (ddof=1), shift-invariant so centering is exact
    var_ref[:] = (s2 - s * s / T) / (T - 1) if T > 1 else s2 * 0.0


def _head_arrays(head_layers: List[Dict], dtype) -> Tuple:
    w0 = head_layers[0]["w"].astype(dtype)
    b0 = head_layers[0]["b"].astype(dtype).reshape(1, -1)
    w1 = head_layers[1]["w"].astype(dtype)
    b1 = head_layers[1]["b"].astype(dtype).reshape(1, -1)
    w2 = head_layers[2]["w"].astype(dtype)
    b2 = head_layers[2]["b"].astype(jnp.float32).reshape(1, 1)
    return w0, b0, w1, b1, w2, b2


@functools.partial(
    jax.jit,
    static_argnames=("T", "rate", "block", "interpret"),
)
def fused_head_stats(head_layers: List[Dict], z: jnp.ndarray, seed,
                     T: int = 10, rate: float = 0.1, block: int = 1024,
                     interpret: bool = False,
                     mask_bits: Optional[jnp.ndarray] = None,
                     encoder: Optional[Tuple] = None):
    """cost, gnorm, mc_mean, mc_var — all [N] f32 — for a 2-hidden-layer
    ReLU cost head over latents ``z`` [N, L].

    ``seed``: int32 scalar seeding the on-chip PRNG (ignored when
    ``mask_bits`` [T, N, H] uint32 is supplied, the interpret-test path).

    With ``encoder=(encoder_layers, fc_mu)`` the input is the raw feature
    matrix instead of latents: the VAE encoder runs inside the kernel
    (it has no dropout, so one pass feeds everything) and ``mu`` [N, L]
    f32 is returned as a fifth output — HBM never sees the [N, H] hidden
    activations at all.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, d_in = z.shape
    h = head_layers[0]["w"].shape[1]
    l = head_layers[0]["w"].shape[0]
    assert len(head_layers) == 3, "kernel is specialized to 2 hidden layers"
    assert h % _LANE == 0 and l % 8 == 0, (l, h)
    assert block % 1024 == 0, block
    nb = -(-n // block)
    pad = nb * block - n
    if pad:
        z = jnp.concatenate([z, jnp.zeros((pad, d_in), z.dtype)])
        if mask_bits is not None:
            mask_bits = jnp.concatenate(
                [mask_bits, jnp.zeros((T, pad, h), jnp.uint32)], axis=1)
    w0, b0, w1, b1, w2, b2 = _head_arrays(head_layers, z.dtype)
    w0t, w1t, w2r = w0.T, w1.T, w2.reshape(1, -1)

    full = lambda i: (0, 0)
    enc_arrays, enc_specs = [], []
    n_enc = 0
    if encoder is not None:
        enc_layers, fc_mu = encoder
        stack = list(enc_layers) + [fc_mu]
        n_enc = len(stack)
        for layer in stack:
            w = layer["w"].astype(z.dtype)
            b = layer["b"].astype(z.dtype).reshape(1, -1)
            enc_arrays += [w, b]
            enc_specs += [
                pl.BlockSpec(w.shape, full),
                pl.BlockSpec(b.shape, full),
            ]

    use_prng = mask_bits is None
    in_specs = [
        pl.BlockSpec((block, d_in), lambda i: (i, 0)),
        *enc_specs,
        pl.BlockSpec((l, h), full),
        pl.BlockSpec((1, h), full),
        pl.BlockSpec((h, h), full),
        pl.BlockSpec((1, h), full),
        pl.BlockSpec((h, 1), full),
        pl.BlockSpec((1, 1), full),
        pl.BlockSpec((h, l), full),
        pl.BlockSpec((h, h), full),
        pl.BlockSpec((1, h), full),
    ]
    if use_prng:
        first = jnp.asarray(seed, jnp.int32).reshape(1)
        first_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    else:
        first = mask_bits
        first_spec = pl.BlockSpec((T, block, h), lambda i: (0, i, 0))
    out_shape = [jax.ShapeDtypeStruct((nb * block, 1), jnp.float32)] * 4
    out_specs = [pl.BlockSpec((block, 1), lambda i: (i, 0))] * 4
    if n_enc:
        out_shape = [jax.ShapeDtypeStruct((nb * block, l), jnp.float32)] \
            + out_shape
        out_specs = [pl.BlockSpec((block, l), lambda i: (i, 0))] + out_specs
    # cap the stacked MC chunk so its [tc*block, H] activations fit the
    # 16 MB scoped-VMEM budget. Empirical bound: 10240 bf16 rows at
    # H=256 fit (5.2 MB per stacked buffer) while 10240 f32 rows do not,
    # so cap the per-buffer footprint rows*H*itemsize at ~5.2 MB.
    itemsize = jnp.dtype(z.dtype).itemsize
    rows_cap = 5_242_880 // max(1, h * itemsize)
    tc = max(1, min(T, rows_cap // block))
    outs = pl.pallas_call(
        functools.partial(_body, T=T, tc=tc, rate=rate, use_prng=use_prng,
                          n_enc=n_enc),
        grid=(nb,),
        in_specs=[first_spec] + in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(first, z, *enc_arrays, w0, b0, w1, b1, w2, b2, w0t, w1t, w2r)
    def unpad(a):
        return a[:n, 0] if a.shape[-1] == 1 else a[:n]
    return tuple(unpad(o) for o in outs)

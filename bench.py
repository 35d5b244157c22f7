"""Benchmark: candidates scored/sec/chip through the full scoring pipeline.

The north-star metric (BASELINE.json): candidates scored per second per
chip on the VAE-extent-search scoring path — encode -> cost head -> z-grad
norms -> MC-dropout x T=10 -> candidate-pool top-k -> k-center-greedy
diversity -> selection union, i.e. one complete `select_programs` phase
(vae_extent_search_tpu/search/select.py), which on this framework is ONE
jitted XLA program whose encoder + cost-head + z-grad + MC-dropout block
runs as a single fused Pallas kernel (ops/fused_head_pallas.py:
activations in VMEM, dropout masks from the on-chip hardware PRNG) and
whose selection strategies operate on a gathered candidate pool.

Baseline provenance (measured, not derived): tools/baseline_probe.py
re-implements the reference's select_programs phase faithfully in torch
on CPU (encode full N once, full-N MC-dropout x T=10 with per-sample
encoder re-runs per mc_predict vae_extent_search.py:670-702, full-N
z-grad, chunked-cdist k-center greedy; budget split .5/.3/.2 + grad 2)
and times it on THIS host: 4,096-candidate pool, best-of-7 = 578 ms
-> 7,087 cands/s on one CPU core (median 5,242; measured 2026-08-18;
the earlier 4,000/s figure was derived from the reference's used_time
accounting). BASELINE_CANDS_PER_SEC records the measured best — the
conservative choice (higher baseline -> lower vs_baseline).

Methodology — honest completion timing on an async/tunneled backend:
`block_until_ready` on the tunneled axon platform acknowledges dispatch,
not completion (measured: a 1.1-TFLOP f32 matmul "completes" in 0.09 ms,
far beyond hardware peak), so per-call block timing is invalid there.
We run K phases back-to-back as ONE compiled program — a `lax.scan`
over K INDEPENDENTLY-INITIALIZED parameter sets (each phase of the real
active loop scores with freshly retrained params, so per-phase params
are the faithful setup AND stop XLA from hoisting any loop-invariant
scoring work out of the scan), reduce one scalar that depends on every
phase's selection output (so no phase can be elided), and device_get
that scalar — one true round-trip for the whole chain. The measured
round-trip latency of a trivial transfer is subtracted:
per_phase = (total - rtt) / K. A per-dispatch variant (K separate
executions chained into one reduction) is also timed and printed on
stderr: on the tunneled dev backend it carries a ~6 ms host-dispatch
gap per phase that says nothing about chip throughput (a production
TPU runtime dispatches in ~0.1 ms); the scan number is the honest
per-chip figure. Scoring runs in bfloat16 (MXU-native; top-1/selection
agreement with f32 is regression-tested in tests/test_models.py),
selection logic and statistics stay f32.

Before the timed windows, a shard_map parity pin runs on the real
hardware: the same selection phase through
search/select_sharded.py::select_programs_sharded over a Mesh of all
visible devices (a mesh of 1 on the single-chip bench) with injected
dropout mask bits must reproduce the unsharded phase's selection
indices exactly. The sharded path was previously pinned only by
CPU-interpret tests at small N (tests/test_pipeline.py); this closes
the real-chip seam and prints a `shard_parity=` line on stderr.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# measured on this host via tools/baseline_probe.py (see module
# docstring): best-of-7 of the reference-faithful torch-CPU phase
BASELINE_CANDS_PER_SEC = 7087.0


def shard_parity_check(cfg_kw):
    """Real-hardware pin: select_programs_sharded over a Mesh of every
    visible device must reproduce the unsharded fused phase's selection
    bit-for-bit when both consume the same injected dropout mask bits
    (the PRNG-free seam also used by the CPU-interpret tests). Runs at
    a smaller pool than the headline bench so the [T, N, H] bits
    tensor stays a few hundred MB of HBM."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from vae_extent_search_tpu.models import init_predictor_params
    from vae_extent_search_tpu.search import SelectionConfig
    from vae_extent_search_tpu.search.select import _select_programs
    from vae_extent_search_tpu.search.select_sharded import (
        select_programs_sharded,
    )

    n_dev = len(jax.devices())
    N, D, T, H = 32768 * n_dev, 24, 10, 256
    cfg = SelectionConfig(T_mc=T, **cfg_kw)
    key = jax.random.PRNGKey(42)
    params = init_predictor_params(key, D, hidden_dim=H, latent_dim=64)
    X = jax.random.normal(key, (N, D), jnp.float32)
    used = jnp.zeros(N, bool).at[:128].set(True)
    rem = ~used
    bits = jax.jit(lambda k: jax.random.bits(k, (T, N, H), jnp.uint32))(
        jax.random.fold_in(key, 7))
    n_meas = 128
    cidx = jnp.concatenate([
        jnp.arange(n_meas, dtype=jnp.int32),
        jnp.zeros(cfg.max_centers - n_meas, jnp.int32)])
    cval = jnp.arange(cfg.max_centers) < n_meas

    sel1, val1, rem1, aux1 = _select_programs(
        params, X, used, rem, key, cfg, False, bits, cidx, cval)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sel2, val2, rem2, aux2 = select_programs_sharded(
        params, X, used, rem, key, cfg, mesh, "data",
        mask_bits=bits, center_idx=cidx, center_valid=cval)

    v1, v2 = np.asarray(val1), np.asarray(val2)
    ok = ((v1 == v2).all()
          and (np.asarray(sel1)[v1] == np.asarray(sel2)[v2]).all()
          and (np.asarray(rem1) == np.asarray(rem2)).all())
    n_sel = int(v1.sum())
    print(f"shard_parity={'OK' if ok else 'FAIL'} mesh={n_dev}dev "
          f"N={N} selected={n_sel} "
          f"backend={jax.default_backend()}", file=sys.stderr)
    if not ok:
        raise AssertionError(
            "sharded fused selection diverged from the unsharded phase "
            "on real hardware")


def main():
    import jax
    import jax.numpy as jnp

    from vae_extent_search_tpu.models import init_predictor_params
    from vae_extent_search_tpu.search import SelectionConfig, select_programs

    # Pool sized like a batched multi-task TenSet candidate set (64 tasks
    # x 4,096 states); dims match the reference experiment defaults
    # (extent dim ~24, latent 64, hidden 256).
    N, D = 262144, 24
    HIDDEN, LATENT = 256, 64
    cfg = SelectionConfig(num_select=64, T_mc=10, topk_factor=5, grad_num=2,
                          rand_num=0, compute_dtype="bfloat16")

    # real-hardware parity pin for the pod-scale path (VERDICT r3 weak
    # #6) before any timing: fail loudly rather than benchmark a
    # kernel whose sharded twin diverges
    shard_parity_check(dict(num_select=cfg.num_select,
                            topk_factor=cfg.topk_factor,
                            grad_num=cfg.grad_num, rand_num=cfg.rand_num,
                            compute_dtype=cfg.compute_dtype))

    # The bench runs under kernel-library dispatch: with
    # VES_KERNEL_LIBRARY unset, default_library() loads the committed
    # chip-tuned logs (result/selftune/) and the fused-head kernel
    # inside _select_programs picks up any (block, mc_chunk) record for
    # this shape — the reference's implicit ApplyHistoryBest role.
    from vae_extent_search_tpu.ops.kernel_library import default_library
    lib = default_library()
    tuned_cfg = lib.fused_head_config(N, D, HIDDEN, LATENT, 10,
                                      dtype="bfloat16")
    print(f"kernel_library: {len(lib)} tuned records loaded, "
          f"fused_head(N={N}) -> "
          f"{tuned_cfg if tuned_cfg is not None else 'hand default'}",
          file=sys.stderr)

    key = jax.random.PRNGKey(0)
    params = init_predictor_params(key, D, hidden_dim=HIDDEN,
                                   latent_dim=LATENT)
    X = jax.random.normal(key, (N, D), jnp.float32)
    used = jnp.zeros(N, bool).at[:256].set(True)
    remaining = ~used
    # compact measured-set list for the diversity stage, exactly as the
    # active loop passes it (skips the full-N center compaction)
    n_meas = 256
    center_idx = jnp.concatenate([
        jnp.arange(n_meas, dtype=jnp.int32),
        jnp.zeros(cfg.max_centers - n_meas, jnp.int32)])
    center_valid = jnp.arange(cfg.max_centers) < n_meas

    from vae_extent_search_tpu.search.select import _select_programs

    K = 16  # phases per timed window

    # K independent parameter sets, stacked leaf-wise: phase i of the
    # real active loop scores with params retrained on i batches, so
    # distinct per-phase params are the faithful setup — and they make
    # every phase's scoring data-dependent on the scan carry slice, so
    # XLA cannot hoist the T-independent encoder/cost work out of the
    # loop and "score" 16 phases by computing one.
    per_phase_params = [
        init_predictor_params(jax.random.fold_in(key, 1000 + i), D,
                              hidden_dim=HIDDEN, latent_dim=LATENT)
        for i in range(K)
    ]
    stacked = jax.tree_util.tree_map(
        lambda *ls: jnp.stack(ls), *per_phase_params)

    def one_phase(k, p):
        sel_idx, valid, new_rem, aux = _select_programs(
            p, X, used, remaining, k, cfg, False, None,
            center_idx, center_valid,
        )
        # one scalar that depends on this phase's full selection output
        return aux["cost_pred"][sel_idx].sum()

    @jax.jit
    def run_chain(key):
        def body(carry, p):
            k = jax.random.fold_in(key, carry[1])
            return (carry[0] + one_phase(k, p), carry[1] + 1), None

        (total, _), _ = jax.lax.scan(body, (jnp.float32(0.0), 0), stacked)
        return total

    @jax.jit
    def run(k, p):
        return one_phase(k, p)

    combine = jax.jit(lambda xs: jnp.stack(xs).sum())

    # warmup + compile all executables end to end (true sync via get).
    # combine is warmed at the length it is timed with (a different
    # list length is a different jit pytree -> retrace inside the
    # timed window otherwise)
    jax.device_get(run_chain(key))
    jax.device_get(combine([run(key, params)] * K))

    # round-trip latency of a trivial transfer (median of 5)
    tiny = jnp.zeros(())
    jax.device_get(tiny)
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(tiny)
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]

    # best-of-5 windows of the K-phase scan. Five reps because the
    # shared host drifts +-40%: more windows = better odds of an
    # undisturbed one.
    best = float("inf")
    windows = []
    for rep in range(5):
        kk = jax.random.fold_in(key, 7000 + rep)
        t0 = time.perf_counter()
        jax.device_get(run_chain(kk))
        total = time.perf_counter() - t0
        per_phase = max(total - rtt, 1e-9) / K
        windows.append(per_phase)
        best = min(best, per_phase)

    # per-dispatch variant for the drift/dispatch-gap diagnostic
    disp_windows = []
    for rep in range(2):
        ks = [jax.random.fold_in(key, rep * K + i) for i in range(K)]
        t0 = time.perf_counter()
        scalars = [run(k, params) for k in ks]
        jax.device_get(combine(scalars))
        disp_windows.append(
            max(time.perf_counter() - t0 - rtt, 1e-9) / K)

    print("scan_windows_ms=" + ",".join(f"{w * 1e3:.2f}" for w in windows)
          + " dispatch_windows_ms="
          + ",".join(f"{w * 1e3:.2f}" for w in disp_windows)
          + f" rtt_ms={rtt * 1e3:.2f}", file=sys.stderr)

    cands_per_sec = N / best
    n_chips = max(1, len(jax.devices()))
    value = cands_per_sec / n_chips

    print(json.dumps({
        "metric": "candidates_scored_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "candidates/s/chip",
        "vs_baseline": round(value / BASELINE_CANDS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()

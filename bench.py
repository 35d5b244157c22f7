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

Baseline derivation (documented, reference numbers from BASELINE.md):
the reference's offline experiment runs select_programs over ~4,000
candidates per phase with MC-dropout T in {10,20} on a CUDA GPU; its
per-phase wall is dominated by predictor training, with scoring+selection
measured at ~1 s/phase in its own `used_time` accounting across 4-6.75
phases of 17-45 s runs -> ~4,000 candidates/s scored. We use
BASELINE_CANDS_PER_SEC = 4000.0 as the per-chip reference throughput.

Methodology — honest completion timing on an async/tunneled backend:
`block_until_ready` on the tunneled axon platform acknowledges dispatch,
not completion (measured: a 1.1-TFLOP f32 matmul "completes" in 0.09 ms,
far beyond hardware peak), so per-call block timing is invalid there.
Instead we queue K phases, combine one scalar from EVERY phase's output
into a single on-device reduction (so no phase can be elided), and
device_get that scalar — one true round-trip for the whole chain. The
measured round-trip latency of a trivial transfer is subtracted:
per_phase = (total - rtt) / K. Scoring runs in bfloat16 (MXU-native;
top-1/selection agreement with f32 is regression-tested in
tests/test_models.py), selection logic and statistics stay f32.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_CANDS_PER_SEC = 4000.0


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

    key = jax.random.PRNGKey(0)
    params = init_predictor_params(key, D, hidden_dim=HIDDEN,
                                   latent_dim=LATENT)
    X = jax.random.normal(key, (N, D), jnp.float32)
    used = jnp.zeros(N, bool).at[:256].set(True)
    remaining = ~used

    from vae_extent_search_tpu.search.select import _select_programs

    @jax.jit
    def run(k):
        # the full phase + its consuming reduction as ONE program — the
        # active loop consumes selection outputs on-device the same way;
        # eager per-phase post-ops would time host dispatch, not compute
        sel_idx, valid, new_rem, aux = _select_programs(
            params, X, used, remaining, k, cfg, False,
        )
        # one scalar that depends on this phase's full selection output
        return aux["cost_pred"][sel_idx].sum()

    combine = jax.jit(lambda xs: jnp.stack(xs).sum())

    # warmup + compile both executables end to end (true sync via get)
    probe = run(key)
    jax.device_get(combine([probe]))

    # round-trip latency of a trivial transfer (median of 5)
    tiny = jnp.zeros(())
    jax.device_get(tiny)
    rtts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(tiny)
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[len(rtts) // 2]

    # best-of-5 chains: K queued phases -> one reduction over all K
    # phase scalars -> one device_get. Five reps because the shared host
    # drifts +-40%: more windows = better odds of an undisturbed one.
    K = 16
    best = float("inf")
    windows = []
    for rep in range(5):
        ks = [jax.random.fold_in(key, rep * K + i) for i in range(K)]
        t0 = time.perf_counter()
        scalars = [run(k) for k in ks]
        jax.device_get(combine(scalars))
        total = time.perf_counter() - t0
        per_phase = max(total - rtt, 1e-9) / K
        windows.append(per_phase)
        best = min(best, per_phase)
    print("windows_ms=" + ",".join(f"{w * 1e3:.2f}" for w in windows)
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

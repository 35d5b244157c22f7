"""Fused-kernel config sweep on the real chip (perf headroom hunt).

Measures the fused scoring kernel (ops/fused_head_pallas.py) per-phase
marginals across config toggles, using the honest completion-timing
recipe from docs/ROUND_NOTES.md: configs interleave in ONE loop (host
drift between separated runs exceeds most marginals), each sample
queues K launches whose outputs fold into one scalar that is
device_get once, minus the measured trivial-transfer RTT.

Usage: python tools/chip_kernel_sweep.py [N] [T]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from vae_extent_search_tpu.models import init_predictor_params
    from vae_extent_search_tpu.ops.fused_head_pallas import fused_head_stats

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    D, H, L = 24, 256, 64
    key = jax.random.PRNGKey(0)
    params = init_predictor_params(key, D, hidden_dim=H, latent_dim=L)
    ct = jnp.bfloat16
    params = jax.tree_util.tree_map(
        lambda a: a.astype(ct) if a.dtype == jnp.float32 else a, params)
    X = jax.random.normal(key, (N, D), jnp.float32).astype(ct)
    enc = (params["encoder"], params["fc_mu"])
    head = params["cost_predictor"]

    def make_fn(block, T=T):
        def phase(x, seed):
            outs = fused_head_stats(head, x, seed, T=T, rate=0.1,
                                    block=block, encoder=enc)
            # one scalar depending on every output
            return sum(o.sum(dtype=jnp.float32) if o.ndim == 1
                       else o[:, 0].sum(dtype=jnp.float32) for o in outs)
        return jax.jit(phase)

    configs = [
        ("block512", make_fn(512)),
        ("block1024", make_fn(1024)),
        ("block2048", make_fn(2048)),
        ("block4096", make_fn(4096)),
        ("block8192", make_fn(8192)),
        ("block1024_T1", make_fn(1024, T=1)),
        ("block4096_T1", make_fn(4096, T=1)),
    ]
    # warm up compiles; drop configs that exceed scoped VMEM etc.
    alive = []
    for name, fn in configs:
        try:
            float(fn(X, 0))
            alive.append((name, fn))
        except Exception as e:
            print(f"  {name}: SKIP ({str(e)[:90]})")
    configs = alive

    # RTT of a trivial round-trip
    trivial = jax.jit(lambda s: s + 1)
    float(trivial(jnp.float32(0)))
    rtts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(trivial(jnp.float32(0)))
        rtts.append(time.perf_counter() - t0)
    rtt = min(rtts)

    K = 20
    REPS = 6
    results = {name: [] for name, _ in configs}
    for rep in range(REPS):
        for name, fn in configs:
            acc = jnp.float32(0)
            t0 = time.perf_counter()
            for i in range(K):
                acc = acc + fn(X, i)
            float(acc)
            dt = time.perf_counter() - t0
            results[name].append((dt - rtt) / K)
    print(f"N={N} T={T} rtt={rtt*1e3:.2f} ms  (best-of-{REPS}, "
          f"K={K} phases/sample)")
    for name, _ in configs:
        best = min(results[name])
        print(f"  {name:16s} {best*1e3:8.3f} ms/phase   "
              f"{N/best/1e6:8.1f} M cand/s")


if __name__ == "__main__":
    main()

"""Decompose the full select_programs phase on chip (marginal costs).

The fused kernel alone runs ~3.6 ms at 262k candidates (chip_kernel_sweep)
while the full phase benches ~10 ms — this tool attributes the gap by
timing select_programs variants with strategies toggled off, interleaved
in one loop per docs/ROUND_NOTES.md methodology.
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
    from vae_extent_search_tpu.search import SelectionConfig
    from vae_extent_search_tpu.search.select import _select_programs

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    D, H, L, T = 24, 256, 64, 10
    key = jax.random.PRNGKey(0)
    params = init_predictor_params(key, D, hidden_dim=H, latent_dim=L)
    ct = jnp.bfloat16
    X = jax.random.normal(key, (N, D), jnp.float32)
    used = jnp.zeros(N, bool).at[:256].set(True)
    rem = ~used
    enc_p = jax.tree_util.tree_map(
        lambda a: a.astype(ct) if a.dtype == jnp.float32 else a, params)

    def scalar_of(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(
            l.sum(dtype=jnp.float32) if l.dtype != jnp.bool_
            else l.sum().astype(jnp.float32) for l in leaves
            if hasattr(l, "sum"))

    def sel_fn(**kw):
        cfg = SelectionConfig(num_select=64, T_mc=T,
                              compute_dtype="bfloat16", **kw)

        @jax.jit
        def run(params, X, used, rem, key):
            out = _select_programs(params, X, used, rem, key, cfg)
            return scalar_of(out[:3]) + out[3]["cost_pred"].sum()
        return lambda k: run(params, X, used, rem, k)

    @jax.jit
    def kernel_only(k):
        seed = jax.random.randint(k, (), 0, 2**31 - 1)
        outs = fused_head_stats(
            enc_p["cost_predictor"], X.astype(ct), seed, T=T, rate=0.1,
            encoder=(enc_p["encoder"], enc_p["fc_mu"]))
        return sum(o.sum(dtype=jnp.float32) if o.ndim == 1
                   else o[:, 0].sum(dtype=jnp.float32) for o in outs)

    configs = [
        ("kernel_only", kernel_only),
        ("full", sel_fn()),
        ("no_div", sel_fn(w_div=0.0, w_cost=0.7)),
        ("no_unc", sel_fn(w_unc=0.0, w_cost=0.8)),
        ("no_grad", sel_fn(grad_num=0)),
        ("cost_only", sel_fn(w_div=0.0, w_unc=0.0, w_cost=1.0,
                             grad_num=0)),
        ("small_centers", sel_fn(max_centers=512)),
    ]
    keys = jax.random.split(key, 64)
    alive = []
    for name, fn in configs:
        try:
            float(fn(keys[0]))
            alive.append((name, fn))
        except Exception as e:
            print(f"  {name}: SKIP ({str(e)[:80]})")
    configs = alive

    trivial = jax.jit(lambda s: s + 1)
    float(trivial(jnp.float32(0)))
    rtt = min(
        (lambda t0: (float(trivial(jnp.float32(0))), time.perf_counter()
                     - t0)[1])(time.perf_counter())
        for _ in range(10))

    K, REPS = 12, 6
    res = {name: [] for name, _ in configs}
    for rep in range(REPS):
        for name, fn in configs:
            acc = jnp.float32(0)
            t0 = time.perf_counter()
            for i in range(K):
                acc = acc + fn(keys[(rep * K + i) % 64])
            float(acc)
            res[name].append((time.perf_counter() - t0 - rtt) / K)
    print(f"N={N} T={T} rtt={rtt*1e3:.2f} ms (best-of-{REPS}, K={K})")
    for name, _ in configs:
        best = min(res[name])
        print(f"  {name:14s} {best*1e3:8.3f} ms/phase  "
              f"{N/best/1e6:8.1f} M cand/s")


if __name__ == "__main__":
    main()

"""Decompose the full select_programs phase on chip (marginal costs).

Times select_programs variants with strategies toggled off, interleaved
in one loop per docs/ROUND_NOTES.md methodology. Each variant runs as a
K-phase `lax.scan` over independently-initialized parameter sets inside
ONE compiled program (same harness as bench.py) so the numbers are pure
device time — per-dispatch chaining pays a ~1-2 ms/phase host gap on
the tunneled backend that drowns sub-millisecond marginals.
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
    K = 12  # phases per compiled scan window
    key = jax.random.PRNGKey(0)
    params = init_predictor_params(key, D, hidden_dim=H, latent_dim=L)
    ct = jnp.bfloat16
    X = jax.random.normal(key, (N, D), jnp.float32)
    used = jnp.zeros(N, bool).at[:256].set(True)
    rem = ~used

    # K independent parameter sets (the active loop retrains per phase);
    # scanning over them stops XLA hoisting T-independent scoring work
    per_phase = [
        init_predictor_params(jax.random.fold_in(key, 1000 + i), D,
                              hidden_dim=H, latent_dim=L)
        for i in range(K)
    ]
    stacked = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *per_phase)
    stacked_enc = jax.tree_util.tree_map(
        lambda a: a.astype(ct) if a.dtype == jnp.float32 else a, stacked)

    def scalar_of(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(
            l.sum(dtype=jnp.float32) if l.dtype != jnp.bool_
            else l.sum().astype(jnp.float32) for l in leaves
            if hasattr(l, "sum"))

    def chain_of(one_phase, stk):
        @jax.jit
        def chain(key):
            def body(carry, p):
                k = jax.random.fold_in(key, carry[1])
                return (carry[0] + one_phase(p, k), carry[1] + 1), None
            (tot, _), _ = jax.lax.scan(body, (jnp.float32(0), 0), stk)
            return tot
        return chain

    def sel_fn(**kw):
        cfg = SelectionConfig(num_select=64, T_mc=T,
                              compute_dtype="bfloat16", **kw)

        def one(p, k):
            out = _select_programs(p, X, used, rem, k, cfg)
            return scalar_of(out[:3]) + out[3]["cost_pred"].sum()
        return chain_of(one, stacked)

    def kernel_one(p, k):
        seed = jax.random.randint(k, (), 0, 2**31 - 1)
        outs = fused_head_stats(
            p["cost_predictor"], X.astype(ct), seed, T=T, rate=0.1,
            encoder=(p["encoder"], p["fc_mu"]))
        return sum(o.sum(dtype=jnp.float32) if o.ndim == 1
                   else o[:, 0].sum(dtype=jnp.float32) for o in outs)

    configs = [
        ("kernel_only", chain_of(kernel_one, stacked_enc)),
        ("full", sel_fn()),
        ("no_div", sel_fn(w_div=0.0, w_cost=0.7)),
        ("no_unc", sel_fn(w_unc=0.0, w_cost=0.8)),
        ("no_grad", sel_fn(grad_num=0)),
        ("no_rand", sel_fn(rand_num=0)),
        ("cost_only", sel_fn(w_div=0.0, w_unc=0.0, w_cost=1.0,
                             grad_num=0, rand_num=0)),
        ("small_centers", sel_fn(max_centers=512)),
    ]
    keys = jax.random.split(key, 64)
    alive = []
    for name, fn in configs:
        try:
            float(fn(keys[0]))  # compile + run once
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

    REPS = 6
    res = {name: [] for name, _ in configs}
    for rep in range(REPS):
        for name, fn in configs:
            t0 = time.perf_counter()
            float(fn(keys[rep + 1]))
            res[name].append(
                max(time.perf_counter() - t0 - rtt, 1e-9) / K)
    print(f"N={N} T={T} rtt={rtt*1e3:.2f} ms (best-of-{REPS}, K={K}, scan)")
    for name, _ in configs:
        best = min(res[name])
        print(f"  {name:14s} {best*1e3:8.3f} ms/phase  "
              f"{N/best/1e6:8.1f} M cand/s")


if __name__ == "__main__":
    main()

"""Decompose the full select_programs phase on chip (marginal costs).

Times select_programs variants with strategies toggled off, interleaved
per docs/ROUND_NOTES.md methodology, using the shared scan harness
(tools/scan_timing.py) so the numbers are pure device time.

Caveat when reading the output: several toggles change the CODE PATH,
not just a stage — w_unc=0 disables the fused Pallas kernel entirely
(_use_fused_head needs an uncertainty budget) and the XLA fallback
dead-code-eliminates everything the consumed scalar does not need, so
"no_unc"/"cost_only" are path comparisons, not stage marginals. The
honest stage marginals on the fused path are full-vs-no_div,
full-vs-no_grad, full-vs-no_rand, full-vs-kernel_only.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from scan_timing import chain_of, stack_params, time_variants
    from vae_extent_search_tpu.models import init_predictor_params
    from vae_extent_search_tpu.ops.fused_head_pallas import fused_head_stats
    from vae_extent_search_tpu.search import SelectionConfig
    from vae_extent_search_tpu.search.select import _select_programs

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    D, H, L, T = 24, 256, 64, 10
    K = 12  # phases per compiled scan window
    key = jax.random.PRNGKey(0)
    ct = jnp.bfloat16
    X = jax.random.normal(key, (N, D), jnp.float32)
    used = jnp.zeros(N, bool).at[:256].set(True)
    rem = ~used

    stacked = stack_params(
        lambda k: init_predictor_params(k, D, hidden_dim=H, latent_dim=L),
        key, K)
    stacked_enc = jax.tree_util.tree_map(
        lambda a: a.astype(ct) if a.dtype == jnp.float32 else a, stacked)

    def scalar_of(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return sum(
            l.sum(dtype=jnp.float32) if l.dtype != jnp.bool_
            else l.sum().astype(jnp.float32) for l in leaves
            if hasattr(l, "sum"))

    def sel_fn(**kw):
        cfg = SelectionConfig(num_select=64, T_mc=T,
                              compute_dtype="bfloat16", **kw)

        def one(p, k):
            out = _select_programs(p, X, used, rem, k, cfg)
            return scalar_of(out[:3]) + out[3]["cost_pred"].sum()
        return chain_of(one, stacked)

    def kernel_one(p, k):
        # mu_layout="none" matches what _select_programs actually runs
        # (the phase re-encodes gathered rows; the [L, N] mu write is
        # skipped) — timing the default layout would inflate the kernel
        # baseline by a dead full-pool HBM write
        seed = jax.random.randint(k, (), 0, 2**31 - 1)
        outs = fused_head_stats(
            p["cost_predictor"], X.astype(ct), seed, T=T, rate=0.1,
            encoder=(p["encoder"], p["fc_mu"]), mu_layout="none")
        return sum(o.sum(dtype=jnp.float32) for o in outs[1:])

    configs = [
        ("kernel_only", chain_of(kernel_one, stacked_enc)),
        ("full", sel_fn()),
        ("no_div", sel_fn(w_div=0.0, w_cost=0.7)),
        ("no_unc", sel_fn(w_unc=0.0, w_cost=0.8)),
        ("no_grad", sel_fn(grad_num=0)),
        ("with_rand", sel_fn(rand_num=4)),  # default rand_num is 0
        ("cost_only", sel_fn(w_div=0.0, w_unc=0.0, w_cost=1.0,
                             grad_num=0)),
        ("small_centers", sel_fn(max_centers=512)),
    ]
    best = time_variants(configs, key, K)
    print(f"N={N} T={T}")
    for name, _ in configs:
        if name in best:
            b = best[name]
            print(f"  {name:14s} {b*1e3:8.3f} ms/phase  "
                  f"{N/b/1e6:8.1f} M cand/s")


if __name__ == "__main__":
    main()

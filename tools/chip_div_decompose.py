"""Attribute the diversity stage's cost inside the fused selection phase.

chip_select_decompose showed diversity = ~1.5 ms/phase at 262k while the
k-center core alone is ~17 us (chip_kcenter_ab). This tool re-builds the
phase with the diversity stage's sub-steps individually stubbed to find
where the time goes (answer: first_k_true's full-N scatter, ~1.3 ms —
fixed by the precompacted center-list path, the "precompact" variant).
Shared scan harness (tools/scan_timing.py), interleaved variants.
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
    from vae_extent_search_tpu.models.predictor import pred_encode
    from vae_extent_search_tpu.ops.fused_head_pallas import fused_head_stats
    from vae_extent_search_tpu.ops.kcenter import k_center_greedy_pool_core
    from vae_extent_search_tpu.search import SelectionConfig
    from vae_extent_search_tpu.search.select import (
        first_k_true,
        l2_normalize,
        masked_top_k,
        scatter_set,
        scatter_unset,
    )

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    D, H, L, T, K = 24, 256, 64, 10, 12
    key = jax.random.PRNGKey(0)
    cfg = SelectionConfig(num_select=64, T_mc=T, compute_dtype="bfloat16")
    ct = jnp.bfloat16
    X = jax.random.normal(key, (N, D), jnp.float32)
    used = jnp.zeros(N, bool).at[:256].set(True)
    rem = ~used

    stacked = stack_params(
        lambda k: init_predictor_params(k, D, hidden_dim=H, latent_dim=L),
        key, K)

    def phase(p, k, div_mode):
        p = jax.tree_util.tree_map(
            lambda a: a.astype(ct) if a.dtype == jnp.float32 else a, p)
        Xc = X.astype(ct)
        k_mc, k_rand = jax.random.split(k)
        seed = jax.random.randint(k_mc, (), 0, jnp.iinfo(jnp.int32).max)
        _, cost_pred, gnorm, mc_mean, mc_var = fused_head_stats(
            p["cost_predictor"], Xc, seed, T=cfg.T_mc, rate=cfg.dropout_rate,
            encoder=(p["encoder"], p["fc_mu"]), mu_layout="none")
        n = N
        k_pool = cfg.num_select * cfg.topk_factor
        pool_idx, pool_valid = masked_top_k(cost_pred, rem, k_pool)
        avail = pool_valid
        cost_p = cost_pred[pool_idx]
        gnorm_p = gnorm[pool_idx]
        mcvar_p = mc_var[pool_idx]
        picked = jnp.zeros((n,), bool)

        def pick_local(scores_p, avail, kk):
            li, lv = masked_top_k(scores_p, avail, kk)
            return pool_idx[li], lv, scatter_unset(avail, li, lv)

        ci, cv, avail = pick_local(cost_p, avail, cfg.n_cost)
        picked = scatter_set(picked, ci, cv)
        gi, gv, avail = pick_local(gnorm_p, avail, cfg.grad_num)
        picked = scatter_set(picked, gi, gv)
        ui, uv, avail = pick_local(mcvar_p, avail, cfg.n_unc)
        picked = scatter_set(picked, ui, uv)

        # ---- diversity stage, by mode ----
        if div_mode == "precompact":
            cidx = jnp.concatenate([
                jnp.concatenate([
                    jnp.arange(256, dtype=jnp.int32),
                    jnp.zeros(cfg.max_centers - 256, jnp.int32)]),
                ci, gi, ui])
            c_valid = jnp.concatenate([
                jnp.arange(cfg.max_centers) < 256, cv, gv, uv])
            zp, _ = pred_encode(p, Xc[pool_idx])
            zc, _ = pred_encode(p, Xc[cidx])
            zp_norm = l2_normalize(zp.astype(jnp.float32))
            centers = l2_normalize(zc.astype(jnp.float32))
            dl, dv = k_center_greedy_pool_core(
                zp_norm, avail, centers, c_valid, cfg.n_div)
            di = pool_idx[dl]
        elif div_mode == "off":
            dl = jnp.arange(cfg.n_div, dtype=jnp.int32)
            dv = jnp.zeros((cfg.n_div,), bool)
            di = pool_idx[dl]
        else:
            if div_mode == "no_fkt":
                cidx = jnp.arange(cfg.max_centers, dtype=jnp.int32)
            else:
                cmask = used | picked
                cidx = first_k_true(cmask, cfg.max_centers)
            c_valid = (used | picked)[cidx]
            if div_mode == "no_encode":
                zp_norm = l2_normalize(X[pool_idx].astype(jnp.float32))
                centers = l2_normalize(X[cidx].astype(jnp.float32))
            else:
                zp, _ = pred_encode(p, Xc[pool_idx])
                zc, _ = pred_encode(p, Xc[cidx])
                zp_norm = l2_normalize(zp.astype(jnp.float32))
                centers = l2_normalize(zc.astype(jnp.float32))
            dl, dv = k_center_greedy_pool_core(
                zp_norm, avail, centers, c_valid, cfg.n_div)
            di = pool_idx[dl]
        picked = scatter_set(picked, di, dv)

        sel_idx = jnp.concatenate([ci, gi, ui, di])
        sel_valid = jnp.concatenate([cv, gv, uv, dv])
        new_rem = rem & ~picked
        return (sel_idx.sum() + sel_valid.sum()
                + new_rem.sum().astype(jnp.int32)).astype(jnp.float32) \
            + cost_pred[sel_idx].sum()

    variants = [
        (m, chain_of(lambda p, k, m=m: phase(p, k, m), stacked))
        for m in ("full", "off", "no_fkt", "no_encode", "precompact")]
    best = time_variants(variants, key, K)
    print(f"N={N}")
    for name, _ in variants:
        if name in best:
            print(f"  {name:10s} {best[name]*1e3:8.3f} ms/phase")


if __name__ == "__main__":
    main()

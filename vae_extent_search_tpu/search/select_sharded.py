"""Pod-scale candidate selection: fused Pallas scoring per shard.

GSPMD has no partitioning rule for the fused head's Pallas custom call
(ops/fused_head_pallas.py) — lowering it inside a plain jit over a
sharded candidate matrix would all-gather the candidate axis around the
kernel, erasing the sharding. This module keeps the fusion at pod scale
(SURVEY §2.1(b) "collective ops for top-k merge"):

- the fused kernel (or the XLA scoring fallback) runs per candidate
  shard under ``jax.shard_map`` over the mesh's data axis — each chip
  scores only its rows, HBM traffic and PRNG draws stay local;
- every full-N reduction becomes a per-shard ``lax.top_k`` on the local
  rows followed by an ``all_gather`` of the [k] per-shard winners and a
  final replicated top-k over [n_shards * k] — the collective moves
  O(shards * k) scalars over ICI, never O(N);
- pool-local logic (strategies 3-6 of select_programs operate on the
  [k_pool]-sized gathered pool) runs replicated on every chip — it is
  hundreds of elements, replication is cheaper than any collective;
- k-center centers are gathered per shard and compacted across shards
  by global index order, reproducing the single-device
  ``jnp.where(center_mask, size=max_centers)`` semantics exactly.

Determinism note: with injected dropout ``mask_bits`` (the interpret
test seam — the TPU hardware PRNG has no CPU lowering) each row sees
the same bits regardless of sharding, so the sharded phase is
bit-identical to the single-device one; tests/test_pipeline.py pins
that. On TPU hardware the per-block PRNG seeds differ between layouts,
so MC-variance ranks (only) carry sampling noise, same as re-seeding.

Reference: the per-phase selection of vae_extent_search.py:1210-1309 —
the reference has no multi-accelerator selection at all; this is the
TPU-native scaling design.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..models.predictor import mc_predict, pred_encode, predict_cost
from .select import (
    NEG_INF,
    first_k_true,
    SelectionConfig,
    _use_fused_head,
    l2_normalize,
    scatter_set,
    scatter_unset,
    masked_top_k,
    z_grad_norms,
)

_BIG = jnp.int32(2**30)


def _smap(f, mesh, in_specs, out_specs):
    return jax.shard_map(f, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_vma=False)


def masked_top_k_sharded(scores, mask, k: int, mesh, axis: str):
    """Global masked top-k over a ["data"-sharded N] score vector.

    Per-shard lax.top_k + all_gather merge: ICI carries
    [n_shards, min(k, n_local)] (value, index) pairs instead of the full
    array. Returns replicated (indices [k], valid [k]) with the same
    tie-breaking as the single-device masked_top_k whenever scores are
    distinct (lax.top_k prefers lower index; global index order is
    preserved by the stable merge below)."""
    n = scores.shape[0]
    n_loc = n // mesh.shape[axis]
    kk = min(k, n_loc)

    def local(s, m):
        base = jax.lax.axis_index(axis) * n_loc
        masked = jnp.where(m, s.astype(jnp.float32), NEG_INF)
        vals, idx = jax.lax.top_k(masked, kk)
        gi = idx + base
        v_all = jax.lax.all_gather(vals, axis)   # [S, kk]
        i_all = jax.lax.all_gather(gi, axis)
        flat_v = v_all.reshape(-1)
        flat_i = i_all.reshape(-1)
        # stable global merge: top-k on values, ties broken toward the
        # lower global index (matches single-device lax.top_k order)
        mk = min(k, flat_v.shape[0])
        order = jnp.lexsort((flat_i, -flat_v))[:mk]
        vals_g = flat_v[order]
        idx_g = flat_i[order]
        valid = vals_g > NEG_INF / 2
        if mk < k:
            idx_g = jnp.concatenate(
                [idx_g, jnp.zeros(k - mk, idx_g.dtype)])
            valid = jnp.concatenate([valid, jnp.zeros(k - mk, bool)])
        return idx_g.astype(jnp.int32), valid

    return _smap(local, mesh, (P(axis), P(axis)), (P(), P()))(scores, mask)


def gather_rows_sharded(x, idx, mesh, axis: str):
    """Replicated gather ``x[idx]`` from a "data"-sharded [N, ...] array
    with replicated indices [k]: each shard contributes the rows it
    owns, merged with one psum of a [k, ...] buffer."""
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n = x.shape[0]
    n_loc = n // mesh.shape[axis]

    def local(x_loc, idx):
        base = jax.lax.axis_index(axis) * n_loc
        loc = idx - base
        ok = (loc >= 0) & (loc < n_loc)
        rows = x_loc[jnp.clip(loc, 0, n_loc - 1)]
        rows = jnp.where(ok[:, None], rows, 0)
        return jax.lax.psum(rows, axis)

    out = _smap(local, mesh, (P(axis, None), P()), P())(x, idx)
    return out[:, 0] if squeeze else out


def gather_masked_rows_sharded(z, mask, max_rows: int, mesh, axis: str):
    """Replicated (rows [max_rows, D], valid [max_rows]) = the first
    ``max_rows`` rows of ``z`` where ``mask``, in global index order —
    the sharded equivalent of ``jnp.where(mask, size=max_rows)`` + gather
    (k-center's center set). Each shard compacts its own rows, then the
    [S * max_rows] candidates merge by global index."""
    n, d = z.shape
    n_loc = n // mesh.shape[axis]
    m_loc_rows = min(max_rows, n_loc)

    def local(z_loc, m_loc):
        base = jax.lax.axis_index(axis) * n_loc
        li = first_k_true(m_loc, m_loc_rows, fill=n_loc)
        valid = li < n_loc
        rows = z_loc[jnp.clip(li, 0, n_loc - 1)]
        rows = jnp.where(valid[:, None], rows, 0)
        gi = jnp.where(valid, li + base, _BIG)
        rows_all = jax.lax.all_gather(rows, axis)   # [S, m, D]
        gi_all = jax.lax.all_gather(gi, axis)
        flat_r = rows_all.reshape(-1, d)
        flat_i = gi_all.reshape(-1)
        order = jnp.argsort(flat_i)[:max_rows]
        return flat_r[order], flat_i[order] < _BIG

    return _smap(local, mesh, (P(axis, None), P(axis)), (P(), P()))(z, mask)


def _fused_scores_sharded(params, X, seed, cfg: SelectionConfig, mesh,
                          axis: str, mask_bits):
    """shard_map wrapper over the fused Pallas kernel: every shard runs
    encoder+cost-head+z-grad+MC-dropout on its local rows only. PRNG
    seeds fold in the shard index so dropout draws are independent."""
    from ..ops.fused_head_pallas import fused_head_stats
    from ..ops.kernel_library import tuned_fused_head_config

    # self-tuned schedule lookup at the LOCAL shard shape (trace-time;
    # see select.py) — compatible-record re-snapping makes this agree
    # with the unsharded path's lookup for any block <= shard rows
    h_dim, l_dim = params["fc_mu"]["w"].shape
    tuned = tuned_fused_head_config(
        X.shape[0] // mesh.shape[axis], X.shape[1], h_dim, l_dim,
        cfg.T_mc, dtype=cfg.compute_dtype)
    tuned_kw = ({"block": tuned[0], "mc_chunk": tuned[1]}
                if tuned is not None else {})

    def local(head, enc, fc_mu, x_loc, seed, bits_loc):
        s = seed + jax.lax.axis_index(axis) * jnp.int32(1 << 20)
        # mu_layout="none": the diversity stage re-encodes its gathered
        # rows, so each shard's [n_loc, L] latent write would be dead
        # HBM traffic (same rationale as the single-device path)
        return fused_head_stats(
            head, x_loc, s, T=cfg.T_mc, rate=cfg.dropout_rate,
            interpret=cfg.fused_interpret, mask_bits=bits_loc,
            encoder=(enc, fc_mu), mu_layout="none", **tuned_kw,
        )[1:]

    bits_spec = P() if mask_bits is None else P(None, axis, None)
    out = _smap(
        local, mesh,
        (P(), P(), P(), P(axis, None), P(), bits_spec),
        (P(axis), P(axis), P(axis), P(axis)),
    )(params["cost_predictor"], params["encoder"], params["fc_mu"],
      X, seed, mask_bits)
    # cost/gnorm/mean/var [n_loc] per shard -> [N] sharded
    return out


def _xla_scores_sharded(params, X, k_mc, cfg: SelectionConfig, mesh,
                        axis: str):
    """XLA scoring fallback per shard (non-default head shapes, or MC
    disabled): same math as _select_programs' else-branch, with the MC
    key folded per shard for independent dropout draws."""

    def local(params, x_loc, k_mc):
        k_loc = jax.random.fold_in(k_mc, jax.lax.axis_index(axis))
        mu, logvar = pred_encode(params, x_loc)
        cost = predict_cost(params, mu).astype(jnp.float32)
        gnorm = z_grad_norms(params, mu).astype(jnp.float32)
        mc_mean, mc_var = mc_predict(params, x_loc, k_loc, cfg.T_mc,
                                     cfg.dropout_rate, mu=mu)
        # mu stays shard-local dead after this point (the diversity
        # stage re-encodes); not returning it lets XLA drop the write
        return (cost, gnorm,
                mc_mean.astype(jnp.float32), mc_var.astype(jnp.float32))

    return _smap(
        local, mesh, (P(), P(axis, None), P()),
        (P(axis), P(axis), P(axis), P(axis)),
    )(params, X, k_mc)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "mesh", "axis", "gate_uncertainty_to_remaining"),
)
def select_programs_sharded(params: Dict, X: jnp.ndarray,
                            used_mask: jnp.ndarray,
                            remaining_mask: jnp.ndarray, key,
                            cfg: SelectionConfig, mesh, axis: str,
                            gate_uncertainty_to_remaining: bool = False,
                            mask_bits: Optional[jnp.ndarray] = None,
                            center_idx: Optional[jnp.ndarray] = None,
                            center_valid: Optional[jnp.ndarray] = None):
    """One full selection phase over a mesh-sharded candidate pool.

    Same seven-stage flow and return contract as
    select._select_programs; every full-N operation is shard-local +
    collective merge, every pool-local operation replicates. Requires
    N divisible by the "data" axis size (callers pad; the scripts'
    candidate pools are powers of two)."""
    n = X.shape[0]
    n_shards = mesh.shape[axis]
    assert n % n_shards == 0, (n, n_shards)
    k_mc, k_rand = jax.random.split(key)
    if cfg.compute_dtype != "float32":
        ct = jnp.dtype(cfg.compute_dtype)
        params = jax.tree_util.tree_map(
            lambda a: a.astype(ct) if a.dtype == jnp.float32 else a, params)
        X = X.astype(ct)
    if _use_fused_head(params, cfg, mask_bits):
        seed = jax.random.randint(k_mc, (), 0, jnp.iinfo(jnp.int32).max)
        cost_pred, gnorm, mc_mean, mc_var = _fused_scores_sharded(
            params, X, seed, cfg, mesh, axis, mask_bits)
    else:
        cost_pred, gnorm, mc_mean, mc_var = _xla_scores_sharded(
            params, X, k_mc, cfg, mesh, axis)

    k_pool = cfg.num_select * cfg.topk_factor

    # 2. candidate pool (merged full-N top-k) + replicated pool gathers
    pool_idx, pool_valid = masked_top_k_sharded(
        cost_pred, remaining_mask, k_pool, mesh, axis)
    avail = pool_valid
    pooled = gather_rows_sharded(
        jnp.stack([cost_pred, gnorm, mc_var], axis=1), pool_idx, mesh, axis)
    cost_p, gnorm_p, mcvar_p = pooled[:, 0], pooled[:, 1], pooled[:, 2]

    picked = jnp.zeros((n,), bool)
    none = (jnp.zeros((0,), jnp.int32), jnp.zeros((0,), bool))

    def pick_local(scores_p, avail, k):
        li, lv = masked_top_k(scores_p, avail, k)
        return pool_idx[li], lv, scatter_unset(avail, li, lv)

    # 3. predicted-cost top-k
    ci, cv, avail = pick_local(cost_p, avail, cfg.n_cost)
    picked = scatter_set(picked, ci, cv)

    # 4. z-grad top-k
    if cfg.grad_num:
        gi, gv, avail = pick_local(gnorm_p, avail, cfg.grad_num)
        picked = scatter_set(picked, gi, gv)
    else:
        gi, gv = none

    # 5. uncertainty top-k
    if not cfg.n_unc:
        ui, uv = none
    elif gate_uncertainty_to_remaining:
        ui, uv = masked_top_k_sharded(
            mc_var, remaining_mask & ~picked, cfg.n_unc, mesh, axis)
        picked = scatter_set(picked, ui, uv)
        avail = avail & ~picked[pool_idx]
    else:
        ui, uv, avail = pick_local(mcvar_p, avail, cfg.n_unc)
        picked = scatter_set(picked, ui, uv)

    # 6. latent diversity: gather the RAW feature rows per shard, then
    # re-encode + normalize the small replicated matrices (identical
    # math to the single-device path: same gathered rows, same encoder)
    if cfg.n_div:
        from ..models.predictor import pred_encode
        from ..ops.kcenter import k_center_greedy_pool_core

        Xp = gather_rows_sharded(X, pool_idx, mesh, axis)
        if center_idx is not None:
            # precompacted replicated center list (see select.py): the
            # cross-shard mask compaction + argsort merge is unnecessary
            cidx = jnp.concatenate(
                [center_idx.astype(jnp.int32), ci, gi, ui])
            c_valid = jnp.concatenate([center_valid, cv, gv, uv])
            Xc = gather_rows_sharded(X, cidx, mesh, axis)
        else:
            Xc, c_valid = gather_masked_rows_sharded(
                X, used_mask | picked, cfg.max_centers, mesh, axis)
        zp, _ = pred_encode(params, Xp)
        zc, _ = pred_encode(params, Xc)
        zp_norm = l2_normalize(zp.astype(jnp.float32))
        centers = l2_normalize(zc.astype(jnp.float32))
        dl, dv = k_center_greedy_pool_core(
            zp_norm, avail, centers, c_valid, cfg.n_div)
        di = pool_idx[dl]
    else:
        di, dv = none
    picked = scatter_set(picked, di, dv)

    # 7. eps-greedy random: replicated noise (same stream as the
    # single-device path) + merged top-k
    if cfg.rand_num:
        noise = jax.random.uniform(k_rand, (n,))
        ri, rv = masked_top_k_sharded(
            noise, remaining_mask & ~picked, cfg.rand_num, mesh, axis)
        picked = scatter_set(picked, ri, rv)
    else:
        ri, rv = none

    parts = [(ci, cv), (gi, gv), (ui, uv), (di, dv), (ri, rv)]
    sel_idx = jnp.concatenate([p[0] for p in parts])
    sel_valid = jnp.concatenate([p[1] for p in parts])
    new_remaining = remaining_mask & ~picked
    aux = {
        "cost_pred": cost_pred,
        "mc_var": mc_var,
        "grad_norm": gnorm,
    }
    return sel_idx, sel_valid, new_remaining, aux

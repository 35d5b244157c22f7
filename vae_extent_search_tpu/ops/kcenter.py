"""Memory-lean k-center greedy (farthest-first) selection.

The naive formulation materializes an [N, N] distance matrix (1 GB at
N=16k fp32) although each greedy step only needs distances to ONE new
center. This version:

1. initializes min-dists with a lax.scan over column blocks of the masked
   distance matrix (peak memory O(N * block), matmuls still hit the MXU)
2. per greedy step computes distances to the single selected center
   (O(N*D)) and folds them into the running min — a fused VPU update.

Same semantics as search/select.py::k_center_greedy (reference
vae_extent_search.py:1024-1109 select_topk_latent_diversity), validated
against it in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _dist_block(z, z_block):
    sq = (
        jnp.sum(z**2, -1)[:, None]
        + jnp.sum(z_block**2, -1)[None, :]
        - 2.0 * z @ z_block.T
    )
    return jnp.sqrt(jnp.maximum(sq, 0.0))


@functools.partial(jax.jit, static_argnames=("block",))
def min_dists_to_centers(z: jnp.ndarray, center_mask: jnp.ndarray,
                         block: int = 1024) -> jnp.ndarray:
    """min over centers of ||z_i - c|| without the full [N, N] matrix."""
    n, d = z.shape
    nb = -(-n // block)
    pad = nb * block - n
    zp = jnp.concatenate([z, jnp.zeros((pad, d), z.dtype)]) if pad else z
    mp = (
        jnp.concatenate([center_mask, jnp.zeros(pad, bool)])
        if pad else center_mask
    )
    z_blocks = zp.reshape(nb, block, d)
    m_blocks = mp.reshape(nb, block)

    def body(carry, zb_mb):
        zb, mb = zb_mb
        db = _dist_block(z, zb)  # [N, block]
        db = jnp.where(mb[None, :], db, jnp.inf)
        return jnp.minimum(carry, db.min(axis=1)), None

    init = jnp.full((n,), jnp.inf, z.dtype)
    out, _ = jax.lax.scan(body, init, (z_blocks, m_blocks))
    return out


@functools.partial(jax.jit, static_argnames=("k", "block"))
def k_center_greedy_blocked(z_norm: jnp.ndarray, cand_mask: jnp.ndarray,
                            center_mask: jnp.ndarray, k: int,
                            block: int = 1024):
    """Drop-in replacement for select.k_center_greedy at large N."""
    min_dists = min_dists_to_centers(z_norm, center_mask, block)

    def body(i, state):
        min_dists, avail, sel, val = state
        score = jnp.where(avail, min_dists, NEG_INF)
        j = jnp.argmax(score)
        ok = score[j] > NEG_INF / 2
        sel = sel.at[i].set(jnp.int32(j))
        val = val.at[i].set(ok)
        avail = avail.at[j].set(False)
        d_new = jnp.sqrt(
            jnp.maximum(jnp.sum((z_norm - z_norm[j]) ** 2, -1), 0.0)
        )
        return (jnp.minimum(min_dists, d_new), avail, sel, val)

    state = (min_dists, cand_mask, jnp.zeros((k,), jnp.int32),
             jnp.zeros((k,), bool))
    _, _, sel, val = jax.lax.fori_loop(0, k, body, state)
    return sel, val


def _sq_dist_block(a: jnp.ndarray, b: jnp.ndarray,
                   b_valid: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances [n, m] via the matmul identity, with
    invalid columns masked to +inf. Squared because every consumer
    (greedy argmax / running min) is monotonic in the distance — the
    sqrt would be pure waste."""
    sq = (
        jnp.sum(a * a, -1)[:, None]
        + jnp.sum(b * b, -1)[None, :]
        - 2.0 * a @ b.T
    )
    return jnp.where(b_valid[None, :], jnp.maximum(sq, 0.0), jnp.inf)


@functools.partial(jax.jit, static_argnames=("k", "max_centers"))
def k_center_greedy_pool(z_pool: jnp.ndarray, avail: jnp.ndarray,
                         z_all: jnp.ndarray, center_mask: jnp.ndarray,
                         k: int, max_centers: int = 4096):
    """k-center greedy restricted to a gathered candidate pool.

    Only pool members are ever selectable, so the O(N) distance state of
    the full-array variants is waste: distances matter only FROM the
    ``[P, D]`` pool TO the (gathered) centers, giving a [P, C] matmul
    + k steps of [P]-sized updates — O(P·C·D + k·P·D) instead of
    O(N·C·D + k·N·D). Selection trajectory is identical to a full-array
    greedy intersected with the pool, because every greedy pick (hence
    every new center) is a pool member. Centers are gathered up to
    ``max_centers``; surplus centers beyond the bound are ignored
    (diversity degrades gracefully). Runs on squared distances
    throughout (sqrt is monotonic, the trajectory is identical).

    Returns (local indices into the pool [k], valid [k])."""
    from ..search.select import first_k_true

    idx = first_k_true(center_mask, max_centers)
    c_valid = center_mask[idx]
    centers = z_all[idx]  # [C, D]
    return k_center_greedy_pool_core(z_pool, avail, centers, c_valid, k)


@functools.partial(jax.jit, static_argnames=("k",))
def k_center_greedy_pool_core(z_pool: jnp.ndarray, avail: jnp.ndarray,
                              centers: jnp.ndarray, c_valid: jnp.ndarray,
                              k: int):
    """Greedy core of :func:`k_center_greedy_pool` over pre-gathered
    centers [C, D] + validity [C] (the sharded selection path gathers
    centers with a cross-shard compaction instead of jnp.where)."""
    min_sq = _sq_dist_block(z_pool, centers, c_valid).min(axis=1)  # [P]

    def body(i, state):
        min_sq, avail, sel, val = state
        score = jnp.where(avail, min_sq, NEG_INF)
        j = jnp.argmax(score)
        ok = score[j] > NEG_INF / 2
        sel = sel.at[i].set(jnp.int32(j))
        val = val.at[i].set(ok)
        avail = avail.at[j].set(False)
        d_new = jnp.maximum(jnp.sum((z_pool - z_pool[j]) ** 2, -1), 0.0)
        return (jnp.minimum(min_sq, d_new), avail, sel, val)

    state = (min_sq, avail, jnp.zeros((k,), jnp.int32),
             jnp.zeros((k,), bool))
    _, _, sel, val = jax.lax.fori_loop(0, k, body, state)
    return sel, val

"""On-device active-learning candidate selection.

Parity target: the reference's ``select_programs``
(vae_extent_search.py:1210-1309) and its strategy functions: predicted-cost
top-k (:927), z-gradient-norm top-k (:950-987), MC-dropout-variance top-k
(:990-1021), k-center-greedy latent diversity (:1024-1109), eps-greedy
random (:869-877), farthest-point / kmeans++ inits (:1112-1208).

TPU-first redesign: index sets become boolean masks over the candidate
axis; every strategy is a masked top-k / argmax on device; the whole
per-phase selection (encode -> predict -> MC-dropout -> z-grad -> pool
top-k -> k-center greedy -> union) is ONE jitted function — the reference
round-trips GPU<->CPU numpy between every step. k-center greedy runs as a
lax.fori_loop over fused distance updates (O(k·N·D) on the VPU/MXU, no
host sync), using dist^2 = |a|^2+|b|^2-2ab so the inner update is a matmul.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.predictor import mc_predict, pred_encode, predict_cost

NEG_INF = -1e30


def masked_top_k(scores: jnp.ndarray, mask: jnp.ndarray, k: int):
    """Indices of the k largest scores where mask; masked-out entries score
    -inf. Returns (indices [k], valid [k]); when k exceeds the pool size
    the tail is padded invalid."""
    n = scores.shape[0]
    kk = min(k, n)
    masked = jnp.where(mask, scores, NEG_INF)
    vals, idx = jax.lax.top_k(masked, kk)
    valid = vals > NEG_INF / 2
    if kk < k:
        idx = jnp.concatenate([idx, jnp.zeros(k - kk, idx.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros(k - kk, bool)])
    return idx, valid


def scatter_unset(mask: jnp.ndarray, idx: jnp.ndarray,
                  valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """mask[idx] = False (only where valid)."""
    if valid is None:
        return mask.at[idx].set(False)
    return mask.at[idx].set(jnp.where(valid, False, mask[idx]))


def scatter_set(mask: jnp.ndarray, idx: jnp.ndarray,
                valid: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    if valid is None:
        return mask.at[idx].set(True)
    return mask.at[idx].set(jnp.where(valid, True, mask[idx]))


def l2_normalize(z: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    return z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + eps)


def first_k_true(mask: jnp.ndarray, k: int,
                 fill: int = 0) -> jnp.ndarray:
    """Indices of the first k set bits of ``mask`` in index order,
    padded with ``fill`` — semantically ``jnp.where(mask, size=k,
    fill_value=fill)[0]``, but lowered as cumsum + bounded scatter.
    The sized-where compaction costs ~2.3 ms over 262k elements on v5e
    (measured, docs/ROUND_NOTES.md); this form is ~0.2 ms."""
    n = mask.shape[0]
    pos = jnp.cumsum(mask) - 1
    tgt = jnp.where(mask & (pos < k), pos, k)  # k = out of bounds: drop
    return jnp.full((k,), fill, jnp.int32).at[tgt].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")


def pairwise_dist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Euclidean distances [n, m] via the matmul identity (MXU-friendly)."""
    sq = (
        jnp.sum(a**2, -1)[:, None]
        + jnp.sum(b**2, -1)[None, :]
        - 2.0 * a @ b.T
    )
    return jnp.sqrt(jnp.maximum(sq, 0.0))


def k_center_greedy(z_norm: jnp.ndarray, cand_mask: jnp.ndarray,
                    center_mask: jnp.ndarray, k: int):
    """Farthest-first traversal: repeatedly pick the candidate with the
    largest min-distance to the growing center set (reference
    select_topk_latent_diversity, :1024-1109). Fully on-device:
    initial min-dists come from one [N, N] masked distance matrix, then a
    fori_loop adds one center per step.

    Returns (selected indices [k], valid [k])."""
    n = z_norm.shape[0]
    d = pairwise_dist(z_norm, z_norm)  # [N, N]
    masked_d = jnp.where(center_mask[None, :], d, jnp.inf)
    min_dists = jnp.min(masked_d, axis=1)  # inf when no centers
    # candidates that can still be picked
    state = (min_dists, cand_mask, jnp.zeros((k,), jnp.int32),
             jnp.zeros((k,), bool))

    def body(i, state):
        min_dists, avail, sel, val = state
        score = jnp.where(avail, min_dists, NEG_INF)
        j = jnp.argmax(score)
        ok = score[j] > NEG_INF / 2
        sel = sel.at[i].set(jnp.int32(j))
        val = val.at[i].set(ok)
        avail = avail.at[j].set(False)
        min_dists = jnp.minimum(min_dists, d[:, j])
        return (min_dists, avail, sel, val)

    _, _, sel, val = jax.lax.fori_loop(0, k, body, state)
    return sel, val


def farthest_point_init(key, z: jnp.ndarray, remaining_mask: jnp.ndarray,
                        k: int):
    """Farthest-point-first init selection (reference
    select_init_latent_diversity, :1112-1153): first point random, then
    greedy farthest (un-normalized z). Incremental min-distance updates
    (O(k*N*D)): each step only needs distances to the newest pick, so no
    [N, N] matrix exists — the reference's cdist formulation would be
    275 GB at the 262k-candidate bench scale."""
    n = z.shape[0]
    probs = remaining_mask / jnp.maximum(remaining_mask.sum(), 1)
    first = jax.random.choice(key, n, p=probs)
    min_sq = jnp.sum((z - z[first]) ** 2, -1)
    sel0 = jnp.zeros((k,), jnp.int32).at[0].set(jnp.int32(first))
    avail = remaining_mask.at[first].set(False)

    def body(i, state):
        min_sq, avail, sel = state
        j = jnp.argmax(jnp.where(avail, min_sq, NEG_INF))
        sel = sel.at[i].set(jnp.int32(j))
        avail = avail.at[j].set(False)
        min_sq = jnp.minimum(min_sq, jnp.sum((z - z[j]) ** 2, -1))
        return (min_sq, avail, sel)

    _, avail, sel = jax.lax.fori_loop(1, k, body, (min_sq, avail, sel0))
    return sel


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def kmeans_representative_init(key, z: jnp.ndarray, k: int,
                               iters: int = 10) -> jnp.ndarray:
    """k-means++ seeding + Lloyd iterations + nearest-real-point
    dedup — the reference's representative init selection
    (select_representative_kmeans, vae_extent_search.py:1156-1208). Like
    the reference, it clusters ALL points (not just remaining) and
    returns the per-center nearest distinct data indices [k]."""
    n = z.shape[0]
    k1, k2 = jax.random.split(key)
    first = jax.random.randint(k1, (), 0, n)
    cidx0 = jnp.zeros((k,), jnp.int32).at[0].set(jnp.int32(first))
    d0 = jnp.sum((z - z[first]) ** 2, -1)  # squared = reference's dist**2

    def seed_body(i, st):
        dist, cidx, kk = st
        kk, sub = jax.random.split(kk)
        # sample proportional to squared distance (kmeans++)
        idx = jax.random.categorical(
            sub, jnp.log(jnp.maximum(dist, 1e-12)))
        cidx = cidx.at[i].set(jnp.int32(idx))
        dist = jnp.minimum(dist, jnp.sum((z - z[idx]) ** 2, -1))
        return dist, cidx, kk

    _, cidx, _ = jax.lax.fori_loop(1, k, seed_body, (d0, cidx0, k2))
    centers = z[cidx]  # [k, D]

    def sq_d(c):
        return (
            jnp.sum(z * z, -1)[:, None]
            + jnp.sum(c * c, -1)[None, :]
            - 2.0 * z @ c.T
        )

    def lloyd(_, centers):
        assign = jnp.argmin(sq_d(centers), axis=1)  # [N]
        sums = jax.ops.segment_sum(z, assign, num_segments=k)
        cnts = jax.ops.segment_sum(
            jnp.ones((n, 1), z.dtype), assign, num_segments=k)
        return jnp.where(cnts > 0, sums / jnp.maximum(cnts, 1.0), centers)

    centers = jax.lax.fori_loop(0, iters, lloyd, centers)
    d = sq_d(centers)  # [N, k]

    def pick(j, st):
        taken, sel = st
        dj = jnp.where(taken, jnp.inf, d[:, j])
        i = jnp.argmin(dj)
        return taken.at[i].set(True), sel.at[j].set(jnp.int32(i))

    _, sel = jax.lax.fori_loop(
        0, k, pick, (jnp.zeros((n,), bool), jnp.zeros((k,), jnp.int32)))
    return sel


def random_select(key, remaining_mask: jnp.ndarray, k: int):
    """eps-greedy random pick without replacement from the remaining set
    (reference random_select_indices, :869-877)."""
    n = remaining_mask.shape[0]
    noise = jax.random.uniform(key, (n,))
    idx, valid = masked_top_k(noise, remaining_mask, k)
    return idx, valid


def z_grad_norms(params: Dict, z: jnp.ndarray) -> jnp.ndarray:
    """||d cost / d z|| per candidate (reference select_topk_z_grad)."""
    grad = jax.grad(lambda zz: predict_cost(params, zz).sum())(z)
    return jnp.linalg.norm(grad, axis=-1)


def _use_fused_head(params: Dict, cfg: "SelectionConfig",
                    mask_bits=None) -> bool:
    """Trace-time gate for the fused Pallas head kernel: TPU backends
    only (the kernel's hardware-PRNG dropout has no CPU lowering), the
    default 2-hidden-layer head shape, and an MC pass actually needed
    (T >= 2 and an uncertainty budget; otherwise XLA's dead-code
    elimination of the unused MC block beats running it). The
    CPU/interpret seam (cfg.fused_interpret + injected ``mask_bits``)
    lets tests run the kernel arithmetic without the TPU PRNG."""
    if cfg.fused_head == "off":
        return False
    if jax.default_backend() == "cpu" and not (
            cfg.fused_interpret and mask_bits is not None):
        return False
    head = params.get("cost_predictor")
    if head is None or len(head) != 3:
        return False
    l, h = head[0]["w"].shape
    if h % 128 != 0 or l % 8 != 0 or h != head[1]["w"].shape[0]:
        return False
    enc = params.get("encoder")
    if enc is None or "fc_mu" not in params:
        return False
    # the fused encoder's hidden widths land on the MXU lane tile and
    # fc_mu must produce the head's latent width (l, 8-aligned above);
    # anything else falls back to the XLA path
    if any(layer["w"].shape[1] % 128 != 0 for layer in enc):
        return False
    if params["fc_mu"]["w"].shape != (enc[-1]["w"].shape[1], l):
        return False
    return cfg.T_mc >= 2 and cfg.n_unc > 0


class SelectionConfig(NamedTuple):
    num_select: int = 64
    w_cost: float = 0.5
    w_unc: float = 0.3
    w_div: float = 0.2
    grad_num: int = 2
    rand_num: int = 0
    T_mc: int = 10
    uncertainty_topk: int = 128
    topk_factor: int = 5
    dropout_rate: float = 0.1
    max_centers: int = 4096
    # compute dtype of the scoring forwards ("float32" | "bfloat16"):
    # bfloat16 is the MXU-native format (~4x matmul throughput); rankings
    # are computed from f32-accumulated matmul outputs either way, and
    # the top-k/selection logic always runs in f32
    compute_dtype: str = "float32"
    # "auto" runs the encoder+cost-head+z-grad+MC-dropout block as ONE
    # Pallas kernel on TPU backends (ops/fused_head_pallas.py: activations
    # stay in VMEM, dropout masks come from the on-chip hardware PRNG —
    # ~2.6x the XLA lowering at 262k candidates); "off" forces the XLA
    # path (always used on CPU, where the TPU PRNG has no lowering)
    fused_head: str = "auto"
    # test seam: run the Pallas kernel in interpret mode (CPU) with
    # injected dropout mask bits instead of the TPU hardware PRNG
    fused_interpret: bool = False

    @property
    def budget(self) -> int:
        return self.num_select - self.grad_num - self.rand_num

    @property
    def n_cost(self) -> int:
        n_cost = int(self.budget * self.w_cost)
        n_unc = int(self.budget * self.w_unc)
        n_div = int(self.budget * self.w_div)
        return n_cost + (self.budget - (n_cost + n_unc + n_div))

    @property
    def n_unc(self) -> int:
        return int(self.budget * self.w_unc)

    @property
    def n_div(self) -> int:
        return int(self.budget * self.w_div)


def select_programs(params: Dict, X: jnp.ndarray, used_mask: jnp.ndarray,
                    remaining_mask: jnp.ndarray, key, cfg: SelectionConfig,
                    gate_uncertainty_to_remaining: bool = False,
                    mask_bits=None, center_idx=None, center_valid=None):
    """Public entry: see _select_programs. When the candidate matrix is
    sharded over more than one device along a named mesh axis, the phase
    runs on the pod-scale path (search/select_sharded.py): the fused
    Pallas head runs per candidate shard under shard_map and every
    full-N top-k is a per-shard lax.top_k merged across shards with an
    all_gather — GSPMD alone has no partitioning rule for the custom
    call and would all-gather the candidate axis around it."""
    from jax.sharding import NamedSharding

    sh = getattr(X, "sharding", None)
    if (sh is not None and isinstance(sh, NamedSharding)
            and len(sh.device_set) > 1 and len(sh.spec) >= 1
            and sh.spec[0] is not None):
        from .select_sharded import select_programs_sharded

        axis = sh.spec[0]
        axis = axis if isinstance(axis, str) else axis[0]
        return select_programs_sharded(
            params, X, used_mask, remaining_mask, key, cfg, sh.mesh,
            axis, gate_uncertainty_to_remaining, mask_bits,
            center_idx, center_valid)
    if cfg.fused_head == "auto" and sh is not None \
            and len(getattr(sh, "device_set", ())) > 1:
        # sharded but not along a named axis we can shard_map over:
        # fall back to the GSPMD XLA path
        cfg = cfg._replace(fused_head="off")
    return _select_programs(params, X, used_mask, remaining_mask, key,
                            cfg, gate_uncertainty_to_remaining, mask_bits,
                            center_idx, center_valid)


@functools.partial(
    jax.jit, static_argnames=("cfg", "gate_uncertainty_to_remaining")
)
def _select_programs(params: Dict, X: jnp.ndarray, used_mask: jnp.ndarray,
                     remaining_mask: jnp.ndarray, key, cfg: SelectionConfig,
                     gate_uncertainty_to_remaining: bool = False,
                     mask_bits=None, center_idx=None, center_valid=None):
    """One full selection phase on device.

    Flow (mirrors reference select_programs :1210-1309):
      1. encode all candidates; cost_pred = head(mu)
      2. candidate pool = top (num_select * topk_factor) predicted among
         remaining
      3. top n_cost by predicted cost from the pool
      4. top grad_num by |dcost/dz| from the pool
      5. top n_unc by MC-dropout variance (from the pool, or from all
         remaining while the measured set is small — the reference gates on
         len(used) < uncertainty_topk)
      6. n_div by k-center greedy on L2-normalized z, centers = used +
         already-selected
      7. rand_num random from remaining
    Returns (selected_idx [num_select], valid [num_select],
             new_remaining_mask, aux dict).

    ``center_idx``/``center_valid`` ([C] int32 / bool): optional
    precompacted measured-set indices for the diversity stage. The
    active loop knows its measured set as a compact list (init +
    every phase's picks), so deriving the center set from
    ``used_mask`` on device — a full-N cumsum + scatter compaction
    (``first_k_true``) — is 1.3 ms of pure waste per phase at 262k
    candidates. With the buffer passed in, the center set is the
    buffer ++ this phase's earlier picks and every diversity op is
    pool-sized. The center SET (hence the k-center trajectory) is
    identical to the mask-derived path whenever the buffer holds the
    whole measured set; when capacity binds, the mask path keeps the
    lowest-index centers while a rolling buffer keeps insertion order
    (both are graceful degradations).
    """
    k_mc, k_rand = jax.random.split(key)
    if cfg.compute_dtype != "float32":
        ct = jnp.dtype(cfg.compute_dtype)
        params = jax.tree_util.tree_map(
            lambda a: a.astype(ct) if a.dtype == jnp.float32 else a, params)
        X = X.astype(ct)
    if _use_fused_head(params, cfg, mask_bits):
        from ..ops.fused_head_pallas import fused_head_stats
        from ..ops.kernel_library import tuned_fused_head_config

        # self-tuned kernel schedule (scripts/tune_kernel_suite.py
        # fusedhead family): consult the process kernel library for a
        # (block, mc_chunk) measured on this chip at this shape; the
        # hand defaults (1024/auto) apply when no record matches. The
        # lookup runs at trace time — a library change after the first
        # trace of a shape keeps the already-compiled schedule.
        h_dim, l_dim = params["fc_mu"]["w"].shape
        tuned = tuned_fused_head_config(
            X.shape[0], X.shape[1], h_dim, l_dim, cfg.T_mc,
            dtype=cfg.compute_dtype)
        tuned_kw = ({"block": tuned[0], "mc_chunk": tuned[1]}
                    if tuned is not None else {})

        seed = jax.random.randint(k_mc, (), 0, jnp.iinfo(jnp.int32).max)
        # mu_layout="none": the diversity stage re-encodes its few
        # hundred gathered rows, so the full [L, N] latent matrix
        # (~67 MB at 262k candidates) is never consumed — skipping the
        # output saves that HBM write every phase (custom-call outputs
        # are not DCE'd by XLA)
        _, cost_pred, gnorm, mc_mean, mc_var = fused_head_stats(
            params["cost_predictor"], X, seed, T=cfg.T_mc,
            rate=cfg.dropout_rate,
            interpret=cfg.fused_interpret, mask_bits=mask_bits,
            encoder=(params["encoder"], params["fc_mu"]),
            mu_layout="none", **tuned_kw,
        )
        mu = None
    else:
        mu, logvar = pred_encode(params, X)
        cost_pred = predict_cost(params, mu).astype(jnp.float32)
        gnorm = z_grad_norms(params, mu).astype(jnp.float32)
        # the encoder has no dropout: the T MC samples reuse mu
        mc_mean, mc_var = mc_predict(params, X, k_mc, cfg.T_mc,
                                     cfg.dropout_rate, mu=mu)
        mc_mean = mc_mean.astype(jnp.float32)
        mc_var = mc_var.astype(jnp.float32)
        mu = mu.astype(jnp.float32)

    n = X.shape[0]
    k_pool = cfg.num_select * cfg.topk_factor

    # 2. candidate pool — the ONE full-N top-k. Strategies 3-6 only ever
    # pick from this pool, so their scores/latents are gathered to
    # [k_pool] arrays once and every later top-k/argmax is pool-sized
    # (at N=262k, k_pool=320 that removes three full-N lax.top_k calls
    # and the O(N) k-center distance state from the phase)
    pool_idx, pool_valid = masked_top_k(cost_pred, remaining_mask, k_pool)
    avail = pool_valid  # [k_pool] local availability mask
    cost_p = cost_pred[pool_idx]
    gnorm_p = gnorm[pool_idx]
    mcvar_p = mc_var[pool_idx]

    picked = jnp.zeros((n,), bool)
    none = (jnp.zeros((0,), jnp.int32), jnp.zeros((0,), bool))

    def pick_local(scores_p, avail, k):
        """Pool-local masked top-k -> (global idx, valid, new avail)."""
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
        # reference gating: while the measured set is small, variance
        # ranks over ALL remaining, not just the pool — full-N top-k
        ui, uv = masked_top_k(mc_var, remaining_mask & ~picked, cfg.n_unc)
        picked = scatter_set(picked, ui, uv)
        # drop any of those that were pool members from availability
        avail = avail & ~picked[pool_idx]
    else:
        ui, uv, avail = pick_local(mcvar_p, avail, cfg.n_unc)
        picked = scatter_set(picked, ui, uv)

    # 6. latent diversity (k-center greedy) restricted to the pool;
    # centers = used + picked, gathered up to cfg.max_centers. Gather
    # the RAW feature rows and re-encode the few hundred gathered rows —
    # rows on the candidate axis gather cheaply, while a full-pool
    # latent materialization/relayout or lane-axis gathers cost
    # milliseconds at 262k (docs/ROUND_NOTES.md); the encoder forward on
    # <=4k rows is microseconds and numerically identical
    if cfg.n_div:
        from ..ops.kcenter import k_center_greedy_pool_core

        if center_idx is not None:
            # precompacted measured set ++ this phase's earlier picks
            # (ci/gi/ui are already compact) — no full-N compaction
            cidx = jnp.concatenate(
                [center_idx.astype(jnp.int32), ci, gi, ui])
            c_valid = jnp.concatenate([center_valid, cv, gv, uv])
        else:
            cmask = used_mask | picked
            cidx = first_k_true(cmask, cfg.max_centers)
            c_valid = cmask[cidx]
        if mu is None:  # fused path: re-encode the gathered rows
            zp, _ = pred_encode(params, X[pool_idx])
            zc, _ = pred_encode(params, X[cidx])
            zp_norm = l2_normalize(zp.astype(jnp.float32))
            centers = l2_normalize(zc.astype(jnp.float32))
        else:
            zp_norm = l2_normalize(mu[pool_idx])
            centers = l2_normalize(mu[cidx])
        dl, dv = k_center_greedy_pool_core(
            zp_norm, avail, centers, c_valid, cfg.n_div)
        di = pool_idx[dl]
    else:
        di, dv = none
    picked = scatter_set(picked, di, dv)

    # 7. eps-greedy random from remaining minus picked
    ri, rv = random_select(k_rand, remaining_mask & ~picked, cfg.rand_num) \
        if cfg.rand_num else (jnp.zeros((0,), jnp.int32), jnp.zeros((0,), bool))
    picked = scatter_set(picked, ri, rv)

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

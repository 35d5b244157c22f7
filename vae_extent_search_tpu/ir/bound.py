"""Demand-driven bound inference for schedule states.

Fills in every iterator's ``(min, extent)`` range, the equivalent of the
reference's ComputeDAG::InferBound (compute_dag.cc:1302) which re-lowers the
state through te::Schedule and te::InferBound. We instead propagate ranges
directly on the loop-state IR:

1. Root-scope stages get their full original extents; extents pass down the
   per-stage split/fuse relation log with te's PassDownDomain math
   (message_passing.cc:109-143: split inner = min(parent, factor) unless a
   thread binding dominates, outer = ceil(parent / factor); fuse = product).
2. A stage attached via compute_at gets *demanded* root extents: the region
   of its output read by the attach target (through any inlined ops in
   between), computed by interval arithmetic over access index expressions
   with the target's loop vars inside the attach point spanning their full
   ranges and outer vars pinned.
3. Reduction dims always demand their full extent.

This is an approximation of te::InferBound's IntSet machinery that is exact
for the loop structures Ansor generates (multi-level tiling + fusion +
cache stages + rfactor).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from . import expr as E
from .state import (
    AT_INLINED,
    AT_ITER,
    AT_ROOT,
    KIND_REDUCTION,
    THREAD_ANNOTATIONS,
    Iterator,
    Stage,
    State,
)
from .tensor import ComputeOp, IterDim, PlaceholderOp


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


class _StageBounds:
    """Per-stage range propagation over the relation log."""

    def __init__(self, stage: Stage):
        self.stage = stage
        self.leaf_uids = [it.uid for it in stage.iters]
        self.leaf_ann = {it.uid: it.annotation for it in stage.iters}
        # thread domination (PassUpThreadBinding, message_passing.cc:56-86)
        self.dominates_thread: Dict[int, bool] = {
            uid: (ann in THREAD_ANNOTATIONS)
            for uid, ann in self.leaf_ann.items()
        }
        for rel in reversed(stage.relations):
            if rel.kind == "split":
                self.dominates_thread[rel.parent] = self.dominates_thread.get(
                    rel.outer, False
                ) or self.dominates_thread.get(rel.inner, False)
            else:  # fuse
                d = self.dominates_thread.get(rel.fused, False)
                self.dominates_thread[rel.outer] = d
                if rel.inner is not None:
                    self.dominates_thread[rel.inner] = d

    def pass_down(self, root_extents: Dict[int, int]) -> Dict[int, int]:
        """uid -> extent for every derived iterator, given root extents
        keyed by root iterator uid."""
        ext = dict(root_extents)
        for rel in self.stage.relations:
            if rel.kind == "split":
                if rel.parent not in ext:
                    continue
                p = ext[rel.parent]
                f = rel.factor
                if f is None:
                    continue
                if not rel.by_nparts:
                    inner = f if self.dominates_thread.get(rel.inner) else min(p, f)
                    ext[rel.inner] = inner
                    ext[rel.outer] = _ceil_div(p, f)
                else:
                    outer = f if self.dominates_thread.get(rel.outer) else min(p, f)
                    ext[rel.outer] = outer
                    ext[rel.inner] = _ceil_div(p, f)
            else:  # fuse
                if rel.outer not in ext:
                    continue
                if rel.inner is None:
                    ext[rel.fused] = ext[rel.outer]
                elif rel.inner in ext:
                    ext[rel.fused] = ext[rel.outer] * ext[rel.inner]
        return ext

    def pass_up_local(self, full: Dict[int, int],
                      leaf_local: Dict[int, int]) -> Dict[int, int]:
        """Propagate local (inside-attach-point) extents from leaves to
        roots. ``full`` holds full extents for every uid (from pass_down
        with original roots)."""
        local = dict(leaf_local)
        for rel in reversed(self.stage.relations):
            if rel.kind == "split":
                o = local.get(rel.outer)
                i = local.get(rel.inner)
                if o is None or i is None:
                    continue
                p_full = full.get(rel.parent)
                stride = full.get(rel.inner, rel.factor or 1)
                p_local = (o - 1) * stride + i if o >= 1 else i
                if p_full is not None:
                    # full coverage of both children means full parent
                    if o == full.get(rel.outer) and i == full.get(rel.inner):
                        p_local = p_full
                    p_local = min(p_local, p_full)
                local[rel.parent] = p_local
            else:  # fuse
                fl = local.get(rel.fused)
                if fl is None:
                    continue
                if rel.inner is None:
                    local[rel.outer] = fl
                    continue
                f_full = full.get(rel.fused)
                i_full = full.get(rel.inner, 1)
                if f_full is not None and fl == f_full:
                    local[rel.outer] = full.get(rel.outer, fl)
                    local[rel.inner] = i_full
                else:
                    local[rel.inner] = min(fl, i_full) if i_full else fl
                    local[rel.outer] = _ceil_div(fl, i_full) if i_full else 1
        return local


def _root_extent_map(stage: Stage) -> Dict[int, int]:
    return {uid: dim.extent for uid, dim in stage.root_of.items()}


_RELAXABLE_THREADS = frozenset(
    {4, 6, 8, 10}  # vthread + threadIdx.x/y/z; blockIdx never relaxes.
    # Known divergence (~5% of GPU shared-cache extents on the ci_log
    # corpora — tools/check_extent_fidelity.py): te's InferRootBound
    # (src/te/schedule/bound.cc:120-175) walks the consumer's leaf nest
    # AND its whole attach path, pinning outer loops to SYMBOLIC points
    # (up_state SinglePoint(iv->var)) and relaxing thread-tagged vars by
    # storage-rank comparison (NeedRelax, bound.cc:54); the demanded
    # region is then EvalSet over those symbolic expressions, so thread
    # relaxation composes exactly through arbitrary attach chains and
    # interacts with the symbolic range mins of demand-clipped stages.
    # We propagate numeric intervals per attach level instead, which
    # loses the cross-level offset structure for shared caches under a
    # doubly-attached accumulator. A faithful fix needs a symbolic
    # interval engine keyed on the attach-path variables (two numeric
    # approximations were tried and both regressed aggregate fidelity —
    # see the round-1 history).
)


def _demanded_region(state: State, consumer_id: int, attach_pos: int,
                     bounds_cache: Dict[int, _StageBounds],
                     full_extents: Dict[int, Dict[int, int]],
                     relax_threads: bool = False):
    """Intervals demanded of every tensor read inside the attach point of
    ``consumer_id`` at iterator position ``attach_pos`` (inclusive scope:
    loops strictly inside the attach iterator), propagated through inlined
    stages. Returns {op_uid: [Interval per dim]}.

    ``relax_threads``: thread-bound loops outside the attach point span
    their full range instead of being pinned — te's NeedRelax semantics
    for shared-scope producers (shared memory is block-cooperative, so a
    shared cache must cover every thread's slice).
    """
    consumer = state.stages[consumer_id]
    sb = bounds_cache[consumer_id]
    # the consumer's inferred extent map (roots possibly demand-clipped)
    full = full_extents[consumer_id]

    # local leaf extents: loops at positions <= attach_pos are pinned
    leaf_local = {}
    for pos, it in enumerate(consumer.iters):
        e = full.get(it.uid, it.extent or 1)
        pinned = pos <= attach_pos
        if pinned and relax_threads and it.annotation in _RELAXABLE_THREADS:
            pinned = False
        leaf_local[it.uid] = 1 if pinned else e
    local = sb.pass_up_local(full, leaf_local)

    # env: consumer's root dim vars -> local intervals
    env = {}
    for uid, dim in consumer.root_of.items():
        le = local.get(uid, dim.extent)
        env[dim.var] = E.Interval(0, max(0, le - 1))

    demands: Dict[int, List[E.Interval]] = {}

    def accumulate(op: ComputeOp, op_env):
        for read in E.collect_reads(op.body):
            t = read.tensor
            ivs = []
            for d, idx in enumerate(read.indices):
                iv = E.eval_interval(idx, op_env)
                lo = max(0, iv.lo)
                hi = min(t.shape[d] - 1, iv.hi)
                if hi < lo:
                    lo, hi = 0, 0
                ivs.append(E.Interval(lo, hi))
            prev = demands.get(t.op.uid)
            if prev is None:
                demands[t.op.uid] = ivs
            else:
                demands[t.op.uid] = [
                    E.Interval(min(a.lo, b.lo), max(a.hi, b.hi))
                    for a, b in zip(prev, ivs)
                ]

    if isinstance(consumer.op, ComputeOp):
        accumulate(consumer.op, env)

    # propagate through inlined stages (reverse stage order = consumers
    # before producers within the DAG's topo order)
    for sid in range(len(state.stages) - 1, -1, -1):
        st_i = state.stages[sid]
        if st_i.compute_at != AT_INLINED:
            continue
        if not isinstance(st_i.op, ComputeOp):
            continue
        dem = demands.get(st_i.op.uid)
        if dem is None:
            continue
        op_env = {
            dim.var: dem[d] for d, dim in enumerate(st_i.op.axes)
        }
        # reduce axes of an inlined op span fully (rare; inlined ops are
        # elementwise in Ansor)
        for rd in st_i.op.reduce_axes:
            op_env[rd.var] = E.Interval(0, rd.extent - 1)
        accumulate(st_i.op, op_env)

    return demands


def infer_bound(dag, state: State) -> State:
    """Return a copy of ``state`` with every iterator range defined."""
    if not state.concrete:
        raise ValueError("only concrete states can be bound-inferred")
    out = state.copy()
    out.stages = [s.shallow_copy() for s in state.stages]

    bounds_cache = {sid: _StageBounds(s) for sid, s in enumerate(out.stages)}
    # inferred extent map (every uid incl. intermediates) per stage
    full_extents: Dict[int, Dict[int, int]] = {}
    # thread-relaxed variant, used for shared-scope cache demands
    relaxed_extents: Dict[int, Dict[int, int]] = {}

    def assign_ranges(sid: int, ext: Dict[int, int]):
        stage = out.stages[sid]
        new_iters = []
        for it in stage.iters:
            e = ext.get(it.uid)
            if e is None:
                e = it.extent if it.extent is not None else 1
            new_iters.append(it.with_range((0, e)))
        stage.iters = new_iters

    def demand_roots(a_stage, demands):
        roots = _root_extent_map(a_stage)
        if isinstance(a_stage.op, ComputeOp):
            dem = demands.get(a_stage.op.uid)
            if dem is not None:
                # spatial dims take demanded extents; reduce dims full
                dim_to_uid = {
                    id(dim): uid for uid, dim in a_stage.root_of.items()
                }
                for d, ax in enumerate(a_stage.op.axes):
                    uid = dim_to_uid.get(id(ax))
                    if uid is not None and d < len(dem):
                        roots[uid] = min(dem[d].extent, ax.extent)
        return roots

    def process(sid: int, root_extents: Dict[int, int],
                relaxed_roots: Dict[int, int]):
        sb = bounds_cache[sid]
        ext = sb.pass_down(root_extents)
        full_extents[sid] = ext
        relaxed_extents[sid] = sb.pass_down(relaxed_roots)
        assign_ranges(sid, ext)
        # recurse into attached stages at each iterator position
        stage = out.stages[sid]
        for pos in range(len(stage.iters)):
            attached = out.attach_map.iter_to_attached_stages.get((sid, pos))
            if not attached:
                continue
            for a_sid in attached:
                a_stage = out.stages[a_sid]
                is_shared = isinstance(a_stage.op, ComputeOp) and \
                    a_stage.op.name.endswith(".shared")
                # shared-scope caches see the thread-relaxed region
                demands = _demanded_region(
                    out, sid, pos, bounds_cache,
                    relaxed_extents if is_shared else full_extents,
                    relax_threads=is_shared,
                )
                roots = demand_roots(a_stage, demands)
                # the relaxed chain always relaxes threads
                relax_dem = _demanded_region(
                    out, sid, pos, bounds_cache, relaxed_extents,
                    relax_threads=True,
                )
                r_roots = demand_roots(a_stage, relax_dem)
                process(a_sid, roots, r_roots)

    for sid, stage in enumerate(out.stages):
        if stage.op_type == "placeholder" or stage.compute_at != AT_ROOT:
            continue
        roots = _root_extent_map(stage)
        process(sid, roots, dict(roots))

    return out

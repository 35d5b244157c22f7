"""Fidelity diagnostic: compare our demand-driven bound inference against
the extents recorded inside SP steps of reference measure records.

Every SplitStep in an Ansor record stores the extent of the iterator it
split at the time the step was created by the C++ search (which ran on
te::InferBound-ed states). Replaying the prefix of steps and running our
infer_bound on it must reproduce that extent; mismatches localize
divergences from TVM semantics without needing TVM itself.
"""

import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

from vae_extent_search_tpu.records import load_records
from vae_extent_search_tpu.ir.steps import SplitStep, step_from_record


def check_record(rec, verbose=False):
    dag = rec.inp.task.compute_dag
    st = dag.init_state.copy()
    results = []
    for srec in rec.inp.step_records:
        step = step_from_record(srec)
        if isinstance(step, SplitStep) and step.extent:
            it = st.stages[step.stage_id].iters[step.iter_id]
            if it.range is not None:
                got = it.range[1]
            else:
                # the reference recorded split extents under InferBound
                # snapshots taken before thread binding existed (see
                # ir/bound.py infer_bound docstring), so the oracle
                # replays with thread relaxation off
                bound = dag.infer_bound(st, relax_threads=False)
                got = bound.stages[step.stage_id].iters[step.iter_id].range[1]
            results.append(
                (step.extent, got,
                 st.stages[step.stage_id].op.name, it.name)
            )
        st.transform_steps.append(step)
        step.apply_to_state(st)
    # also ensure full replay + bound works
    dag.infer_bound(st)
    return results


def main(paths):
    total = Counter()
    mismatches = []
    for path in paths:
        try:
            records = load_records(path)
        except Exception as e:
            print(f"LOAD FAIL {path}: {e}")
            continue
        for ri, rec in enumerate(records):
            try:
                results = check_record(rec)
            except Exception as e:
                total["replay_error"] += 1
                mismatches.append((path, ri, "ERROR", repr(e)[:120]))
                continue
            for want, got, opname, itname in results:
                total["checked"] += 1
                if want == got:
                    total["ok"] += 1
                else:
                    total["mismatch"] += 1
                    mismatches.append((path, ri, f"{opname}/{itname}",
                                       f"want {want} got {got}"))
    print(dict(total))
    for m in mismatches[:40]:
        print("  ", m)
    if total["checked"]:
        print(f"accuracy: {total['ok'] / total['checked']:.4f}")


if __name__ == "__main__":
    import glob

    paths = sys.argv[1:] or glob.glob(
        "/root/reference/tutorials/auto_scheduler/ci_logs/*.json"
    )
    main(paths)

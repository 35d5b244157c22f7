"""Golden fidelity against the reference's own record corpora.

Every SplitStep in a reference measure record stores the extent of the
iterator it split, as computed by the reference's te::InferBound at search
time — an oracle for our bound inference without running TVM.

The reference computed every recorded extent under InferBound snapshots
taken *before* thread bindings existed (InitThreadBind runs its one
InferBound at the top, before it creates any bind; evolutionary mutation
then rewrites split lengths while keeping stale extent fields — see
ir/bound.py). The oracle therefore replays with ``relax_threads=False``;
cooperative-fetch splits on ``.shared`` stages are checked separately
because their recorded extents go stale whenever the consumer's reduction
tiling was later mutated (demonstrable on resnet-18-cuda record 1, where
both caches record 32 — consistent only with the pre-mutation k split).
"""

import os

import pytest

from tests.conftest import CI_LOGS
from vae_extent_search_tpu.ir.steps import SplitStep, step_from_record
from vae_extent_search_tpu.records import load_records

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CI_LOGS), reason="reference ci_logs unavailable"
)


def _check_file(name, min_accuracy, max_records=None,
                min_accuracy_stale_prone=0.0):
    records = load_records(os.path.join(CI_LOGS, name))
    if max_records:
        records = records[:max_records]
    checked = ok = 0          # stable oracles (not stale-prone)
    s_checked = s_ok = 0      # cooperative-fetch splits on .shared stages
    for rec in records:
        dag = rec.inp.task.compute_dag
        st = dag.init_state.copy()
        for srec in rec.inp.step_records:
            step = step_from_record(srec)
            if isinstance(step, SplitStep) and step.extent:
                it = st.stages[step.stage_id].iters[step.iter_id]
                got = it.range[1] if it.range else dag.infer_bound(
                    st, relax_threads=False
                ).stages[step.stage_id].iters[step.iter_id].range[1]
                opname = st.stages[step.stage_id].op.name
                if opname.endswith(".shared"):
                    s_checked += 1
                    s_ok += int(got == step.extent)
                else:
                    checked += 1
                    ok += int(got == step.extent)
            st.transform_steps.append(step)
            step.apply_to_state(st)
        dag.infer_bound(st)  # full replay must succeed
    assert checked > 0
    accuracy = ok / checked
    assert accuracy >= min_accuracy, f"{name}: {accuracy:.3f} ({ok}/{checked})"
    if s_checked:
        s_acc = s_ok / s_checked
        assert s_acc >= min_accuracy_stale_prone, (
            f"{name} shared-stage splits: {s_acc:.3f} ({s_ok}/{s_checked})"
        )


def test_matmul_extents_exact():
    _check_file("matmul.json", 1.0)


def test_resnet50_llvm_extents_exact():
    _check_file("resnet-50-NHWC-B1-llvm.json", 1.0, max_records=10)


def test_resnet18_cuda_extents():
    # non-shared splits must reproduce exactly; cooperative-fetch splits
    # on .shared stages are stale-prone (see module docstring)
    _check_file("resnet-18-NHWC-B1-cuda.json", 1.0, max_records=10,
                min_accuracy_stale_prone=0.5)


def test_final_state_shared_cache_semantics():
    """te's final-state semantics for cooperative fetching: a shared cache
    under a thread-bound consumer covers every thread's slice (NeedRelax,
    bound.cc:54-68). Hand-derived on resnet-18-cuda record 1 (dense
    1x1000x512, T_add bound blockIdx=20/vthread=1/threadIdx=50, weight
    cache attached at the k.0 loop with k tiles [1,16]): the weight cache
    must cover threadIdx's 50 j-values x the 16-wide k window = 800,
    cooperative-fetch split per thread = 16."""
    records = load_records(os.path.join(CI_LOGS,
                                        "resnet-18-NHWC-B1-cuda.json"))
    rec = records[1]
    dag = rec.inp.task.compute_dag
    st = dag.init_state.copy()
    for srec in rec.inp.step_records:
        step = step_from_record(srec)
        st.transform_steps.append(step)
        step.apply_to_state(st)
    bound = dag.infer_bound(st)
    # stage 3 = weight placeholder.shared: leaves (outer, threadIdx, vec)
    weight_shared = bound.stages[3]
    assert weight_shared.op.name == "placeholder.shared"
    exts = [it.range[1] for it in weight_shared.iters]
    assert exts == [16, 50, 1], exts
    # stage 1 = data placeholder.shared: 1x512 data, k window 16 over
    # 50 threads -> outer 1, threadIdx 50 (clipped by demand 16? no:
    # cooperative fetch splits by consumer thread extent)
    data_shared = bound.stages[1]
    assert data_shared.op.name == "placeholder.shared"
    # without thread relaxation the same stage shrinks to one thread's
    # slice — the pre-bind snapshot semantics
    snap = dag.infer_bound(st, relax_threads=False)
    snap_exts = [it.range[1] for it in snap.stages[3].iters]
    assert snap_exts[0] * snap_exts[1] * snap_exts[2] <= 16 * 50


def test_stale_extent_mismatches_have_premutation_ancestors():
    """Every SP-extent oracle mismatch on the stale-prone GPU corpus
    must be explainable as a pre-mutation InferBound snapshot: one
    inverse MutateTileSize move on an earlier consumer split reproduces
    the recorded extent (tools/stale_extent_forensic.py; full-corpus
    result: 20/20 explained). This pins two known-stale records so the
    mechanism claim stays regression-tested without the full sweep."""
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tools.stale_extent_forensic import explain, find_mismatches
    from vae_extent_search_tpu.records import load_records

    path = os.path.join(
        "/root/reference/tutorials/auto_scheduler/ci_logs",
        "resnet-18-NHWC-B1-cuda.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference ci_logs unavailable")
    records = load_records(path)
    for ri in (1, 12):
        mis = find_mismatches(records[ri])
        assert mis, f"record {ri} no longer mismatches (corpus moved?)"
        for mm in mis:
            hit = explain(records[ri], mm, max_depth=1)
            assert hit, (ri, mm)

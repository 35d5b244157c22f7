"""Golden fidelity against the reference's own record corpora.

Every SplitStep in a reference measure record stores the extent of the
iterator it split, as computed by the reference's te::InferBound at search
time — an oracle for our bound inference without running TVM.
"""

import os

import pytest

from tests.conftest import CI_LOGS
from vae_extent_search_tpu.ir.steps import SplitStep, step_from_record
from vae_extent_search_tpu.records import load_records

pytestmark = pytest.mark.skipif(
    not os.path.isdir(CI_LOGS), reason="reference ci_logs unavailable"
)


def _check_file(name, min_accuracy, max_records=None):
    records = load_records(os.path.join(CI_LOGS, name))
    if max_records:
        records = records[:max_records]
    checked = ok = 0
    for rec in records:
        dag = rec.inp.task.compute_dag
        st = dag.init_state.copy()
        for srec in rec.inp.step_records:
            step = step_from_record(srec)
            if isinstance(step, SplitStep) and step.extent:
                it = st.stages[step.stage_id].iters[step.iter_id]
                got = it.range[1] if it.range else dag.infer_bound(
                    st
                ).stages[step.stage_id].iters[step.iter_id].range[1]
                checked += 1
                ok += int(got == step.extent)
            st.transform_steps.append(step)
            step.apply_to_state(st)
        dag.infer_bound(st)  # full replay must succeed
    assert checked > 0
    accuracy = ok / checked
    assert accuracy >= min_accuracy, f"{name}: {accuracy:.3f} ({ok}/{checked})"


def test_matmul_extents_exact():
    _check_file("matmul.json", 1.0)


def test_resnet50_llvm_extents_exact():
    _check_file("resnet-50-NHWC-B1-llvm.json", 1.0, max_records=10)


def test_resnet18_cuda_extents():
    # GPU shared-cache relaxation divergence documented in ir/bound.py
    _check_file("resnet-18-NHWC-B1-cuda.json", 0.90, max_records=10)

"""High-fidelity analytic runner (search/analytic_hf.py).

The base AnalyticRunner prices only coarse quantized schedule
properties, so generated pools carry large exact-cost plateaus that
bound any predictor's top-1 recall (docs/RECALL_FORENSIC.md). The
fidelity="high" variant prices the per-store feature matrices (the
reference's feature.cc quantities) through a smooth roofline, giving
distinct schedules distinct costs while staying deterministic.
"""

import os

import numpy as np
import pytest

from vae_extent_search_tpu.records import (
    SearchTask,
    load_records,
    make_record,
    make_workload_key,
    save_records,
)
from vae_extent_search_tpu.search.analytic_hf import (
    HFHardware,
    hf_cost_from_features,
    hf_costs_batch,
)
from vae_extent_search_tpu.search.measure import (
    AnalyticRunner,
    runner_from_spec,
)
from vae_extent_search_tpu.search.sketch import make_state_records, make_states

from tests.conftest import CI_LOGS

CONV = make_workload_key("conv2d_layer",
                         (1, 14, 14, 32, 32, 3, 3, [1, 1], [1, 1]))
TGT = "llvm -mcpu=skylake-avx512"


@pytest.fixture(scope="module")
def conv_pool():
    task = SearchTask(CONV, TGT)
    states = make_states(task, 400, evo_population=512, min_population=64,
                         seed=3)
    return task, states


def test_hf_breaks_cost_plateaus(conv_pool):
    """hf costs separate schedules the base runner collapses: far more
    distinct values and a far smaller exact-minimum plateau (the
    recall@1 ceiling) on the same pool."""
    task, states = conv_pool
    lo = AnalyticRunner().run(task, states)
    hi = AnalyticRunner(fidelity="high").run(task, states)
    cl = np.array([r.costs[0] for r in lo if r.error_no == 0])
    ch = np.array([r.costs[0] for r in hi if r.error_no == 0])
    assert len(ch) == len(cl) == len(states)
    assert np.all(np.isfinite(ch)) and np.all(ch > 0)
    assert len(set(ch.tolist())) >= 2 * len(set(cl.tolist()))
    plateau_lo = int((cl <= cl.min() * (1 + 1e-12)).sum())
    plateau_hi = int((ch <= ch.min() * (1 + 1e-12)).sum())
    assert plateau_hi <= max(2, plateau_lo // 8)


def test_hf_deterministic_and_seed_jitter(conv_pool):
    task, states = conv_pool
    a = AnalyticRunner(fidelity="high").run(task, states[:16])
    b = AnalyticRunner(fidelity="high").run(task, states[:16])
    assert [r.costs for r in a] == [r.costs for r in b]
    # noise jitters deterministically per (state, seed)
    c = AnalyticRunner(fidelity="high", noise=0.1, seed=1).run(
        task, states[:16])
    d = AnalyticRunner(fidelity="high", noise=0.1, seed=2).run(
        task, states[:16])
    assert [r.costs for r in c] != [r.costs for r in d]


def test_hf_record_path_matches_state_path(tmp_path):
    """run_record_lists (native batch featurizer + native print noise
    key) is bit-identical to the python State path under
    fidelity=high — same features, same jitter keys."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from scripts.measure_programs import remeasure_file

    task = SearchTask(CONV, TGT)
    recs = make_state_records(task, 40, evo_population=48,
                              min_population=16, seed=9)
    pool = str(tmp_path / "pool.json")
    save_records(pool, [make_record(task, r, costs=[0.0], timestamp=0)
                        for r in recs], mode="w")
    fast_out = str(tmp_path / "fast.json")
    slow_out = str(tmp_path / "slow.json")
    r_fast = AnalyticRunner(noise=0.1, seed=5, fidelity="high")
    assert remeasure_file(pool, fast_out, r_fast) == len(recs)
    r_slow = AnalyticRunner(noise=0.1, seed=5, fidelity="high")
    r_slow.run_record_lists = None  # force the python State path
    assert remeasure_file(pool, slow_out, r_slow) == len(recs)
    A = load_records(fast_out)
    B = load_records(slow_out)
    assert len(A) == len(B) == len(recs)
    for a, b in zip(A, B):
        assert a.res.costs == b.res.costs
        assert a.res.error_no == b.res.error_no


def test_hf_gpu_branch_on_reference_corpus():
    """The GPU pricing branch runs on the reference's cuda records and
    produces finite, mostly-distinct costs (thread/block features
    exercised)."""
    recs = load_records(os.path.join(CI_LOGS, "resnet-18-NHWC-B1-cuda.json"))
    runner = AnalyticRunner(fidelity="high")
    ok = []
    for rec in recs:  # one record per task in this log
        task = rec.inp.task
        out = runner.run_record_lists(task, [rec.inp.step_records])
        if out is None:  # native engine unavailable: python path
            out = runner.run(
                task, [task.compute_dag.apply_steps(rec.inp.step_records)])
        ok.extend(r.costs[0] for r in out if r.error_no == 0)
    assert len(ok) >= len(recs) - 2
    assert all(np.isfinite(c) and c > 0 for c in ok)
    assert len(set(ok)) == len(ok)  # distinct tasks -> distinct costs


def test_hf_error_conventions():
    # all-zero row = unlowerable-state convention -> +inf
    assert hf_cost_from_features(np.zeros((1, 164), np.float32)) == float(
        "inf")
    assert hf_cost_from_features(np.zeros((0, 164), np.float32)) == float(
        "inf")
    batch = hf_costs_batch([None, np.zeros((1, 164), np.float32)])
    assert batch == [float("inf")] * 2


def test_hf_overlap_breaks_roofline_ties(conv_pool):
    """overlap > 0 (imperfect compute/memory overlap) separates
    schedules that tie under a hard max() roofline."""
    task, states = conv_pool
    from vae_extent_search_tpu.features.per_store import (
        get_per_store_features_from_states,
    )

    feats = [f for f in get_per_store_features_from_states(states, task)
             if f is not None]
    hard = [hf_cost_from_features(f, HFHardware(overlap=0.0)) for f in feats]
    soft = [hf_cost_from_features(f, HFHardware(overlap=0.1)) for f in feats]
    assert len(set(soft)) > len(set(hard))


def test_runner_from_spec_hf():
    r = runner_from_spec("analytic_hf", noise=0.05, seed=3)
    assert isinstance(r, AnalyticRunner)
    assert r.fidelity == "high" and r.noise == 0.05
    with pytest.raises(ValueError):
        AnalyticRunner(fidelity="medium")

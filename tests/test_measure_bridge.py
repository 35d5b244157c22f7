"""CommandRunner external-measurement bridge, driven end to end.

The reference's LocalRunner/RPCRunner (measure.py:375-611) execute
candidate kernels out of process and map failures/timeouts to
error_no-carrying MeasureResults. The TPU framework's bridge is
CommandRunner + an external timer command; these tests drive it with
tools/toy_timer.py (an analytic-cost "hardware") through
ProgramMeasurer, including the error-line and timeout paths."""

import os
import sys

import numpy as np

from vae_extent_search_tpu.records import SearchTask, load_records
from vae_extent_search_tpu.records.workload import make_workload_key
from vae_extent_search_tpu.search.measure import (
    ERROR_NO_ERROR,
    ERROR_RUNTIME_DEVICE,
    AnalyticRunner,
    CommandRunner,
    EmptyBuilder,
    ProgramMeasurer,
    RecordToFile,
)
from vae_extent_search_tpu.search.sketch import make_states

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TIMER = f"{sys.executable} {os.path.join(REPO, 'tools', 'toy_timer.py')}"


def _task_and_states(n=8):
    wk = make_workload_key(
        "matmul_add", (64, 64, 64, "float32"))
    task = SearchTask(wk, "llvm")
    return task, make_states(task, n, seed=5)


def test_command_runner_round_trip(tmp_path):
    """Happy path: external timer costs come back in order and match the
    analytic simulator it wraps; records land in the log with
    error_no=0."""
    task, states = _task_and_states()
    log = str(tmp_path / "rec.json")
    measurer = ProgramMeasurer(
        EmptyBuilder(), CommandRunner(TIMER, timeout=120),
        callbacks=[RecordToFile(log)])
    results = measurer.measure(task, states)
    assert all(r.error_no == ERROR_NO_ERROR for r in results)
    ref = AnalyticRunner(noise=0.2).run(task, states)
    got = np.array([r.costs[0] for r in results])
    want = np.array([r.costs[0] for r in ref])
    assert np.allclose(got, want, rtol=1e-6)
    recs = load_records(log)
    assert len(recs) == len(states)
    assert all(r.res.error_no == ERROR_NO_ERROR for r in recs)
    # best-tracking saw the real costs
    assert measurer.best_cost[task.workload_key] == got.min()


def test_command_runner_error_lines(tmp_path, monkeypatch):
    """Lines the timer marks "error" become ERROR_RUNTIME_DEVICE results
    with MAX_FLOAT cost; good lines still parse."""
    monkeypatch.setenv("TOY_TIMER_FAIL_EVERY", "3")
    task, states = _task_and_states(6)
    results = CommandRunner(TIMER, timeout=120).run(task, states)
    errs = [i for i, r in enumerate(results)
            if r.error_no == ERROR_RUNTIME_DEVICE]
    assert errs == [2, 5]
    assert all(results[i].error_no == ERROR_NO_ERROR
               for i in range(6) if i not in errs)


def test_command_runner_timeout(monkeypatch):
    """A hung timer maps the whole batch to error results instead of
    blocking the search (reference timeout semantics)."""
    monkeypatch.setenv("TOY_TIMER_SLEEP", "30")
    task, states = _task_and_states(2)
    results = CommandRunner(TIMER, timeout=3).run(task, states)
    assert all(r.error_no == ERROR_RUNTIME_DEVICE for r in results)


def test_tune_vae_loop_with_command_runner(tmp_path):
    """End to end inside the online tuning loop: tune_vae's phase loop
    measuring through the external bridge produces a valid record log
    and a finite best cost."""
    sys.path.insert(0, REPO)
    from scripts.vae_experiments.tune_vae import run_tuning

    log = str(tmp_path / "tune.json")
    best, wall = run_tuning(
        _task_and_states(1)[0], n_candidates=48, measure_size=8,
        n_phases=2, vae_epochs=10, reg_epochs=15,
        runner=CommandRunner(TIMER, timeout=120),
        log_file=log, select="model", verbose=False)
    assert best is not None and np.isfinite(best)
    recs = load_records(log)
    assert len(recs) >= 16
    assert min(r.res.costs[0] for r in recs
               if r.res.error_no == ERROR_NO_ERROR) <= best * 1.0001


def test_measure_service_tracker_topology(tmp_path):
    """The tracker/server measurement service (measure_service.py;
    reference RPCRunner + tvm.rpc topology, measure.py:434-611): two
    servers register under one key, a ServiceRunner round-robins
    batches across them through the tracker, costs equal the backend
    simulator's, and records land via ProgramMeasurer callbacks."""
    from vae_extent_search_tpu.search.measure_service import (
        MeasureServer,
        MeasureTracker,
        ServiceRunner,
    )

    task, states = _task_and_states(8)
    tracker = MeasureTracker()
    s1 = MeasureServer(AnalyticRunner(noise=0.2), key="v5e",
                       tracker_addr=tracker.addr)
    s2 = MeasureServer(AnalyticRunner(noise=0.2), key="v5e",
                       tracker_addr=tracker.addr)
    try:
        runner = ServiceRunner("v5e", *tracker.addr, timeout=60)
        log = str(tmp_path / "svc.json")
        measurer = ProgramMeasurer(EmptyBuilder(), runner,
                                   callbacks=[RecordToFile(log)])
        r1 = measurer.measure(task, states[:4])
        r2 = measurer.measure(task, states[4:])
        results = r1 + r2
        assert all(r.error_no == ERROR_NO_ERROR for r in results)
        ref = AnalyticRunner(noise=0.2).run(task, states)
        got = np.array([r.costs[0] for r in results])
        want = np.array([r.costs[0] for r in ref])
        assert np.allclose(got, want, rtol=1e-6)
        assert len(load_records(log)) == 8
    finally:
        s1.close()
        s2.close()
        tracker.close()


def test_measure_service_failover_and_unknown_key():
    """A dead server is evicted and the batch retries on the live one;
    a key with no servers degrades to error results, not exceptions."""
    from vae_extent_search_tpu.search.measure_service import (
        MeasureServer,
        MeasureTracker,
        ServiceRunner,
    )

    task, states = _task_and_states(3)
    tracker = MeasureTracker()
    dead = MeasureServer(AnalyticRunner(), key="v5e",
                         tracker_addr=tracker.addr)
    dead.close()  # registered but gone
    live = MeasureServer(AnalyticRunner(noise=0.2), key="v5e",
                         tracker_addr=tracker.addr)
    try:
        runner = ServiceRunner("v5e", *tracker.addr, timeout=10)
        # run twice: whichever round-robin slot hits the dead server
        # must fail over to the live one within the same call
        for _ in range(2):
            results = runner.run(task, states)
            assert all(r.error_no == ERROR_NO_ERROR for r in results)

        nobody = ServiceRunner("tpu-v9", *tracker.addr, timeout=5)
        results = nobody.run(task, states)
        assert all(r.error_no == ERROR_RUNTIME_DEVICE for r in results)
    finally:
        live.close()
        tracker.close()


def test_local_service_measure_context():
    """LocalServiceMeasureContext mirrors LocalRPCMeasureContext: one
    line spawns tracker+server and hands back a pluggable runner."""
    from vae_extent_search_tpu.search.measure_service import (
        LocalServiceMeasureContext,
    )

    task, states = _task_and_states(4)
    with LocalServiceMeasureContext() as ctx:
        results = ctx.runner.run(task, states)
    assert all(r.error_no == ERROR_NO_ERROR for r in results)
    assert all(np.isfinite(r.costs[0]) for r in results)


def test_flop_repeat_count_reference_thresholds():
    """The FLOP-dependent timing-repeat policy matches the reference's
    exact thresholds (measure_programs.py:107-120)."""
    from vae_extent_search_tpu.search.measure import flop_repeat_count

    assert flop_repeat_count(2416443392.0) == 4
    assert flop_repeat_count(1e12) == 4
    assert flop_repeat_count(834928640.0) == 6
    assert flop_repeat_count(2416443391.0) == 6
    assert flop_repeat_count(2097152.0) == 10
    assert flop_repeat_count(1.0) == 10
    assert flop_repeat_count(2097153.0) == 8
    assert flop_repeat_count(834928639.0) == 8


def test_analytic_runner_emits_repeat_costs():
    """AnalyticRunner(repeat=R) emits R cost entries per record; repeat 0
    equals the single-repeat cost (so means stay comparable) and later
    repeats only differ under noise."""
    task, states = _task_and_states(4)
    one = AnalyticRunner(noise=0.2).run(task, states)
    ten = AnalyticRunner(noise=0.2, repeat=10).run(task, states)
    for a, b in zip(one, ten):
        assert len(b.costs) == 10
        assert b.costs[0] == a.costs[0]
        assert len(set(b.costs)) > 1  # noise spreads the repeats
    # noise=0 stays fully deterministic across repeats
    det = AnalyticRunner(repeat=4).run(task, states)
    for r in det:
        assert len(set(r.costs)) == 1


def test_command_runner_repeat_contract(tmp_path):
    """CommandRunner(repeat=R) appends R to the timer argv and parses
    comma-separated multi-repeat cost lines; records written through
    ProgramMeasurer carry all R costs."""
    task, states = _task_and_states(5)
    log = str(tmp_path / "rep.json")
    measurer = ProgramMeasurer(
        EmptyBuilder(), CommandRunner(TIMER, timeout=120, repeat=6),
        callbacks=[RecordToFile(log)])
    results = measurer.measure(task, states)
    assert all(r.error_no == ERROR_NO_ERROR for r in results)
    assert all(len(r.costs) == 6 for r in results)
    recs = load_records(log)
    assert all(len(r.res.costs) == 6 for r in recs)
    # repeat-0 equals the single-repeat timing (same analytic base)
    ref = CommandRunner(TIMER, timeout=120).run(task, states)
    for a, b in zip(ref, results):
        assert abs(a.costs[0] - b.costs[0]) <= 1e-9 * max(a.costs[0], 1e-30)


def test_measure_programs_flop_dependent_repeats(tmp_path):
    """scripts/measure_programs.remeasure_file applies the reference's
    FLOP-repeat policy to its runner: a small matmul task (flop_ct
    2*64^3 = 524288 <= 2097152) gets 10 costs per emitted record
    (reference measure_programs.py:107-120), and --no-flop-repeats
    restores single-cost records."""
    sys.path.insert(0, REPO)
    from scripts.measure_programs import remeasure_file
    from vae_extent_search_tpu.records import make_record, save_records
    from vae_extent_search_tpu.search.measure import flop_repeat_count

    task, states = _task_and_states(6)
    assert flop_repeat_count(task.compute_dag.flop_ct) == 10
    in_file = str(tmp_path / "to_measure.json")
    save_records(in_file, [
        make_record(task, st.transform_steps, [0.0], 0, 0.0, 0.0)
        for st in states], mode="w")

    out_file = str(tmp_path / "measured.json")
    n = remeasure_file(in_file, out_file, AnalyticRunner(noise=0.2))
    recs = load_records(out_file)
    assert n == 6 and len(recs) == 6
    assert all(len(r.res.costs) == 10 for r in recs
               if r.res.error_no == ERROR_NO_ERROR)

    out2 = str(tmp_path / "measured_single.json")
    remeasure_file(in_file, out2, AnalyticRunner(noise=0.2),
                   flop_repeats=False)
    recs2 = load_records(out2)
    assert all(len(r.res.costs) == 1 for r in recs2
               if r.res.error_no == ERROR_NO_ERROR)
    # repeat-0 cost matches the single-cost run bit-exactly
    for a, b in zip(recs2, recs):
        assert a.res.costs[0] == b.res.costs[0]

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

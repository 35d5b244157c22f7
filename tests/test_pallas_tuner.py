"""Self-tuning path: Pallas matmul kernel, state->config mapping, runner,
online active loop (scripts/tune_pallas_kernel.py components)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae_extent_search_tpu.ops.matmul_pallas import (
    config_is_valid,
    make_matmul,
    matmul_vmem_bytes,
    predicted_seconds,
    snap_config_to_hw,
)
from vae_extent_search_tpu.records import SearchTask, make_workload_key
from vae_extent_search_tpu.records.serde import (
    ERROR_BUILD_TIMEOUT,
    ERROR_INSTANTIATION,
    ERROR_NO_ERROR,
)
from vae_extent_search_tpu.search.measure import (
    EmptyBuilder,
    ProgramMeasurer,
    runner_from_spec,
)
from vae_extent_search_tpu.search.pallas_tuner import (
    PallasMatmulRunner,
    state_loops,
    state_to_matmul_config,
)
from vae_extent_search_tpu.search.sketch import make_states


def _task(M=64, N=64, K=64):
    return SearchTask(
        make_workload_key("matmul_auto_scheduler_test", (M, N, K)), "llvm")


# ---------------------------------------------------------------------------
# kernel numerics (interpret mode; the chip path is the same code)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cfg", [(128, 128, 128), (64, 256, 32),
                                 (256, 256, 256), (8, 128, 64)])
def test_matmul_kernel_interpret_exact(cfg):
    M = N = K = 256
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((M, K), np.float32))
    b = jnp.asarray(rng.standard_normal((K, N), np.float32))
    mm = make_matmul(M, N, K, *cfg, dtype_name="float32", interpret=True)
    got = mm(a, b)
    want = a @ b
    assert float(jnp.max(jnp.abs(got - want))) < 1e-4


def test_matmul_kernel_bf16_inputs_f32_accum():
    M = N = K = 128
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((M, K), np.float32))
    b = jnp.asarray(rng.standard_normal((K, N), np.float32))
    mm = make_matmul(M, N, K, 64, 64, 64, dtype_name="bfloat16",
                     interpret=True)
    got = mm(a, b)
    want = jnp.dot(a.astype(jnp.bfloat16).astype(jnp.float32),
                   b.astype(jnp.bfloat16).astype(jnp.float32))
    rel = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
    assert got.dtype == jnp.float32
    assert rel < 1e-5  # same bf16 products, f32 accumulation


def test_config_validity():
    ok, _ = config_is_valid(256, 256, 256, 128, 128, 128)
    assert ok
    ok, why = config_is_valid(256, 256, 256, 100, 128, 64)
    assert not ok and "divide" in why
    ok, why = config_is_valid(256, 256, 256, 0, 128, 64)
    assert not ok
    # VMEM blow-up: full-K panels at bf16
    big = matmul_vmem_bytes(4096, 4096, 4096, 2)
    ok, why = config_is_valid(4096, 4096, 4096, 4096, 4096, 4096)
    assert not ok and "VMEM" in why and big > 12 * 2**20
    # predicted_seconds grows with grid overhead for tiny blocks
    assert (predicted_seconds(1536, 1536, 1536, 2, 1, 3)
            > predicted_seconds(1536, 1536, 1536, 256, 128, 128) * 100)


def test_snap_config_to_hw():
    # bm -> sublane multiple (16 for bf16), bn/bk -> 128-lane multiples,
    # all divisors of the axis; full dim always legal
    assert snap_config_to_hw(1536, 1536, 1536, 64, 96, 4) == (64, 128, 128)
    assert snap_config_to_hw(1536, 1536, 1536, 2, 1, 3) == (16, 128, 128)
    assert snap_config_to_hw(1536, 1536, 1536, 24, 200, 400) == \
        (32, 256, 512)
    # already legal: unchanged
    assert snap_config_to_hw(1536, 1536, 1536, 128, 384, 768) == \
        (128, 384, 768)
    # axis smaller than the alignment: snaps to the full dim
    assert snap_config_to_hw(64, 64, 64, 3, 3, 3) == (16, 64, 64)
    # f32 sublane is 8
    import jax.numpy as jnp

    assert snap_config_to_hw(1536, 1536, 1536, 3, 1, 1,
                             dtype=jnp.float32)[0] == 8


# ---------------------------------------------------------------------------
# state -> config mapping
# ---------------------------------------------------------------------------

def test_state_to_config_canonical_tiling():
    from vae_extent_search_tpu.ir.schedule_api import (
        state_reorder,
        state_split,
    )

    task = _task(256, 256, 256)
    st = task.compute_dag.init_state.copy()
    cid = next(i for i, s in enumerate(st.stages) if s.op.name == "C")
    i_it, j_it, k_it = st.stages[cid].iters
    i0, i1, i2 = state_split(st, cid, i_it, [4, 8])
    j0, j1, j2 = state_split(st, cid, j_it, [2, 16])
    k0, k1 = state_split(st, cid, k_it, [32])
    state_reorder(st, cid, [i0, j0, k0, i1, j1, k1, i2, j2])
    # expected: grid loops = everything outside k0; block = inside
    exts = {it.name: it.range[1] for it in st.stages[cid].iters}
    cfg, why = state_to_matmul_config(st)
    assert why is None
    assert cfg == (exts["i.1"] * exts["i.2"],
                   exts["j.1"] * exts["j.2"],
                   exts["k.1"])


def test_state_to_config_unsplit_reduction():
    task = _task(64, 64, 64)
    st = task.compute_dag.init_state.copy()
    cfg, why = state_to_matmul_config(st)
    # plain i, j, k nest: the whole reduction is inside the block
    assert cfg == (1, 1, 64) and why is None


def test_state_to_config_pool_divisibility():
    task = _task(1536, 1536, 1536)
    states = make_states(task, 80, seed=11)
    assert len(states) > 20
    n_valid = 0
    for st in states:
        cfg, why = state_to_matmul_config(st)
        assert cfg is not None, why
        bm, bn, bk = cfg
        assert 1536 % bm == 0 and 1536 % bn == 0 and 1536 % bk == 0, (
            cfg, st.to_str())
        n_valid += config_is_valid(1536, 1536, 1536, bm, bn, bk)[0]
    assert n_valid > len(states) * 0.8


def test_state_loops_depth_tracks_print_nesting():
    task = _task(1536, 1536, 1536)
    st = make_states(task, 10, seed=3)[0]
    loops = state_loops(st)
    # depth increases by exactly 1 per enclosing loop along any DFS path
    for (_, _, d0), (_, _, d1) in zip(loops, loops[1:]):
        assert d1 <= d0 + 1


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------

def _fake_time(M, N, K, bm, bn, bk):
    return predicted_seconds(M, N, K, bm, bn, bk)


def test_runner_caches_per_config_and_spec():
    task = _task(1536, 1536, 1536)
    states = make_states(task, 30, seed=7)
    r = PallasMatmulRunner(time_fn=_fake_time)
    m = ProgramMeasurer(EmptyBuilder(), r, max_continuous_error=10**9)
    res = m.measure(task, states)
    assert len(res) == len(states)
    assert any(x.error_no == ERROR_NO_ERROR for x in res)
    timed = r.n_timed
    res2 = r.run(task, states)
    assert r.n_timed == timed  # fully cached
    assert [x.costs[0] for x in res2] == [
        r.cache[(1536, 1536, 1536) + snap_config_to_hw(
            1536, 1536, 1536, *state_to_matmul_config(s)[0])].costs[0]
        for s in states]
    assert isinstance(runner_from_spec("pallas_matmul"), PallasMatmulRunner)
    assert runner_from_spec("pallas_matmul:float32").dtype == "float32"


def test_runner_rejects_invalid_and_slow_configs():
    from vae_extent_search_tpu.ir.schedule_api import (
        state_reorder,
        state_split,
    )

    task = _task(4096, 4096, 4096)
    # VMEM-invalid: whole matrices inside the block (reduce split [4096]
    # leaves k.0 extent 1 -> grid (1,1,1), block (4096, 4096, 4096))
    st = task.compute_dag.init_state.copy()
    cid = next(i for i, s in enumerate(st.stages) if s.op.name == "C")
    i_it, j_it, k_it = st.stages[cid].iters
    k0, k1 = state_split(st, cid, k_it, [4096])
    state_reorder(st, cid, [k0, i_it, j_it, k1])
    cfg, _ = state_to_matmul_config(st)
    assert cfg == (4096, 4096, 4096)
    r = PallasMatmulRunner(time_fn=_fake_time)
    res = r.run(task, [st])
    assert res[0].error_no == ERROR_INSTANTIATION

    # too-slow config (tiny blocks -> enormous grid) on the REAL timing
    # path is rejected by the prediction guard before any compile:
    # split k so bk snaps small -> (16, 128, 128) at 8192^3 is a
    # 2.1M-step grid (predicted ~3 s/call)
    task2 = _task(8192, 8192, 8192)
    st2 = task2.compute_dag.init_state.copy()
    cid2 = next(i for i, s in enumerate(st2.stages) if s.op.name == "C")
    state_split(st2, cid2, st2.stages[cid2].iters[2], [128])
    cfg2, _ = state_to_matmul_config(st2)
    assert cfg2 == (1, 1, 128)
    r2 = PallasMatmulRunner(max_seconds=0.5)  # real path, no time_fn
    res2 = r2.run(task2, [st2])
    assert res2[0].error_no == ERROR_BUILD_TIMEOUT


# ---------------------------------------------------------------------------
# online active loop
# ---------------------------------------------------------------------------

def test_online_active_search_measures_progressively():
    from vae_extent_search_tpu.search.active_loop import (
        SelectionConfig,
        run_active_search_online,
    )

    rng = np.random.default_rng(0)
    N, D = 400, 12
    X = rng.integers(1, 64, size=(N, D)).astype(np.float32)
    w = rng.standard_normal(D)
    truth = X @ w / 10.0
    calls = []

    def measure_fn(idxs):
        calls.append(list(idxs))
        return truth[np.asarray(idxs)].astype(np.float32)

    res = run_active_search_online(
        X, measure_fn, measure_size=16, max_phases=3,
        vae_epochs=30, reg_epochs=40,
        selection=SelectionConfig(num_select=16),
        verbose=False,
    )
    assert res.n_measured == sum(len(c) for c in calls)
    assert len(set(res.selected_order)) == len(res.selected_order)
    assert res.best_index in res.selected_order
    assert res.best_label == pytest.approx(truth[res.best_index])
    # best-so-far is monotone
    assert all(b1 >= b0 - 1e-9
               for b0, b1 in zip(res.best_history, res.best_history[1:]))

    res_r = run_active_search_online(
        X, measure_fn, measure_size=16, max_phases=3, select="random")
    assert res_r.n_measured == 64


# ---------------------------------------------------------------------------
# composite runner + kernel-suite TaskScheduler flow
# ---------------------------------------------------------------------------

def test_composite_runner_dispatches_per_family():
    from vae_extent_search_tpu.ops.conv2d_pallas import (
        predicted_conv_seconds,
    )
    from vae_extent_search_tpu.search.pallas_tuner import PallasKernelRunner

    r = PallasKernelRunner(matmul_time_fn=_fake_time,
                           conv_time_fn=predicted_conv_seconds)
    mm_task = _task(256, 256, 256)
    conv_task = SearchTask(
        make_workload_key(
            "conv2d_layer", (1, 8, 8, 128, 128, 3, 3, [1, 1], [1, 1])),
        "llvm")
    res = r.run(mm_task, make_states(mm_task, 8, seed=1))
    assert any(x.error_no == ERROR_NO_ERROR for x in res)
    assert r.matmul.n_timed > 0 and r.conv.n_timed == 0
    res = r.run(conv_task, make_states(conv_task, 8, seed=1))
    assert any(x.error_no == ERROR_NO_ERROR for x in res)
    assert r.conv.n_timed > 0
    assert r.n_timed == r.matmul.n_timed + r.conv.n_timed

    bad = SearchTask(make_workload_key("max_pool2d_layer", (1, 8, 8, 8, 2)),
                     "llvm")
    with pytest.raises(ValueError, match="no Pallas kernel family"):
        r.run(bad, [])

    assert runner_from_spec("pallas").matmul.dtype == "bfloat16"
    assert runner_from_spec("pallas:float32").conv.dtype == "float32"


def test_kernel_suite_scheduler_tunes_mixed_families(tmp_path):
    """The gradient TaskScheduler allocates trials across a mixed Pallas
    kernel suite through the composite runner, and the resulting log is a
    dispatchable kernel library (scripts/tune_kernel_suite.py flow;
    reference task_scheduler.py:418-474 + dispatcher.py:149-308)."""
    from vae_extent_search_tpu.ops.conv2d_pallas import (
        predicted_conv_seconds,
    )
    from vae_extent_search_tpu.ops.kernel_library import PallasKernelLibrary
    from vae_extent_search_tpu.records.task import TuningOptions
    from vae_extent_search_tpu.search.measure import RecordToFile
    from vae_extent_search_tpu.search.pallas_tuner import PallasKernelRunner
    from vae_extent_search_tpu.search.task_scheduler import TaskScheduler

    mm_wk = make_workload_key("matmul_auto_scheduler_test", (256, 256, 256))
    conv_wk = make_workload_key(
        "conv2d_layer", (1, 8, 8, 128, 128, 3, 3, [1, 1], [1, 1]))
    donor = [SearchTask(mm_wk, "llvm"), SearchTask(conv_wk, "llvm")]
    record = [SearchTask(mm_wk, "tpu -model=bfloat16"),
              SearchTask(conv_wk, "tpu -model=bfloat16")]

    runner = PallasKernelRunner(matmul_time_fn=_fake_time,
                                conv_time_fn=predicted_conv_seconds)
    log = str(tmp_path / "suite.json")
    opts = TuningOptions(num_measure_trials=16, num_measures_per_round=4,
                         builder=EmptyBuilder(), runner=runner,
                         measure_callbacks=[RecordToFile(log)])
    sched = TaskScheduler(record, [1.0, 2.0], strategy="gradient",
                          callbacks=[], seed=0)
    from vae_extent_search_tpu.search.sketch import SketchPolicy

    sched.tune(opts, policies=[SketchPolicy(t, seed=i)
                               for i, t in enumerate(donor)])
    assert sched.ct >= 16
    assert all(c > 0 for c in sched.task_cts)  # warm-up touched both

    lib = PallasKernelLibrary.from_file(log)
    assert len(lib) == 2
    for t in record:
        rec = lib.query(t.workload_key, dtype="bfloat16")
        assert rec is not None
        assert rec.res.mean_cost < 1e9


# ---------------------------------------------------------------------------
# self-tuning families: the framework's own kernels (VERDICT r3 item 4)
# ---------------------------------------------------------------------------

def _fh_task(N=4096, D=24, H=256, L=64, T=10, target="llvm"):
    return SearchTask(
        make_workload_key("fused_head_layer", (N, D, H, L, T)), target)


def _gh_task(R=120000, F=164, c=(98, 6, 8, 12), target="llvm"):
    return SearchTask(
        make_workload_key("gbdt_hist_layer", (R, F) + tuple(c)), target)


def test_state_to_fusedhead_config_manual():
    """Hand-tiled MC nest: candidate (i) tiles inside the outermost
    reduction multiply into block, MC (t) tiles into mc_chunk; the A1
    stage's identically-named k loop must not hijack the cut."""
    from vae_extent_search_tpu.ir.schedule_api import (
        state_reorder,
        state_split,
    )
    from vae_extent_search_tpu.search.pallas_tuner import (
        state_to_fusedhead_config,
    )

    task = _fh_task(4096, 24, 256, 64, 10)
    st = task.compute_dag.init_state.copy()
    sid = next(i for i, s in enumerate(st.stages) if s.op.name == "MC")
    t_it, i_it, k_it = st.stages[sid].iters
    t0, t1 = state_split(st, sid, t_it, [2])
    i0, i1, i2 = state_split(st, sid, i_it, [4, 512])
    k0, k1 = state_split(st, sid, k_it, [16])
    state_reorder(st, sid, [t0, i0, k0, t1, i1, k1, i2])
    cfg, why = state_to_fusedhead_config(st)
    assert why is None
    assert cfg == (4 * 512, 2)


def test_state_to_fusedhead_config_ga_pool():
    from vae_extent_search_tpu.search.pallas_tuner import (
        state_to_fusedhead_config,
    )

    task = _fh_task()
    states = make_states(task, 32, evo_population=64, min_population=16,
                         seed=5)
    cfgs = set()
    for st in states:
        cfg, why = state_to_fusedhead_config(st)
        assert cfg is not None, (why, st.to_str())
        cfgs.add(cfg)
    assert len(cfgs) >= 4  # the GA explores distinct (block, tc) points


def test_snap_fused_config_lattice():
    from vae_extent_search_tpu.ops.fused_head_pallas import (
        snap_fused_config,
    )

    # lane alignment + clamping
    assert snap_fused_config(262144, 24, 256, 64, 10, 1000, 3) == (896, 3)
    assert snap_fused_config(262144, 24, 256, 64, 10, 7, 99) == (128, 10)
    # VMEM cols cap: tc*block bounded by the stacked-activation budget
    blk, tc = snap_fused_config(262144, 24, 256, 64, 10, 4096, 10)
    assert blk == 4096 and tc == 10240 // 4096
    # small-N cap: block never exceeds the padded candidate count
    assert snap_fused_config(300, 24, 256, 64, 10, 4096, 1)[0] == 384


def test_state_to_hist_ladder_pool():
    from vae_extent_search_tpu.search.pallas_tuner import (
        state_to_hist_ladder,
    )

    task = _gh_task()
    states = make_states(task, 32, evo_population=64, min_population=16,
                         seed=5)
    ladders = set()
    for st in states:
        cfg, why = state_to_hist_ladder(st)
        assert cfg is not None, (why, st.to_str())
        assert all(2 <= w <= 128 and (w & (w - 1)) == 0 for w in cfg), cfg
        assert tuple(sorted(set(cfg))) == cfg
        ladders.add(cfg)
    assert len(ladders) >= 3  # flat + several window mixes


def test_state_to_hist_ladder_unsplit_is_flat():
    from vae_extent_search_tpu.search.pallas_tuner import (
        state_to_hist_ladder,
    )

    task = _gh_task()
    st = task.compute_dag.init_state.copy()
    cfg, why = state_to_hist_ladder(st)
    assert cfg == () and why is None


def test_fusedhead_runner_fake_timer_caches():
    from vae_extent_search_tpu.search.pallas_tuner import (
        PallasFusedHeadRunner,
        predicted_fusedhead_seconds,
    )

    r = PallasFusedHeadRunner(time_fn=predicted_fusedhead_seconds)
    task = _fh_task(4096, 24, 256, 64, 10, target="tpu -model=bfloat16")
    states = make_states(_fh_task(), 16, evo_population=64,
                         min_population=16, seed=3)
    res = r.run(task, states)
    assert len(res) == len(states)
    ok = [x for x in res if x.error_no == ERROR_NO_ERROR]
    assert ok and r.n_timed == len(r.cache)
    # distinct states collapsing onto one snapped config share a cost
    res2 = r.run(task, states)
    assert [x.costs for x in res2] == [x.costs for x in res]
    assert r.n_timed == len(r.cache)  # all cache hits on replay


def test_boosthist_runner_fake_timer_prefers_census_ladder():
    """With the analytic surrogate, a census-covering ladder must beat
    flat (fewer effective one-hot lanes) at 1M rows."""
    from vae_extent_search_tpu.search.pallas_tuner import (
        BoostHistRunner,
        predicted_hist_seconds,
    )

    r = BoostHistRunner(time_fn=predicted_hist_seconds)
    flat = r._time_config((1_000_000, 164, 98, 6, 8, 12), ())
    ladd = r._time_config((1_000_000, 164, 98, 6, 8, 12), (2, 16, 64, 128))
    assert ladd < flat


def test_selftune_library_dispatch_roundtrip(tmp_path, monkeypatch):
    """Tuned records for the framework's own kernels persist through the
    standard record log and dispatch into their consumers: the fused
    selection head reads (block, mc_chunk) from the library, the device
    GBDT reads its tier ladder through _plan_tiers_env."""
    from vae_extent_search_tpu.ops import kernel_library as kl
    from vae_extent_search_tpu.ops.kernel_library import (
        PallasKernelLibrary,
        tuned_fused_head_config,
        tuned_hist_ladder,
    )
    from vae_extent_search_tpu.search.measure import RecordToFile
    from vae_extent_search_tpu.search.pallas_tuner import (
        BoostHistRunner,
        PallasFusedHeadRunner,
        predicted_fusedhead_seconds,
        predicted_hist_seconds,
    )

    log = str(tmp_path / "selftune.json")
    fh_rec = _fh_task(4096, 24, 256, 64, 10, target="tpu -model=bfloat16")
    gh_rec = _gh_task(target="tpu -model=bfloat16")
    measurer = ProgramMeasurer(
        EmptyBuilder(),
        PallasFusedHeadRunner(time_fn=predicted_fusedhead_seconds),
        callbacks=[RecordToFile(log)], max_continuous_error=10 ** 9)
    measurer.measure(fh_rec, make_states(_fh_task(), 24, evo_population=64,
                                         min_population=16, seed=3))
    measurer = ProgramMeasurer(
        EmptyBuilder(), BoostHistRunner(time_fn=predicted_hist_seconds),
        callbacks=[RecordToFile(log)], max_continuous_error=10 ** 9)
    measurer.measure(gh_rec, make_states(_gh_task(), 24, evo_population=64,
                                         min_population=16, seed=3))

    lib = PallasKernelLibrary.from_file(log)
    fh_cfg = lib.fused_head_config(4096, 24, 256, 64, 10)
    assert fh_cfg is not None and fh_cfg[0] % 128 == 0 and fh_cfg[1] >= 1
    ladder = lib.hist_ladder(120000, 164, 98, 6, 8, 12)
    assert ladder is not None

    # process-default library -> boost_tpu tier planning
    monkeypatch.setenv(kl.LIBRARY_ENV, log)
    monkeypatch.delenv("VES_BOOST_TIER", raising=False)
    assert tuned_fused_head_config(4096, 24, 256, 64, 10) == fh_cfg
    assert tuned_hist_ladder(120000, 164, 98, 6, 8, 12) == ladder

    import numpy as np

    from vae_extent_search_tpu.models.boost_tpu import _plan_tiers_env

    # n_edges convention: nbins = ne + 1 (plan_tiers_multi)
    ne = np.array([1] * 98 + [11] * 6 + [49] * 8 + [99] * 12 + [255] * 40)
    plan, idx_big = _plan_tiers_env(ne, 120000)
    assert tuple(sw for sw, _ in plan) == tuple(
        w for w in ladder if w in {sw for sw, _ in plan}) or ladder == ()
    # nearest-shape dispatch (round 5): a nearby row count still
    # matches the tuned record (row counts are not divisibility-
    # compatible quantities — ops/kernel_library.py::query_nearest)...
    plan_near, _ = _plan_tiers_env(ne, 120001)
    assert [sw for sw, _ in plan_near] == [sw for sw, _ in plan]
    # ...while a shape beyond the log-ratio cap keeps the hand default
    ne_far = np.array([1] * 2 + [255] * 3)
    plan_def, _ = _plan_tiers_env(ne_far, 50)
    assert [sw for sw, _ in plan_def] == [
        sw for sw, _ in _plan_tiers_env(ne_far, 0)[0]]


def test_fused_head_mc_chunk_invariant_interpret():
    """mc_chunk only re-chunks the stacked MC pass; with injected
    dropout bits the outputs are bit-identical across (block, mc_chunk)
    schedules — the tuner can explore them without changing search
    results."""
    import jax

    from vae_extent_search_tpu.models import init_predictor_params
    from vae_extent_search_tpu.ops.fused_head_pallas import fused_head_stats

    key = jax.random.PRNGKey(0)
    N, D, H, L, T = 512, 24, 256, 64, 4
    params = init_predictor_params(key, D, hidden_dim=H, latent_dim=L)
    X = jax.random.normal(key, (N, D), jnp.float32)
    bits = jax.random.bits(jax.random.fold_in(key, 1), (T, N, H),
                           jnp.uint32)
    outs = []
    for block, tc in ((1024, None), (256, 2), (128, 1)):
        o = fused_head_stats(
            params["cost_predictor"], X, jnp.int32(7), T=T, block=block,
            interpret=True, mask_bits=bits,
            encoder=(params["encoder"], params["fc_mu"]),
            mu_layout="none", mc_chunk=tc)
        outs.append([np.asarray(x) for x in o[1:]])
    for other in outs[1:]:
        for a, b in zip(outs[0], other):
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)

"""Tuned-kernel dispatch (ops/kernel_library.py): ApplyHistoryBest applied
to the framework's own Pallas kernels — tune logs load, exact + compatible
queries follow the reference dispatcher semantics, and the dispatching op
builders fall back to XLA when no record matches."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from vae_extent_search_tpu.ops import kernel_library as kl
from vae_extent_search_tpu.ops.kernel_library import (
    PallasKernelLibrary,
    default_library,
    tuned_matmul,
)
from vae_extent_search_tpu.records import SearchTask, make_workload_key
from vae_extent_search_tpu.records.serde import ERROR_NO_ERROR
from vae_extent_search_tpu.search.measure import (
    EmptyBuilder,
    ProgramMeasurer,
    RecordToFile,
)
from vae_extent_search_tpu.search.pallas_tuner import (
    PallasConv2dRunner,
    PallasMatmulRunner,
)
from vae_extent_search_tpu.search.sketch import make_states


def _fake_matmul_timer(M, N, K, bm, bn, bk):
    # deterministic, config-dependent: big blocks win, bm breaks ties
    return 1.0 / (bm * bn * bk) + 1e-6 * bm


def _tune_matmul_log(tmp_path, M=64, N=64, K=64, n_states=24,
                     dtype="bfloat16", name="tune_matmul.json"):
    wk = make_workload_key("matmul_auto_scheduler_test", (M, N, K))
    donor = SearchTask(wk, "llvm")
    record_task = SearchTask(wk, f"tpu -model={dtype}")
    states = make_states(donor, n_states, evo_population=64,
                         min_population=20, seed=7)
    runner = PallasMatmulRunner(dtype=dtype, time_fn=_fake_matmul_timer)
    log = str(tmp_path / name)
    measurer = ProgramMeasurer(EmptyBuilder(), runner,
                               callbacks=[RecordToFile(log)],
                               max_continuous_error=10 ** 9)
    measurer.measure(record_task, states)
    return log, runner


@pytest.fixture(scope="module")
def matmul_log(tmp_path_factory):
    return _tune_matmul_log(tmp_path_factory.mktemp("kl"))


def test_library_loads_and_exact_query(matmul_log):
    log, runner = matmul_log
    lib = PallasKernelLibrary.from_file(log)
    assert len(lib) == 1  # one (workload, dtype) key, best kept
    cfg = lib.matmul_config(64, 64, 64, "bfloat16")
    assert cfg is not None
    ok = [(c, s) for c, s, e in runner.measured_configs()
          if e == ERROR_NO_ERROR]
    best_cfg = min(ok, key=lambda cs: cs[1])[0]
    assert cfg == best_cfg


def test_dtype_partitions_records(matmul_log):
    log, _ = matmul_log
    lib = PallasKernelLibrary.from_file(log)
    # records were timed under bfloat16; a float32 query must not match
    # (block validity is dtype-dependent: sublane 16 vs 8)
    assert lib.matmul_config(64, 64, 64, "float32") is None


def test_compatible_match_rescales_to_query_shape(matmul_log):
    log, _ = matmul_log
    lib = PallasKernelLibrary.from_file(log)
    # no exact (128, 64, 64) record; the (64, 64, 64) one is compatible
    # (every target arg a multiple of the record's, dis-factor 2)
    cfg = lib.matmul_config(128, 64, 64, "bfloat16")
    assert cfg is not None
    bm, bn, bk = cfg
    assert 128 % bm == 0 and 64 % bn == 0 and 64 % bk == 0
    # non-dividing args never match (reference utils.py:82-130)
    assert lib.matmul_config(96, 64, 64, "bfloat16") is None
    lib_strict = PallasKernelLibrary.from_file(log,
                                               include_compatible=False)
    assert lib_strict.matmul_config(128, 64, 64, "bfloat16") is None


def test_dispatching_matmul_numerics(matmul_log):
    log, _ = matmul_log
    lib = PallasKernelLibrary.from_file(log)
    fn, prov = lib.matmul(64, 64, 64, "bfloat16", interpret=True)
    assert prov[0] == "pallas"
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((64, 64), np.float32))
    b = jnp.asarray(rng.standard_normal((64, 64), np.float32))
    got = fn(a, b)
    want = jnp.dot(a.astype(jnp.bfloat16).astype(jnp.float32),
                   b.astype(jnp.bfloat16).astype(jnp.float32))
    assert got.dtype == jnp.float32
    rel = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
    assert rel < 1e-5


def test_empty_library_falls_back_to_xla():
    lib = PallasKernelLibrary()
    fn, prov = lib.matmul(32, 32, 32, "float32")
    assert prov == ("xla",)
    rng = np.random.default_rng(4)
    a = jnp.asarray(rng.standard_normal((32, 32), np.float32))
    b = jnp.asarray(rng.standard_normal((32, 32), np.float32))
    assert float(jnp.max(jnp.abs(fn(a, b) - a @ b))) < 1e-4
    # conv fallback too
    conv, prov = lib.conv2d(1, 8, 8, 32, 32, 3, 3, 1, 1, "float32")
    assert prov == ("xla",)


def test_best_record_wins_on_update(matmul_log):
    log, runner = matmul_log
    lib = PallasKernelLibrary.from_file(log)
    (_, best_rec), = lib._best.values()
    ok = [s for _, s, e in runner.measured_configs() if e == ERROR_NO_ERROR]
    assert best_rec.res.mean_cost == pytest.approx(min(ok))


def test_default_library_env_reload(matmul_log, monkeypatch):
    log, _ = matmul_log
    # unset/empty -> the committed tuned logs load implicitly (the
    # reference's ApplyHistoryBest-in-every-build role); this repo
    # checkout ships result/selftune/*.json with real chip records
    monkeypatch.delenv(kl.LIBRARY_ENV, raising=False)
    committed = kl.committed_log_paths()
    assert committed, "repo ships default tuning logs"
    assert len(default_library()) > 0
    # explicit off switch -> empty library, XLA fallback everywhere
    monkeypatch.setenv(kl.LIBRARY_ENV, "none")
    assert len(default_library()) == 0
    fn, prov = tuned_matmul(64, 64, 64, "bfloat16")
    assert prov == ("xla",)
    monkeypatch.setenv(kl.LIBRARY_ENV, log)
    assert len(default_library()) == 1  # env change reloads
    fn, prov = tuned_matmul(64, 64, 64, "bfloat16", interpret=True)
    assert prov[0] == "pallas"
    # missing paths are tolerated (fresh cluster node without the log)
    monkeypatch.setenv(kl.LIBRARY_ENV,
                       log + os.pathsep + "/nonexistent/tuned.json")
    assert len(default_library()) == 1


def test_conv2d_library_roundtrip(tmp_path):
    params = (1, 8, 8, 32, 32, 3, 3, 1, 1)
    N, H, W, CO, CI, KH, KW, stride, pad = params
    wk = make_workload_key(
        "conv2d_layer",
        (N, H, W, CO, CI, KH, KW, [stride, stride], [pad, pad]))
    donor = SearchTask(wk, "llvm")
    record_task = SearchTask(wk, "tpu -model=bfloat16")
    states = make_states(donor, 16, evo_population=64, min_population=20,
                         seed=11)

    def fake_timer(*a):
        boh, bco, bci = a[-3:]
        return 1.0 / (boh * bco * bci + 1.0)

    runner = PallasConv2dRunner(dtype="bfloat16", time_fn=fake_timer)
    log = str(tmp_path / "tune_conv.json")
    measurer = ProgramMeasurer(EmptyBuilder(), runner,
                               callbacks=[RecordToFile(log)],
                               max_continuous_error=10 ** 9)
    measurer.measure(record_task, states)

    lib = PallasKernelLibrary.from_file(log)
    cfg = lib.conv2d_config(*params, dtype="bfloat16")
    assert cfg is not None
    ok = [(c, s) for c, s, e in runner.measured_configs()
          if e == ERROR_NO_ERROR]
    assert cfg == min(ok, key=lambda cs: cs[1])[0]
    fn, prov = lib.conv2d(*params, dtype="bfloat16", interpret=True)
    assert prov[0] == "pallas"
    from vae_extent_search_tpu.ops.conv2d_pallas import xla_conv2d_reference

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((N, H, W, CI), np.float32))
    w = jnp.asarray(rng.standard_normal((KH, KW, CI, CO), np.float32))
    bias = jnp.asarray(rng.standard_normal(CO, np.float32))
    want = xla_conv2d_reference(*params, dtype_name="bfloat16")(x, w, bias)
    got = fn(x, w, bias)
    rel = float(jnp.max(jnp.abs(got - want)) / jnp.max(jnp.abs(want)))
    assert rel < 1e-4


def test_nearest_shape_matching_for_self_kernel_families(monkeypatch):
    """gbdt_hist_layer / fused_head_layer records dispatch by nearest
    log-shape distance, not divisibility: a ladder tuned at 120k rows
    must still serve an 800k-row corpus (row counts are not tile-
    divisible quantities), while wildly distant shapes return None."""
    monkeypatch.delenv(kl.LIBRARY_ENV, raising=False)
    lib = default_library()
    # the committed self-tuning log holds gbdt_hist_layer @
    # (120000, 164, 98, 6, 8, 12) and fused_head_layer @
    # (262144, 24, 256, 64, 10)
    assert lib.hist_ladder(800000, 173, 100, 8, 10, 14) is not None
    assert lib.hist_ladder(120000, 164, 98, 6, 8, 12) == (4, 8, 16)
    # far outside the log-ratio cap -> hand defaults
    assert lib.hist_ladder(5000, 20, 4, 1, 1, 2) is None
    # fused head re-snaps onto nearby pool sizes
    assert lib.fused_head_config(131072, 24, 256, 64, 10) is not None

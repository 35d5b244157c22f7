"""Native components: record parser + batch extent featurizer, golden
against the Python IR."""

import os

import numpy as np
import pytest

from vae_extent_search_tpu.features.extent import extent_vector
from vae_extent_search_tpu.records import (
    SearchTask,
    load_records,
    make_workload_key,
)
from vae_extent_search_tpu.search.measure import (
    AnalyticRunner,
    EmptyBuilder,
    ProgramMeasurer,
    RecordToFile,
)
from vae_extent_search_tpu.search.sketch import make_states

NATIVE = os.path.exists(
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "vae_extent_search_tpu", "native", "libves_native.so",
    )
)

pytestmark = pytest.mark.skipif(not NATIVE, reason="native lib not built")


@pytest.fixture(scope="module")
def record_log(tmp_path_factory):
    task = SearchTask(
        make_workload_key(
            "conv2d_layer", (1, 7, 7, 32, 32, 3, 3, [1, 1], [1, 1])
        ),
        "llvm -mcpu=skylake-avx512",
    )
    states = make_states(task, 40, evo_population=48, min_population=16,
                         seed=9)
    log = str(tmp_path_factory.mktemp("native") / "recs.json")
    measurer = ProgramMeasurer(EmptyBuilder(), AnalyticRunner(noise=0.1),
                               callbacks=[RecordToFile(log)])
    measurer.measure(task, states)
    return log


def test_native_parser_matches_serde(record_log):
    from vae_extent_search_tpu.records.fast_parser import load_records_fast

    A = load_records(record_log)
    B = load_records_fast(record_log)
    assert len(A) == len(B)
    for a, b in zip(A, B):
        assert a.inp.step_records == b.inp.step_records
        assert a.inp.task.workload_key == b.inp.task.workload_key
        assert abs(a.res.mean_cost - b.res.mean_cost) < 1e-12


def test_native_extent_featurizer_golden(record_log):
    from vae_extent_search_tpu.records.fast_parser import (
        featurize_extents_native,
    )

    vecs, labels, status = featurize_extents_native(
        record_log, python_fallback=False
    )
    recs = load_records(record_log)
    assert (status == 0).all(), status
    for i, rec in enumerate(recs):
        py = extent_vector(rec.inp.recover_state(infer_bound=True))
        assert vecs[i].shape == py.shape, (i, vecs[i], py)
        assert np.allclose(vecs[i], py), (i, vecs[i], py)


def test_native_perstore_featurizer_golden(record_log):
    from vae_extent_search_tpu.features.per_store import (
        get_per_store_features_from_state,
    )
    from vae_extent_search_tpu.records.fast_parser import (
        featurize_perstore_native,
        load_records_fast,
    )

    feats, status = featurize_perstore_native(record_log,
                                              python_fallback=False)
    recs = load_records_fast(record_log)
    assert (status == 0).all(), status
    for i, rec in enumerate(recs):
        st = rec.inp.recover_state(infer_bound=True)
        ref = get_per_store_features_from_state(st, rec.inp.task)
        assert feats[i].shape == ref.shape, (i, feats[i].shape, ref.shape)
        assert np.allclose(feats[i], ref, atol=1e-4), (
            i, np.argwhere(~np.isclose(feats[i], ref, atol=1e-4))[:5])


def test_native_perstore_ci_corpora_golden():
    """Golden equality on the reference's own cuda corpus — exercises
    cache read/write mirroring, attach ordering and the non-affine
    (winograd) full-expression demand path."""
    from tests.conftest import CI_LOGS
    from vae_extent_search_tpu.features.per_store import (
        get_per_store_features_from_state,
    )
    from vae_extent_search_tpu.records.fast_parser import (
        featurize_perstore_native,
        load_records_fast,
    )

    path = os.path.join(CI_LOGS, "resnet-18-NHWC-B1-cuda.json")
    if not os.path.exists(path):
        pytest.skip("reference ci_logs unavailable")
    feats, status = featurize_perstore_native(path, python_fallback=False)
    recs = load_records_fast(path)
    assert (status == 0).all(), status
    for i, rec in enumerate(recs):
        st = rec.inp.recover_state(infer_bound=True)
        ref = get_per_store_features_from_state(st, rec.inp.task)
        assert feats[i].shape == ref.shape
        assert np.allclose(feats[i], ref, atol=1e-4), i


def test_native_perstore_states_golden():
    """State-batch featurization (the learned-cost-model search hot loop)
    matches the python path on evolutionary states — including partially
    bound ones, where compute_at reset some stages' ranges."""
    from vae_extent_search_tpu.features.per_store import (
        get_per_store_features_from_states,
    )

    task = SearchTask(
        make_workload_key(
            "conv2d_layer", (1, 14, 14, 64, 64, 3, 3, [1, 1], [1, 1])
        ),
        "cuda",
    )
    states = make_states(task, 48, evo_population=64, min_population=16,
                         seed=3)
    A = get_per_store_features_from_states(states, task, use_native=True)
    B = get_per_store_features_from_states(states, task, use_native=False)
    assert len(A) == len(B) == len(states)
    for i, (a, b) in enumerate(zip(A, B)):
        assert a.shape == b.shape, i
        assert np.allclose(a, b, atol=1e-4), i


def test_native_evolutionary_search():
    """The native-batched GA (record-level mutations, C++ replay + dedup
    keys + features per generation) produces valid unique states whose
    best score is no worse than the initial population's."""
    import numpy as np

    from vae_extent_search_tpu.features.per_store import (
        get_per_store_features_from_states,
    )
    from vae_extent_search_tpu.search.sketch import (
        PythonCostModel,
        SketchPolicy,
    )

    class DetModel(PythonCostModel):
        def predict(self, task, states):
            feats = get_per_store_features_from_states(states, task)
            return self.predict_on_feature_list(task, feats)

        def predict_on_feature_list(self, task, feats):
            return np.asarray([f.sum() % 7.0 for f in feats], np.float32)

    task = SearchTask(
        make_workload_key(
            "conv2d_layer", (1, 7, 7, 32, 32, 3, 3, [1, 1], [1, 1])
        ),
        "llvm -mcpu=skylake-avx512",
    )
    model = DetModel()
    pol = SketchPolicy(task, model, seed=11)
    init = pol.sample_initial_population(24)
    out = pol._evolutionary_search_native(init, 16)
    assert out is not None and len(out) > 0  # native path engaged
    keys = {s.to_str() for s in out}
    assert len(keys) == len(out)  # unique
    best_out = max(model.predict(task, out))
    best_init = max(model.predict(task, init))
    assert best_out >= best_init


def test_native_rfactor_golden():
    """Rfactor replays natively: per-store + extent features of
    rfactor-sketch states match the python path exactly."""
    from vae_extent_search_tpu.features.per_store import (
        get_per_store_features_from_states,
    )
    from vae_extent_search_tpu.records.task import HardwareParams

    hw = HardwareParams(
        num_cores=18, vector_unit_bytes=64, cache_line_bytes=64,
        max_shared_memory_per_block=2**31 - 1,
        max_local_memory_per_block=2**31 - 1,
        max_threads_per_block=2**31 - 1, max_vthread_extent=1, warp_size=1,
    )
    task = SearchTask(
        make_workload_key("softmax_nm_auto_scheduler_test", (4, 2048)),
        "llvm -mcpu=skylake-avx512", hardware_params=hw,
    )
    states = make_states(task, 32, evo_population=48, min_population=16,
                         seed=6)
    assert any(
        s.to_record()[0] == "RF"
        for st in states for s in st.transform_steps
    ), "expected rfactor states in the sketch population"
    A = get_per_store_features_from_states(states, task, use_native=True)
    B = get_per_store_features_from_states(states, task, use_native=False)
    for i, (a, b) in enumerate(zip(A, B)):
        assert a.shape == b.shape and np.allclose(a, b, atol=1e-4), i


def test_native_conv3d_golden():
    """5-dim spatial ops (conv3d / resnet3d family) run the whole stack:
    sketches, bound inference and both featurizer paths agree."""
    from vae_extent_search_tpu.features.per_store import (
        get_per_store_features_from_states,
    )

    task = SearchTask(
        make_workload_key(
            "conv3d_layer",
            (1, 4, 14, 14, 32, 32, 3, 3, 3, [1, 1, 1], [1, 1, 1]),
        ),
        "llvm -mcpu=skylake-avx512",
    )
    states = make_states(task, 12, evo_population=16, min_population=8,
                         seed=2)
    A = get_per_store_features_from_states(states, task, use_native=True)
    B = get_per_store_features_from_states(states, task, use_native=False)
    for i, (a, b) in enumerate(zip(A, B)):
        assert a.shape == b.shape and np.allclose(a, b, atol=1e-4), i


def test_tenset_hash_tasks_search_and_featurize():
    """TenSet relay-hash workloads reconstructed from the reference cuda
    corpus (dense / softmax / winograd / conv) all support the full
    pipeline: sketch generation -> GA -> native featurization golden-equal
    to python."""
    from tests.conftest import CI_LOGS
    from vae_extent_search_tpu.features.per_store import (
        get_per_store_features_from_states,
    )
    from vae_extent_search_tpu.records.fast_parser import load_records_fast

    path = os.path.join(CI_LOGS, "resnet-18-NHWC-B1-cuda.json")
    if not os.path.exists(path):
        pytest.skip("reference ci_logs unavailable")
    recs = load_records_fast(path)
    seen = set()
    for r in recs:
        wk = r.inp.task.workload_key
        if wk in seen or len(seen) >= 6:
            continue
        seen.add(wk)
        task = r.inp.task
        states = make_states(task, 4, evo_population=8, min_population=4,
                             seed=1)
        assert states
        A = get_per_store_features_from_states(states, task,
                                               use_native=True)
        B = get_per_store_features_from_states(states, task,
                                               use_native=False)
        for i, (a, b) in enumerate(zip(A, B)):
            assert a.shape == b.shape and np.allclose(a, b, atol=1e-4), \
                (wk[:40], i)


def test_native_survives_corrupt_streams():
    """Garbage/truncated step-token streams yield error statuses, never
    crashes (record logs come from disk; decode_steps bounds-checks every
    header, list marker and argument count)."""
    import ctypes

    from vae_extent_search_tpu.records.fast_parser import (
        _load_fx,
        _load_lib,
        _load_ps,
        _string_pool_arrays,
        _TaskDescCache,
    )

    task = SearchTask(make_workload_key("matmul_add", (32, 32, 32)),
                      "llvm")
    lib = _load_ps(_load_fx(_load_lib()))
    desc, edesc = _TaskDescCache.get(task)
    pool, offs = _string_pool_arrays(["x"])
    rng = np.random.default_rng(0)
    for _ in range(30):
        n_tok = int(rng.integers(1, 40))
        toks = rng.integers(-5, 20, n_tok).astype(np.int32)
        begin = np.zeros(1, np.int64)
        end = np.asarray([n_tok], np.int64)
        h = lib.ves_featurize_perstore(
            desc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            edesc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            toks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            begin.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            end.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            1, pool, offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            0, 64, 1, 0)
        lib.ves_ps_free(h)


@pytest.mark.parametrize("wk,args", [
    ("max_pool2d_auto_scheduler_test", (1, 14, 14, 64, 1)),
    ("min_nm_auto_scheduler_test", (32, 512)),
    ("softmax_abcd_auto_scheduler_test", (1, 4, 64, 64)),
    ("depthwise_conv2d_layer", (1, 14, 14, 96, 3, 3, [1, 1], [1, 1])),
    ("batch_matmul", (4, 64, 64, 32)),
    ("group_conv2d_layer", (1, 14, 14, 64, 64, 3, 3, 1, 1, 8)),
    ("conv2d_transpose_layer", (1, 8, 8, 64, 128, 4, 4, 2, 1)),
    ("avg_pool2d_layer", (1, 14, 14, 64, 7, 1, 0)),
    ("max_pool2d_layer", (1, 112, 112, 64, 3, 2, 1)),
])
@pytest.mark.parametrize("target", ["llvm -mcpu=skylake-avx512", "cuda"])
def test_native_workload_families_golden(wk, args, target):
    """Every workload family (pool/min/softmax/depthwise) featurizes
    natively golden-equal to python on both targets."""
    from vae_extent_search_tpu.features.per_store import (
        get_per_store_features_from_states,
    )

    task = SearchTask(make_workload_key(wk, args), target)
    states = make_states(task, 6, evo_population=10, min_population=4,
                         seed=2)
    assert states
    A = get_per_store_features_from_states(states, task, use_native=True)
    B = get_per_store_features_from_states(states, task, use_native=False)
    for i, (a, b) in enumerate(zip(A, B)):
        assert a.shape == b.shape and np.allclose(a, b, atol=1e-4), i


# ---------------------------------------------------------------------------
# Native analytic-measure batch (replay + infer + byte-exact print + summary)
# ---------------------------------------------------------------------------


CORPORA = [
    "conv2d.json",
    "matmul.json",
    "resnet-18-NHWC-B1-cuda.json",
    "resnet-50-NHWC-B1-llvm.json",
]


@pytest.mark.parametrize("log", CORPORA)
def test_native_print_state_byte_exact(log):
    """The native name-tracking printer reproduces State.to_str BYTE
    FOR BYTE on the reference corpora (CPU + GPU: splits, fuses, cache
    read/write, thread binds, storage align, rfactor) — it is the
    AnalyticRunner's noise-key input, so anything weaker changes
    simulated costs."""
    from tests.conftest import CI_LOGS
    from vae_extent_search_tpu.records import load_records
    from vae_extent_search_tpu.records.fast_parser import (
        analytic_batch_native,
    )

    recs = load_records(os.path.join(CI_LOGS, log))
    by_task = {}
    for r in recs:
        by_task.setdefault(
            (r.inp.task.workload_key, str(r.inp.task.target)), []
        ).append(r)
    checked = 0
    for rs in by_task.values():
        task = rs[0].inp.task
        rl = [r.inp.step_records for r in rs]
        batch = analytic_batch_native(task, rl)
        assert batch is not None
        statuses, texts, srows, irows = batch
        for i in range(len(rs)):
            if statuses[i] != 0:
                continue
            st = task.compute_dag.infer_bound(
                task.compute_dag.apply_steps(rl[i]))
            assert st.to_str().encode() == texts[i], (log, i)
            checked += 1
    assert checked > 0


def test_native_analytic_sparse_falls_back():
    """Symbolic (data-dependent) extents print PrimExpr text the native
    printer does not attempt — the whole task must report unavailable,
    never a wrong byte stream."""
    from tests.conftest import CI_LOGS
    from vae_extent_search_tpu.records import load_records
    from vae_extent_search_tpu.records.fast_parser import (
        analytic_batch_native,
    )

    recs = load_records(os.path.join(CI_LOGS, "sparse_dense.json"))
    task = recs[0].inp.task
    assert analytic_batch_native(
        task, [r.inp.step_records for r in recs]) is None


def test_remeasure_fast_path_identical(tmp_path):
    """remeasure_file through AnalyticRunner.run_record_lists (native
    batch) writes records with bit-identical costs and steps to the
    python State path — same noise keys (byte-exact print), same cost
    expressions in the same order."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from scripts.measure_programs import remeasure_file
    from vae_extent_search_tpu.records import (
        load_records,
        make_record,
        save_records,
    )
    from vae_extent_search_tpu.search.sketch import make_state_records

    task = SearchTask(
        make_workload_key("conv2d_layer",
                          (1, 14, 14, 32, 32, 3, 3, [1, 1], [1, 1])),
        "llvm -mcpu=skylake-avx512")
    recs = make_state_records(task, 40, evo_population=48,
                              min_population=16, seed=9)
    pool = str(tmp_path / "pool.json")
    save_records(pool, [make_record(task, r, costs=[0.0], timestamp=0)
                        for r in recs], mode="w")

    fast_out = str(tmp_path / "fast.json")
    slow_out = str(tmp_path / "slow.json")
    r_fast = AnalyticRunner(noise=0.1, seed=5)
    assert remeasure_file(pool, fast_out, r_fast) == len(recs)
    r_slow = AnalyticRunner(noise=0.1, seed=5)
    r_slow.run_record_lists = None  # force the python State path
    assert remeasure_file(pool, slow_out, r_slow) == len(recs)

    A = load_records(fast_out)
    B = load_records(slow_out)
    assert len(A) == len(B) == len(recs)
    for a, b in zip(A, B):
        assert a.res.costs == b.res.costs
        assert a.res.error_no == b.res.error_no
        assert a.inp.step_records == b.inp.step_records


def test_native_rejects_out_of_range_annotation():
    """An AN step with an annotation outside the 12-entry enum must
    fail native replay (status != 0 -> python fallback) rather than
    index the printer's kAnnStr table out of bounds."""
    from vae_extent_search_tpu.records.fast_parser import (
        analytic_batch_native,
    )

    task = SearchTask(
        make_workload_key("matmul_auto_scheduler_test", (64, 64, 64)),
        "llvm -mcpu=skylake-avx512")
    good = [["SP", 2, 0, 64, [8], 1], ["AN", 2, 0, 3]]
    bad = [["SP", 2, 0, 64, [8], 1], ["AN", 2, 0, 99]]
    batch = analytic_batch_native(task, [good, bad])
    assert batch is not None
    statuses = batch[0]
    assert statuses[0] == 0
    assert statuses[1] != 0


def test_native_parser_null_split_lengths(tmp_path):
    """Records whose SP lengths contain JSON null (undefined split
    lengths — sketch-stage records serialize them; the reference's
    Array<Optional<Integer>> does too) must parse natively with full
    serde parity, not be silently dropped (which also NULL-crashed
    RawRecords when every record dropped)."""
    from vae_extent_search_tpu.records import (
        load_records,
        make_record,
        save_records,
    )
    from vae_extent_search_tpu.records.fast_parser import (
        load_records_fast,
    )
    from vae_extent_search_tpu.search.sketch import generate_sketches

    task = SearchTask(
        make_workload_key("conv2d_layer",
                          (1, 14, 14, 32, 32, 3, 3, [1, 1], [1, 1])),
        "llvm -mcpu=skylake-avx512")
    rec = None
    for s in generate_sketches(task, seed=0):
        recs = [st.to_record() for st in s.transform_steps]
        if any(r[0] == "SP" and any(l is None for l in r[4])
               for r in recs):
            rec = recs
            break
    assert rec is not None
    p = str(tmp_path / "nullrec.json")
    save_records(p, [make_record(task, rec, costs=[0.1], timestamp=0)],
                 mode="w")
    assert "null" in open(p).read()
    py = load_records(p)
    nat = load_records_fast(p)
    assert len(nat) == len(py) == 1
    assert nat[0].inp.step_records == py[0].inp.step_records
    # empty log: zero records, no NULL-pointer crash
    e = str(tmp_path / "empty.json")
    open(e, "w").close()
    assert load_records_fast(e) == []

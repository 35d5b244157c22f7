"""Auxiliary components: dispatcher sampling, schedule mixing, baseline
models, few-shot modes, layout helpers."""

import os

import numpy as np
import pytest

from vae_extent_search_tpu.records import (
    SearchTask,
    load_records,
    make_workload_key,
)
from vae_extent_search_tpu.search.measure import (
    AnalyticRunner,
    EmptyBuilder,
    MeasureResult,
    ProgramMeasurer,
    RecordToFile,
)
from vae_extent_search_tpu.search.sketch import make_states

WK = make_workload_key("matmul_add", (64, 64, 64))
TGT = "llvm -mcpu=skylake-avx512"


@pytest.fixture(scope="module")
def small_log(tmp_path_factory):
    task = SearchTask(WK, TGT)
    states = make_states(task, 16, evo_population=24, min_population=8,
                         seed=3)
    log = str(tmp_path_factory.mktemp("aux") / "recs.json")
    m = ProgramMeasurer(EmptyBuilder(), AnalyticRunner(noise=0.1),
                        callbacks=[RecordToFile(log)])
    m.measure(task, states)
    return log


def test_apply_history_best_or_sample(small_log):
    from vae_extent_search_tpu.records.dispatcher import (
        ApplyHistoryBestOrSample,
    )

    d = ApplyHistoryBestOrSample(load_records(small_log), num_measure=4)
    hit = d.query(TGT, WK)  # exact hit: no sampling
    assert hit is not None and hit.res.error_no == 0
    other = make_workload_key("matmul_add", (32, 32, 32))
    rec = d.query(TGT, other)  # miss: samples and returns a real record
    assert rec is not None
    assert rec.inp.task.workload_key == other


def test_schedule_selector(small_log):
    from vae_extent_search_tpu.utils.schedule_selector import (
        ScheduleSelector,
    )

    sel = ScheduleSelector([WK], small_log, seed=1)
    top = sel.load_rec_only_high(percent=0.5)
    assert len(top[WK]) >= 1
    path, total, idxs = sel.random_look4_better(top)
    assert total > 0 and len(load_records(path)) == 1
    _, _, idxs2 = sel.random_look4_better(top, seen=[idxs])
    assert idxs2 != idxs or len(top[WK]) == 1


def test_baseline_models_and_metrics():
    from vae_extent_search_tpu.models.gbdt import (
        LGBModelInternal,
        RandomModelInternal,
    )
    from vae_extent_search_tpu.models.metrics import random_mix

    rng = np.random.default_rng(0)
    feats = [rng.random((3, 164)).astype(np.float32) for _ in range(20)]
    labels = np.asarray([f.sum() for f in feats], np.float32)
    g = LGBModelInternal(n_estimators=10)
    g.fit_base(feats, labels)
    assert g.predict_on_features(feats).shape == (20,)
    r = RandomModelInternal(seed=1).fit_base(feats, labels)
    assert r.predict_on_features(feats).shape == (20,)
    mixed = random_mix(labels, 0.3)
    assert mixed.shape == labels.shape


def test_few_shot_maml_mode():
    from vae_extent_search_tpu.models.segment import (
        MLPModelInternal,
        few_shot_fit,
    )

    rng = np.random.default_rng(0)
    fbt, lbt = {}, {}
    for t in ("a", "b"):
        fbt[t] = [rng.random((rng.integers(2, 5), 164)).astype(np.float32)
                  for _ in range(16)]
        lbt[t] = [float(f.sum() % 3) for f in fbt[t]]
    models = few_shot_fit(MLPModelInternal, fbt, lbt, mode="maml",
                          fine_tune_epochs=6, n_epoch=6)
    for t in ("a", "b"):
        p = models[t].predict_on_features(fbt[t][:4])
        assert p.shape == (4,) and np.isfinite(p).all()


def test_all_modules_import():
    """Every package module imports cleanly (catches lazy-import rot)."""
    import importlib
    import pkgutil

    import vae_extent_search_tpu as pkg

    for m in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        importlib.import_module(m.name)


def test_command_runner_external_adapter(tmp_path):
    """CommandRunner pipes a batch to an external command and reads costs
    back; missing/garbage lines map to error records."""
    import os
    import stat

    from vae_extent_search_tpu.search.measure import (
        CommandRunner,
        ProgramMeasurer,
    )

    sh = tmp_path / "measure.sh"
    sh.write_text(
        "#!/bin/bash\n"
        "n=$(wc -l < \"$1\")\n"
        ": > \"$2\"\n"
        "for i in $(seq 1 $n); do\n"
        "  if [ $i -eq 2 ]; then echo error >> \"$2\";"
        " else echo \"0.00$i\" >> \"$2\"; fi\n"
        "done\n"
    )
    os.chmod(sh, stat.S_IRWXU)

    task = SearchTask(make_workload_key("matmul_add", (64, 64, 64)),
                      "llvm")
    states = make_states(task, 3, evo_population=8, min_population=3,
                         seed=1)
    m = ProgramMeasurer(EmptyBuilder(), CommandRunner(str(sh)))
    results = m.measure(task, states)
    assert len(results) == len(states)
    assert results[0].error_no == 0 and results[0].mean_cost > 0
    assert results[1].error_no != 0  # the "error" line


def test_network_grid_tasks_buildable():
    """The benchmark grid covers every reference family, each family's
    task list includes its non-conv head ops (reference relay extraction
    yields dense/pool tasks too, dump_network_info.py:21-62), and every
    distinct workload kind in the grid reconstructs into a ComputeDAG."""
    import json

    from vae_extent_search_tpu.records.networks import (
        build_network_keys,
        get_network_tasks,
    )
    from vae_extent_search_tpu.ir.dag import ComputeDAG
    from vae_extent_search_tpu.records.workload import (
        workload_key_to_tensors,
    )

    keys = build_network_keys()
    assert len(keys) == 108
    families = {name for name, _ in keys}
    assert families == {
        "resnet_18", "resnet_50", "mobilenet_v2", "mobilenet_v3",
        "wide_resnet_50", "resnext_50", "inception_v3", "densenet_121",
        "resnet3d_18", "bert_tiny", "bert_base", "bert_medium",
        "bert_large", "dcgan",
    }

    expect_kinds = {
        "resnet_50": {"conv2d_layer", "max_pool2d_layer",
                      "avg_pool2d_layer", "matmul_add"},
        "resnext_50": {"conv2d_layer", "group_conv2d_layer",
                       "max_pool2d_layer", "avg_pool2d_layer",
                       "matmul_add"},
        "mobilenet_v3": {"conv2d_layer", "depthwise_conv2d_layer",
                         "avg_pool2d_layer", "matmul_add"},
        "dcgan": {"matmul_add", "conv2d_transpose_layer"},
        "bert_base": {"matmul_add", "batch_matmul"},
    }
    seen_wkeys = set()
    for name, (bs, size) in keys:
        tasks, weights = get_network_tasks(name, bs, size, "llvm")
        assert len(tasks) == len(weights) > 0
        kinds = {json.loads(t.workload_key)[0] for t in tasks}
        if name in expect_kinds:
            assert kinds == expect_kinds[name], (name, kinds)
        seen_wkeys.update(t.workload_key for t in tasks)

    distinct_kinds = {}
    for wk in seen_wkeys:
        distinct_kinds.setdefault(json.loads(wk)[0], wk)
    assert len(distinct_kinds) >= 8
    for kind, wk in sorted(distinct_kinds.items()):
        dag = ComputeDAG(workload_key_to_tensors(wk))
        assert dag.flop_ct > 0, kind


def test_tenset_relay_hash_reconstruction_real_tasklist():
    """Every task of the reference's shipped real resnet-50 TenSet task
    list (scripts/ansor_tasks_pkl, relay-hash workload keys) reconstructs
    into a buildable ComputeDAG via the shape-signature inference
    (records/tenset_workloads.py)."""
    import json
    import re

    from vae_extent_search_tpu.ir.dag import ComputeDAG
    from vae_extent_search_tpu.records.tenset_workloads import (
        infer_tenset_workload,
    )

    pkl = ("/root/reference/scripts/ansor_tasks_pkl/"
           "resnet_50-(1,224,224,3).pkl")
    raw = open(pkl, "rb").read().decode("latin1")
    keys = re.findall(r'\["[0-9a-f]{32}", [0-9, ]+\]', raw)
    assert len(keys) == 29
    for k in keys:
        parts = json.loads(k)
        tensors = infer_tenset_workload(parts[0], parts[1:])
        assert tensors is not None, k
        dag = ComputeDAG(tensors)
        assert dag.flop_ct > 0, k


@pytest.mark.parametrize("name,args", [
    # mobilenet depthwise 3x3 (kernel HWC1 + bias + relu group)
    ("depthwise", [1, 112, 112, 32, 3, 3, 32, 1, 1, 1, 1, 32,
                   1, 112, 112, 32]),
    # resnext 3x3 g32 grouped conv (kernel HWIO with I = CI/G)
    ("group", [1, 56, 56, 128, 3, 3, 4, 128, 1, 1, 1, 128,
               1, 56, 56, 128]),
    # dcgan 4x4/s2 transposed conv (upsampling conv group)
    ("tconv", [1, 8, 8, 512, 4, 4, 512, 256, 1, 1, 1, 256,
               1, 16, 16, 256]),
    # bert attention batched NT matmul (three 3-d shapes)
    ("bmm", [12, 128, 64, 12, 128, 64, 12, 128, 128]),
    # stem max pool: 1x1x1xC extra is a bias, NOT a group-conv kernel
    ("pool", [1, 112, 112, 64, 1, 1, 1, 64, 1, 56, 56, 64]),
    # resnet3d NDHWC conv3d (5-int shape groups)
    ("conv3d", [1, 8, 28, 28, 32, 3, 3, 3, 32, 32, 1, 1, 1, 1, 32,
                1, 8, 28, 28, 32]),
])
def test_tenset_reconstruction_op_families(name, args):
    """Shape-signature inference distinguishes depthwise / grouped /
    transposed convs and batched matmuls (the mobilenet / resnext /
    dcgan / bert relay groups) and the result sketches + featurizes."""
    import json

    import numpy as np

    from vae_extent_search_tpu.features.per_store import (
        get_per_store_features_from_states,
    )
    from vae_extent_search_tpu.ir.dag import ComputeDAG
    from vae_extent_search_tpu.records.tenset_workloads import (
        infer_tenset_workload,
    )

    expect_op = {
        "depthwise": "DepthwiseConv2d",
        "group": "group_conv2d_nhwc",
        "tconv": "conv2d_transpose_nhwc",
        "bmm": "compute",
        "pool": "pool_max",
        "conv3d": "Conv3dOutput",
    }[name]
    tensors = infer_tenset_workload("0" * 32, args)
    assert tensors is not None
    ops = [getattr(op, "name", "?") for op in ComputeDAG(tensors).ops]
    assert expect_op in ops, ops

    wk = json.dumps(["0" * 32] + args)
    task = SearchTask(wk, TGT)
    states = make_states(task, 4, evo_population=8, min_population=2,
                         seed=5)
    assert states
    feats = get_per_store_features_from_states(states, task)
    assert all(np.isfinite(f).all() for f in feats)


def test_dispatcher_model_table_and_override():
    """best_by_model (-model= target attr) takes precedence over target
    keys, and user-defined overrides beat both (reference
    dispatcher.py:156-158, 298-317)."""
    import json

    from vae_extent_search_tpu.records import SearchTask
    from vae_extent_search_tpu.records.dispatcher import ApplyHistoryBest
    from vae_extent_search_tpu.records.serde import (
        MeasureInput,
        MeasureRecord,
        MeasureResult,
    )

    wkl = json.dumps(["matmul_auto_scheduler_test", 64, 64, 64])

    def rec(target, cost):
        return MeasureRecord(
            MeasureInput(SearchTask(wkl, target), []),
            MeasureResult([cost], 0, cost, 0.0),
        )

    disp = ApplyHistoryBest()
    # generic llvm record (cheap) + model-specific record (expensive)
    disp.update([rec("llvm", 0.001),
                 rec("llvm -model=e5-2673", 0.002)])
    # a model-matching query must pick the model table despite the
    # cheaper generic entry under the same target key
    got = disp.query("llvm -model=e5-2673", wkl)
    assert got.inp.task.target == "llvm -model=e5-2673"
    # plain llvm query falls back to the target-key table (min cost)
    got2 = disp.query("llvm", wkl)
    assert got2.res.mean_cost == 0.001
    # user-defined override wins over everything
    disp.override("llvm -model=e5-2673", wkl, rec("llvm", 9.9))
    got3 = disp.query("llvm -model=e5-2673", wkl)
    assert got3.res.mean_cost == 9.9


def test_hyperparameter_opt_tpe_end_to_end(tmp_path, monkeypatch):
    """scripts/hyperparameter_opt.py --algo tpe runs the full tune loop
    in-image (the reference needs NNI; the TPE tuner here is
    self-contained) and returns a best config drawn from the space with
    a finite metric."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from vae_extent_search_tpu.data import make_dataset_from_log_file

    log = os.path.join(repo, "result", "corpus", "resnet_18-B1-llvm.json")
    ds_path = str(tmp_path / "ds.pkl")
    make_dataset_from_log_file([log], ds_path, min_sample_size=1,
                               verbose=0)

    from scripts.hyperparameter_opt import SPACES, main

    monkeypatch.setattr(
        sys, "argv",
        ["hyperparameter_opt.py", "--dataset", ds_path, "--model",
         "gbdt", "--algo", "tpe", "--n-trials", "6"])
    best_cfg, best_val = main()
    assert set(best_cfg) == set(SPACES["gbdt"])
    assert all(best_cfg[k] in v for k, v in SPACES["gbdt"].items())
    assert np.isfinite(best_val)


def test_tpe_tuner_concentrates_on_good_region():
    """On a synthetic objective the TPE tuner must find the optimum
    faster than its own startup-random phase would by chance: after 20
    trials the best config is the known argmax."""
    import random as _random
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from scripts.hyperparameter_opt import TPE

    space = {"a": [1, 2, 3, 4], "b": [10, 20, 30], "c": ["x", "y"]}

    def objective(cfg):
        return (cfg["a"] == 3) * 2 + (cfg["b"] == 20) * 1 \
            + (cfg["c"] == "y") * 0.5

    tuner = TPE(space, _random.Random(0))
    best, best_v = None, -1
    for _ in range(20):
        cfg = tuner.ask()
        v = objective(cfg)
        tuner.tell(cfg, v)
        if v > best_v:
            best, best_v = cfg, v
    assert best == {"a": 3, "b": 20, "c": "y"}, best


def test_gp_ucb_concentrates_on_optimum():
    """The GP-UCB tuner (the bayes_opt algorithm) must localize a
    smooth 2-D optimum far better than its random warmup: after 6
    random + 18 guided trials the best point is within 0.05 of the
    argmax in the normalized box, and the guided phase beats a pure
    random search of the same total budget."""
    import random as _random

    from scripts.hyperparameter_opt import GPUCB

    bounds = {"a": (0.0, 1.0), "b": (-2.0, 2.0)}

    def objective(p):
        return -((p["a"] - 0.3) ** 2) - ((p["b"] - 0.8) / 4.0) ** 2

    rng = _random.Random(0)
    opt = GPUCB(bounds, rng)
    vals = []
    best, best_v = None, -np.inf
    for _ in range(24):
        pt = opt.ask()
        v = objective(pt)
        opt.tell(pt, v)
        vals.append(v)
        if v > best_v:
            best, best_v = pt, v
    assert abs(best["a"] - 0.3) < 0.05, best
    assert abs((best["b"] - 0.8) / 4.0) < 0.05, best
    # guided trials concentrate: the last 8 average far above the
    # warmup randoms (UCB still explores, so compare means, not each)
    assert np.mean(vals[-8:]) > np.mean(vals[:6]) + 0.1, vals


def test_lgbm_bayesian_hpo_end_to_end(tmp_path, monkeypatch):
    """scripts/hyperparameter_opt.py --model lgbm --algo gp reproduces
    the reference lightgbm bayesian flow in-image: probe + random +
    GP-guided trials over the reference's box space, best params
    rounded/clamped, tuned model saved and reloadable."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from vae_extent_search_tpu.data import make_dataset_from_log_file

    log = os.path.join(repo, "result", "corpus", "resnet_18-B1-llvm.json")
    ds_path = str(tmp_path / "ds.pkl")
    make_dataset_from_log_file([log], ds_path, min_sample_size=1,
                               verbose=0)

    from scripts.hyperparameter_opt import LGBM_BOUNDS, main

    out_model = str(tmp_path / "lgbm_tuned.pkl")
    monkeypatch.setattr(
        sys, "argv",
        ["hyperparameter_opt.py", "--dataset", ds_path, "--model",
         "lgbm", "--algo", "gp", "--init-points", "2", "--n-iter", "2",
         "--n-estimators", "40", "--out-model", out_model])
    opt_params, best_val = main()
    assert np.isfinite(best_val) and best_val <= 0  # -RMSE
    assert isinstance(opt_params["num_leaves"], int)
    lo, hi = LGBM_BOUNDS["num_leaves"]
    assert lo <= opt_params["num_leaves"] <= hi

    from vae_extent_search_tpu.models.gbdt import LGBModelInternal

    m = LGBModelInternal.load(out_model)
    assert m is not None


def test_perstore_features_from_records(small_log):
    """The 'feature' input-mode ablation: flattened per-store rows with
    the extent pipeline's filtering + label conventions."""
    from vae_extent_search_tpu.features import (
        extent_features_from_records,
    )
    from vae_extent_search_tpu.features.per_store import (
        FEATURE_VEC_LEN,
        perstore_features_from_records,
    )
    from vae_extent_search_tpu.records import load_records

    records = load_records(small_log)
    feats, labels, kept = perstore_features_from_records(records)
    assert feats.ndim == 2 and feats.shape[0] == len(kept) > 0
    assert feats.shape[1] % FEATURE_VEC_LEN == 0
    assert np.isfinite(feats).all()

    # same label convention as the extent pipeline (the modal filters
    # differ — extent-vector length vs store count — so only the
    # intersection of kept sets must agree)
    from vae_extent_search_tpu.features.extent import label_from_costs

    for i, lab in zip(kept, labels):
        assert abs(label_from_costs(records[i].res.costs) - lab) < 1e-6
    e_feats, e_labels, e_kept = extent_features_from_records(records)
    assert set(kept) & set(e_kept)

    # python fallback path agrees with the native batch
    f2, l2, k2 = perstore_features_from_records(records, use_native=False)
    assert k2 == kept
    np.testing.assert_allclose(f2, feats, rtol=1e-5, atol=1e-5)


def test_gp_ucb_init_points_random_phase():
    """bayes_opt semantics: init_points uniform-random exploration
    trials run BEFORE any GP-guided acquisition (probes don't count
    toward the random budget)."""
    import random

    from scripts.hyperparameter_opt import GPUCB

    bounds = {"a": (0.0, 1.0), "b": (0.0, 10.0)}
    opt = GPUCB(bounds, random.Random(0), init_points=5)
    opt.probe({"a": 0.5, "b": 5.0})
    for i in range(9):
        pt = opt.ask()
        opt.tell(pt, -(pt["a"] - 0.3) ** 2)
        if i == 0:
            assert pt == {"a": 0.5, "b": 5.0}  # the probe first
    # 1 probe + 5 randoms served; asks 7+ were GP-guided
    assert opt._n_random == 5


def test_lgbm_params_reach_real_library_backend():
    """LGBModelInternal must hand its tuned defaults AND HPO overrides
    to the real-lightgbm backend too (_fit_lgb passes _lgb_params);
    dropping them silently made the bayesian tuner optimize noise."""
    from vae_extent_search_tpu.models.gbdt import LGBModelInternal

    m = LGBModelInternal(params={"num_leaves": 31,
                                 "min_sum_hessian_in_leaf": 9,
                                 "learning_rate": 0.07,
                                 "max_depth": 4})
    p = m._lgb_params()
    assert p["num_leaves"] == 31
    assert p["min_sum_hessian_in_leaf"] == 9
    assert p["feature_fraction"] == 0.84375  # tuned default survives
    # explicit LGBMRegressor kwargs must not duplicate
    assert "learning_rate" not in p and "max_depth" not in p
    assert m.learning_rate == 0.07
    # the in-repo grower sees the same overrides (renamed), and an
    # explicit max_depth caps lossguide growth there too
    np_ = m._native_params()
    assert np_["num_leaves"] == 31 and np_["min_child_weight"] == 9
    assert np_["max_depth"] == 4
    assert "max_depth" not in LGBModelInternal()._native_params()


def test_remeasure_abort_persists_prefix(tmp_path):
    """ProgramMeasurer abort parity INCLUDING persistence: when the
    continuous-error threshold trips, records measured before the
    abort are already saved (RecordToFile semantics), not discarded."""
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from scripts.measure_programs import remeasure_file
    from vae_extent_search_tpu.records import load_records, save_records

    corpus = os.path.join(repo, "result", "corpus", "resnet_18-B1-llvm.json")
    src = load_records(corpus, max_lines=8)
    task = src[0].inp.task
    base = [r for r in src if r.inp.task.workload_key == task.workload_key]
    pool = (base * 40)[:170]
    pool_path = str(tmp_path / "pool.json")
    save_records(pool_path, pool, mode="w")

    class ErrorRunner:
        def run_record_lists(self, task, record_lists):
            now = 0.0
            return [MeasureResult([1e10], 2, 0.0, now)
                    for _ in record_lists]

        def run(self, task, states):  # pragma: no cover
            raise AssertionError("fast path must be taken")

    out = str(tmp_path / "out.json")
    with pytest.raises(RuntimeError, match="continuous"):
        remeasure_file(pool_path, out, ErrorRunner())
    kept = load_records(out)
    assert len(kept) == 150  # everything up to the abort point
    assert all(r.res.error_no == 2 for r in kept)


def test_trace_profile_writes_tensorboard_trace(tmp_path):
    """The jax.profiler hook (utils.trace_profile, wired to
    vae_extent_search.py --profile-dir / VES_TRACE_DIR) produces a
    TensorBoard-loadable trace dir; disabled mode is a no-op."""
    import glob

    import jax
    import jax.numpy as jnp

    from vae_extent_search_tpu.utils import trace_profile

    logdir = str(tmp_path / "trace")
    with trace_profile(logdir):
        jax.device_get(jax.jit(lambda x: x * 2)(jnp.ones(8)))
    hits = glob.glob(os.path.join(logdir, "**", "*.trace*"),
                     recursive=True) + glob.glob(
        os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    assert hits, os.listdir(logdir)

    with trace_profile(None):   # disabled: no logdir -> no-op
        pass
    with trace_profile(str(tmp_path / "off"), enabled=False):
        pass
    assert not os.path.exists(str(tmp_path / "off"))


def test_dump_network_info_registry_merges_across_targets(
        tmp_path, monkeypatch):
    """all_tasks.pkl is the global multi-platform registry: a second
    grid dump at another target must MERGE into it, not clobber the
    first platform's tasks (the reference's registry spans all its
    hardware targets)."""
    import pickle
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import scripts.dump_network_info as dni

    monkeypatch.setattr(dni, "NETWORK_INFO_FOLDER", str(tmp_path))
    for target in ("llvm", "cuda"):
        monkeypatch.setattr(
            sys, "argv",
            ["dump_network_info.py", "--target", target,
             "--networks", "dcgan"])
        dni.main()
    with open(tmp_path / "all_tasks.pkl", "rb") as f:
        recs = pickle.load(f)
    targets = {rec[1] for rec in recs}
    assert targets == {"llvm", "cuda"}, targets
    # idempotent on re-dump: same key set, this-run records win
    n = len(recs)
    monkeypatch.setattr(
        sys, "argv",
        ["dump_network_info.py", "--target", "cuda",
         "--networks", "dcgan"])
    dni.main()
    with open(tmp_path / "all_tasks.pkl", "rb") as f:
        assert len(pickle.load(f)) == n

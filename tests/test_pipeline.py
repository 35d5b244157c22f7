"""End-to-end pipeline tests: sketch -> measure -> featurize -> train ->
schedule/search tooling."""

import os

import numpy as np
import pytest

from vae_extent_search_tpu.data import Dataset, make_dataset_from_log_file
from vae_extent_search_tpu.features.per_store import (
    FEATURE_VEC_LEN,
    get_per_store_features_from_state,
    get_per_store_features_from_states,
)
from vae_extent_search_tpu.records import (
    SearchTask,
    TuningOptions,
    load_records,
    make_record,
    make_workload_key,
    save_records,
)
from vae_extent_search_tpu.records.dispatcher import (
    ApplyHistoryBest,
    calc_workload_dis_factor,
)
from vae_extent_search_tpu.search.measure import (
    AnalyticRunner,
    EmptyBuilder,
    ProgramMeasurer,
    RecordToFile,
)
from vae_extent_search_tpu.search.sketch import (
    RandomCostModel,
    SketchPolicy,
    make_states,
)
from vae_extent_search_tpu.search.task_scheduler import TaskScheduler


@pytest.fixture(scope="module")
def matmul_task():
    return SearchTask(
        make_workload_key("matmul_auto_scheduler_test", (64, 64, 64)),
        "llvm -mcpu=skylake-avx512",
    )


def test_sketch_policy_generates_unique_valid_states(matmul_task):
    policy = SketchPolicy(matmul_task, RandomCostModel(0), seed=1)
    pop = policy.sample_initial_population(16)
    assert len(pop) >= 8
    keys = {st.to_str() for st in pop}
    assert len(keys) == len(pop)
    for st in pop[:4]:
        text = st.to_str(True)
        assert "(None)" not in text


def test_evolutionary_search_improves_scores(matmul_task):
    class InnerLoopLover(RandomCostModel):
        """Deterministic model preferring large vectorized loops."""

        def predict(self, task, states):
            out = []
            for st in states:
                score = 0.0
                for stage in st.stages:
                    for it in stage.iters:
                        if it.annotation == 2 and it.range:
                            score += min(it.range[1], 16)
                out.append(score)
            return np.asarray(out, np.float32)

    model = InnerLoopLover()
    policy = SketchPolicy(matmul_task, model, seed=3)
    pop = policy.sample_initial_population(24)
    best = policy.evolutionary_search(pop, 8)
    init_best = max(model.predict(matmul_task, pop))
    evo_best = max(model.predict(matmul_task, best))
    assert evo_best >= init_best


def test_pool_generation_feature_free_identical(matmul_task):
    """The keys-only native GA mode (feature emission skipped under a
    feature-free cost model) must produce the bit-identical candidate
    pool as the full-features mode — same trajectory, same dedup, same
    validity filtering."""
    from vae_extent_search_tpu.search import sketch

    assert sketch.RandomCostModel.feature_free is True
    fast = sketch.make_state_records(matmul_task, 40, evo_population=48,
                                     min_population=16, seed=11)
    old = sketch.RandomCostModel.feature_free
    try:
        sketch.RandomCostModel.feature_free = False
        full = sketch.make_state_records(matmul_task, 40,
                                         evo_population=48,
                                         min_population=16, seed=11)
    finally:
        sketch.RandomCostModel.feature_free = old
    assert fast is not None and full is not None
    assert len(fast) == len(full) > 0
    assert fast == full


def test_measure_and_features_roundtrip(tmp_path, matmul_task):
    states = make_states(matmul_task, 24, evo_population=32,
                         min_population=12, seed=5)
    log = str(tmp_path / "records.json")
    measurer = ProgramMeasurer(
        EmptyBuilder(), AnalyticRunner(noise=0.1),
        callbacks=[RecordToFile(log)],
    )
    measurer.measure(matmul_task, states)
    recs = load_records(log)
    assert len(recs) == len(states)
    # replay every record and featurize
    st0 = recs[0].inp.recover_state(infer_bound=True)
    feats = get_per_store_features_from_state(st0, matmul_task)
    assert feats.shape[1] == FEATURE_VEC_LEN
    assert np.isfinite(feats).all()


def test_dataset_build_and_split(tmp_path, matmul_task):
    states = make_states(matmul_task, 60, evo_population=64,
                         min_population=20, seed=6)
    log = str(tmp_path / "ds.json")
    measurer = ProgramMeasurer(EmptyBuilder(), AnalyticRunner(noise=0.1),
                               callbacks=[RecordToFile(log)])
    measurer.measure(matmul_task, states)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        ds = make_dataset_from_log_file([log], str(tmp_path / "d.pkl"),
                                        min_sample_size=10, verbose=0)
    finally:
        os.chdir(cwd)
    assert len(ds) == len(states)
    train, test = ds.random_split_within_task(0.8)
    assert len(train) + len(test) == len(ds)
    # throughputs normalized to max 1
    for task in ds.tasks():
        assert ds.throughputs[task].max() == pytest.approx(1.0)


def test_apply_history_best(tmp_path, matmul_task):
    states = make_states(matmul_task, 10, evo_population=16,
                         min_population=8, seed=7)
    records = [
        make_record(matmul_task, st.transform_steps, [0.01 * (i + 1)])
        for i, st in enumerate(states)
    ]
    ahb = ApplyHistoryBest(records)
    rec = ahb.query(matmul_task.target, matmul_task.workload_key)
    assert rec is not None
    assert rec.res.mean_cost == pytest.approx(0.01)
    # compatible-match via dis factor: a 2x larger matmul
    big_key = make_workload_key("matmul_auto_scheduler_test", (128, 128, 128))
    assert ahb.best_cost(matmul_task.target, big_key) == pytest.approx(0.08)
    assert calc_workload_dis_factor(
        ("m", (128, 128)), ("m", (64, 64))
    ) == 4.0


def test_task_scheduler_round_robin_and_gradient(tmp_path):
    tasks = [
        SearchTask(
            make_workload_key("matmul_auto_scheduler_test", (n, n, n)),
            "llvm",
        )
        for n in (32, 48)
    ]
    opts = TuningOptions(
        num_measure_trials=32, num_measures_per_round=8,
        builder=EmptyBuilder(), runner=AnalyticRunner(noise=0.1),
    )
    for strategy in ("round-robin", "gradient"):
        sched = TaskScheduler(tasks, [1.0, 2.0], strategy=strategy,
                              callbacks=[])
        sched.tune(opts)
        assert sched.ct >= 32
        assert all(c < 1e9 for c in sched.best_costs)


def test_per_store_features_error_convention(matmul_task):
    # an unlowerable "state" yields one all-zero row
    class Broken:
        stages = []

    feats = get_per_store_features_from_states([Broken()], matmul_task)
    assert feats[0].shape == (1, FEATURE_VEC_LEN)
    assert not feats[0].any()


def test_gpu_sketch_structure():
    """GPU sketches carry the reference's structure: shared caches with
    cooperative threadIdx fetch, block/vthread/thread binds on the output
    (cf. conv2d.json record shape)."""
    from vae_extent_search_tpu.search.sketch import SketchPolicy

    task = SearchTask(
        make_workload_key(
            "conv2d_layer", (1, 7, 7, 64, 64, 3, 3, [1, 1], [1, 1])
        ),
        "cuda -keys=cuda,gpu -max_num_threads=1024 -thread_warp_size=32",
    )
    policy = SketchPolicy(task, seed=2)
    names = {
        (s.op.name, s.compute_at) for s in policy.sketches[0].stages
    }
    assert ("pad_temp.shared", "iter") in names
    assert ("kernel.shared", "iter") in names
    assert ("conv2d_nchw", "iter") in names
    assert ("T_add", "inlined") in names

    pop = policy.sample_initial_population(6)
    assert pop
    st = pop[0]
    text = st.to_str(True)
    assert "threadIdx.x" in text
    assert "(None)" not in text
    # the block/vthread/thread binds exist as steps (a bound iterator with
    # tile size 1 is trivial-deleted from the print, like the reference)
    from vae_extent_search_tpu.ir.steps import AnnotationStep

    anns = {
        s.annotation for s in st.transform_steps
        if isinstance(s, AnnotationStep)
    }
    assert {5, 4, 6} <= anns  # blockIdx.x, vthread, threadIdx.x


def test_learned_model_search_quality():
    """sketch.gbdt tuning must find schedules at least as good as random
    sampling of equal budget (the learned-cost-model search loop:
    featurize -> fit -> GA -> eps-greedy measure)."""
    import numpy as np

    from vae_extent_search_tpu.records import SearchTask, make_workload_key
    from vae_extent_search_tpu.records.serde import MeasureInput
    from vae_extent_search_tpu.search.cost_model import make_search_policies
    from vae_extent_search_tpu.search.measure import (
        AnalyticRunner,
        EmptyBuilder,
        ProgramMeasurer,
    )
    from vae_extent_search_tpu.search.sketch import make_states

    task = SearchTask(
        make_workload_key("conv2d_layer",
                          (1, 14, 14, 64, 64, 3, 3, [1, 1], [1, 1])),
        "llvm -mcpu=skylake-avx512",
    )
    measurer = ProgramMeasurer(EmptyBuilder(), AnalyticRunner(noise=0.05))
    policies, model = make_search_policies("sketch.gbdt", [task], seed=17)
    pol = policies[0]
    best_tuned = np.inf
    n_measured = 0
    for _ in range(3):
        states = pol.continue_search_one_round(24)
        results = measurer.measure(task, states)
        inputs = [
            MeasureInput(task, [s.to_record() for s in st.transform_steps])
            for st in states
        ]
        model.update(inputs, results)
        n_measured += len(results)
        costs = [r.mean_cost for r in results if r.error_no == 0]
        if costs:
            best_tuned = min(best_tuned, min(costs))

    rand_states = make_states(task, n_measured, evo_population=128,
                              min_population=n_measured, seed=99)
    rand_results = measurer.measure(task, rand_states)
    best_rand = min(r.mean_cost for r in rand_results if r.error_no == 0)
    # the guided search should do at least ~as well as random sampling
    assert best_tuned <= best_rand * 1.10, (best_tuned, best_rand)


def test_active_search_on_device_mesh():
    """The active-learning search runs sharded over a (data, model) mesh
    (candidates over ICI data axis, hidden features over model axis) and
    still finds the optimum on a replay corpus."""
    import numpy as np

    from vae_extent_search_tpu.parallel.mesh import make_mesh
    from vae_extent_search_tpu.search.active_loop import run_active_search

    rng = np.random.default_rng(0)
    n, d = 512, 16
    feats = rng.integers(1, 64, (n, d)).astype(np.float32)
    w = rng.normal(size=d).astype(np.float32)
    labels = (feats @ w / d).astype(np.float32)

    mesh = make_mesh()  # (data, model) over the 8 virtual devices
    res = run_active_search(
        feats, labels, measure_size=48, max_phases=8, vae_epochs=40,
        reg_epochs=60, sampling_seed=3, mesh=mesh,
    )
    assert res.found, (res.phase, res.train_size)


def test_shared_vae_pretrain_matches_in_loop_training():
    """pretrain_pool_vae (the reference's once-per-pool top-level VAE
    pretrain, vae_extent_search.py:442-509) must yield bit-identical
    params to what run_active_search trains itself, and feeding them
    back must reproduce the same search trajectory."""
    import jax
    import numpy as np

    from vae_extent_search_tpu.search.active_loop import (
        pretrain_pool_vae,
        run_active_search,
    )

    rng = np.random.default_rng(7)
    n, d = 256, 12
    feats = rng.integers(1, 64, (n, d)).astype(np.float32)
    w = rng.normal(size=d).astype(np.float32)
    labels = (feats @ w / d).astype(np.float32)

    kw = dict(measure_size=32, max_phases=6, vae_epochs=30, reg_epochs=40,
              latent_dim=16, hidden_dim=32, sampling_seed=5)
    vae_params = pretrain_pool_vae(feats, latent_dim=16, hidden_dim=32,
                                   vae_epochs=30)
    res_self = run_active_search(feats, labels, **kw)
    res_shared = run_active_search(feats, labels, **kw,
                                   pretrained_vae_params=vae_params)
    assert res_self.selected_order == res_shared.selected_order
    assert res_self.phase == res_shared.phase
    assert res_self.found == res_shared.found


def test_sharded_fused_selection_matches_single_device():
    """Pod-scale selection (select_sharded.py): the fused Pallas kernel
    shard_mapped per candidate shard + cross-shard top-k merges must
    reproduce the single-device phase bit-for-bit when fed the same
    injected dropout mask bits (the PRNG-free seam — interpret mode has
    no TPU hardware PRNG)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vae_extent_search_tpu.models import init_predictor_params
    from vae_extent_search_tpu.parallel.mesh import make_mesh
    from vae_extent_search_tpu.search import (
        SelectionConfig,
        select_programs,
    )

    key = jax.random.PRNGKey(0)
    N, D, T, H = 1024, 24, 6, 256
    params = init_predictor_params(key, D)
    X = jax.random.normal(key, (N, D), jnp.float32)
    used = jnp.zeros(N, bool).at[:64].set(True)
    rem = ~used
    bits = jax.random.bits(jax.random.fold_in(key, 7), (T, N, H),
                           jnp.uint32)
    cfg = SelectionConfig(num_select=64, T_mc=T, rand_num=4,
                          fused_interpret=True)

    sel1, val1, rem1, aux1 = select_programs(params, X, used, rem, key,
                                             cfg, mask_bits=bits)

    mesh = make_mesh(8, data=8, model=1)
    sh1 = NamedSharding(mesh, P("data"))
    sh2 = NamedSharding(mesh, P("data", None))
    sel2, val2, rem2, aux2 = select_programs(
        params,
        jax.device_put(X, sh2),
        jax.device_put(used, sh1),
        jax.device_put(rem, sh1),
        key, cfg,
        mask_bits=jax.device_put(
            bits, NamedSharding(mesh, P(None, "data", None))),
    )
    v1, v2 = np.asarray(val1), np.asarray(val2)
    assert (v1 == v2).all()
    assert (np.asarray(sel1)[v1] == np.asarray(sel2)[v2]).all()
    assert (np.asarray(rem1) == np.asarray(rem2)).all()
    assert np.allclose(np.asarray(aux1["cost_pred"]),
                       np.asarray(aux2["cost_pred"]))
    assert np.allclose(np.asarray(aux1["mc_var"]),
                       np.asarray(aux2["mc_var"]), atol=1e-5)


def test_precompacted_centers_match_mask_derived():
    """Passing the measured set as a compact center list (what the
    active loop does — it skips the full-N first_k_true compaction)
    must reproduce the mask-derived diversity stage exactly, on the
    single-device path and on the sharded path (same injected dropout
    bits)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vae_extent_search_tpu.models import init_predictor_params
    from vae_extent_search_tpu.parallel.mesh import make_mesh
    from vae_extent_search_tpu.search import (
        SelectionConfig,
        select_programs,
    )

    key = jax.random.PRNGKey(11)
    N, D, T, H = 1024, 24, 6, 256
    n_meas = 64
    params = init_predictor_params(key, D)
    X = jax.random.normal(key, (N, D), jnp.float32)
    used = jnp.zeros(N, bool).at[:n_meas].set(True)
    rem = ~used
    bits = jax.random.bits(jax.random.fold_in(key, 7), (T, N, H),
                           jnp.uint32)
    cfg = SelectionConfig(num_select=64, T_mc=T, rand_num=4,
                          fused_interpret=True, max_centers=256)
    cidx = jnp.concatenate([
        jnp.arange(n_meas, dtype=jnp.int32),
        jnp.zeros(cfg.max_centers - n_meas, jnp.int32)])
    cval = jnp.arange(cfg.max_centers) < n_meas

    base = select_programs(params, X, used, rem, key, cfg,
                           mask_bits=bits)
    compact = select_programs(params, X, used, rem, key, cfg,
                              mask_bits=bits, center_idx=cidx,
                              center_valid=cval)
    for a, b in zip(base[:3], compact[:3]):
        assert (np.asarray(a) == np.asarray(b)).all()

    mesh = make_mesh(8, data=8, model=1)
    sh1 = NamedSharding(mesh, P("data"))
    sh2 = NamedSharding(mesh, P("data", None))
    sharded = select_programs(
        params, jax.device_put(X, sh2), jax.device_put(used, sh1),
        jax.device_put(rem, sh1), key, cfg,
        mask_bits=jax.device_put(
            bits, NamedSharding(mesh, P(None, "data", None))),
        center_idx=cidx, center_valid=cval,
    )
    for a, b in zip(base[:3], sharded[:3]):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_active_search_center_ring_buffer():
    """With max_centers smaller than the final measured set, the center
    buffer must roll (newest picks replace the oldest centers) and the
    search must still run to completion."""
    import numpy as np

    from vae_extent_search_tpu.search import SelectionConfig
    from vae_extent_search_tpu.search.active_loop import run_active_search

    rng = np.random.default_rng(4)
    n, d = 512, 16
    feats = rng.integers(1, 64, (n, d)).astype(np.float32)
    w = rng.normal(size=d).astype(np.float32)
    labels = (feats @ w / d).astype(np.float32)

    res = run_active_search(
        feats, labels, measure_size=48, max_phases=8, vae_epochs=30,
        reg_epochs=50, sampling_seed=5,
        selection=SelectionConfig(num_select=48, max_centers=64),
    )
    # the loop measured past the 64-center capacity without crashing
    assert res.train_size > 64
    assert res.found or res.phase == 8


def test_sharded_topk_and_gathers_match_reference():
    """The collective primitives of select_sharded.py agree with their
    single-device counterparts on random inputs, including bf16 scores
    with duplicate values (tie-breaking toward the lower global index)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vae_extent_search_tpu.parallel.mesh import make_mesh
    from vae_extent_search_tpu.search.select import masked_top_k
    from vae_extent_search_tpu.search.select_sharded import (
        gather_masked_rows_sharded,
        gather_rows_sharded,
        masked_top_k_sharded,
    )

    mesh = make_mesh(8, data=8, model=1)
    shard = NamedSharding(mesh, P("data"))
    shard2 = NamedSharding(mesh, P("data", None))
    key = jax.random.PRNGKey(3)
    n, k = 512, 37
    # bf16 round-trip forces duplicates -> exercises tie-breaking
    scores = jax.random.normal(key, (n,)).astype(jnp.bfloat16) \
        .astype(jnp.float32)
    mask = jax.random.bernoulli(jax.random.fold_in(key, 1), 0.7, (n,))
    i1, v1 = masked_top_k(scores, mask, k)
    i2, v2 = masked_top_k_sharded(jax.device_put(scores, shard),
                                  jax.device_put(mask, shard), k,
                                  mesh, "data")
    assert (np.asarray(v1) == np.asarray(v2)).all()
    assert (np.asarray(i1)[np.asarray(v1)]
            == np.asarray(i2)[np.asarray(v2)]).all()

    z = jax.random.normal(jax.random.fold_in(key, 2), (n, 16))
    idx = jnp.asarray([0, 5, 511, 63, 64, 200], jnp.int32)
    g = gather_rows_sharded(jax.device_put(z, shard2), idx, mesh, "data")
    assert np.allclose(np.asarray(g), np.asarray(z[idx]))

    cmask = jax.random.bernoulli(jax.random.fold_in(key, 4), 0.1, (n,))
    rows, valid = gather_masked_rows_sharded(
        jax.device_put(z, shard2), jax.device_put(cmask, shard), 64,
        mesh, "data")
    ref_idx = jnp.where(cmask, size=64, fill_value=0)[0]
    ref_valid = cmask[ref_idx]
    assert (np.asarray(valid) == np.asarray(ref_valid)).all()
    assert np.allclose(np.asarray(rows)[np.asarray(valid)],
                       np.asarray(z[ref_idx])[np.asarray(ref_valid)])


def test_active_search_bucketed_shapes():
    """bucket_shapes pads (candidates -> x256, features -> x8) so a
    multi-task sweep reuses compiled programs; padding must be masked out
    of training/selection and the search must still find the optimum."""
    import numpy as np

    from vae_extent_search_tpu.search.active_loop import run_active_search

    rng = np.random.default_rng(1)
    n, d = 300, 13  # deliberately non-bucket-aligned
    feats = rng.integers(1, 64, (n, d)).astype(np.float32)
    w = rng.normal(size=d).astype(np.float32)
    labels = (np.log1p(feats) @ w).astype(np.float32)

    res = run_active_search(feats, labels, measure_size=32, max_phases=15,
                            vae_epochs=30, reg_epochs=50, latent_dim=16,
                            hidden_dim=64, sampling_seed=2000,
                            bucket_shapes=True)
    assert res.found
    # selected indices never point at padding
    assert all(0 <= i < n for i in res.selected_order)


def test_encoder_lineage_arms_find_optimum():
    """The AE ablation (deterministic recon-only pretrain, no KL;
    reference for_ablation/ae_reg_feature.ipynb) and the VIB arm (no
    pretrain, sampled z + Huber + cosine-warm-up KL; reference
    model_mid/vib_mlp_*_v1.ipynb) must both run the active loop and
    find the optimum on an easy synthetic corpus."""
    import numpy as np

    from vae_extent_search_tpu.search.active_loop import run_active_search

    rng = np.random.default_rng(11)
    n, d = 384, 12
    feats = rng.integers(1, 64, (n, d)).astype(np.float32)
    w = rng.normal(size=d).astype(np.float32)
    labels = (np.log1p(feats) @ w).astype(np.float32)

    kw = dict(measure_size=32, max_phases=15, vae_epochs=30, reg_epochs=60,
              latent_dim=16, hidden_dim=64, sampling_seed=2001)
    for mode in ("ae", "vib"):
        res = run_active_search(feats, labels, encoder_mode=mode, **kw)
        assert res.found, (mode, res.phase, res.train_size)
        assert all(0 <= i < n for i in res.selected_order)

    # vib has no pretrained latent space; non-random init must be refused
    import pytest
    with pytest.raises(ValueError):
        run_active_search(feats, labels, encoder_mode="vib",
                          init_mode="diversity", **kw)
    with pytest.raises(ValueError):
        run_active_search(feats, labels, encoder_mode="nope", **kw)


def test_sharded_selection_xla_fallback_two_axis_mesh():
    """The sharded selection's XLA scoring fallback (no fused kernel on
    CPU without injected bits) must run on a (data, model) mesh with a
    non-trivial model axis and produce a valid, duplicate-free
    selection."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vae_extent_search_tpu.models import init_predictor_params
    from vae_extent_search_tpu.parallel.mesh import make_mesh
    from vae_extent_search_tpu.search import (
        SelectionConfig,
        select_programs,
    )

    key = jax.random.PRNGKey(5)
    N, D = 512, 16
    params = init_predictor_params(key, D, hidden_dim=64, latent_dim=16)
    X = jax.random.normal(key, (N, D), jnp.float32)
    used = jnp.zeros(N, bool).at[:32].set(True)
    mesh = make_mesh(8, data=4, model=2)
    sh1 = NamedSharding(mesh, P("data"))
    sh2 = NamedSharding(mesh, P("data", None))
    cfg = SelectionConfig(num_select=16, T_mc=4, rand_num=2)
    sel, valid, new_rem, aux = select_programs(
        params, jax.device_put(X, sh2), jax.device_put(used, sh1),
        jax.device_put(~used, sh1), key, cfg)
    sel = np.asarray(sel)[np.asarray(valid)]
    assert len(set(sel.tolist())) == len(sel) > 0
    assert not np.asarray(used)[sel].any()
    assert int(np.asarray(new_rem).sum()) == N - 32 - len(sel)


def test_gpu_cache_read_attach_outermost_reduce_tile():
    """Shared cooperative-fetch caches attach at the LAST reduce
    iterator of the OUTERMOST reduce tile (reference
    GetLastReduceIteratorInOutermostReduceTile, utils.h:503; the
    conv2d.json cuda golden attaches at iter 14 = leading-space-levels
    (3) * n_axes (4) + n_reduce (3) - 1 for structure "SSSRRSRS") —
    NOT after all 5 space levels, which lands in an inner reduce tile
    and reloads the tile every inner iteration."""
    from vae_extent_search_tpu.search.sketch import generate_sketches

    task = SearchTask(
        make_workload_key(
            "conv2d_layer", (1, 56, 56, 64, 64, 3, 3, [1, 1], [1, 1])
        ),
        "cuda",
    )
    cas = []
    for s in generate_sketches(task, seed=0):
        cas.extend(r for st in s.transform_steps
                   for r in [st.to_record()] if r[0] == "CA")
    shared_attach = sorted({r[3] for r in cas if r[3] > 11})
    assert shared_attach == [14], cas


def test_transfer_tune_plus_mix_refit(tmp_path):
    """transfer_tune's second stage runs a frozen-base + delta
    (plus_mix_task) model: the pretrained base is reloaded pristine,
    a calibrated delta fits on the first half's measurement residuals,
    and predictions sum (reference task_scheduler.py:498-583 +
    mlp_model.py:446-474)."""
    from vae_extent_search_tpu.search.cost_model import (
        LearnedCostModel,
        PlusMixCostModel,
    )
    from vae_extent_search_tpu.search.task_scheduler import transfer_tune

    tasks = [
        SearchTask(
            make_workload_key("matmul_auto_scheduler_test", (n, n, n)),
            "llvm",
        )
        for n in (32, 48, 64, 96)
    ]

    # pretrain a small gbdt base on analytic measurements of task 0
    pre_log = str(tmp_path / "pretrain.json")
    states = make_states(tasks[0], 32, evo_population=64,
                         min_population=20, seed=3)
    measurer = ProgramMeasurer(
        EmptyBuilder(), AnalyticRunner(noise=0.1),
        callbacks=[RecordToFile(pre_log)])
    measurer.measure(tasks[0], states)
    base = LearnedCostModel(kind="gbdt")
    base.update_from_file(pre_log)
    model_pkl = str(tmp_path / "base_gbdt.pkl")
    base.save(model_pkl)

    log = str(tmp_path / "transfer.json")
    opts = TuningOptions(
        num_measure_trials=32, num_measures_per_round=8,
        builder=EmptyBuilder(), runner=AnalyticRunner(noise=0.1),
        measure_callbacks=[RecordToFile(log)],
    )
    sched = TaskScheduler(tasks, strategy="round-robin", callbacks=[])
    transfer_tune(sched, opts, search_policy="sketch.gbdt",
                  load_model_file=model_pkl)

    assert sched.ct >= 32
    assert all(c < 1e9 for c in sched.best_costs)
    mixed = sched.transfer_model
    assert isinstance(mixed, PlusMixCostModel)
    assert mixed._is_fit()  # delta trained on stage-1 residuals

    # frozen base: the combined model's base predicts exactly like a
    # pristine reload of the pretrained pickle
    probe = make_states(tasks[2], 8, evo_population=64,
                        min_population=20, seed=5)
    feats = get_per_store_features_from_states(probe, tasks[2])
    keys = [tasks[2].workload_key] * len(feats)
    fresh = LearnedCostModel.load(model_pkl, "gbdt")
    np.testing.assert_allclose(
        mixed.base.internal.predict_on_features(
            mixed.base._embed(feats, keys)),
        fresh.internal.predict_on_features(fresh._embed(feats, keys)),
        rtol=1e-6)

    # the delta moves the combined prediction off the base
    combined = mixed.predict_on_feature_list(tasks[2], feats)
    base_only = mixed._base_predict(feats, keys)
    assert np.any(np.abs(combined - base_only) > 1e-9)

"""The analytic multi-platform dimension (search/platforms.py).

The reference dataset spans 6 hardware platforms (reference
README.md:20-27) and keys cross-platform structure on the target
string: random_split_by_target (dataset.py:152-179), transfer_tune
(task_scheduler.py:498-583), the tl_compare ablation. These tests pin:
registry resolution, historical-constant stability of the default
platform, per-platform pricing divergence (CPU vector ISA + GPU
generation), HardwareParams schedule-space knobs, the measure_programs
--target re-targeting flow, and the by_target dataset split.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from vae_extent_search_tpu.data.dataset import Dataset, LearningTask
from vae_extent_search_tpu.records import SearchTask, load_records
from vae_extent_search_tpu.records.workload import make_workload_key
from vae_extent_search_tpu.search.measure import AnalyticRunner
from vae_extent_search_tpu.search.platforms import (
    PLATFORMS,
    platform_by_name,
    platform_for_target,
)
from vae_extent_search_tpu.search.sketch import make_states


def _matmul_task(target, n=128):
    wk = make_workload_key("matmul_auto_scheduler_test", (n, n, n))
    return SearchTask(wk, target)


def test_registry_has_all_six_reference_platforms():
    """One profile per TenSet platform (reference README.md:20-27)."""
    assert set(PLATFORMS) == {"platinum-8272", "e5-2673", "epyc-7452",
                              "graviton2", "k80", "t4"}
    gpus = {n for n, p in PLATFORMS.items() if p.is_gpu}
    assert gpus == {"k80", "t4"}
    # target strings are unique — they're the dataset key
    targets = [p.target for p in PLATFORMS.values()]
    assert len(set(targets)) == 6


def test_target_resolution():
    assert platform_for_target("llvm -mcpu=skylake-avx512").name == \
        "platinum-8272"
    assert platform_for_target("llvm").name == "platinum-8272"
    assert platform_for_target("llvm -mcpu=core-avx2").name == "e5-2673"
    assert platform_for_target("llvm -mcpu=znver2").name == "epyc-7452"
    assert platform_for_target(
        "llvm -mtriple=aarch64-linux-gnu -mattr=+neon").name == "graviton2"
    assert platform_for_target("cuda").name == "k80"
    assert platform_for_target("cuda -model=k80").name == "k80"
    assert platform_for_target("cuda -model=t4").name == "t4"
    # unknown fragments fall back to the kind default
    assert platform_for_target("llvm -mcpu=weird9000").name == \
        "platinum-8272"
    assert platform_for_target("cuda -model=a100").name == "k80"
    with pytest.raises(KeyError):
        platform_by_name("tpu-v9")


def test_default_platform_costs_bit_stable():
    """Auto platform resolution is a no-op for the historical default
    targets — pre-registry corpora replay bit-identically."""
    for target in ("llvm", "llvm -mcpu=skylake-avx512"):
        task = _matmul_task(target)
        states = make_states(task, 16, seed=3)
        auto = AnalyticRunner(noise=0.2).run(task, states)
        pinned = AnalyticRunner(noise=0.2, platform=None).run(task, states)
        assert [r.costs for r in auto] == [r.costs for r in pinned]


def test_cpu_platforms_price_differently():
    """The same schedules get platform-dependent costs AND a
    platform-dependent ranking (vector ISA + core count move different
    schedules by different amounts) — cross-platform transfer is a real
    learning problem, not a rescaling."""
    task = _matmul_task("llvm")
    states = make_states(task, 64, seed=7)

    def costs(platform):
        r = AnalyticRunner(platform=platform).run(task, states)
        return np.array([x.costs[0] for x in r])

    c_sky = costs("platinum-8272")
    c_grav = costs("graviton2")
    c_e5 = costs("e5-2673")
    assert not np.allclose(c_sky, c_grav)
    assert not np.allclose(c_sky, c_e5)
    # rankings diverge, not just scales
    assert (np.argsort(c_sky) != np.argsort(c_grav)).any()
    ratio = c_grav / c_sky
    assert ratio.std() / ratio.mean() > 0.01  # not one global factor


def test_gpu_platforms_price_differently_hf():
    """k80 vs t4 profiles separate on the high-fidelity (per-store
    feature) path: same cuda pool, different costs."""
    from vae_extent_search_tpu.features.per_store import (
        get_per_store_features_from_states,
    )
    from vae_extent_search_tpu.search.analytic_hf import (
        hf_cost_from_features,
    )

    task = _matmul_task("cuda")
    states = make_states(task, 24, seed=11)
    feats = get_per_store_features_from_states(states, task)
    k80 = platform_by_name("k80").hf
    t4 = platform_by_name("t4").hf
    c_k80 = np.array([hf_cost_from_features(f, k80) for f in feats])
    c_t4 = np.array([hf_cost_from_features(f, t4) for f in feats])
    ok = np.isfinite(c_k80) & np.isfinite(c_t4)
    assert ok.sum() >= 8
    assert (c_t4[ok] < c_k80[ok]).all()  # t4 is simply faster...
    ratio = c_k80[ok] / c_t4[ok]
    assert ratio.std() / ratio.mean() > 0.01  # ...but not uniformly


def test_hardware_params_platform_profiles():
    """Non-default CPU platforms shape the schedule space via
    HardwareParams (InitParallel fuses to num_cores*16; reference
    sketch_policy_rules.cc:580-643); the default target keeps the
    reference's host-cpu-count behavior."""
    grav = SearchTask("[\"matmul_auto_scheduler_test\", 8, 8, 8]",
                      "llvm -mtriple=aarch64-linux-gnu -mattr=+neon")
    assert grav.hardware_params.num_cores == 64
    assert grav.hardware_params.vector_unit_bytes == 16
    epyc = SearchTask(grav.workload_key, "llvm -mcpu=znver2")
    assert epyc.hardware_params.num_cores == 32
    sky = SearchTask(grav.workload_key, "llvm -mcpu=skylake-avx512")
    assert sky.hardware_params.num_cores == (os.cpu_count() or 1)


def test_measure_programs_target_retargeting(tmp_path):
    """A to-measure pool measured --target'ed to a platform emits
    records carrying that platform's target string with that platform's
    costs (reference measure_programs.py rebuilds tasks from its
    required --target; TenSet measured one cuda pool on k80 AND t4)."""
    from vae_extent_search_tpu.records import make_record, save_records
    from scripts.measure_programs import remeasure_file

    task = _matmul_task("llvm")
    states = make_states(task, 8, seed=2)
    pool = str(tmp_path / "pool.json")
    save_records(pool, [
        make_record(task, st.transform_steps, [0.0], 0, 0.0, 0.0)
        for st in states], mode="w")

    grav_target = "llvm -mtriple=aarch64-linux-gnu -mattr=+neon"
    out_g = str(tmp_path / "grav.json")
    remeasure_file(pool, out_g, AnalyticRunner(), target=grav_target)
    out_s = str(tmp_path / "sky.json")
    remeasure_file(pool, out_s, AnalyticRunner(),
                   target="llvm -mcpu=skylake-avx512")

    recs_g, recs_s = load_records(out_g), load_records(out_s)
    assert all(r.inp.task.target == grav_target for r in recs_g)
    assert all(r.inp.task.target == "llvm -mcpu=skylake-avx512"
               for r in recs_s)
    cg = np.array([r.res.costs[0] for r in recs_g])
    cs = np.array([r.res.costs[0] for r in recs_s])
    assert not np.allclose(cg, cs)

    # cross-kind re-targeting is rejected
    with pytest.raises(SystemExit):
        remeasure_file(pool, str(tmp_path / "bad.json"), AnalyticRunner(),
                       target="cuda -model=k80")


def test_dataset_random_split_by_target():
    """by_target split (reference dataset.py:152-179): train targets
    keep their tasks, everything else is test; data survives intact."""
    ds = Dataset()
    rng = np.random.default_rng(0)
    targets = ["llvm -mcpu=skylake-avx512", "llvm -mcpu=core-avx2",
               "cuda -model=k80"]
    for t_i, target in enumerate(targets):
        for w in range(3):
            task = LearningTask(f"wk{w}", target)
            feats = np.asarray([rng.standard_normal(4).astype(np.float32)
                                for _ in range(10)], dtype=object)
            ds.load_task_data(task, feats,
                              rng.random(10).astype(np.float32), 0.01)
    train, test = ds.random_split_by_target(
        train_targets=targets[:2])
    assert {t.target for t in train.tasks()} == set(targets[:2])
    assert {t.target for t in test.tasks()} == {targets[2]}
    assert len(train) == 60 and len(test) == 30
    # throughputs survive the split unchanged
    t0 = LearningTask("wk0", targets[0])
    np.testing.assert_array_equal(train.throughputs[t0],
                                  ds.throughputs[t0])


def test_measure_programs_cli_per_platform_folders(tmp_path):
    """The CLI writes per-platform record folders (reference
    measure_records/<platform>/*.json layout)."""
    from vae_extent_search_tpu.records import make_record, save_records

    task = _matmul_task("llvm")
    states = make_states(task, 6, seed=4)
    pool_dir = tmp_path / "pools"
    pool_dir.mkdir()
    pool = str(pool_dir / "t1.json")
    save_records(pool, [
        make_record(task, st.transform_steps, [0.0], 0, 0.0, 0.0)
        for st in states], mode="w")

    env = dict(os.environ, VES_DATASET_ROOT=str(tmp_path / "ds"),
               JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "measure_programs.py"),
         "--in-folder", str(pool_dir), "--runner", "analytic",
         "--target", "llvm -mcpu=core-avx2"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    out = tmp_path / "ds" / "measure_records" / "e5-2673" / "t1.json"
    assert out.exists(), r.stdout
    recs = load_records(str(out))
    assert len(recs) == 6
    assert all(r.inp.task.target == "llvm -mcpu=core-avx2" for r in recs)

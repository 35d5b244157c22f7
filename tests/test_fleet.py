"""collect_fleet end-to-end: master -> 2 worker processes -> gather.

Drives the reference's cluster-collection protocol
(collect_aws/{collect_master,collect_worker,gather_master}.py) on one
host with the local-subprocess transport: the master launches two
workers with interleaved file shards, each worker measures its shard
and zips ``dataset_part_<start>_<end>.zip``, and the gather step merges
the zips into one records folder that must equal a direct
single-process measurement of the whole corpus (the analytic runner is
deterministic under a fixed seed). The SSH transport differs only in
the launch/fetch command strings (tested via --dry-run)."""

import glob
import os
import subprocess
import sys

import pytest

from vae_extent_search_tpu.records import (
    SearchTask,
    load_records,
    make_record,
    make_workload_key,
    save_records,
)
from vae_extent_search_tpu.search.measure import AnalyticRunner
from vae_extent_search_tpu.search.sketch import make_states

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLEET = os.path.join(REPO, "scripts", "collect_fleet")
TGT = "llvm -mcpu=skylake-avx512"


@pytest.fixture(scope="module")
def to_measure_folder(tmp_path_factory):
    """4 tiny to-measure task files (dump_programs output shape:
    MeasureInputs with dummy results)."""
    folder = tmp_path_factory.mktemp("to_measure")
    for i, (n, m, k) in enumerate([(32, 32, 32), (48, 32, 32),
                                   (32, 48, 32), (32, 32, 48)]):
        task = SearchTask(make_workload_key("matmul_add", (n, m, k)), TGT)
        states = make_states(task, 6, evo_population=16,
                             min_population=6, seed=10 + i)
        records = [make_record(task, st.transform_steps, costs=[0.0],
                               timestamp=0) for st in states]
        save_records(str(folder / f"task_{i}.json"), records)
    return str(folder)


def _run(cmd, cwd):
    r = subprocess.run(cmd, cwd=cwd, capture_output=True, text=True,
                       timeout=600)
    assert r.returncode == 0, f"{' '.join(cmd)}\n{r.stdout}\n{r.stderr}"
    return r.stdout


def test_fleet_master_workers_gather(to_measure_folder, tmp_path):
    env_master = tmp_path / "master"
    env_master.mkdir()
    w0 = str(tmp_path / "w0")
    w1 = str(tmp_path / "w1")

    # master: launch 2 local workers on interleaved shards and wait
    _run([sys.executable,
          os.path.join(FLEET, "collect_master.py"),
          "--workers", f"local:{w0}", f"local:{w1}",
          "--in-folder", to_measure_folder,
          "--runner", "analytic", "--noise", "0.1", "--seed", "7"],
         cwd=str(env_master))

    # each worker left exactly one zip and no raw records folder
    for wd, start in [(w0, 0), (w1, 1)]:
        zips = glob.glob(os.path.join(wd, "dataset_part_*.zip"))
        assert len(zips) == 1, zips
        assert os.path.basename(zips[0]) == f"dataset_part_{start}_4.zip"
        assert not os.path.exists(
            os.path.join(wd, "dataset", "measure_records"))

    # gather: merge both workers' zips into one records folder
    out = _run([sys.executable,
                os.path.join(FLEET, "gather_master.py"),
                "--workers", f"local:{w0}", f"local:{w1}",
                "--out-folder", "dataset/measure_records"],
               cwd=str(env_master))
    assert "gathered 4 record files" in out

    merged = sorted(glob.glob(
        str(env_master / "dataset" / "measure_records" / "*.json")))
    assert len(merged) == 4

    # the merged fleet output equals a direct single-process run of the
    # same corpus (deterministic analytic runner, same seed)
    from scripts.measure_programs import remeasure_file

    for f in merged:
        src = os.path.join(to_measure_folder, os.path.basename(f))
        direct = str(tmp_path / ("direct_" + os.path.basename(f)))
        remeasure_file(src, direct, AnalyticRunner(noise=0.1, seed=7))
        got = load_records(f)
        want = load_records(direct)
        assert len(got) == len(want) > 0
        for rg, rw in zip(got, want):
            assert rg.res.costs == rw.res.costs
            assert rg.inp.step_records == rw.inp.step_records


def test_fleet_ssh_transport_command_shape(to_measure_folder, tmp_path):
    """--dry-run prints the reference-shaped ssh+tmux launch and the
    scp gather command without executing them."""
    r = subprocess.run(
        [sys.executable, os.path.join(FLEET, "collect_master.py"),
         "--workers", "ssh:c64_00:repo", "ssh:c64_01:repo",
         "--in-folder", to_measure_folder, "--dry-run"],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=120)
    assert r.returncode == 0, r.stderr
    assert "[c64_00]" in r.stdout and "--start-idx 0" in r.stdout
    assert "[c64_01]" in r.stdout and "--start-idx 1" in r.stdout
    assert "--step-idx 2" in r.stdout


def test_worker_warmup_and_measurer_smoke(to_measure_folder, tmp_path):
    """Worker with --warmup and --no-zip leaves raw records (the
    reference's warmup measure is run then discarded)."""
    wd = str(tmp_path / "w")
    _run([sys.executable, os.path.join(FLEET, "collect_worker.py"),
          "--start-idx", "0", "--end-idx", "2", "--step-idx", "1",
          "--in-folder", to_measure_folder, "--workdir", wd,
          "--warmup", "--no-zip", "--noise", "0.1", "--seed", "3"],
         cwd=str(tmp_path))
    recs = glob.glob(os.path.join(wd, "dataset", "measure_records",
                                  "*.json"))
    assert len(recs) == 2
    assert all(len(load_records(f)) > 0 for f in recs)

"""Plain Ansor-style tuning driver — the experiment's baseline arm.

Parity: reference scripts/vae_experiments/ansor.py:62-113 — cached task
extraction through the PathManager, TaskScheduler-driven tuning with a
RecordToFile log + TSV latency trace, then best-schedule application and
latency evaluation. The reference compiles with ApplyHistoryBest and
benchmarks on a local GPU via an RPC context; candidate-kernel execution
is an external adapter here (TPU hosts don't run CUDA/LLVM kernels), so
evaluation is the ApplyHistoryBest latency estimate and, optionally, a
CommandRunner measurement fleet.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

from vae_extent_search_tpu.records import TuningOptions
from vae_extent_search_tpu.records.networks import get_network_tasks
from vae_extent_search_tpu.search.measure import (
    AnalyticRunner,
    CommandRunner,
    EmptyBuilder,
    RecordToFile,
)
from vae_extent_search_tpu.search.task_scheduler import (
    LogEstimatedLatency,
    PrintTableInfo,
    TaskScheduler,
)
from vae_extent_search_tpu.utils.misc import PathManager, seed_everything


def get_tasks(network, batch_size, image_size, target, path_manager,
              verbose=True, get_pkl=True):
    """Cached network->tasks (reference ansor.py:40-58: tasks_pkl_use /
    tasks_pkl_save through the PathManager)."""
    tasks = weights = None
    if get_pkl:
        loaded = path_manager.tasks_pkl_use()
        if loaded is not None:
            tasks, weights = loaded
    if not tasks:
        print("Extract tasks...")
        tasks, weights = get_network_tasks(network, batch_size, image_size,
                                           target)
        if not path_manager.tasks_pkl_check():
            path_manager.tasks_pkl_save(tasks, weights)
    if verbose:
        for idx, task in enumerate(tasks):
            print(f"========== Task {idx}  (workload key: "
                  f"{task.workload_key}) ==========")
    print(f"Total tasks length : {len(tasks)}")
    return tasks, weights


def run_tuning(tasks, weights, paths, num_measure_trials, runner):
    print("=" * 80)
    print("Begin tuning...")
    tuner = TaskScheduler(
        tasks, weights,
        callbacks=[PrintTableInfo(), LogEstimatedLatency(paths["tsv"])],
    )
    tune_option = TuningOptions(
        num_measure_trials=num_measure_trials,
        num_measures_per_round=16,
        builder=EmptyBuilder(),
        runner=runner,
        measure_callbacks=[RecordToFile(paths["json"])],
    )
    tuner.tune(tune_option)  # search_policy default: plain sketch+random


def evaluate(paths, network, batch_size, image_size, target):
    """Best-schedule latency from the tuning log (the ApplyHistoryBest
    estimate; real compile+benchmark is the external adapter)."""
    from scripts.estimate_network_latency import estimate_network_latency

    latency, missing = estimate_network_latency(
        [paths["json"]], network, batch_size, image_size, target
    )
    print(f"Estimated network latency: {latency * 1e3:.3f} ms "
          f"({missing} tasks unmeasured)")
    return latency


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--network", type=str, default="resnet_18")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--target", type=str, default="llvm -mcpu=skylake-avx512")
    p.add_argument("--num-measure-trials", type=int, default=256)
    p.add_argument("--work-dir", type=str, default="ansor_out")
    p.add_argument("--measure-command", type=str, default=None,
                   help="external measurement command (CommandRunner); "
                        "default: the analytic simulator")
    p.add_argument("--seed", type=int, default=42)
    args = p.parse_args()

    seed_everything(args.seed)
    pm = PathManager(args.work_dir, f"{args.network}-B{args.batch_size}",
                     args.target).makedirs()
    paths = {"json": pm.record_log(pm.network), "tsv": pm.latency_tsv()}

    tasks, weights = get_tasks(args.network, args.batch_size,
                               args.image_size, args.target, pm,
                               verbose=False)
    runner = (CommandRunner(args.measure_command) if args.measure_command
              else AnalyticRunner(noise=0.2))
    t0 = time.time()
    run_tuning(tasks, weights, paths, args.num_measure_trials, runner)
    print(f"tuning wall: {time.time() - t0:.1f}s")
    evaluate(paths, args.network, args.batch_size, args.image_size,
             args.target)


if __name__ == "__main__":
    main()

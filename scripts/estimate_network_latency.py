"""Estimate end-to-end network latency from recorded best schedules.

Parity: reference scripts/estimate_network_latency.py:10-35 —
sum(task_weight x best-recorded-cost) via ApplyHistoryBest.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vae_extent_search_tpu.records import iter_records
from vae_extent_search_tpu.records.dispatcher import ApplyHistoryBest
from vae_extent_search_tpu.records.networks import get_network_tasks


def estimate_network_latency(log_files, network, batch_size=1,
                             image_size=224, target="llvm"):
    ahb = ApplyHistoryBest()
    for path in log_files:
        ahb.update(iter_records(path))
    tasks, weights = get_network_tasks(network, batch_size, image_size,
                                       target)
    total = 0.0
    missing = 0
    for task, weight in zip(tasks, weights):
        c = ahb.best_cost(task.target, task.workload_key)
        if c == float("inf"):
            missing += 1
            continue
        total += c * weight
    return total, missing


def main():
    p = argparse.ArgumentParser()
    p.add_argument("logs", nargs="+")
    p.add_argument("--network", type=str, default="resnet_50")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--target", type=str, default="llvm")
    args = p.parse_args()

    total, missing = estimate_network_latency(
        args.logs, args.network, args.batch_size, args.image_size,
        args.target,
    )
    print(f"{args.network} (B{args.batch_size}, {args.image_size}): "
          f"estimated latency {total * 1e3:.3f} ms "
          f"({missing} tasks missing)")


if __name__ == "__main__":
    main()

"""Concatenate a network's per-task record files into one log.

Parity: reference scripts/network2measure_records.py.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.common import MEASURE_RECORD_FOLDER, NETWORK_INFO_FOLDER, clean_name
from vae_extent_search_tpu.records import SearchTask


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--network-task-pkl", type=str, required=True)
    p.add_argument("--out-file", type=str, required=True)
    args = p.parse_args()

    with open(args.network_task_pkl, "rb") as f:
        task_records, weights = pickle.load(f)
    tasks = [SearchTask.from_record(r) for r in task_records]

    n = 0
    with open(args.out_file, "w") as out:
        for task in tasks:
            fname = os.path.join(
                MEASURE_RECORD_FOLDER,
                clean_name((task.workload_key, task.target.split()[0]))
                + ".json",
            )
            if not os.path.exists(fname):
                print(f"missing: {fname}")
                continue
            with open(fname) as f:
                for line in f:
                    if line.strip() and not line.startswith("#"):
                        out.write(line)
                        n += 1
    print(f"wrote {n} records -> {args.out_file}")


if __name__ == "__main__":
    main()

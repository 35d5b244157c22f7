"""List every task in the network info folder.

Parity: reference scripts/print_all_tasks.py — enumerates all_tasks.pkl
with workload key, target and FLOP count.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.common import load_and_register_tasks


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--network-info-folder", default=None)
    args = p.parse_args()
    tasks = load_and_register_tasks(args.network_info_folder)
    for i, task in enumerate(tasks):
        dag = task.compute_dag
        print(f"[{i:5d}] flop={dag.flop_ct:.3e} target={task.target} "
              f"key={task.workload_key[:80]}")


if __name__ == "__main__":
    main()

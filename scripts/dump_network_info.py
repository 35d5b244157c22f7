"""Dump network task info for the benchmark grid.

Parity: reference scripts/dump_network_info.py — builds per-network task
lists for the network grid and writes ``*.task.pkl`` files plus the global
``all_tasks.pkl`` registry (:139-241).
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.common import NETWORK_INFO_FOLDER, clean_name
from vae_extent_search_tpu.records.networks import (
    build_network_keys,
    get_network_tasks,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--target", type=str, default="llvm")
    p.add_argument("--networks", nargs="*", default=None)
    args = p.parse_args()

    os.makedirs(NETWORK_INFO_FOLDER, exist_ok=True)
    all_tasks = {}
    keys = build_network_keys()
    if args.networks:
        keys = [k for k in keys if k[0] in args.networks]

    for name, shape_args in keys:
        try:
            tasks, weights = get_network_tasks(
                name, *shape_args, target=args.target
            )
        except ValueError:
            continue
        network_key = (name, list(shape_args))
        out = os.path.join(
            NETWORK_INFO_FOLDER,
            clean_name((network_key, args.target)) + ".task.pkl",
        )
        with open(out, "wb") as f:
            pickle.dump(([t.to_record() for t in tasks], weights), f)
        for t in tasks:
            all_tasks[(t.workload_key, t.target)] = t.to_record()
        print(f"{name} {shape_args}: {len(tasks)} tasks -> {out}")

    with open(os.path.join(NETWORK_INFO_FOLDER, "all_tasks.pkl"), "wb") as f:
        pickle.dump(list(all_tasks.values()), f)
    print(f"all_tasks.pkl: {len(all_tasks)} unique tasks")


if __name__ == "__main__":
    main()

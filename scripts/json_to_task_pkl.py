"""Featurize one record log and pickle the per-store dataset arrays.

Parity: reference scripts/json_to_task_pkl.py — the minimal demo of
get_per_store_features_from_file (which here runs through the native
featurizer when libves_native.so is built).
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vae_extent_search_tpu.features.per_store import (
    get_per_store_features_from_file,
)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("log_file")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    feats, throughputs, task_ids, min_costs = (
        get_per_store_features_from_file(args.log_file)
    )
    # default next to the CWD, not next to the (possibly read-only)
    # input log
    out = args.out or os.path.basename(args.log_file) + ".task.pkl"
    with open(out, "wb") as f:
        pickle.dump((feats, throughputs, task_ids, min_costs), f)
    print(f"{len(feats)} records, {len(min_costs)} tasks -> {out}")


if __name__ == "__main__":
    main()

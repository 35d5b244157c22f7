"""Build a performance dataset from measure-record logs.

Parity: reference scripts/make_dataset.py — select record files (hold-out
and sample-count options) and run make_dataset_from_log_file with
min_sample_size 48 (:204-206).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vae_extent_search_tpu.data import make_dataset_from_log_file


def main():
    p = argparse.ArgumentParser()
    p.add_argument("logs", nargs="+", type=str,
                   help="record log files (globs ok)")
    p.add_argument("--out-file", type=str, default="dataset.pkl")
    p.add_argument("--min-sample-size", type=int, default=48)
    p.add_argument("--n-threads", type=int, default=1,
                   help="native featurizer threads (collection boxes)")
    p.add_argument("--n-task", type=int, default=None,
                   help="cap the number of record files used")
    args = p.parse_args()

    files = []
    for pat in args.logs:
        files.extend(sorted(glob.glob(pat)))
    if args.n_task:
        files = files[: args.n_task]
    make_dataset_from_log_file(files, args.out_file, args.min_sample_size,
                               n_threads=args.n_threads)


if __name__ == "__main__":
    main()

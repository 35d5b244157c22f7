"""Fleet collection worker: measure an assigned shard then exit.

Parity: reference scripts/collect_aws worker flow (workers shut themselves
down when done, collect_aws/README.md:10). --auto-shard derives this
worker's shard from jax.process_index() on a multi-host pod (the DCN-level
task sharding of SURVEY §5).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from scripts.measure_programs import remeasure_file
from vae_extent_search_tpu.search.measure import AnalyticRunner


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--to-measure-glob", type=str,
                   default="dataset/to_measure_programs/*.json")
    p.add_argument("--out-folder", type=str, default="dataset/measure_records")
    p.add_argument("--shard-idx", type=int, default=0)
    p.add_argument("--num-shards", type=int, default=1)
    p.add_argument("--auto-shard", action="store_true",
                   help="shard by jax.process_index()")
    args = p.parse_args()

    shard_idx, num_shards = args.shard_idx, args.num_shards
    if args.auto_shard:
        from vae_extent_search_tpu.parallel.multihost import (
            maybe_initialize_distributed,
        )

        shard_idx, num_shards = maybe_initialize_distributed()

    files = sorted(glob.glob(args.to_measure_glob))[shard_idx::num_shards]
    runner = AnalyticRunner(noise=0.2)
    os.makedirs(args.out_folder, exist_ok=True)
    for f in files:
        out = os.path.join(args.out_folder, os.path.basename(f))
        n = remeasure_file(f, out, runner)
        print(f"[shard {shard_idx}/{num_shards}] {f}: {n} programs")


if __name__ == "__main__":
    main()

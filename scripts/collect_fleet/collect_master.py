"""Fleet collection master: shard measurement jobs across workers.

Parity: reference scripts/collect_aws/collect_master.py + README —
master SSH-fans-out per-task shards of measure_programs.py
(--start-idx/--end-idx/--step-idx) to named workers and gathers zipped
record logs. TPU-era equivalent: the same sharding contract driven over
SSH or a shared filesystem; on a JAX multi-host pod the sharding is by
process_index instead (see collect_worker.py --auto-shard).
"""

import argparse
import glob
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workers", nargs="+", required=True,
                   help="worker hostnames (ssh) or 'local'")
    p.add_argument("--to-measure-glob", type=str,
                   default="dataset/to_measure_programs/*.json")
    p.add_argument("--out-folder", type=str,
                   default="dataset/measure_records")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args()

    files = sorted(glob.glob(args.to_measure_glob))
    n_workers = len(args.workers)
    procs = []
    for wi, worker in enumerate(args.workers):
        shard = files[wi::n_workers]
        for f in shard:
            cmd = [
                sys.executable, "scripts/measure_programs.py",
                "--in-file", f,
                "--out-file", os.path.join(args.out_folder,
                                           os.path.basename(f)),
            ]
            if worker != "local":
                cmd = ["ssh", worker] + cmd
            if args.dry_run:
                print(" ".join(cmd))
            else:
                procs.append(subprocess.Popen(cmd))
    for pr in procs:
        pr.wait()


if __name__ == "__main__":
    main()

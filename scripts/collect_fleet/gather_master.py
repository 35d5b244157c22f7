"""Fleet gather: copy worker zip shards back and merge the records.

Parity: reference scripts/collect_aws/gather_master.py — after the
workers finish, the master scp's every ``dataset_part_*.zip`` home.
This version also merges them: each zip's ``dataset/measure_records/*``
entries are extracted into one records folder (shards are disjoint by
construction — interleaved file indices — so merging is pure union;
same-named files from different shards cannot occur).

Sources mirror collect_master worker specs:
- ``ssh:<host>[:<remote_repo_dir>]`` — scp the zips back.
- ``local:<workdir>`` — read the zips from a local worker directory.
"""

import argparse
import glob
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def fetch_zips(spec: str, stage_dir: str) -> list:
    if spec.startswith("ssh:"):
        parts = spec.split(":", 2)
        host = parts[1]
        repo_dir = parts[2] if len(parts) > 2 else "vae-extent-search-tpu"
        # per-host staging: the shared dir would re-glob zips from
        # earlier sources (double merge) and stale zips from previous
        # gather runs (cross-experiment contamination)
        host_dir = os.path.join(stage_dir, host.replace("@", "_"))
        os.makedirs(host_dir, exist_ok=True)
        for old in glob.glob(os.path.join(host_dir,
                                          "dataset_part_*.zip")):
            os.remove(old)
        cmd = (f"scp -o StrictHostKeyChecking=no "
               f"{host}:{repo_dir}/dataset_part_*.zip {host_dir}/")
        print(cmd)
        subprocess.run(cmd, shell=True, check=True)
        return sorted(glob.glob(os.path.join(host_dir,
                                             "dataset_part_*.zip")))
    if spec == "local" or spec.startswith("local:"):
        workdir = spec.split(":", 1)[1] if ":" in spec else "."
        return sorted(glob.glob(os.path.join(workdir,
                                             "dataset_part_*.zip")))
    raise SystemExit(f"unknown source spec {spec!r}")


def merge_zip(zpath: str, out_folder: str) -> int:
    n = 0
    with zipfile.ZipFile(zpath) as zf:
        for name in zf.namelist():
            base = os.path.basename(name)
            if not base:
                continue
            dest = os.path.join(out_folder, base)
            with zf.open(name) as src, open(dest, "wb") as dst:
                dst.write(src.read())
            n += 1
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workers", nargs="+", required=True,
                   help="where the zips live: ssh:<host>[:<repo_dir>] "
                        "or local:<workdir>")
    p.add_argument("--out-folder", type=str,
                   default="dataset/measure_records")
    p.add_argument("--stage-dir", type=str, default="fleet_gather",
                   help="staging dir for scp'd zips")
    args = p.parse_args()

    os.makedirs(args.out_folder, exist_ok=True)
    total_files = 0
    for spec in args.workers:
        for zpath in fetch_zips(spec, args.stage_dir):
            n = merge_zip(zpath, args.out_folder)
            total_files += n
            print(f"{zpath}: merged {n} record files")
    print(f"gathered {total_files} record files -> {args.out_folder}")


if __name__ == "__main__":
    main()

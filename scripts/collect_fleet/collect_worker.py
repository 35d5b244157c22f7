"""Fleet collection worker: measure an assigned shard, zip, exit.

Parity: reference scripts/collect_aws/collect_worker.py — the worker
(optionally) runs one warmup measurement and discards it, measures its
interleaved file shard via measure_programs.py
(--start-idx/--end-idx/--step-idx), zips the records into
``dataset_part_<start>_<end>.zip``, deletes the raw records folder, and
shuts the machine down (collect_aws/collect_worker.py:17-35). Here the
zip is written with ``zipfile`` (archive paths rooted at
``dataset/measure_records/...`` exactly like the reference's
``zip -r dataset/measure_records``) and ``--shutdown`` is opt-in.

``--auto-shard`` derives (shard, n_shards) from ``jax.process_index()``
on a multi-host pod — the DCN-level task sharding of SURVEY §5 — instead
of the explicit indices.
"""

import argparse
import glob
import os
import shutil
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)


def run_shard(in_folder: str, out_folder: str, start: int, end,
              step: int, runner: str, noise: float, seed: int) -> int:
    """Measure files [start:end:step] of in_folder into out_folder.
    In-process equivalent of the reference's
    ``python3 measure_programs.py --start-idx ... --step-idx ...``."""
    from scripts.measure_programs import remeasure_file
    from vae_extent_search_tpu.search.measure import runner_from_spec

    r = runner_from_spec(runner, noise=noise, seed=seed)

    files = sorted(glob.glob(os.path.join(in_folder, "*.json")))
    end = len(files) if end is None else end
    files = files[start:end:step]
    os.makedirs(out_folder, exist_ok=True)
    total = 0
    for f in files:
        out = os.path.join(out_folder, os.path.basename(f))
        n = remeasure_file(f, out, r)
        total += n
        print(f"[shard {start}/{step}] {f}: {n} programs", flush=True)
    return total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--start-idx", type=int, default=0)
    p.add_argument("--end-idx", type=int, default=None)
    p.add_argument("--step-idx", type=int, default=1)
    p.add_argument("--auto-shard", action="store_true",
                   help="shard by jax.process_index() on a multi-host "
                        "pod instead of explicit indices")
    p.add_argument("--in-folder", type=str,
                   default="dataset/to_measure_programs")
    p.add_argument("--workdir", type=str, default=".",
                   help="worker working directory: records + zip land "
                        "under it (local-transport isolation)")
    p.add_argument("--runner", type=str, default="analytic")
    p.add_argument("--noise", type=float, default=0.2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--warmup", action="store_true")
    p.add_argument("--no-zip", action="store_true",
                   help="leave raw records in place (skip the zip + "
                        "cleanup step)")
    p.add_argument("--shutdown", action="store_true",
                   help="power off when done (reference AWS workers; "
                        "requires privileges — off by default)")
    args = p.parse_args()

    start, end, step = args.start_idx, args.end_idx, args.step_idx
    if args.auto_shard:
        from vae_extent_search_tpu.parallel.multihost import (
            maybe_initialize_distributed,
        )
        start, step = maybe_initialize_distributed()
        end = None

    records_dir = os.path.join(args.workdir, "dataset", "measure_records")

    if args.warmup:
        # reference: measure one file, then clear the logs — warms the
        # builder/runner stack so the first real timings are clean
        run_shard(args.in_folder, records_dir, 0, 1, 1,
                  args.runner, args.noise, args.seed)
        shutil.rmtree(records_dir, ignore_errors=True)

    run_shard(args.in_folder, records_dir, start, end, step,
              args.runner, args.noise, args.seed)

    if not args.no_zip:
        end_name = end if end is not None else "all"
        zpath = os.path.join(args.workdir,
                             f"dataset_part_{start}_{end_name}.zip")
        if os.path.exists(zpath):
            os.remove(zpath)
        with zipfile.ZipFile(zpath, "w", zipfile.ZIP_DEFLATED) as zf:
            for f in sorted(glob.glob(os.path.join(records_dir, "*"))):
                zf.write(f, os.path.join("dataset", "measure_records",
                                         os.path.basename(f)))
        shutil.rmtree(records_dir)
        print(f"zipped -> {zpath}", flush=True)

    if args.shutdown:
        os.system("sudo shutdown -h now")


if __name__ == "__main__":
    main()

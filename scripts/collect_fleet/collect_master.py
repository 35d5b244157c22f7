"""Fleet collection master: launch measurement workers over a fleet.

Parity: reference scripts/collect_aws/collect_master.py — the master
SSH-launches one detached worker per machine with an interleaved shard
of the to-measure task files (worker i measures files
[start=i : end : step=n_workers], the reference's
--start-idx/--end-idx/--step-idx contract, measure_programs.py:88-91);
each worker zips its records into ``dataset_part_<start>_<end>.zip``
and (on AWS) shuts its VM down; gather_master.py later copies the zips
back (collect_aws/README.md:7-14, gather_master.py).

Worker specs (the transport is the only per-spec difference — the
sharding/zip/gather protocol is identical):

- ``ssh:<host>[:<remote_repo_dir>]`` — launch detached on another
  machine via ``ssh ... tmux new-session -d`` exactly like the
  reference; gather later with gather_master.py.
- ``local[:<workdir>]`` — launch as a local subprocess with its own
  working directory (default: ``fleet_work/worker_<i>``). This drives
  the full protocol on one host: N worker processes, disjoint shards,
  per-worker zip artifacts, gather-merge.

The master waits for local workers; ssh workers are fire-and-forget
(detached in tmux) like the reference.
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

WORKER = os.path.join("scripts", "collect_fleet", "collect_worker.py")


def worker_cmd(start: int, end: int, step: int, args) -> list:
    cmd = [
        "python3", WORKER,
        "--start-idx", str(start), "--end-idx", str(end),
        "--step-idx", str(step),
        "--in-folder", args.in_folder,
        "--runner", args.runner,
    ]
    if args.noise is not None:
        cmd += ["--noise", str(args.noise)]
    if args.seed is not None:
        cmd += ["--seed", str(args.seed)]
    if args.warmup:
        cmd += ["--warmup"]
    if args.shutdown:
        cmd += ["--shutdown"]
    return cmd


def launch_ssh(host: str, repo_dir: str, cmd: list):
    """Detached launch on a remote machine, reference
    collect_master.py ssh_tmux_run: ssh <host> tmux new-session -d."""
    remote = f"cd {repo_dir}; " + " ".join(cmd)
    remote = remote.replace('"', '\\"')
    full = (f'ssh -o StrictHostKeyChecking=no {host} '
            f'"tmux new-session -d \\"{remote}\\""')
    print(full)
    ret = os.system(full)
    if ret != 0:
        # os.system returns a wait STATUS (exit code << 8); passing it
        # to SystemExit would truncate mod 256 and could read as success
        raise SystemExit(f"ssh launch failed on {host} "
                         f"(status {ret >> 8 or ret})")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workers", nargs="+", required=True,
                   help="worker specs: ssh:<host>[:<repo_dir>] or "
                        "local[:<workdir>]")
    p.add_argument("--in-folder", type=str,
                   default="dataset/to_measure_programs",
                   help="to-measure task files (shared path or "
                        "pre-synced on every worker)")
    p.add_argument("--n-tasks", type=int, default=None,
                   help="cap the file index range (reference n_tasks); "
                        "default: all files in --in-folder")
    p.add_argument("--runner", type=str, default="analytic")
    p.add_argument("--noise", type=float, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--warmup", action="store_true",
                   help="run + discard one warmup measurement first "
                        "(reference collect_worker.py warmup step)")
    p.add_argument("--shutdown", action="store_true",
                   help="workers power the machine down when done "
                        "(reference AWS behavior; ignored for local "
                        "workers, which just exit)")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args()

    if args.n_tasks is not None:
        end = args.n_tasks
    else:
        import glob
        end = len(glob.glob(os.path.join(args.in_folder, "*.json")))
        if end == 0:
            # the corpus may live only on the workers (--in-folder help:
            # "pre-synced on every worker") — a silent end=0 would launch
            # a whole fleet of no-op shards
            raise SystemExit(
                f"no task files under {args.in_folder!r} on this master; "
                "pass --n-tasks when the corpus lives on the workers")
    n_workers = len(args.workers)
    print(f"tasks: {end}, workers: {n_workers}, "
          f"tasks/worker <= {-(-end // max(n_workers, 1))}")

    procs = []
    for wi, spec in enumerate(args.workers):
        cmd = worker_cmd(wi, end, n_workers, args)
        if spec.startswith("ssh:"):
            parts = spec.split(":", 2)
            host = parts[1]
            repo_dir = parts[2] if len(parts) > 2 else "vae-extent-search-tpu"
            if args.dry_run:
                print(f"[{host}] {' '.join(cmd)}")
            else:
                launch_ssh(host, repo_dir, cmd)
        elif spec == "local" or spec.startswith("local:"):
            workdir = (spec.split(":", 1)[1] if ":" in spec
                       else os.path.join("fleet_work", f"worker_{wi}"))
            cmd += ["--workdir", workdir]
            cmd[0] = sys.executable
            cmd[1] = os.path.join(REPO, WORKER)
            if args.dry_run:
                print(f"[local {workdir}] {' '.join(cmd)}")
            else:
                os.makedirs(workdir, exist_ok=True)
                procs.append(subprocess.Popen(cmd))
        else:
            raise SystemExit(f"unknown worker spec {spec!r} "
                             "(want ssh:<host> or local[:<workdir>])")

    rc = 0
    for pr in procs:
        rc |= pr.wait()
    if procs:
        print(f"local workers done (rc={rc}); gather with "
              "gather_master.py")
    sys.exit(rc)


if __name__ == "__main__":
    main()

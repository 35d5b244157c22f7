"""Full multi-task sweep: the 13,848-task-scale driver (BASELINE config 5).

Per task (sharded across hosts by --shard-idx/--num-shards or
jax.process_index on a multi-host pod): generate a candidate pool ->
measure (simulated or replayed) -> featurize extents through the NATIVE
pipeline -> run the VAE-extent active search -> append a per-task result
row. Equivalent of running the reference's experiment across every TenSet
task, with the fleet mechanics of scripts/collect_aws replaced by
process-index sharding (SURVEY §5 DCN task sharding).
"""

import argparse
import csv
import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.common import clean_name
from vae_extent_search_tpu.records import SearchTask
from vae_extent_search_tpu.search import SelectionConfig, run_active_search
from vae_extent_search_tpu.search.measure import (
    AnalyticRunner,
    EmptyBuilder,
    ProgramMeasurer,
    RecordToFile,
)
from vae_extent_search_tpu.search.sketch import make_states


def sweep_task(task: SearchTask, work_dir: str, n_states: int,
               measure_size: int, seeds, max_phases: int,
               vae_epochs: int, reg_epochs: int, noise: float,
               mesh=None, pool_owner: bool = True,
               runner_spec: str = "analytic"):
    log = os.path.join(
        work_dir,
        clean_name((task.workload_key, task.target.split()[0])) + ".json",
    )
    done = log + ".done"
    if pool_owner:
        # gate on the COMPLETION sentinel, not the log: a run killed
        # mid-generation leaves a partial log and no sentinel — it must
        # be regenerated, not silently reused
        if not os.path.exists(done):
            if os.path.exists(log):
                os.remove(log)
            from vae_extent_search_tpu.search.measure import (
                runner_from_spec,
            )

            states = make_states(task, n_states, seed=2023)
            measurer = ProgramMeasurer(
                EmptyBuilder(), runner_from_spec(runner_spec, noise=noise),
                callbacks=[RecordToFile(log)],
            )
            for s in range(0, len(states), 256):
                measurer.measure(task, states[s:s + 256])
        # global-mesh mode: every process device_puts the SAME pool
        # onto the global mesh, so exactly one process may generate it
        # (concurrent appends to one log interleave, and a reader can
        # see a half-written file); the sentinel marks completion
        with open(done, "w"):
            pass
    else:
        # generation + analytic measurement of a large pool can run
        # many minutes; a non-owner dying early strands the owner at
        # the next cross-host collective, so wait long (overridable)
        wait_s = float(os.environ.get("VES_POOL_WAIT_S", "7200"))
        deadline = time.time() + wait_s
        while not os.path.exists(done):
            if time.time() > deadline:
                raise TimeoutError(f"pool owner never finished {log}")
            time.sleep(0.5)

    # featurize through the native pipeline (python fallback automatic)
    from vae_extent_search_tpu.records.fast_parser import (
        featurize_extents_native,
    )

    try:
        vecs, labels, status = featurize_extents_native(log)
    except (FileNotFoundError, OSError):
        from vae_extent_search_tpu.features import (
            extent_features_from_records,
        )
        from vae_extent_search_tpu.records import load_records

        feats, labels, _ = extent_features_from_records(load_records(log))
        vecs = list(feats)
        status = np.zeros(len(vecs), np.int32)

    ok = [i for i in range(len(vecs))
          if status[i] == 0 and vecs[i] is not None]
    if len(ok) < measure_size * 2:
        return None, {"reason": "pool_too_small", "pool": len(ok),
                      "raw_pool": len(vecs)}
    # modal length (the experiment's implicit uniform-length requirement)
    from collections import Counter

    modal = Counter(len(vecs[i]) for i in ok).most_common(1)[0][0]
    sel = [i for i in ok if len(vecs[i]) == modal]
    feats = np.stack([vecs[i] for i in sel])
    labs = np.asarray([labels[i] for i in sel], np.float32)
    if len(feats) < measure_size * 2:
        return None, {"reason": "modal_bucket_too_small",
                      "pool": len(feats), "raw_pool": len(vecs)}

    # one VAE pretrain per task, shared across sampling seeds (the
    # reference pretrains once per pool at script top level)
    from vae_extent_search_tpu.search import pretrain_pool_vae

    vae_params = pretrain_pool_vae(feats, vae_epochs=vae_epochs,
                                   bucket_shapes=True)
    rows = []
    for seed in seeds:
        res = run_active_search(
            feats, labs, measure_size=measure_size, max_phases=max_phases,
            vae_epochs=vae_epochs, reg_epochs=reg_epochs,
            selection=SelectionConfig(num_select=measure_size),
            sampling_seed=seed, bucket_shapes=True,
            pretrained_vae_params=vae_params, mesh=mesh,
        )
        rows.append({
            "workload_key": task.workload_key[:48],
            "n_candidates": len(feats),
            "seed": seed,
            "found": int(res.found),
            "phase": res.phase,
            "train_size": res.train_size,
            "used_time": round(res.used_time, 2),
            # final-model recall columns (meaningful on textured pools,
            # e.g. --runner analytic_hf; see docs/RECALL_FORENSIC.md)
            "top1": ("" if res.final_recall_topk is None
                     else res.final_recall_topk),
            "optimum_rank": ("" if res.final_optimum_rank is None
                             else res.final_optimum_rank),
        })
    return rows, None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--tasks-pkl", type=str, default=None,
                   help="all_tasks.pkl-style task list")
    p.add_argument("--networks", nargs="*",
                   default=["resnet_18", "mobilenet_v2"])
    p.add_argument("--target", type=str, default="llvm -mcpu=skylake-avx512")
    p.add_argument("--work-dir", type=str, default="sweep_records")
    p.add_argument("--out-csv", type=str, default="sweep_results.csv")
    p.add_argument("--n-states", type=int, default=1000)
    p.add_argument("--measure-size", type=int, default=32)
    p.add_argument("--seeds", nargs="+", type=int, default=[2000, 2001])
    p.add_argument("--max-phases", type=int, default=20)
    p.add_argument("--vae-epochs", type=int, default=200)
    p.add_argument("--reg-epochs", type=int, default=300)
    p.add_argument("--noise", type=float, default=0.25)
    p.add_argument("--runner", type=str, default="analytic",
                   help="pool measurement runner spec (see "
                        "runner_from_spec); analytic_hf gives textured "
                        "costs where the recall columns are meaningful")
    p.add_argument("--max-tasks", type=int, default=None)
    p.add_argument("--shard-idx", type=int, default=0)
    p.add_argument("--num-shards", type=int, default=1)
    p.add_argument("--auto-shard", action="store_true")
    p.add_argument("--global-mesh", action="store_true",
                   help="instead of sharding TASKS across processes "
                        "(--auto-shard, the DCN contract), every process "
                        "joins ONE global data mesh and each task's "
                        "device work (train step, fused selection) runs "
                        "collectively over all hosts' devices; process 0 "
                        "writes the CSV (tests/_mh_collective_worker.py "
                        "is the 2-process correctness gate for this path)")
    p.add_argument("--resume", action="store_true",
                   help="skip tasks whose rows already exist in --out-csv "
                        "(preemption recovery; relies on deterministic "
                        "task order)")
    args = p.parse_args()

    if args.tasks_pkl:
        with open(args.tasks_pkl, "rb") as f:
            tasks = [SearchTask.from_record(r) for r in pickle.load(f)]
    else:
        from vae_extent_search_tpu.records.networks import get_network_tasks

        tasks = []
        seen = set()
        for net in args.networks:
            for t, _ in zip(*get_network_tasks(net, target=args.target)):
                if t.workload_key not in seen:
                    seen.add(t.workload_key)
                    tasks.append(t)

    shard_idx, num_shards = args.shard_idx, args.num_shards
    mesh = None
    is_writer = True
    if args.global_mesh:
        import jax
        import numpy as _np
        from jax.sharding import Mesh

        from vae_extent_search_tpu.parallel.multihost import (
            maybe_initialize_distributed,
        )

        pid, _ = maybe_initialize_distributed()
        # tasks are NOT sharded: every process runs the same loop and
        # the per-task device work (pjit train step + sharded fused
        # selection) collectives across all hosts' devices
        mesh = Mesh(_np.asarray(jax.devices()), ("data",))
        is_writer = pid == 0
    elif args.auto_shard:
        from vae_extent_search_tpu.parallel.multihost import (
            maybe_initialize_distributed,
        )

        # joins the pod when VES_COORDINATOR/NUM_PROCESSES/PROCESS_ID
        # are set (or jax auto-detects one); no-op on a single host
        shard_idx, num_shards = maybe_initialize_distributed()
    tasks = tasks[shard_idx::num_shards]
    if args.max_tasks:
        tasks = tasks[: args.max_tasks]

    os.makedirs(args.work_dir, exist_ok=True)

    # Preemption recovery: the CSV is an append-only log written one task
    # at a time in deterministic task order, so a task is "done" iff the
    # log still has one unconsumed row for EVERY current seed under its
    # truncated key. Keying the multiset on (key, seed) keeps duplicate
    # 48-char prefixes honest and makes a resume with a grown --seeds
    # list re-run the task (instead of mis-skipping on a stale total).
    done_budget = {}
    if args.resume and os.path.exists(args.out_csv):
        from collections import Counter

        with open(args.out_csv, newline="") as f:
            done_budget = Counter(
                (r["workload_key"], int(r["seed"]))
                for r in csv.DictReader(f))

    print(f"[shard {shard_idx}/{num_shards}] {len(tasks)} tasks")
    t0 = time.time()
    all_rows = []
    skipped = []
    skipped_path = args.out_csv + ".skipped"
    for i, task in enumerate(tasks):
        key48 = task.workload_key[:48]
        seeds_to_run = []
        for s in args.seeds:
            if done_budget.get((key48, s), 0) > 0:
                done_budget[(key48, s)] -= 1
            else:
                seeds_to_run.append(s)
        if not seeds_to_run:
            print(f"  task {i + 1}/{len(tasks)}: resumed (rows in log)")
            continue
        rows, skip = sweep_task(
            task, args.work_dir, args.n_states, args.measure_size,
            seeds_to_run, args.max_phases, args.vae_epochs,
            args.reg_epochs, args.noise, mesh=mesh,
            pool_owner=is_writer, runner_spec=args.runner,
        )
        # shape bucketing (bucket_shapes=True) lets tasks share compiled
        # programs; still drop the executable cache periodically so the
        # LLVM CPU JIT cannot accumulate to OOM over thousands of tasks
        if (i + 1) % 64 == 0:
            import jax

            jax.clear_caches()
        if rows:
            all_rows.extend(rows)
            if not is_writer:
                # global-mesh mode: every process computed the same
                # rows; only process 0 owns the log
                continue
            # append incrementally: a crash or preemption mid-sweep keeps
            # every completed task's rows (the log is the checkpoint)
            exists = os.path.exists(args.out_csv)
            with open(args.out_csv, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
                if not exists:
                    w.writeheader()
                w.writerows(rows)
            found = sum(r["found"] for r in rows)
            print(f"  task {i + 1}/{len(tasks)}: top-1 found "
                  f"{found}/{len(rows)} seeds "
                  f"(phases {[r['phase'] for r in rows]})")
        else:
            # coverage honesty: every non-swept task lands in the
            # sidecar with its reason + usable pool size, so the CSV's
            # denominator is auditable (skips aren't silent)
            skipped.append({"workload_key": task.workload_key,
                            "target": task.target, **(skip or {})})
            if not is_writer:
                continue
            # resumed runs revisit skipped tasks (they write no CSV
            # rows); don't append a duplicate sidecar entry each time
            already = False
            if os.path.exists(skipped_path):
                with open(skipped_path, newline="") as f:
                    already = any(
                        r.get("workload_key") == task.workload_key
                        and r.get("target") == task.target
                        for r in csv.DictReader(f))
            if already:
                continue
            with open(skipped_path, "a", newline="") as f:
                w = csv.DictWriter(
                    f, fieldnames=["workload_key", "target", "reason",
                                   "pool", "raw_pool"])
                if f.tell() == 0:
                    w.writeheader()
                w.writerow(skipped[-1])
            print(f"  task {i + 1}/{len(tasks)}: skipped "
                  f"({(skip or {}).get('reason', '?')}, pool "
                  f"{(skip or {}).get('pool', '?')}) -> {skipped_path}")

    if all_rows or skipped:
        n_swept = len({r["workload_key"] for r in all_rows})
        print(f"coverage: {len(tasks)} tasks listed, ~{n_swept} swept "
              f"this run, {len(skipped)} skipped "
              f"(reasons in {skipped_path})")
    if all_rows:
        found_rate = np.mean([r["found"] for r in all_rows])
        mean_phase = np.mean([r["phase"] for r in all_rows])
        print(f"swept {len(tasks)} tasks in {time.time() - t0:.0f}s: "
              f"top-1 found rate {found_rate:.2f}, mean phases "
              f"{mean_phase:.2f} -> {args.out_csv}")


if __name__ == "__main__":
    main()

"""Measure to-measure program pools into record logs.

Parity: reference scripts/measure_programs.py — replays to-measure files
through ProgramMeasurer (builder+runner+RecordToFile), shardable via
--start-idx/--end-idx/--step-idx (:88-91), with the FLOP-dependent
timing-repeat policy (:107-120; see flop_repeat_count). On the TPU
framework, real candidate-kernel timing is an external adapter; the
built-in runners are ``analytic`` (deterministic simulator) and
``replay`` (costs from an existing log).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.common import (
    MEASURE_RECORD_FOLDER,
    TO_MEASURE_PROGRAM_FOLDER,
    clean_name,
)
from vae_extent_search_tpu.records import load_records
from vae_extent_search_tpu.search.measure import (
    EmptyBuilder,
    ProgramMeasurer,
    RecordToFile,
)


def remeasure_file(in_file: str, out_file: str, runner, batch: int = 64,
                   flop_repeats: bool = True, target: str = None):
    records = load_records(in_file)
    if not records:
        return 0
    task = records[0].inp.task
    if target and target != task.target:
        # re-target the pool: to-measure programs are generated once per
        # target kind and measured on each platform of that kind with
        # the records carrying the platform's target string (reference
        # measure_programs.py rebuilds tasks from its required --target;
        # TenSet measured one cuda pool on both k80 and t4)
        from vae_extent_search_tpu.records import SearchTask

        if target.split()[0] != (task.target.split()[0] if task.target
                                 else "llvm"):
            raise SystemExit(
                f"--target kind {target.split()[0]!r} does not match the "
                f"pool's kind {task.target!r}: schedule spaces differ "
                "across kinds; regenerate the pool with dump_programs")
        task = SearchTask(task.workload_key, target)
    if flop_repeats and hasattr(runner, "repeat"):
        # FLOP-dependent timing-repeat policy (reference
        # measure_programs.py:107-120): emitted records carry `repeat`
        # cost entries scaled to the task's arithmetic volume
        from vae_extent_search_tpu.search.measure import flop_repeat_count

        runner.repeat = flop_repeat_count(task.compute_dag.flop_ct)
    os.makedirs(os.path.dirname(out_file) or ".", exist_ok=True)
    if os.path.exists(out_file):
        os.remove(out_file)

    # fast path: runners that measure straight from step records (the
    # analytic simulator's native replay+infer+print batch) skip the
    # python State recovery entirely — bit-identical costs, measured
    # ~5x end-to-end (7.5x on the measure step; see docs/ROUND_NOTES.md)
    fast = getattr(runner, "run_record_lists", None)
    if fast is not None:
        results = fast(task, [r.inp.step_records for r in records])
        if results is not None:
            from vae_extent_search_tpu.records import (
                make_record,
                save_records,
            )

            # abort parity with ProgramMeasurer's max_continuous_error,
            # INCLUDING its persistence semantics: RecordToFile keeps
            # everything written before the abort, so save up to the
            # abort point before raising
            error_ct = 0
            cut = len(results)
            for i, res in enumerate(results):
                if res.error_no == 0:
                    error_ct = 0
                else:
                    error_ct += 1
                    if error_ct >= 150:
                        cut = i + 1
                        break
            out = [
                make_record(task, rec.inp.step_records, res.costs,
                            res.error_no, res.all_cost, res.timestamp)
                for rec, res in zip(records[:cut], results[:cut])
            ]
            save_records(out_file, out, mode="a")
            if cut < len(results):
                raise RuntimeError(
                    "too many continuous measurement errors")
            return len(out)

    measurer = ProgramMeasurer(
        EmptyBuilder(), runner, callbacks=[RecordToFile(out_file)]
    )
    n = 0
    for s in range(0, len(records), batch):
        chunk = records[s:s + batch]
        states = [r.inp.recover_state(infer_bound=True) for r in chunk]
        measurer.measure(task, states)
        n += len(states)
    return n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--in-file", type=str, default=None,
                   help="one to-measure file (else sweep --in-folder)")
    p.add_argument("--in-folder", type=str,
                   default=TO_MEASURE_PROGRAM_FOLDER,
                   help="folder of to-measure files, shardable via "
                        "--start-idx/--end-idx/--step-idx "
                        "(reference measure_programs.py:88-91)")
    p.add_argument("--out-file", type=str, default=None)
    p.add_argument("--runner", type=str, default="analytic",
                   help="analytic | replay | command:<external timer "
                        "invoked as '<cmd> in.json out.json'> | "
                        "service:<key>@<host>:<port> (measure through "
                        "the tracker/server service — the reference "
                        "RPCRunner topology, measure.py:434-611)")
    p.add_argument("--replay-log", type=str, default=None)
    p.add_argument("--noise", type=float, default=0.3)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--start-idx", type=int, default=0)
    p.add_argument("--end-idx", type=int, default=None)
    p.add_argument("--step-idx", type=int, default=1)
    p.add_argument("--resume", action="store_true",
                   help="skip files whose output already exists non-empty")
    p.add_argument("--no-flop-repeats", action="store_true",
                   help="disable the FLOP-dependent timing-repeat policy "
                        "(reference measure_programs.py:107-120) and emit "
                        "single-cost records")
    p.add_argument("--target", type=str, default=None,
                   help="measure the pools AS this platform target "
                        "(records carry it; the analytic runner prices "
                        "with its profile — search/platforms.py). Output "
                        "defaults to measure_records/<platform>/ like the "
                        "reference's per-platform record folders")
    args = p.parse_args()

    from vae_extent_search_tpu.search.measure import runner_from_spec

    runner = runner_from_spec(args.runner, noise=args.noise,
                              seed=args.seed, replay_log=args.replay_log)

    if args.in_file:
        files = [args.in_file]
    else:
        import glob

        files = sorted(glob.glob(os.path.join(args.in_folder, "*.json")))
        end = args.end_idx if args.end_idx is not None else len(files)
        files = files[args.start_idx:end:args.step_idx]
        if not files:
            print(f"no to-measure files under {args.in_folder}")
            return

    out_folder = MEASURE_RECORD_FOLDER
    if args.target:
        from vae_extent_search_tpu.search.platforms import (
            platform_for_target,
        )

        out_folder = os.path.join(MEASURE_RECORD_FOLDER,
                                  platform_for_target(args.target).name)

    for i, in_file in enumerate(files):
        out = args.out_file if (args.out_file and len(files) == 1) else \
            os.path.join(out_folder, os.path.basename(in_file))
        if args.resume and os.path.exists(out) and os.path.getsize(out) > 0:
            print(f"[{i + 1}/{len(files)}] exists, skip {out}", flush=True)
            continue
        n = remeasure_file(in_file, out, runner, batch=args.batch_size,
                           flop_repeats=not args.no_flop_repeats,
                           target=args.target)
        print(f"[{i + 1}/{len(files)}] measured {n} programs -> {out}",
              flush=True)


if __name__ == "__main__":
    main()

"""Multi-workload self-tuning: the gradient TaskScheduler allocates REAL
on-chip Pallas kernel measurements across a suite of kernel workloads.

This closes the reference's flagship flow (scripts/tune_network.py:63-109:
extract tasks -> TaskScheduler(gradient) -> tune -> ApplyHistoryBest ->
network latency) over the TPU's own compute substrate: the "network" is a
weighted suite of matmul/conv2d kernel shapes, each trial compiles + times
a real Pallas kernel on the attached chip (search/pallas_tuner.py), the
gradient strategy (Ansor §6, reference task_scheduler.py:418-474) decides
which workload's next round buys the most suite-latency reduction, and the
resulting log is a PallasKernelLibrary (ops/kernel_library.py) whose
weighted tuned latency is the estimate_network_latency analogue
(reference scripts/estimate_network_latency.py:10-35).

Suite entries, comma-free tokens, repeatable:
  matmul:MxNxK[:weight]
  conv2d:NxHxWxCOxCIxKHxKW[:weight]        (stride 1, same padding)
  fusedhead:NxDxHxLxT[:weight]             (the framework's own fused
                                            selection-head kernel:
                                            block x mc_chunk schedule)
  gbdthist:RxFxC2xC16xC64xC128[:weight]    (device-GBDT histogram tier
                                            ladder for a rows x census
                                            shape; C* = #features with
                                            <=2/<=16/<=64/<=128 bins)

The fusedhead/gbdthist families tune the framework's OWN kernels
(VERDICT r3 item 4): tuned records dispatch through the process
kernel library (VES_KERNEL_LIBRARY) into search/select.py and
models/boost_tpu.py, and the suite summary prints tuned-vs-hand-default
speedups for them.

Usage (chip):
  python scripts/tune_kernel_suite.py \
      --suite matmul:1536x1536x1536:2 conv2d:1x56x56x128x128x3x3:4 \
      --n-trials 96 --measures-per-round 8
CPU smoke test (--policy sketch: the default sketch.vae retrains the VAE
cost model every round and takes multiple minutes even at --n-trials 16;
plain `sketch` finishes in ~1 s):
  JAX_PLATFORMS=cpu python scripts/tune_kernel_suite.py --fake-timer \
      --policy sketch \
      --suite matmul:256x256x256 conv2d:1x8x8x128x128x3x3 --n-trials 16
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vae_extent_search_tpu.ops.conv2d_pallas import (
    conv_out_size,
    predicted_conv_seconds,
)
from vae_extent_search_tpu.ops.kernel_library import PallasKernelLibrary
from vae_extent_search_tpu.ops.matmul_pallas import predicted_seconds
from vae_extent_search_tpu.records import (
    SearchTask,
    TuningOptions,
    make_workload_key,
)
from vae_extent_search_tpu.search.measure import (
    EmptyBuilder,
    RecordToFile,
)
from vae_extent_search_tpu.search.pallas_tuner import (
    PallasKernelRunner,
    time_xla_conv2d,
    time_xla_matmul,
)
from vae_extent_search_tpu.search.task_scheduler import (
    LogEstimatedLatency,
    PrintTableInfo,
    TaskScheduler,
)


def parse_suite_entry(token: str):
    """-> (family, dims tuple, weight)."""
    parts = token.split(":")
    family = parts[0]
    dims = tuple(int(v) for v in parts[1].split("x"))
    weight = float(parts[2]) if len(parts) > 2 else 1.0
    if family == "matmul":
        if len(dims) != 3:
            raise SystemExit(f"matmul wants MxNxK, got {parts[1]!r}")
    elif family == "conv2d":
        if len(dims) != 7:
            raise SystemExit(f"conv2d wants NxHxWxCOxCIxKHxKW, got "
                             f"{parts[1]!r}")
        KH, KW = dims[5], dims[6]
        if KH % 2 == 0 or KW % 2 == 0:
            raise SystemExit(
                f"conv2d suite entries use 'same' padding, which needs odd "
                f"kernel sizes; got KH={KH} KW={KW}")
        if KH != KW:
            # the Pallas conv runner + XLA baseline plumb one scalar pad
            raise SystemExit(
                f"conv2d suite entries need square kernels (KH==KW); "
                f"got KH={KH} KW={KW}")
    elif family == "fusedhead":
        if len(dims) != 5:
            raise SystemExit(f"fusedhead wants NxDxHxLxT, got {parts[1]!r}")
        if dims[2] % 128 or dims[3] % 8:
            raise SystemExit(
                f"fusedhead needs H%128==0 and L%8==0 (the kernel's "
                f"layout contract), got H={dims[2]} L={dims[3]}")
    elif family == "gbdthist":
        if len(dims) != 6:
            raise SystemExit(
                f"gbdthist wants RxFxC2xC16xC64xC128, got {parts[1]!r}")
        if sum(dims[2:]) > dims[1]:
            raise SystemExit(
                f"gbdthist census {dims[2:]} exceeds F={dims[1]}")
    else:
        raise SystemExit(f"unknown suite family {family!r}")
    return family, dims, weight


def conv_same_padding(KH, KW):
    """'same' padding per spatial dim (odd kernels only; see parse)."""
    return (KH - 1) // 2, (KW - 1) // 2


def entry_workload_key(family, dims):
    if family == "matmul":
        return make_workload_key("matmul_auto_scheduler_test", dims)
    if family == "fusedhead":
        return make_workload_key("fused_head_layer", dims)
    if family == "gbdthist":
        return make_workload_key("gbdt_hist_layer", dims)
    N, H, W, CO, CI, KH, KW = dims
    pad_h, pad_w = conv_same_padding(KH, KW)
    return make_workload_key(
        "conv2d_layer", (N, H, W, CO, CI, KH, KW, [1, 1], [pad_h, pad_w]))


def entry_flops(family, dims):
    if family == "matmul":
        M, N, K = dims
        return 2.0 * M * N * K
    if family == "fusedhead":
        from vae_extent_search_tpu.search.pallas_tuner import (
            PallasFusedHeadRunner,
        )

        return PallasFusedHeadRunner.flop_estimate(*dims)
    if family == "gbdthist":
        return 2.0 * dims[0] * dims[1] * 256 * 16
    N, H, W, CO, CI, KH, KW = dims
    pad_h, pad_w = conv_same_padding(KH, KW)
    OH = conv_out_size(H, KH, 1, pad_h)
    OW = conv_out_size(W, KW, 1, pad_w)
    return 2.0 * N * OH * OW * CO * KH * KW * CI


DEFAULT_SUITE = [
    # a resnet-block-flavoured mix: three conv stages + a dense head
    "conv2d:1x56x56x128x128x3x3:4",
    "conv2d:1x28x28x256x256x3x3:4",
    "matmul:1536x1536x1536:1",
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--suite", type=str, nargs="+", default=DEFAULT_SUITE,
                   help="matmul:MxNxK[:w] / conv2d:NxHxWxCOxCIxKHxKW[:w]")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--n-trials", type=int, default=96,
                   help="total measurement trials across the suite")
    p.add_argument("--measures-per-round", type=int, default=8)
    p.add_argument("--strategy", type=str, default="gradient",
                   choices=["gradient", "round-robin"])
    p.add_argument("--policy", type=str, default="sketch.vae",
                   help="search policy spec (sketch.<cost-model>)")
    p.add_argument("--seed", type=int, default=2023)
    p.add_argument("--max-seconds", type=float, default=2.0)
    p.add_argument("--log-file", type=str, default="tune_kernel_suite.json")
    p.add_argument("--fake-timer", action="store_true",
                   help="CPU smoke test: analytic stand-in for the chip")
    p.add_argument("--skip-xla-baseline", action="store_true")
    args = p.parse_args()

    entries = [parse_suite_entry(t) for t in args.suite]

    # two task lists per entry (tune_pallas_kernel.py pattern): the llvm
    # donor drives sketch generation (CPU tiling rules are the schedule-
    # space donor), the tpu -model=<dtype> task keys the records so
    # ops/kernel_library.py can dispatch them later
    donor_tasks, record_tasks, weights = [], [], []
    for family, dims, weight in entries:
        wk = entry_workload_key(family, dims)
        donor_tasks.append(SearchTask(wk, "llvm"))
        record_tasks.append(SearchTask(wk, f"tpu -model={args.dtype}"))
        weights.append(weight)

    from vae_extent_search_tpu.search.pallas_tuner import (
        predicted_fusedhead_seconds,
        predicted_hist_seconds,
    )

    runner = PallasKernelRunner(
        dtype=args.dtype, max_seconds=args.max_seconds,
        matmul_time_fn=predicted_seconds if args.fake_timer else None,
        conv_time_fn=predicted_conv_seconds if args.fake_timer else None,
        fusedhead_time_fn=(predicted_fusedhead_seconds
                           if args.fake_timer else None),
        hist_time_fn=predicted_hist_seconds if args.fake_timer else None,
        verbose=not args.fake_timer,
    )
    tune_option = TuningOptions(
        num_measure_trials=args.n_trials,
        num_measures_per_round=args.measures_per_round,
        builder=EmptyBuilder(),
        runner=runner,
        measure_callbacks=[RecordToFile(args.log_file)],
    )
    scheduler = TaskScheduler(
        record_tasks, weights, strategy=args.strategy,
        callbacks=[PrintTableInfo(), LogEstimatedLatency()],
        seed=args.seed,
    )

    from vae_extent_search_tpu.search.cost_model import make_search_policies

    policies, cost_model = make_search_policies(
        args.policy, donor_tasks, seed=args.seed)

    # seed the framework-kernel families' hand-default schedules into
    # the log first (PreloadMeasuredStates role): the library's
    # min-cost query then never regresses production below the hand
    # defaults, and the GA gets the default as a measured anchor
    from vae_extent_search_tpu.search.measure import ProgramMeasurer
    from vae_extent_search_tpu.search.pallas_tuner import (
        default_config_state,
    )

    seeder = ProgramMeasurer(EmptyBuilder(), runner,
                             callbacks=[RecordToFile(args.log_file)],
                             max_continuous_error=10 ** 9)
    for task in record_tasks:
        st = default_config_state(task)
        if st is not None:
            res = seeder.measure(task, [st])
            print(f"  seeded hand-default config of "
                  f"{task.workload_key.split(',')[0]}: "
                  f"{res[0].costs[0] * 1e3:.3f} ms")

    t0 = time.time()
    scheduler.tune(tune_option, policies=policies, cost_model=cost_model)
    wall = time.time() - t0

    lib = PallasKernelLibrary.from_file(args.log_file)
    print(f"\nsuite tuned in {wall:.1f}s "
          f"({args.n_trials} trials, {runner.n_timed} distinct configs "
          f"compiled+timed); library holds {len(lib)} workloads")

    tuned_total, xla_total = 0.0, 0.0
    have_xla = not args.skip_xla_baseline and not args.fake_timer
    for (family, dims, weight), task in zip(entries, record_tasks):
        rec = lib.query(task.workload_key, dtype=args.dtype)
        if rec is None:
            print(f"  {family} {dims}: NO tuned record (all configs "
                  "invalid/errored)")
            continue
        sec = rec.res.mean_cost
        gf = entry_flops(family, dims) / sec / 1e9
        line = (f"  {family} {'x'.join(map(str, dims))} w={weight:g}: "
                f"tuned {sec*1e3:.3f} ms ({gf:.0f} GFLOP/s)")
        tuned_total += weight * sec
        if family in ("fusedhead", "gbdthist"):
            # the baseline for the framework's own kernels is the
            # hand-picked default schedule, measured through the SAME
            # runner/timing path (tuned-vs-default is the claim the
            # record log substantiates)
            if family == "fusedhead":
                from vae_extent_search_tpu.ops.fused_head_pallas import (
                    snap_fused_config,
                )

                import jax.numpy as jnp

                dcfg = snap_fused_config(*dims, 1024, dims[4],
                                         dtype=jnp.dtype(args.dtype))
                def_sec = runner.fusedhead._time_config(*dims, *dcfg)
                dcfg_s = f"block={dcfg[0]} tc={dcfg[1]}"
            else:
                dladder = (2, 16, 64, 128)
                def_sec = runner.hist._time_config(dims, dladder)
                dcfg_s = "ladder=2,16,64,128"
            line += (f" | default[{dcfg_s}] {def_sec*1e3:.3f} ms "
                     f"({def_sec/sec:.2f}x)")
        elif have_xla:
            if family == "matmul":
                xla_sec = time_xla_matmul(*dims, dtype=args.dtype)
            else:
                N, H, W, CO, CI, KH, KW = dims
                pad, _ = conv_same_padding(KH, KW)
                xla_sec = time_xla_conv2d(N, H, W, CO, CI, KH, KW, 1, pad,
                                          dtype=args.dtype)
            xla_total += weight * xla_sec
            line += f" | XLA {xla_sec*1e3:.3f} ms ({xla_sec/sec:.2f}x)"
        print(line)

    print(f"\nweighted suite latency (tuned Pallas): {tuned_total*1e3:.3f} ms")
    if have_xla and xla_total:
        print(f"weighted suite latency (XLA):          {xla_total*1e3:.3f} ms"
              f"  -> tuned at {xla_total/tuned_total:.2f}x XLA")


if __name__ == "__main__":
    main()

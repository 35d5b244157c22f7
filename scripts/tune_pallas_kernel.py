"""Self-tuning demo: the framework tunes its own TPU Pallas kernels.

The reference's end-to-end story is "tune kernels for the machine you run
on, learning which candidates to measure" (tune_network.py, vae_experiments/
tune_vae.py). Its machine runs TVM-lowered CPU/GPU kernels; this framework's
machine is a TPU running Pallas kernels — so the TPU-native flagship demo is
the framework tuning its OWN compute substrate:

  sketch-GA candidate pool (matmul tilings)        search/sketch.py
    -> extent featurization                        features/extent.py
    -> VAE pretrain + active-learning selection    search/active_loop.py
    -> REAL on-chip measurement of the Pallas      search/pallas_tuner.py
       matmul each schedule maps onto              ops/matmul_pallas.py

The reference cannot do this at all: its measurement path builds TVM
kernels for host CPUs/GPUs. Here the "hardware in the loop" is the chip the
search itself runs on, and the result is a tuned (bm, bn, bk) block config
judged against XLA's own dot at the same shape/dtype.

Two target-kernel families: blocked matmul (ops/matmul_pallas.py) and
implicit-GEMM conv2d+bias+relu (ops/conv2d_pallas.py — the reference's
flagship tutorial workload, tune_conv2d_layer_cuda.py:56-62).

Usage (chip):
  python scripts/tune_pallas_kernel.py --dim 1536 --n-candidates 1000 \
      --measure-size 16 --n-phases 6
  python scripts/tune_pallas_kernel.py --arm random   # stub-selection arm
  python scripts/tune_pallas_kernel.py --workload conv2d \
      --conv 1 56 56 256 256 3 3      # N H W CO CI KH KW (stride 1, pad 1)
CPU smoke test:
  JAX_PLATFORMS=cpu python scripts/tune_pallas_kernel.py --fake-timer ...

The written log is a kernel library: ops/kernel_library.py replays it into
block configs so framework code dispatches the tuned kernel afterwards
(``VES_KERNEL_LIBRARY=tune_pallas.json``, then ``tuned_matmul(M, N, K)``)
— the reference's tune-once / ApplyHistoryBest-every-build flow
(dispatcher.py:149-308) closed over the TPU's own compute substrate.
"""

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vae_extent_search_tpu.features.extent import extent_vector
from vae_extent_search_tpu.ops.conv2d_pallas import (
    conv_out_size,
    predicted_conv_seconds,
    snap_conv_config_to_hw,
)
from vae_extent_search_tpu.ops.matmul_pallas import (
    predicted_seconds,
    snap_config_to_hw,
)
from vae_extent_search_tpu.records import SearchTask, make_workload_key
from vae_extent_search_tpu.records.serde import ERROR_NO_ERROR
from vae_extent_search_tpu.search.active_loop import (
    SelectionConfig,
    run_active_search_online,
)
from vae_extent_search_tpu.search.measure import (
    EmptyBuilder,
    ProgramMeasurer,
    RecordToFile,
)
from vae_extent_search_tpu.search.pallas_tuner import (
    PallasConv2dRunner,
    PallasMatmulRunner,
    state_to_conv_config,
    state_to_matmul_config,
    time_xla_conv2d,
    time_xla_matmul,
)
from vae_extent_search_tpu.search.sketch import make_states


def pad_extent_features(states):
    vecs = [extent_vector(st) for st in states]
    d = max(len(v) for v in vecs)
    X = np.zeros((len(vecs), d), np.float32)
    for i, v in enumerate(vecs):
        X[i, : len(v)] = v
    return X


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workload", type=str, default="matmul",
                   choices=["matmul", "conv2d"])
    p.add_argument("--dim", type=int, default=1536,
                   help="square matmul size (or use --m/--n/--k)")
    p.add_argument("--m", type=int, default=None)
    p.add_argument("--n", type=int, default=None)
    p.add_argument("--k", type=int, default=None)
    p.add_argument("--conv", type=int, nargs=7,
                   default=[1, 56, 56, 256, 256, 3, 3],
                   metavar=("N", "H", "W", "CO", "CI", "KH", "KW"),
                   help="conv2d_layer dims (stride fixed 1)")
    p.add_argument("--pad", type=int, default=None,
                   help="conv padding (default: same, (KH-1)//2)")
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--n-candidates", type=int, default=1000)
    p.add_argument("--measure-size", type=int, default=16)
    p.add_argument("--n-phases", type=int, default=6)
    p.add_argument("--arm", type=str, default="model",
                   choices=["model", "random"],
                   help="selection arm: full model-based mix, or the "
                        "reference online arm's random stub (baseline)")
    p.add_argument("--vae-epochs", type=int, default=500)
    p.add_argument("--reg-epochs", type=int, default=1000)
    p.add_argument("--seed", type=int, default=2023)
    p.add_argument("--sampling-seed", type=int, default=2000)
    p.add_argument("--max-seconds", type=float, default=2.0,
                   help="reject configs predicted slower than this")
    p.add_argument("--log-file", type=str, default="tune_pallas.json")
    p.add_argument("--out-csv", type=str, default=None,
                   help="append a summary row here")
    p.add_argument("--fake-timer", action="store_true",
                   help="CPU smoke test: analytic stand-in for the chip")
    p.add_argument("--skip-xla-baseline", action="store_true")
    args = p.parse_args()

    if args.workload == "matmul":
        M = args.m or args.dim
        N = args.n or args.dim
        K = args.k or args.dim
        wk = make_workload_key("matmul_auto_scheduler_test", (M, N, K))
        shape_desc = f"[{M}x{K}] @ [{K}x{N}]"
        to_cfg = state_to_matmul_config
        snap = lambda c: snap_config_to_hw(M, N, K, *c)   # noqa: E731
        flops = 2.0 * M * N * K
        fake_fn = lambda *a: predicted_seconds(*a)        # noqa: E731
        runner_cls = PallasMatmulRunner
        xla_fn = lambda: time_xla_matmul(M, N, K, dtype=args.dtype)  # noqa: E731
    else:
        cN, cH, cW, cCO, cCI, cKH, cKW = args.conv
        pad = args.pad if args.pad is not None else (cKH - 1) // 2
        params = (cN, cH, cW, cCO, cCI, cKH, cKW, 1, pad)
        wk = make_workload_key(
            "conv2d_layer",
            (cN, cH, cW, cCO, cCI, cKH, cKW, [1, 1], [pad, pad]))
        OH = conv_out_size(cH, cKH, 1, pad)
        OW = conv_out_size(cW, cKW, 1, pad)
        shape_desc = (f"conv2d {cN}x{cH}x{cW}x{cCI} * "
                      f"{cKH}x{cKW}x{cCI}x{cCO} (pad {pad})")
        to_cfg = state_to_conv_config
        snap = lambda c: snap_conv_config_to_hw(*params, *c)  # noqa: E731
        flops = 2.0 * cN * OH * OW * cCO * cKH * cKW * cCI
        fake_fn = lambda *a: predicted_conv_seconds(*a)       # noqa: E731
        runner_cls = PallasConv2dRunner
        xla_fn = lambda: time_xla_conv2d(*params, dtype=args.dtype)  # noqa: E731

    task = SearchTask(wk, "llvm")  # schedule-space donor for the tilings
    # records carry the chip target + dtype so ops/kernel_library.py can
    # dispatch them later (the -model attribute is the dispatcher's
    # best_by_model key — here "hardware model" = timed operand dtype)
    record_task = SearchTask(wk, f"tpu -model={args.dtype}")

    t0 = time.time()
    print(f"generating {args.n_candidates} candidate tilings for "
          f"{shape_desc} {args.dtype} ...")
    states = make_states(task, args.n_candidates, seed=args.seed)
    X = pad_extent_features(states)
    cfgs = [to_cfg(st)[0] for st in states]
    raw = {c for c in cfgs if c is not None}
    snapped = {snap(c) for c in raw}
    print(f"  {len(states)} states -> {len(raw)} raw tilings -> "
          f"{len(snapped)} hw-legal block configs in {time.time()-t0:.1f}s")

    runner = runner_cls(dtype=args.dtype,
                        max_seconds=args.max_seconds,
                        time_fn=fake_fn if args.fake_timer else None,
                        verbose=True)
    measurer = ProgramMeasurer(EmptyBuilder(), runner,
                               callbacks=[RecordToFile(args.log_file)],
                               max_continuous_error=10 ** 9)

    def measure_fn(idxs):
        results = measurer.measure(record_task, [states[i] for i in idxs])
        return np.asarray(
            [-np.log((r.mean_cost if r.error_no == ERROR_NO_ERROR else 1e10)
                     + 1e-8) for r in results], np.float32)

    res = run_active_search_online(
        X, measure_fn,
        measure_size=args.measure_size,
        max_phases=args.n_phases,
        vae_epochs=args.vae_epochs,
        reg_epochs=args.reg_epochs,
        selection=SelectionConfig(num_select=args.measure_size),
        sampling_seed=args.sampling_seed,
        train_seed=args.seed,
        select=args.arm,
        verbose=True,
    )

    best_cfg = snap(to_cfg(states[res.best_index])[0])
    best_sec = float(np.exp(-res.best_label))
    gflops = flops / best_sec / 1e9
    cfg_names = (("bm", "bn", "bk") if args.workload == "matmul"
                 else ("boh", "bco", "bci"))
    print(f"\narm={args.arm}: measured {res.n_measured} states "
          f"({runner.n_timed} distinct configs compiled+timed) in "
          f"{res.used_time:.1f}s")
    print(f"best config "
          + " ".join(f"{n}={v}" for n, v in zip(cfg_names, best_cfg))
          + f": {best_sec*1e3:.3f} ms  ({gflops:.0f} GFLOP/s)")

    xla_sec = None
    if not args.skip_xla_baseline and not args.fake_timer:
        xla_sec = xla_fn()
        print(f"XLA same shape/dtype: {xla_sec*1e3:.3f} ms "
              f"({flops/xla_sec/1e9:.0f} GFLOP/s) -> tuned kernel at "
              f"{xla_sec/best_sec:.2f}x XLA")

    ok = [(c, s) for c, s, e in runner.measured_configs()
          if e == ERROR_NO_ERROR]
    if ok:
        worst = max(s for _, s in ok)
        med = float(np.median([s for _, s in ok]))
        print(f"measured-config spread: best {best_sec*1e3:.3f} / median "
              f"{med*1e3:.3f} / worst {worst*1e3:.3f} ms "
              f"(best is {med/best_sec:.1f}x median)")

    if args.out_csv:
        shape = ((args.m or args.dim, args.n or args.dim, args.k or args.dim)
                 if args.workload == "matmul" else tuple(args.conv))
        row = {
            "arm": args.arm, "workload": args.workload,
            "shape": "x".join(str(v) for v in shape), "dtype": args.dtype,
            "n_candidates": len(states), "measure_size": args.measure_size,
            "n_phases": res.phases, "n_measured": res.n_measured,
            "n_configs_timed": runner.n_timed,
            "best_cfg": "x".join(str(v) for v in best_cfg),
            "best_ms": best_sec * 1e3,
            "gflops": gflops,
            "xla_ms": None if xla_sec is None else xla_sec * 1e3,
            "wall_s": res.used_time,
            "sampling_seed": args.sampling_seed,
            "best_history": "|".join(f"{b:.4f}" for b in res.best_history),
        }
        exists = os.path.exists(args.out_csv)
        with open(args.out_csv, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(row))
            if not exists:
                w.writeheader()
            w.writerow(row)
        print(f"summary appended to {args.out_csv}")


if __name__ == "__main__":
    main()

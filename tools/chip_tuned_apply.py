"""Apply-history-best validation on chip: dispatch through the kernel
library and time tuned-Pallas vs XLA at the same shape/dtype.

Closes the loop scripts/tune_pallas_kernel.py opens: that CLI tunes and
reports; this tool proves a *fresh process* can recover the tuned config
from the log alone (ops/kernel_library.py — the reference's
ApplyHistoryBest-at-build-time role, dispatcher.py:149-308) and that the
dispatched kernel reproduces the tuned performance.

Usage (one chip job at a time — see docs/ROUND_NOTES.md tunnel rules):
  python tools/chip_tuned_apply.py result/pallas_tune/*.json

Timing uses the tunnel-safe chained-scan round trip (a dependent scalar
device_get once; dispatch acks are not completion — docs/ROUND_NOTES.md).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vae_extent_search_tpu.ops.kernel_library import PallasKernelLibrary
from vae_extent_search_tpu.records.dispatcher import target_model_of


def _time_call(fn, args, iters=64, repeats=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def timed(*ops):
        def body(s, _):
            out = fn(ops[0] + s.astype(ops[0].dtype), *ops[1:])
            return jnp.sum(out) * jnp.float32(1e-30), None

        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return s

    jax.device_get(timed(*args))  # compile + warm
    tiny = jax.jit(lambda x: x * 2.0)
    x0 = jnp.float32(1.0)
    jax.device_get(tiny(x0))
    floors = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.device_get(tiny(x0))
        floors.append(time.perf_counter() - t0)
    floor = float(np.median(floors))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.device_get(timed(*args))
        best = min(best, time.perf_counter() - t0)
    return max(best - floor, best * 0.05) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("logs", nargs="+", help="tuning logs "
                   "(scripts/tune_pallas_kernel.py output)")
    p.add_argument("--iters", type=int, default=64)
    p.add_argument("--repeats", type=int, default=3)
    p.add_argument("--interpret", action="store_true",
                   help="CPU smoke mode (timings are meaningless)")
    args = p.parse_args()

    import jax.numpy as jnp

    lib = PallasKernelLibrary.from_files(args.logs)
    print(f"library: {len(lib)} tuned (workload, dtype) entries from "
          f"{len(args.logs)} log(s)\n")

    rng = np.random.default_rng(0)
    for (name, wargs, dtype), (cost, rec) in sorted(lib._best.items()):
        assert dtype == target_model_of(rec.inp.task.target)
        if "matmul" in name:
            M, N, K = int(wargs[0]), int(wargs[1]), int(wargs[2])
            fn, prov = lib.matmul(M, N, K, dtype,
                                  interpret=args.interpret)
            a = jnp.asarray(rng.standard_normal((M, K), np.float32),
                            jnp.dtype(dtype))
            b = jnp.asarray(rng.standard_normal((K, N), np.float32),
                            jnp.dtype(dtype))
            ops = (a, b)
            flops = 2.0 * M * N * K
            xfn = lambda x, y: jnp.dot(x, y,  # noqa: E731
                                       preferred_element_type=jnp.float32)
            desc = f"matmul {M}x{N}x{K} {dtype}"
        elif "conv2d_layer" in name:
            N_, H, W, CO, CI, KH, KW = (int(v) for v in wargs[:7])
            stride, pad = int(wargs[7]), int(wargs[9])
            params = (N_, H, W, CO, CI, KH, KW, stride, pad)
            fn, prov = lib.conv2d(*params, dtype=dtype,
                                  interpret=args.interpret)
            from vae_extent_search_tpu.ops.conv2d_pallas import (
                conv_out_size,
                xla_conv2d_reference,
            )

            x = jnp.asarray(rng.standard_normal((N_, H, W, CI), np.float32),
                            jnp.dtype(dtype))
            w = jnp.asarray(
                rng.standard_normal((KH, KW, CI, CO), np.float32),
                jnp.dtype(dtype))
            bias = jnp.asarray(rng.standard_normal(CO, np.float32),
                               jnp.dtype(dtype))
            ops = (x, w, bias)
            OH = conv_out_size(H, KH, stride, pad)
            OW = conv_out_size(W, KW, stride, pad)
            flops = 2.0 * N_ * OH * OW * CO * KH * KW * CI
            xfn = xla_conv2d_reference(*params, dtype_name=dtype)
            desc = (f"conv2d {N_}x{H}x{W}x{CI} * {KH}x{KW}x{CI}x{CO} "
                    f"{dtype}")
        else:
            print(f"{name}: no dispatcher for this workload family")
            continue

        print(f"{desc}: dispatch -> {prov} (recorded {cost*1e3:.3f} ms)")
        if prov[0] != "pallas":
            print("  no tuned config recovered; skipping timing\n")
            continue
        sec = _time_call(fn, ops, args.iters, args.repeats)
        xsec = _time_call(xfn, ops, args.iters, args.repeats)
        print(f"  dispatched kernel {sec*1e3:8.3f} ms "
              f"({flops/sec/1e9:8.1f} GFLOP/s)")
        print(f"  XLA same shape    {xsec*1e3:8.3f} ms "
              f"({flops/xsec/1e9:8.1f} GFLOP/s)  -> {xsec/sec:.2f}x\n")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Exhaustive ground truth for the Pallas matmul self-tuning demo.

Times EVERY hardware-legal, VMEM-valid (bm, bn, bk) block config of a
matmul shape on the attached TPU — the oracle the active search
(scripts/tune_pallas_kernel.py) is judged against: how many configs did
the search measure before hitting the exhaustive-sweep optimum?

Writes a CSV sorted by measured seconds; resumable (configs already in
the CSV are skipped).

Usage: python tools/pallas_exhaustive.py --dim 1536 --out result/pallas_selftune/exhaustive_1536.csv
"""

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402


def legal_configs(M, N, K, dtype_name):
    import jax.numpy as jnp

    from vae_extent_search_tpu.ops.matmul_pallas import config_is_valid

    dtype = jnp.dtype(dtype_name)
    sublane = 16 if dtype.itemsize < 4 else 8

    def axis_vals(dim, align):
        vals = [d for d in range(1, dim + 1)
                if dim % d == 0 and d % align == 0]
        if dim not in vals:
            vals.append(dim)  # full dim is always legal
        return vals

    out = []
    for bm in axis_vals(M, sublane):
        for bn in axis_vals(N, 128):
            for bk in axis_vals(K, 128):
                if config_is_valid(M, N, K, bm, bn, bk, dtype)[0]:
                    out.append((bm, bn, bk))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dim", type=int, default=1536)
    p.add_argument("--m", type=int, default=None)
    p.add_argument("--n", type=int, default=None)
    p.add_argument("--k", type=int, default=None)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--max-seconds", type=float, default=2.0)
    p.add_argument("--out", type=str, required=True)
    args = p.parse_args()
    M, N, K = args.m or args.dim, args.n or args.dim, args.k or args.dim

    from vae_extent_search_tpu.search.pallas_tuner import PallasMatmulRunner

    cfgs = legal_configs(M, N, K, args.dtype)
    print(f"{len(cfgs)} legal configs for [{M}x{K}]@[{K}x{N}] {args.dtype}")

    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            for row in csv.DictReader(f):
                done.add((int(row["bm"]), int(row["bn"]), int(row["bk"])))
        print(f"resuming: {len(done)} already measured")

    runner = PallasMatmulRunner(dtype=args.dtype,
                                max_seconds=args.max_seconds)
    fields = ["bm", "bn", "bk", "seconds", "gflops", "error"]
    new_file = not os.path.exists(args.out)
    t0 = time.time()
    with open(args.out, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        if new_file:
            w.writeheader()
        for i, (bm, bn, bk) in enumerate(cfgs):
            if (bm, bn, bk) in done:
                continue
            err = ""
            try:
                sec = runner._time_config(M, N, K, bm, bn, bk)
            except Exception as e:
                sec = float("nan")
                err = type(e).__name__
            gf = 2.0 * M * N * K / sec / 1e9 if sec == sec else 0.0
            w.writerow({"bm": bm, "bn": bn, "bk": bk,
                        "seconds": f"{sec:.8g}", "gflops": f"{gf:.1f}",
                        "error": err})
            f.flush()
            print(f"[{i+1}/{len(cfgs)}] ({bm},{bn},{bk}) "
                  f"{sec*1e3 if sec == sec else float('nan'):.3f} ms "
                  f"{gf:.0f} GFLOP/s {err}", flush=True)
    rows = list(csv.DictReader(open(args.out)))
    ok = [r for r in rows if not r["error"]]
    ok.sort(key=lambda r: float(r["seconds"]))
    print(f"\nswept {len(rows)} configs ({len(ok)} ok) in "
          f"{time.time()-t0:.0f}s; top 5:")
    for r in ok[:5]:
        print(f"  ({r['bm']},{r['bn']},{r['bk']}) "
              f"{float(r['seconds'])*1e3:.3f} ms {r['gflops']} GFLOP/s")


if __name__ == "__main__":
    main()

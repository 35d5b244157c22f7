#!/usr/bin/env python
"""Cross-hardware throughput comparison for one task's record logs.

Parity target: the reference's transfer-learning ablation notebook
(scripts/pre_experiments/for_ablation/tl_compare.ipynb): load the SAME
task's measurement records from several hardware platforms (k80 / t4 /
local 3090 in the notebook), align the schedules, filter rows any
platform failed to measure (throughput <= 1e-10), and summarize how
transferable the ranking is — the notebook plots a histogram of
normalized-throughput differences and spot-checks schedules whose
feature vectors are identical across platforms.

This tool prints the same quantities as statistics (no matplotlib in
the image): per-pair throughput-difference mean/std/quantiles,
Pearson/Spearman correlation, top-k set overlap, and the count of
aligned schedules with identical extent features; optional CSV dump.

Usage:
  python tools/tl_compare.py a.json b.json [c.json ...] \
      [--align steps|index] [--topk 64] [--out diffs.csv]
"""

import argparse
import itertools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from vae_extent_search_tpu.records.serde import load_records  # noqa: E402


def _valid(rec) -> bool:
    # same filters as the experiment input pipeline
    # (print_programs.py:23 cost<1e6; zero-cost rows are build errors)
    return (rec.res.error_no == 0 and rec.res.costs
            and rec.res.mean_cost < 1e6 and rec.res.mean_cost > 0)


def _load(path):
    recs = [r for r in load_records(path) if _valid(r)]
    if not recs:
        raise SystemExit(f"{path}: no valid records")
    wkeys = {r.inp.task.workload_key for r in recs}
    if len(wkeys) != 1:
        raise SystemExit(f"{path}: {len(wkeys)} workloads; tl_compare "
                         "expects single-task logs (one per hardware)")
    return recs


def _align(logs, mode: str):
    """Returns a list of per-file index arrays over the aligned rows."""
    if mode == "index":
        n = min(len(r) for r in logs)
        return [np.arange(n) for _ in logs]
    # align by schedule identity: canonical transform-step serialization
    keymaps = []
    for recs in logs:
        km = {}
        for i, r in enumerate(recs):
            km.setdefault(json.dumps(r.inp.step_records), i)
        keymaps.append(km)
    common = set(keymaps[0])
    for km in keymaps[1:]:
        common &= set(km)
    common = sorted(common, key=lambda k: keymaps[0][k])
    return [np.asarray([km[k] for k in common], int) for km in keymaps]


def _ranks(x: np.ndarray) -> np.ndarray:
    """Average ranks over ties (scipy rankdata 'average' semantics) —
    quantized throughputs otherwise get tie-order-dependent ranks."""
    order = np.argsort(x, kind="stable")
    ranks = np.empty(len(x), np.float64)
    ranks[order] = np.arange(len(x), dtype=np.float64)
    _, inv = np.unique(x, return_inverse=True)
    sums = np.bincount(inv, weights=ranks)
    counts = np.bincount(inv)
    return (sums / counts)[inv]


def _spearman(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.corrcoef(_ranks(a), _ranks(b))[0, 1])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("files", nargs="+", help="single-task record logs, "
                   "one per hardware platform")
    p.add_argument("--align", choices=["steps", "index"], default="steps",
                   help="match schedules by transform-step identity "
                        "(default) or by line index (the notebook's zip "
                        "— valid when every log replays the same "
                        "to-measure file in order)")
    p.add_argument("--topk", type=int, default=64)
    p.add_argument("--out", type=str, default=None,
                   help="write aligned throughputs + diffs as CSV")
    args = p.parse_args()
    if len(args.files) < 2:
        raise SystemExit("need at least two record files")

    logs = [_load(f) for f in args.files]
    names = [os.path.basename(f) for f in args.files]
    idxs = _align(logs, args.align)
    n = len(idxs[0])
    if n == 0:
        raise SystemExit("no aligned schedules between the logs")
    print(f"aligned {n} schedules across {len(logs)} logs "
          f"(align={args.align})")

    # per-file normalized throughput over the aligned subset
    tps = []
    for recs, idx in zip(logs, idxs):
        costs = np.asarray([recs[i].res.mean_cost for i in idx])
        tps.append(costs.min() / costs)
    tps = np.stack(tps)  # [n_files, n]

    # drop rows any platform effectively failed on (notebook: > 1e-10)
    keep = (tps > 1e-10).all(axis=0)
    tps = tps[:, keep]
    n = int(keep.sum())
    print(f"{n} rows after the >1e-10 throughput filter")

    # identical-feature spot check (notebook cell 5): schedules whose
    # extent vectors match exactly — on steps-aligned logs these are the
    # same schedule by construction, so report only under index mode
    if args.align == "index":
        from vae_extent_search_tpu.features.extent import extent_vector

        same = 0
        rows = np.flatnonzero(keep)
        for j in rows:
            vecs = []
            for recs, idx in zip(logs, idxs):
                st = recs[idx[j]].inp.recover_state()
                vecs.append(tuple(extent_vector(st)))
            if len(set(vecs)) == 1:
                same += 1
        print(f"identical extent features across all logs: {same}/{n}")

    k = min(args.topk, n)
    for (i, a), (j, b) in itertools.combinations(enumerate(names), 2):
        d = tps[i] - tps[j]
        qs = np.percentile(d, [5, 25, 50, 75, 95])
        top_i = set(np.argsort(-tps[i])[:k].tolist())
        top_j = set(np.argsort(-tps[j])[:k].tolist())
        print(f"\n{a}  vs  {b}")
        print(f"  throughput diff: mean {d.mean():+.4f}  std {d.std():.4f}")
        print("  quantiles [5/25/50/75/95]: "
              + " ".join(f"{q:+.4f}" for q in qs))
        print(f"  pearson {np.corrcoef(tps[i], tps[j])[0, 1]:.4f}"
              f"  spearman {_spearman(tps[i], tps[j]):.4f}"
              f"  top-{k} overlap {len(top_i & top_j) / k:.3f}")

    if args.out:
        with open(args.out, "w") as f:
            f.write(",".join(names) + "\n")
            for row in tps.T:
                f.write(",".join(f"{v:.6g}" for v in row) + "\n")
        print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Per-column bin-cardinality census of a per-store training corpus.

Decides whether the device-GBDT histogram kernel deserves a
MID-cardinality tier (sw=16/64) on top of the landed binary tier
(docs/NEXT.md, round-2 verdict item 10): the expanded-pack tier trades
sw bytes/row/feature of HBM for a sw-x reduction in one-hot VPU
compare work, so it only pays for columns whose bin count actually
falls in (2, sw].

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python tools/bin_cardinality.py dataset/tenset_scale.pkl [max_tasks]

Loads the dataset pickle (make_dataset.py output), stacks up to
max_tasks tasks' per-store feature matrices into one DMatrix (the exact
matrix train_model.py feeds the GBDT) and reports the n_bins histogram.
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from vae_extent_search_tpu.models.boost import DMatrix

    path = sys.argv[1] if len(sys.argv) > 1 else "dataset/tenset_scale.pkl"
    max_tasks = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    with open(path, "rb") as f:
        ds = pickle.load(f)

    mats = []
    rows = 0
    for i, task in enumerate(ds.tasks()):
        if i >= max_tasks:
            break
        feats = ds.features[task]
        mats.extend(np.asarray(f, np.float32) for f in feats if len(f))
        rows += sum(len(f) for f in feats)
    X = np.concatenate(mats, axis=0)
    print(f"{X.shape[0]} per-store rows x {X.shape[1]} features "
          f"from {min(max_tasks, len(ds.features))} tasks")

    dm = DMatrix(X)
    dm._ensure_binned()
    nbins = np.array([len(t) + 1 for t in dm._thresholds])
    for lo, hi, tag in [(1, 2, "<=2 (binary tier, sw=2)"),
                        (3, 16, "3-16 (candidate sw=16 tier)"),
                        (17, 64, "17-64 (candidate sw=64 tier)"),
                        (65, 255, "65-255 (full-width)"),
                        (256, 10**9, ">=256 (full-width)")]:
        n = int(((nbins >= lo) & (nbins <= hi)).sum())
        print(f"  bins {tag:28s}: {n:4d} columns")
    print("nbins per column:", nbins.tolist())


if __name__ == "__main__":
    main()

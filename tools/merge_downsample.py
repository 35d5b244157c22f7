"""Merge per-platform dataset pickles with a per-task record cap.

The round-5 full-grid corpora are 5.67M records over 11,446
task-platform pairs; naively loading all six platform pickles plus the
flatten/embedding/pack copies inside train_model peaks >130 GB and
OOM-kills the host (observed: stage B of fullgrid_downstream). This
tool streams ONE platform at a time, seed-samples up to ``cap`` records
per task, renormalizes that task's throughputs to the kept subset
(tp' = tp / tp_kept.max(), min_latency' = min_latency / tp_kept.max()
— the same invariant make_dataset applies when it caps records before
featurization), and writes one merged pickle sized for training.

Usage:
  python tools/merge_downsample.py out.pkl cap in1.pkl in2.pkl ...
"""

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vae_extent_search_tpu.data import Dataset


def main():
    out_path, cap = sys.argv[1], int(sys.argv[2])
    ins = sys.argv[3:]
    rng = np.random.default_rng(2026)
    merged = Dataset()
    total = 0
    for path in ins:
        with open(path, "rb") as f:
            ds: Dataset = pickle.load(f)
        n_t = 0
        for task in list(ds.tasks()):
            feats = ds.features[task]
            tp = np.asarray(ds.throughputs[task])
            if len(tp) > cap:
                idx = np.sort(rng.choice(len(tp), size=cap, replace=False))
                feats = [feats[i] for i in idx]
                tp = tp[idx]
            scale = float(tp.max()) if len(tp) else 1.0
            if scale <= 0:
                scale = 1.0
            merged.load_task_data(
                task, feats, tp / scale,
                ds.min_latency[task] / scale)
            n_t += 1
            total += len(tp)
        print(f"{path}: {n_t} tasks merged ({total} records so far)",
              flush=True)
        del ds
    with open(out_path, "wb") as f:
        pickle.dump(merged, f, protocol=4)
    print(f"-> {out_path} ({total} records, "
          f"{len(list(merged.tasks()))} tasks)")


if __name__ == "__main__":
    main()

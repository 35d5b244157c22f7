"""Measured train_model marginal of kernel-library dispatch (r4 ask 2).

The self-tuned GBDT histogram ladder beat the hand default 1.28x in
isolation (docs/SELF_TUNING.md), but until round 5 nothing loaded the
tuned logs by default, so production training never saw the win. With
ops/kernel_library.py now defaulting to the committed logs, this tool
measures the marginal where it matters: a real pack-sum GBDT pretrain
on the chip, library ON (default: committed tuned logs) vs OFF
(VES_KERNEL_LIBRARY=none -> hand ladder), interleaved A/B/A/B against
host drift (docs/NEXT.md timing rules: one model/DMatrix per arm, warm
with the same round count).

Usage: python tools/chip_train_marginal.py [dataset.pkl] [n_rounds]
"""

import os
import pickle
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    dataset = sys.argv[1] if len(sys.argv) > 1 else \
        "dataset/dataset_graviton2_s500.pkl"
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 120

    import jax
    print("backend:", jax.default_backend())

    from vae_extent_search_tpu.data import Dataset
    from vae_extent_search_tpu.models.gbdt import GBDTModelInternal

    with open(dataset, "rb") as f:
        ds: Dataset = pickle.load(f)
    train, _ = ds.random_split_within_task(0.9, seed=0)
    feats, labels, _ = train.flatten(with_workload_embedding=True,
                                     embed_total_dim=9)
    rows = sum(len(f) for f in feats)
    print(f"{len(feats)} programs / {rows} per-store rows from {dataset}")

    def one_fit(env_value):
        if env_value is None:
            os.environ.pop("VES_KERNEL_LIBRARY", None)
        else:
            os.environ["VES_KERNEL_LIBRARY"] = env_value
        m = GBDTModelInternal(n_estimators=n_rounds, backend="xgb")
        m.use_workload_embedding = True
        m.workload_embed_total_dim = 9
        t0 = time.perf_counter()
        m.fit_base(feats, labels)
        return time.perf_counter() - t0

    # warm both arms once (compiles cached per ladder shape), then
    # interleave timed reps
    arms = {"library(default tuned logs)": None,
            "hand default (none)": "none"}
    for name, env in arms.items():
        w = one_fit(env)
        print(f"warm {name}: {w:.1f}s", flush=True)
    times = {k: [] for k in arms}
    for rep in range(2):
        for name, env in arms.items():
            t = one_fit(env)
            times[name].append(t)
            print(f"rep{rep} {name}: {t:.1f}s", flush=True)
    a = min(times["library(default tuned logs)"])
    b = min(times["hand default (none)"])
    print(f"\nbest-of-2: library {a:.1f}s  hand {b:.1f}s  "
          f"marginal {b / a:.3f}x")


if __name__ == "__main__":
    main()

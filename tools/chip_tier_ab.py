"""A/B the device-GBDT histogram tiering on a realistic-mix corpus.

Arms: VES_BOOST_TIER=0 (flat full-width), "2" (binary tier only, the
round-2 configuration), "2,16,64", and the default {2,16,64,128}
ladder. The corpus mimics the measured per-store cardinality census
(tools/bin_cardinality.py on the generated TenSet-scale corpus):
~98/164 binary columns, ~6 at <=16 bins, a few at 17-64, ~12 at
65-128, rest continuous.

Timing rules (docs/ROUND_NOTES.md): arms interleave inside one loop,
warm with the SAME round count (the scan path compiles per chunk
length), and each arm owns its DMatrix (the pack cache keys on the
hist engine, not the tier env).

Usage: python tools/chip_tier_ab.py [--rows 1000000] [--rounds 20]
       [--reps 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from vae_extent_search_tpu.models import boost, boost_tpu  # noqa: E402


def make_mix_corpus(n_rows: int, seed: int = 0, n_binary: int = 98,
                    n_small: int = 6, n_mid: int = 8, n_mid2: int = 12,
                    n_cont: int = 40):
    # census-faithful mix (tools/bin_cardinality.py on the TenSet-scale
    # corpus): 98 binary, ~6 at <=16 bins, a handful at 17-64, ~12 at
    # 65-128, rest effectively continuous
    rng = np.random.default_rng(seed)
    cols = []
    for _ in range(n_binary):
        cols.append((rng.random(n_rows) < rng.uniform(0.05, 0.95))
                    .astype(np.float32))
    for _ in range(n_small):
        cols.append(rng.integers(0, 12, n_rows).astype(np.float32))
    for _ in range(n_mid):
        cols.append(rng.integers(0, 50, n_rows).astype(np.float32))
    for _ in range(n_mid2):
        cols.append(rng.integers(0, 100, n_rows).astype(np.float32))
    for _ in range(n_cont):
        cols.append(rng.random(n_rows, dtype=np.float32))
    rows = np.stack(cols, axis=1)
    n_packs = max(1, n_rows // 20)
    pack_ids = np.sort(rng.integers(0, n_packs, n_rows))
    _, pack_ids = np.unique(pack_ids, return_inverse=True)
    n_packs = int(pack_ids.max()) + 1
    w = np.zeros(n_packs, np.float32)
    np.add.at(w, pack_ids, rows[:, 0] - 0.3 * rows[:, 99])
    w += 0.01 * rng.standard_normal(n_packs).astype(np.float32)
    labels = ((w - w.min()) / (w.max() - w.min())).astype(np.float32)
    return rows, pack_ids.astype(np.int64), labels


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--rounds", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--depth", type=int, default=6)
    args = ap.parse_args()

    import jax
    print("backend:", jax.default_backend(), jax.devices())

    rows, pack_ids, labels = make_mix_corpus(args.rows)
    # eta 0.2 diverges on this synthetic by ~round 15 (pack-sum
    # residual amplification ~ rows/pack x eta); histogram timing is
    # data-independent but a diverged run makes the parity check
    # vacuous (all arms collapse to one saturated leaf value)
    params = {"max_depth": args.depth, "eta": 0.03, "gamma": 0.003,
              "min_child_weight": 2}

    arms = [("flat", "0"), ("binary", "2"),
            ("multi64", "2,16,64"), ("multi128", "")]
    dms, preds = {}, {}
    for tag, _ in arms:
        dms[tag] = boost.DMatrix(rows, label=labels[pack_ids],
                                 pack_ids=pack_ids,
                                 group_sizes=[len(labels)])
        dms[tag]._ensure_binned()

    def run(tag, env):
        if env:
            os.environ["VES_BOOST_TIER"] = env
        else:
            os.environ.pop("VES_BOOST_TIER", None)
        t0 = time.perf_counter()
        bst = boost_tpu.train(params, dms[tag],
                              num_boost_round=args.rounds,
                              obj=boost.pack_sum_square_error,
                              verbose_eval=0)
        return time.perf_counter() - t0, bst

    # warmup: compile + pack every arm at the timed round count
    for tag, env in arms:
        dt, bst = run(tag, env)
        preds[tag] = np.asarray(bst.predict(dms[tag]))
        print(f"warm {tag}: {dt:.2f}s")

    times = {tag: [] for tag, _ in arms}
    for rep in range(args.reps):
        for tag, env in arms:
            dt, _ = run(tag, env)
            times[tag].append(dt)
    base = min(times["flat"]) / args.rounds
    for tag, _ in arms:
        per = min(times[tag]) / args.rounds
        print(f"{tag}: best {per * 1e3:.0f} ms/round "
              f"({base / per:.2f}x vs flat)")
    for tag in ("binary", "multi64", "multi128"):
        c = np.corrcoef(preds["flat"], preds[tag])[0, 1]
        err = np.abs(preds["flat"] - preds[tag]).max()
        print(f"parity flat vs {tag}: corr {c:.6f} max|d| {err:.2e}")


if __name__ == "__main__":
    main()

"""A/B the kron (hi/lo) one-hot decomposition of the full-width
histogram tier (VES_BOOST_KRON) on the census-faithful corpus.

Arms, all interleaved in one loop per ROUND_NOTES timing rules:
  ladder      — default tier ladder {2,16,64,128}, kron off
  ladder+kron — same ladder, kron on (affects the ~40 continuous cols)
  flat        — VES_BOOST_TIER=0, kron off (everything full-width)
  flat+kron   — VES_BOOST_TIER=0, kron on (maximal kron surface)

kron_plan picks hi-group counts per level (m=1..8 -> hc 8/8/4/4, m=16
-> 2, m>=32 flat), so the win concentrates in the shallow levels.
Parity: predictions must match the kron-off arm to float rounding
(same products, different dot blocking).

Usage: python tools/chip_kron_ab.py [--rows 1000000] [--rounds 20]
       [--reps 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from vae_extent_search_tpu.models import boost, boost_tpu  # noqa: E402
from tools.chip_tier_ab import make_mix_corpus  # noqa: E402


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
    params = {"max_depth": args.depth, "eta": 0.03, "gamma": 0.003,
              "min_child_weight": 2}

    # (tag, tier_env, kron_env)
    arms = [("ladder", None, "0"), ("ladder+kron", None, "1"),
            ("flat", "0", "0"), ("flat+kron", "0", "1")]
    dms, preds = {}, {}
    for tag, _, _ in arms:
        dms[tag] = boost.DMatrix(rows, label=labels[pack_ids],
                                 pack_ids=pack_ids,
                                 group_sizes=[len(labels)])
        dms[tag]._ensure_binned()

    def run(tag, tier, kron):
        if tier is None:
            os.environ.pop("VES_BOOST_TIER", None)
        else:
            os.environ["VES_BOOST_TIER"] = tier
        os.environ["VES_BOOST_KRON"] = kron
        t0 = time.perf_counter()
        bst = boost_tpu.train(params, dms[tag],
                              num_boost_round=args.rounds,
                              obj=boost.pack_sum_square_error,
                              verbose_eval=0)
        return time.perf_counter() - t0, bst

    for tag, tier, kron in arms:
        dt, bst = run(tag, tier, kron)
        preds[tag] = np.asarray(bst.predict(dms[tag]))
        print(f"warm {tag}: {dt:.2f}s", flush=True)

    times = {tag: [] for tag, _, _ in arms}
    for rep in range(args.reps):
        for tag, tier, kron in arms:
            dt, _ = run(tag, tier, kron)
            times[tag].append(dt)
    for tag, _, _ in arms:
        per = min(times[tag]) / args.rounds
        print(f"{tag}: best {per * 1e3:.0f} ms/round")
    for on, off in (("ladder+kron", "ladder"), ("flat+kron", "flat")):
        ratio = min(times[off]) / min(times[on])
        c = np.corrcoef(preds[off], preds[on])[0, 1]
        err = np.abs(preds[off] - preds[on]).max()
        print(f"{on}: {ratio:.2f}x vs {off}; parity corr {c:.6f} "
              f"max|d| {err:.2e}")


if __name__ == "__main__":
    main()

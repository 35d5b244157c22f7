"""Pretraining-scale GBDT engine benchmark: numpy grower vs device
(boost_tpu) rounds on a synthetic TenSet-shaped corpus.

Shape mimics the reference pretraining job (xgb_model.py over
make_dataset output): ~20 per-store rows per program, 164 features,
pack-sum objective. Timing is wall-clock per boosting round; every
round materializes its tree on the host (np.asarray of the round's
outputs), which forces real device completion — no dispatch-rate
artifact (docs/ROUND_NOTES.md timing rules).

Usage: python tools/chip_boost_bench.py [--rows 1000000] [--cols 164]
       [--rounds 20] [--numpy-rounds 2]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from vae_extent_search_tpu.models import boost, boost_tpu  # noqa: E402


def make_corpus(n_rows: int, n_cols: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    rows = rng.random((n_rows, n_cols), dtype=np.float32)
    # ~20 rows per pack
    n_packs = max(1, n_rows // 20)
    pack_ids = np.sort(rng.integers(0, n_packs, n_rows))
    # keep pack ids dense
    _, pack_ids = np.unique(pack_ids, return_inverse=True)
    n_packs = int(pack_ids.max()) + 1
    w = np.zeros(n_packs, np.float32)
    np.add.at(w, pack_ids, rows[:, 0] - 0.3 * rows[:, 1])
    w += 0.01 * rng.standard_normal(n_packs).astype(np.float32)
    # normalized-throughput-like labels in [0, 1] (dataset.py contract);
    # also keeps the pack-sum residual amplification (≈ rows/pack × eta)
    # from oscillating on this synthetic corpus
    labels = ((w - w.min()) / (w.max() - w.min())).astype(np.float32)
    return rows, pack_ids.astype(np.int64), labels


def bench(train_fn, rows, pack_ids, labels, params, n_rounds,
          warmup: int, tag: str):
    d = boost.DMatrix(rows, label=labels[pack_ids], pack_ids=pack_ids,
                      group_sizes=[len(labels)])
    t_bin = time.perf_counter()
    d._ensure_binned()
    t_bin = time.perf_counter() - t_bin
    if warmup:
        # warm with the SAME round count: the scan fast path compiles
        # per chunk length, so a different warmup k leaves the timed
        # run paying a fresh compile
        train_fn(params, d, num_boost_round=n_rounds,
                 obj=boost.pack_sum_square_error, verbose_eval=0)
    t0 = time.perf_counter()
    bst = train_fn(params, d, num_boost_round=n_rounds,
                   obj=boost.pack_sum_square_error, verbose_eval=0)
    dt = time.perf_counter() - t0
    per_round = dt / n_rounds
    print(f"{tag}: bin {t_bin:.1f}s, {n_rounds} rounds in {dt:.2f}s "
          f"({per_round * 1e3:.0f} ms/round, "
          f"{len(rows) * n_rounds / dt / 1e6:.2f} M row-rounds/s)")
    return per_round, bst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--cols", type=int, default=164)
    ap.add_argument("--rounds", type=int, default=20)
    ap.add_argument("--numpy-rounds", type=int, default=2)
    ap.add_argument("--depth", type=int, default=6)
    args = ap.parse_args()

    import jax
    print("backend:", jax.default_backend(), jax.devices())

    rows, pack_ids, labels = make_corpus(args.rows, args.cols)
    params = {"max_depth": args.depth, "eta": 0.2, "gamma": 0.003,
              "min_child_weight": 2}

    tpu_round, bst_t = bench(boost_tpu.train, rows, pack_ids, labels,
                             params, args.rounds, warmup=2, tag="device")
    if not args.numpy_rounds:
        return
    np_round, bst_n = bench(boost.train, rows, pack_ids, labels, params,
                            args.numpy_rounds, warmup=0, tag="numpy ")

    # sanity: SAME round count on a shared subset — the engines must
    # produce near-identical ensembles
    sub = slice(0, min(50_000, len(rows)))
    r_s, p_s, l_s = rows[sub], pack_ids[sub], labels
    _, p_s = np.unique(p_s, return_inverse=True)
    dt1 = boost.DMatrix(r_s, label=l_s[pack_ids[sub]], pack_ids=p_s)
    dt2 = boost.DMatrix(r_s, label=l_s[pack_ids[sub]], pack_ids=p_s)
    bt = boost_tpu.train(params, dt1, num_boost_round=3,
                         obj=boost.pack_sum_square_error, verbose_eval=0)
    bn = boost.train(params, dt2, num_boost_round=3,
                     obj=boost.pack_sum_square_error, verbose_eval=0)
    q_t = boost.pack_sum_predict_throughput(bt.predict(dt1), p_s)
    q_n = boost.pack_sum_predict_throughput(bn.predict(dt2), p_s)
    print(f"engine parity corr (3 rounds, {len(r_s)} rows): "
          f"{np.corrcoef(q_t, q_n)[0, 1]:.5f}")
    print(f"speedup/round: {np_round / tpu_round:.1f}x")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Segment-MLP pretraining-scale profile on the chip (verdict item 4).

Fits MLPModelInternal on a synthetic pretraining-scale per-store corpus
(default ~520k rows across 40k programs, D=164 — the real corpus
geometry) with the scan fit path (all epochs one compiled program) and
reports ms/epoch.

Timing rules (docs/ROUND_NOTES.md): the tunneled chip acknowledges
DISPATCH on block_until_ready, so the timed quantity is a device_get of
a scalar reduced from the trained params; the scan is ONE dispatch so
the 6-31 ms floor amortizes over all epochs; warmup uses the SAME
n_epoch (the scan compiles per length).

Run (on the chip):  python tools/chip_mlp_scale.py [n_programs] [epochs]
CPU check:          env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
                        python tools/chip_mlp_scale.py 2000 10
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    from vae_extent_search_tpu.models.segment import MLPModelInternal

    n_prog = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    loss = sys.argv[3] if len(sys.argv) > 3 else "lambdaRank"
    D = 164
    rng = np.random.default_rng(0)
    sizes = rng.integers(4, 24, n_prog)
    feats = [rng.random((int(s), D), dtype=np.float32) * 3 for s in sizes]
    w = rng.random(D).astype(np.float32)
    y = np.asarray([float(f.sum(0) @ w) for f in feats], np.float32)
    y = (y - y.min()) / (np.ptp(y) + 1e-8)
    total_rows = int(sizes.sum())
    print(f"corpus: {n_prog} programs, {total_rows} per-store rows, "
          f"D={D}, backend={jax.default_backend()}")

    model = MLPModelInternal(in_dim=D, n_epoch=epochs, fit_mode="scan",
                             loss_type=loss)

    t0 = time.time()
    model.fit_base(feats, y, verbose=False)
    wall_first = time.time() - t0
    # honest steady-state: refit with identical shapes + same epoch
    # count (compile cache hit), force a real round-trip via params sum
    t0 = time.time()
    model.params = None
    model.fit_base(feats, y, verbose=False)
    s = float(sum(np.asarray(p).sum()
                  for p in jax.tree_util.tree_leaves(model.params)))
    wall = time.time() - t0
    assert np.isfinite(s)

    # pure device scan marginal (host packing excluded): pre-pack the
    # batches once via fit_base internals, then time _fit_scan alone
    # (it device_gets best_params -> a real round-trip, per
    # docs/ROUND_NOTES.md tunnel timing rules). Warmed by the fits
    # above (same n_epoch -> same scan length -> compile cache hit).
    from vae_extent_search_tpu.models.segment import (
        compute_fea_norm_vec, make_segment_batches)
    norm = compute_fea_norm_vec(feats)
    labels = np.asarray(y, np.float32)
    rngp = np.random.default_rng(model.seed)
    perm = rngp.permutation(n_prog)
    n_val = max(1, int(n_prog * 0.1))
    tr, va = perm[n_val:], perm[:n_val]
    tr_b = make_segment_batches([feats[i] for i in tr], labels[tr],
                                model.batch_size, norm)
    va_b = make_segment_batches([feats[i] for i in va], labels[va],
                                model.batch_size, norm)
    from vae_extent_search_tpu.models.segment import init_segment_mlp_params
    model.fea_norm_vec = norm
    model.params = init_segment_mlp_params(
        jax.random.PRNGKey(0), D, model.hidden_dim)
    model._fit_scan(tr_b, va_b)  # warm (same shapes as the fits above)
    t0 = time.time()
    model._fit_scan(tr_b, va_b)
    float(np.asarray(jax.tree_util.tree_leaves(model.params)[0]).sum())
    scan_wall = time.time() - t0

    pred = model.predict_on_features(feats[:2000])
    corr = float(np.corrcoef(pred, y[:2000])[0, 1])
    print(f"first fit (incl. compile + host batch packing): "
          f"{wall_first:.1f}s")
    print(f"steady fit_base (incl. host packing): {wall:.2f}s for "
          f"{epochs} epochs -> {wall / epochs * 1e3:.1f} ms/epoch")
    print(f"device scan alone: {scan_wall:.2f}s -> "
          f"{scan_wall / epochs * 1e3:.1f} ms/epoch "
          f"({total_rows * epochs / scan_wall / 1e6:.1f}M row-epochs/s)")
    print(f"fit sanity: corr(pred, y) on 2k programs = {corr:.3f}")
    print(f'{{"metric": "mlp_scan_fit_rows_per_s", '
          f'"value": {total_rows * epochs / scan_wall:.0f}, '
          f'"unit": "row-epochs/s"}}')


if __name__ == "__main__":
    main()

"""JAX model stack: VAE, cost predictor, losses, selection ops."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vae_extent_search_tpu.models import (
    PredictorConfig,
    fit_predictor,
    init_predictor_params,
    init_vae_params,
    load_pretrained_encoder,
    mc_predict,
    metrics,
    pred_forward,
    train_vae,
    vae_forward,
)
from vae_extent_search_tpu.models.predictor import pair_loss
from vae_extent_search_tpu.search import (
    SelectionConfig,
    k_center_greedy,
    l2_normalize,
    masked_top_k,
    select_programs,
)


def test_vae_shapes_and_training_improves():
    key = jax.random.PRNGKey(0)
    X = jax.random.normal(key, (256, 20))
    params = init_vae_params(key, 20, latent_dim=8, hidden_dim=32)
    x_recon, mu, logvar, z, feat = vae_forward(params, X)
    assert x_recon.shape == (256, 20) and mu.shape == (256, 8)
    best, info = train_vae(key, X[:200], X[200:], latent_dim=8,
                           hidden_dim=32, epochs=30, batch_size=64)
    ep_losses = np.asarray(info["history"][0])
    assert ep_losses[-1] < ep_losses[0]


def test_predictor_fit_reduces_loss_and_encoder_transfer():
    key = jax.random.PRNGKey(1)
    X = jax.random.normal(key, (128, 12))
    y = jnp.sum(X[:, :3], axis=1)
    vp = init_vae_params(key, 12, latent_dim=8, hidden_dim=32)
    pp = init_predictor_params(key, 12, hidden_dim=32, latent_dim=8)
    pp = load_pretrained_encoder(pp, vp)
    # encoder weights actually copied
    assert jnp.allclose(pp["fc_mu"]["w"], vp["fc_mu"]["w"])
    mask = jnp.ones(128, bool)
    cfg = PredictorConfig(lambda_reg=1.0, lambda_pair=0.0, gamma=0.0,
                          beta=0.0, head_lr=1e-2, encoder_lr=1e-3)
    best, info = fit_predictor(pp, X, y, mask, key, cfg, 200)
    losses = np.asarray(info["losses"])
    assert losses[-1] < losses[0] * 0.5


def test_mc_dropout_variance_positive():
    key = jax.random.PRNGKey(2)
    pp = init_predictor_params(key, 10, hidden_dim=32, latent_dim=8,
                               predictor_layers=3)
    X = jax.random.normal(key, (32, 10))
    mean, var = mc_predict(pp, X, key, T=8)
    assert mean.shape == (32,) and var.shape == (32,)
    assert float(var.max()) > 0.0


def test_pair_loss_ordering():
    pred = jnp.array([0.0, 1.0, 2.0])
    true = jnp.array([0.0, 1.0, 2.0])
    perfect = pair_loss(pred, true, margin=0.0)
    wrong = pair_loss(-pred, true, margin=0.0)
    assert float(perfect) == 0.0
    assert float(wrong) > 0.0


def test_masked_top_k():
    scores = jnp.array([5.0, 4.0, 3.0, 2.0, 1.0])
    mask = jnp.array([False, True, True, True, False])
    idx, valid = masked_top_k(scores, mask, 2)
    assert set(np.asarray(idx).tolist()) == {1, 2}
    assert bool(valid.all())


def test_k_center_greedy_spreads():
    key = jax.random.PRNGKey(3)
    # two tight direction-clusters + one opposite outlier
    a = jnp.array([1.0, 0.0, 0.0, 0.0]) + jax.random.normal(key, (20, 4)) * 0.01
    b = jnp.array([0.0, 1.0, 0.0, 0.0]) + jax.random.normal(key, (20, 4)) * 0.01
    out = jnp.array([[-1.0, -1.0, 0.0, 0.0]])
    z = l2_normalize(jnp.concatenate([a, b, out]))
    cand = jnp.ones(41, bool).at[0].set(False)
    centers = jnp.zeros(41, bool).at[0].set(True)  # center in cluster a
    sel, valid = k_center_greedy(z, cand, centers, 2)
    sel = set(np.asarray(sel).tolist())
    # picks must come from the other cluster/outlier, not cluster a
    assert all(s >= 20 for s in sel)


def test_select_programs_end_to_end():
    key = jax.random.PRNGKey(4)
    N, D = 200, 10
    X = jax.random.normal(key, (N, D))
    pp = init_predictor_params(key, D, hidden_dim=32, latent_dim=8)
    used = jnp.zeros(N, bool).at[:20].set(True)
    remaining = ~used
    cfg = SelectionConfig(num_select=16, T_mc=4, topk_factor=3, grad_num=2,
                          rand_num=2)
    sel_idx, valid, new_remaining, aux = select_programs(
        pp, X, used, remaining, key, cfg, gate_uncertainty_to_remaining=True
    )
    sel = np.asarray(sel_idx)[np.asarray(valid)]
    # no duplicates, nothing already used, remaining shrank correctly
    assert len(set(sel.tolist())) == len(sel)
    assert not np.asarray(used)[sel].any()
    assert int(np.asarray(new_remaining).sum()) == N - 20 - len(sel)


def test_metrics_parity_semantics():
    preds = np.array([0.9, 0.1, 0.5, 0.3])
    labels = np.array([1.0, 0.0, 0.6, 0.2])
    assert metrics.metric_pairwise_comp_accuracy(preds, labels) == 1.0
    assert metrics.recall_at_k(preds, labels, k=1) == 1
    assert metrics.metric_top_k_recall(preds, labels, 2) == 1.0
    assert metrics.metric_peak_score(preds, labels, 2) == pytest.approx(1.0)
    assert metrics.metric_r_squared(labels, labels) == 1.0


def test_blocked_kcenter_matches_full():
    """ops.k_center_greedy_blocked == select.k_center_greedy up to
    floating-point tie-breaks (different summation order)."""
    from vae_extent_search_tpu.ops.kcenter import (
        k_center_greedy_blocked,
        min_dists_to_centers,
    )
    from vae_extent_search_tpu.search.select import pairwise_dist

    key = jax.random.PRNGKey(0)
    z = l2_normalize(jax.random.normal(key, (200, 16)))
    centers = jnp.zeros(200, bool).at[:30].set(True)
    cand = ~centers
    d = pairwise_dist(z, z)
    md_full = jnp.min(jnp.where(centers[None, :], d, jnp.inf), axis=1)
    md_blk = min_dists_to_centers(z, centers, block=64)
    assert float(jnp.max(jnp.abs(md_full - md_blk))) < 1e-3

    s1, v1 = k_center_greedy(z, cand, centers, 8)
    s2, v2 = k_center_greedy_blocked(z, cand, centers, 8, block=64)
    assert (np.asarray(s1) == np.asarray(s2)).all()
    assert bool(v1.all()) and bool(v2.all())


def test_pallas_segment_sum_interpret():
    """Pallas ragged segment-sum kernel == jax.ops.segment_sum (interpreter
    mode so the suite covers it on the CPU mesh)."""
    from vae_extent_search_tpu.ops.segment_sum_pallas import (
        pad_for_pallas,
        segment_ids_to_offsets,
        segment_sum_pallas,
    )

    rng = np.random.default_rng(1)
    S, H, MAXR = 24, 128, 16
    counts = rng.integers(1, 9, size=S)
    seg_ids = np.repeat(np.arange(S), counts)
    feats = rng.normal(size=(int(counts.sum()), H)).astype(np.float32)
    offs = segment_ids_to_offsets(seg_ids, S)
    fp, fo, S2 = pad_for_pallas(feats, offs, MAXR)
    ref = jax.ops.segment_sum(jnp.asarray(feats), jnp.asarray(seg_ids),
                              num_segments=S)
    out = segment_sum_pallas(jnp.asarray(fp), jnp.asarray(fo), S2, MAXR,
                             interpret=True)[:S]
    assert np.allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_vae_hyperparameter_search():
    """KL/dim-targeted VAE hyperparameter search (reference
    VAE_Trainer.hyperparameter_search): trains each config, scores
    recon R^2 with a penalty outside the target KL/dim band, returns the
    best config + sorted results."""
    import jax.numpy as jnp
    import numpy as np

    from vae_extent_search_tpu.models.segment import (
        search_segment_vae_hyperparams,
    )

    rng = np.random.default_rng(0)
    n_seg = 128
    seg_ids = np.repeat(np.arange(n_seg), 4).astype(np.int32)
    # low-rank structured features so the VAE can reconstruct
    z = rng.normal(size=(len(seg_ids), 8)).astype(np.float32)
    w = rng.normal(size=(8, 164)).astype(np.float32)
    feats = (z @ w).astype(np.float32)
    valid = np.ones(n_seg, bool)
    best_params, best_cfg, results = search_segment_vae_hyperparams(
        jnp.asarray(feats), jnp.asarray(seg_ids), jnp.asarray(valid),
        n_seg, 164,
        configs=[
            {"hidden_dim": 128, "latent_dim": 32, "beta": 1e-4,
             "lr": 1e-3},
            {"hidden_dim": 128, "latent_dim": 32, "beta": 1e-3,
             "lr": 1e-3},
        ],
        epochs=80,
    )
    assert len(results) == 2
    assert results[0]["score"] >= results[1]["score"]
    assert "kl_per_dim" in best_cfg and "recon_r2" in best_cfg
    assert best_params is not None


def test_select_bf16_agrees_with_f32():
    """bfloat16 scoring (the bench/TPU default) must keep selection
    behavior: identical predicted-cost top-1, high selection overlap,
    near-perfect cost correlation vs float32."""
    import jax
    import jax.numpy as jnp

    from vae_extent_search_tpu.models import init_predictor_params
    from vae_extent_search_tpu.search import (
        SelectionConfig,
        select_programs,
    )

    # Multi-seed: bf16 runs matmul INPUTS in bf16 with f32 accumulation
    # and f32 intermediates (models/modules.py dense), so rankings only
    # see one input rounding per matmul. Measured range with that policy:
    # overlap 0.94-0.98, corr > 0.9999 over seeds 0-5; the thresholds
    # below leave margin for cross-machine reduction-order jitter.
    N, D = 4096, 24
    for seed in range(3):
        key = jax.random.PRNGKey(seed)
        params = init_predictor_params(key, D)
        X = jax.random.normal(key, (N, D), jnp.float32)
        used = jnp.zeros(N, bool).at[:64].set(True)
        rem = ~used
        res = {}
        for dt in ("float32", "bfloat16"):
            cfg = SelectionConfig(num_select=64, T_mc=10, compute_dtype=dt)
            sel, valid, _, aux = select_programs(params, X, used, rem,
                                                 key, cfg)
            res[dt] = (np.asarray(sel)[np.asarray(valid)],
                       np.asarray(aux["cost_pred"]))
        s32, c32 = res["float32"]
        s16, c16 = res["bfloat16"]
        overlap = len(set(s32.tolist()) & set(s16.tolist())) \
            / max(1, len(s32))
        corr = np.corrcoef(c32, c16)[0, 1]
        assert int(np.argmax(c32)) == int(np.argmax(c16)), seed
        assert overlap > 0.85 and corr > 0.999, (seed, overlap, corr)


def test_fused_head_kernel_interpret_matches_jax():
    """The fused Pallas head kernel (ops/fused_head_pallas.py) must
    reproduce the XLA scoring path bit-for-bit tolerance-wise: exact mu /
    cost / z-grad-norm, and exact MC mean/variance when fed the same
    dropout masks (interpret mode takes mask bits as an input because the
    TPU hardware PRNG has no CPU lowering; on TPU only the bit source
    differs)."""
    import jax
    import jax.numpy as jnp

    from vae_extent_search_tpu.models import init_predictor_params
    from vae_extent_search_tpu.models.predictor import (
        pred_encode,
        predict_cost,
    )
    from vae_extent_search_tpu.ops.fused_head_pallas import fused_head_stats
    from vae_extent_search_tpu.search.select import z_grad_norms

    key = jax.random.PRNGKey(0)
    N, D, H, T, rate = 300, 24, 256, 6, 0.1
    params = init_predictor_params(key, D, hidden_dim=H, latent_dim=64)
    X = jax.random.normal(key, (N, D), jnp.float32)
    mu, _ = pred_encode(params, X)
    head = params["cost_predictor"]
    bits = jax.random.bits(jax.random.fold_in(key, 7), (T, N, H),
                           jnp.uint32)

    # head-only and encoder-fused variants
    out_h = fused_head_stats(head, mu, 0, T=T, rate=rate, block=1024,
                             interpret=True, mask_bits=bits)
    out_e = fused_head_stats(head, X, 0, T=T, rate=rate, block=1024,
                             interpret=True, mask_bits=bits,
                             encoder=(params["encoder"], params["fc_mu"]))
    mu_k = out_e[0]
    assert np.allclose(np.asarray(mu_k), np.asarray(mu), atol=1e-5)

    # same-mask MC reference (identical bits -> exact stats)
    thresh = np.uint32(int(rate * 2**32))
    h0 = jax.nn.relu(mu @ head[0]["w"] + head[0]["b"])
    preds = []
    for t in range(T):
        h0d = jnp.where(bits[t] >= thresh, h0 / (1 - rate), 0.0)
        h1 = jax.nn.relu(h0d @ head[1]["w"] + head[1]["b"])
        preds.append((h1 @ head[2]["w"] + head[2]["b"])[:, 0])
    preds = jnp.stack(preds)
    refs = (predict_cost(params, mu), z_grad_norms(params, mu),
            preds.mean(0), preds.var(0, ddof=1))
    for got4, name in ((out_h, "head-only"), (out_e[1:], "enc-fused")):
        for got, ref in zip(got4, refs):
            scale = float(jnp.max(jnp.abs(ref))) + 1e-12
            err = float(jnp.max(jnp.abs(got - ref))) / scale
            assert err < 1e-5, (name, err)


def test_fused_head_kernel_shape_grid():
    """Interpret-mode fuzz of the fused head kernel across the gate's
    admissible shape space: lane-aligned hidden widths, 8-aligned
    latents, T values that exercise the VMEM chunking (f32 at block=1024
    chunks at tc=5), and dropout-rate extremes."""
    import jax
    import jax.numpy as jnp

    from vae_extent_search_tpu.models import init_predictor_params
    from vae_extent_search_tpu.models.predictor import (
        pred_encode,
        predict_cost,
    )
    from vae_extent_search_tpu.ops.fused_head_pallas import fused_head_stats
    from vae_extent_search_tpu.search.select import z_grad_norms

    key = jax.random.PRNGKey(1)
    for d_in, hidden, latent, T, rate in (
        (10, 128, 8, 2, 0.5),    # minimal aligned dims, heavy dropout
        (10, 256, 64, 7, 0.1),   # default dims, odd T (chunk 5 + 2 in f32)
        (10, 128, 32, 11, 0.0),  # rate 0: masks keep everything
        # wide input (per-store feature mode: D = n_stores * 164) — the
        # wrapper must shrink the candidate block so the [D, block]
        # input block stays inside scoped VMEM (820*1024*4B overflowed
        # the 16 MB budget on v5e before the clamp)
        (820, 256, 64, 10, 0.1),
    ):
        params = init_predictor_params(key, d_in, hidden_dim=hidden,
                                       latent_dim=latent,
                                       predictor_hidden=hidden)
        X = jax.random.normal(key, (200, d_in), jnp.float32)
        mu, _ = pred_encode(params, X)
        head = params["cost_predictor"]
        bits = jax.random.bits(key, (T, 200, hidden), jnp.uint32)
        mu_k, cost, gnorm, mean, var = fused_head_stats(
            head, X, 0, T=T, rate=rate, block=1024, interpret=True,
            mask_bits=bits, encoder=(params["encoder"], params["fc_mu"]))

        thresh = np.uint32(min(int(rate * 2**32), 2**32 - 1))
        h0 = jax.nn.relu(mu @ head[0]["w"] + head[0]["b"])
        preds = []
        for t in range(T):
            h0d = jnp.where(bits[t] >= thresh, h0 / (1 - rate), 0.0)
            h1 = jax.nn.relu(h0d @ head[1]["w"] + head[1]["b"])
            preds.append((h1 @ head[2]["w"] + head[2]["b"])[:, 0])
        preds = jnp.stack(preds)
        refs = (mu, predict_cost(params, mu), z_grad_norms(params, mu),
                preds.mean(0), preds.var(0, ddof=1))
        for got, ref in zip((mu_k, cost, gnorm, mean, var), refs):
            # absolute floor 1e-6: at rate=0 the true variance is 0 and
            # both sides carry only ~1e-16 float noise
            scale = float(jnp.max(jnp.abs(ref))) + 1e-6
            err = float(jnp.max(jnp.abs(got - ref))) / scale
            assert err < 1e-5, (hidden, latent, T, rate, err)


def test_workload_embedding():
    """9-tag workload embedding (reference xgb_model.py:79-87): tag hits
    on known workloads, MLP 10-dim padding, and an in-search
    LearnedCostModel fit/predict round-trip with the embedding appended
    (matching the reference's use_workload_embedding=True default)."""
    import json

    from vae_extent_search_tpu.models.embedding import (
        WORKLOAD_EMBED_TAGS,
        append_workload_embedding,
        get_workload_embedding,
    )
    import vae_extent_search_tpu.records.workload_library  # noqa: F401

    soft = get_workload_embedding(
        json.dumps(["softmax_nm_auto_scheduler_test", 64, 128]))
    assert soft[WORKLOAD_EMBED_TAGS.index("max")] == 1.0
    assert soft[WORKLOAD_EMBED_TAGS.index("softmax")] == 1.0
    assert soft[WORKLOAD_EMBED_TAGS.index("dense")] == 0.0

    bmm = get_workload_embedding(json.dumps(["batch_matmul", 4, 64, 64, 64]))
    assert bmm[WORKLOAD_EMBED_TAGS.index("compute(b, i, j)")] == 1.0

    # unregistered keys degrade to the zero embedding
    assert not get_workload_embedding('["nonexistent_wkl", 1]').any()

    feats = [np.random.rand(3, 164).astype(np.float32),
             np.random.rand(5, 164).astype(np.float32)]
    out = append_workload_embedding(
        feats, [json.dumps(["batch_matmul", 4, 64, 64, 64])] * 2,
        total_dim=10)
    assert out[0].shape == (3, 174) and out[1].shape == (5, 174)
    assert np.allclose(out[0][:, :164], feats[0])
    assert np.allclose(out[0][0, 164:], np.concatenate([bmm, [0.0]]))

    # MLP save/load keeps the embedding contract
    from vae_extent_search_tpu.models.segment import MLPModelInternal

    m = MLPModelInternal(in_dim=174, n_epoch=2)
    m.use_workload_embedding = True
    m.fit_base(out * 8, np.random.rand(16).astype(np.float32))
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "m.pkl")
        m.save(p)
        m2 = MLPModelInternal.load(p)
    assert m2.use_workload_embedding and m2.workload_embed_total_dim == 10
    preds = m2.predict_on_features(out)
    assert preds.shape == (2,) and np.isfinite(preds).all()


def test_fit_checkpoint_resume():
    """Per-epoch crash-resume snapshot (reference tmp_mlp.pkl,
    mlp_model.py:598): the checkpoint written mid-fit is loadable and
    predicts; the final write matches the fitted model's params."""
    import os
    import tempfile

    import numpy as np

    from vae_extent_search_tpu.models.segment import MLPModelInternal

    feats = [np.random.rand(4, 164).astype(np.float32) for _ in range(12)]
    labels = np.random.rand(12).astype(np.float32)
    m = MLPModelInternal(in_dim=164, n_epoch=6)
    with tempfile.TemporaryDirectory() as d:
        ckpt = os.path.join(d, "tmp_mlp.pkl")
        m.fit_base(feats, labels, checkpoint_path=ckpt, checkpoint_every=2)
        assert os.path.exists(ckpt)
        m2 = MLPModelInternal.load(ckpt)
    preds = m2.predict_on_features(feats)
    assert preds.shape == (12,) and np.isfinite(preds).all()
    # final snapshot == fitted state (fit re-saves after best-params swap)
    import jax

    for a, b in zip(jax.tree_util.tree_leaves(m.params),
                    jax.tree_util.tree_leaves(m2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_init_mode_alternatives():
    """farthest-point and kmeans++ representative inits (reference
    select_init_latent_diversity :1112-1153 /
    select_representative_kmeans :1156-1208): distinct valid indices,
    spread wider than a random draw, and the active loop runs with each
    init_mode."""
    import jax
    import jax.numpy as jnp

    from vae_extent_search_tpu.search.active_loop import run_active_search
    from vae_extent_search_tpu.search.select import (
        farthest_point_init,
        kmeans_representative_init,
    )

    key = jax.random.PRNGKey(0)
    # three tight clusters; representative inits must touch all three
    centers = np.array([[0.0, 0.0], [10.0, 0.0], [0.0, 10.0]], np.float32)
    pts = np.concatenate(
        [centers[i] + 0.1 * np.random.default_rng(i).standard_normal((20, 2))
         for i in range(3)]).astype(np.float32)
    z = jnp.asarray(pts)

    sel_k = np.asarray(kmeans_representative_init(key, z, 3))
    assert len(set(sel_k.tolist())) == 3
    assert {int(i) // 20 for i in sel_k} == {0, 1, 2}

    sel_f = np.asarray(
        farthest_point_init(key, z, jnp.ones(len(pts), bool), 3))
    assert {int(i) // 20 for i in sel_f} == {0, 1, 2}

    feats = np.random.default_rng(0).random((60, 8)).astype(np.float32)
    labels = np.random.default_rng(1).random(60).astype(np.float32)
    for mode in ("diversity", "kmeans"):
        res = run_active_search(
            feats, labels, measure_size=6, max_phases=3, latent_dim=4,
            hidden_dim=16, vae_epochs=5, reg_epochs=5, init_mode=mode,
        )
        assert res.train_size >= 6


def test_fused_head_chip_agreement():
    """On a TPU backend, the fused-kernel selection must be statistically
    indistinguishable from the XLA path (tools/chip_check_fused.py).
    Skipped on CPU, where the fused path gates off by design."""
    import jax
    import pytest

    if jax.default_backend() == "cpu":
        pytest.skip("fused Pallas path is TPU-only")
    import importlib
    import sys as _sys

    _sys.path.insert(0, "tools")
    mod = importlib.import_module("chip_check_fused")
    assert mod.main() == 0


def test_entmax15_properties():
    """entmax-1.5 (variants.py; reference Entmax15 mask): simplex
    output, sparser than softmax, uniform on tied logits, and matching
    sparsemax/softmax limits qualitatively."""
    import jax
    import jax.numpy as jnp

    from vae_extent_search_tpu.models.variants import entmax15, sparsemax

    z = jax.random.normal(jax.random.PRNGKey(0), (64, 16)) * 3
    p = np.asarray(entmax15(z))
    assert np.allclose(p.sum(-1), 1.0, atol=1e-5)
    assert (p >= 0).all()
    soft = np.asarray(jax.nn.softmax(z, axis=-1))
    sp = np.asarray(sparsemax(z))
    # sparsity ordering: sparsemax >= entmax15 >= softmax zero counts
    assert (sp == 0).sum() >= (p == 0).sum() > (soft == 0).sum()
    tied = np.asarray(entmax15(jnp.ones((1, 8))))
    assert np.allclose(tied, 1.0 / 8, atol=1e-6)
    # gradients stay finite (the sqrt-at-zero clamp)
    g = jax.grad(lambda z: entmax15(z).sum() ** 2)(z)
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("arch", ["lstm", "mha", "tabnet"])
def test_sequence_model_variants_learn(arch, tmp_path):
    """All three alternative cost models (reference mlp_model.py
    LSTMModuel/MHAModule + tabnet_model.py SegmentSumMLPModule) fit a
    synthetic segment-sum objective and round-trip through save/load."""
    from vae_extent_search_tpu.models.variants import (
        SequenceModelInternal,
    )

    rng = np.random.default_rng(1)
    feats = [rng.random((int(rng.integers(2, 9)), 12)).astype(np.float32)
             for _ in range(96)]
    w = rng.normal(size=12).astype(np.float32)
    labels = np.asarray([f.sum(0) @ w for f in feats], np.float32)
    labels = (labels - labels.mean()) / labels.std()

    # tabnet's 7-step encoder needs a hotter schedule to fit in-test
    lr = 5e-3 if arch == "tabnet" else 7e-4
    epochs = 300 if arch == "tabnet" else 120
    m = SequenceModelInternal(arch=arch, in_dim=12, n_epoch=epochs,
                              hidden_dim=64, lr=lr)
    m.fit_base(feats, labels)
    pred = m.predict_on_features(feats)
    corr = np.corrcoef(pred, labels)[0, 1]
    assert corr > 0.6, (arch, corr)

    path = str(tmp_path / f"{arch}.pkl")
    m.save(path)
    m2 = SequenceModelInternal.load(path)
    assert np.allclose(m2.predict_on_features(feats), pred)


def test_tabnet_ghost_batchnorm_state():
    """Ghost batch-norm: training uses per-virtual-batch statistics and
    advances the running stats; eval uses the running stats (so the
    same inputs score differently before vs after training-mode
    passes)."""
    import jax
    import jax.numpy as jnp

    from vae_extent_search_tpu.models.variants import (
        init_tabnet_params,
        pad_segments,
        tabnet_forward,
    )

    rng = np.random.default_rng(0)
    feats = [rng.random((4, 8)).astype(np.float32) * 10 + 5
             for _ in range(32)]
    fe, mask = pad_segments(feats)
    params, state = init_tabnet_params(jax.random.PRNGKey(0), 8,
                                       hidden_dim=32)
    _, state2 = tabnet_forward(params, state, fe, mask, training=True)
    # running stats moved toward the (shifted) batch statistics
    m0 = np.asarray(state["initial_bn"]["mean"])
    m1 = np.asarray(state2["initial_bn"]["mean"])
    assert (m1 > m0).all()
    p_eval_before, _ = tabnet_forward(params, state, fe, mask)
    p_eval_after, _ = tabnet_forward(params, state2, fe, mask)
    assert not np.allclose(np.asarray(p_eval_before),
                           np.asarray(p_eval_after))


def test_entmax_axis_argument():
    """entmax15/sparsemax honor a non-default axis (review finding:
    the sorted-moments math previously assumed the last axis)."""
    import jax
    import jax.numpy as jnp

    from vae_extent_search_tpu.models.variants import entmax15, sparsemax

    z = jax.random.normal(jax.random.PRNGKey(1), (6, 9)) * 2
    for fn in (entmax15, sparsemax):
        p0 = np.asarray(fn(z.T, axis=0))
        p1 = np.asarray(fn(z, axis=-1))
        assert np.allclose(p0.T, p1, atol=1e-6)
        assert np.allclose(p0.sum(axis=0), 1.0, atol=1e-5)


def test_segment_vae_cost_model_learns(tmp_path):
    """SegmentVAEModelInternal (the for_inference lineage: SegmentVAE
    pretrain + latent regression as the search's cost model) fits a
    synthetic segment-sum objective, round-trips through save/load, and
    scores all-zero (unlowerable) feature rows -inf."""
    from vae_extent_search_tpu.models.segment import SegmentVAEModelInternal

    rng = np.random.default_rng(3)
    feats = [rng.random((int(rng.integers(2, 9)), 12)).astype(np.float32)
             for _ in range(96)]
    w = rng.normal(size=12).astype(np.float32)
    labels = np.asarray([f.sum(0) @ w for f in feats], np.float32)
    labels = (labels - labels.mean()) / labels.std()

    m = SegmentVAEModelInternal(in_dim=12, hidden_dim=64, latent_dim=16,
                                vae_epochs=60, reg_epochs=200,
                                encoder_lr=1e-4, head_lr=1e-3)
    m.fit_base(feats, labels)
    pred = m.predict_on_features(feats)
    corr = np.corrcoef(pred, labels)[0, 1]
    assert corr > 0.6, corr

    # refits keep the pretrained VAE encoder (tune_vae: later phases only
    # retrain the regression model) and stay finite
    m.fit_base(feats, labels)
    pred2 = m.predict_on_features(feats)
    assert np.isfinite(pred2).all()

    # frozen batch-norm stats: scores are per-program (independent of
    # what else is in the predict batch, unlike train-mode batch stats)
    sub = m.predict_on_features(feats[:7])
    assert np.allclose(sub, pred2[:7], atol=1e-5), (sub, pred2[:7])

    # unlowerable states (all-zero rows) score -inf
    bad = np.zeros((3, 12), np.float32)
    scored = m.predict_on_features([feats[0], bad])
    assert np.isfinite(scored[0]) and scored[1] == -np.inf

    path = str(tmp_path / "vae_cm.pkl")
    m.save(path)
    m2 = SegmentVAEModelInternal.load(path)
    assert np.allclose(m2.predict_on_features(feats), pred)


def test_sketch_vae_policy_spec():
    """'sketch.vae' resolves to a SegmentVAEModelInternal-backed
    LearnedCostModel with the 10-dim workload-embedding contract."""
    from vae_extent_search_tpu.models.segment import SegmentVAEModelInternal
    from vae_extent_search_tpu.search.cost_model import make_search_policies

    policies, model = make_search_policies("sketch.vae", [])
    assert isinstance(model.internal, SegmentVAEModelInternal)
    assert model.internal.in_dim == 174
    assert model._embed_total == 10


def test_segment_sum_rows_matmul_matches_scatter():
    """The accelerator path's one-hot-matmul segment sum must equal the
    scatter path (padding id == n_seg dropped; grads are plain-matmul
    transposes and agree too)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vae_extent_search_tpu.models.segment import segment_sum_rows

    rng = np.random.default_rng(11)
    R, H, n_seg = 700, 48, 96
    h = jnp.asarray(rng.standard_normal((R, H)).astype(np.float32))
    ids = jnp.asarray(np.sort(rng.integers(0, n_seg + 1, R)).astype(np.int32))
    a = segment_sum_rows(h, ids, n_seg, via="scatter")
    b = segment_sum_rows(h, ids, n_seg, via="matmul")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)
    ga = jax.grad(lambda x: segment_sum_rows(
        x, ids, n_seg, via="scatter").sum())(h)
    gb = jax.grad(lambda x: segment_sum_rows(
        x, ids, n_seg, via="matmul").sum())(h)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-5, atol=1e-5)


def test_mlp_scan_fit_matches_host_loop():
    """The pretraining-scale scan fit (one compiled program for all
    epochs, models/segment.py _fit_scan) must reproduce the host
    per-batch loop: same batches, same optimizer sequence, same
    patience/early-stop selection — predictions agree to fp tolerance
    (round-2 verdict item 4)."""
    import numpy as np

    from vae_extent_search_tpu.models.segment import MLPModelInternal

    rng = np.random.default_rng(3)
    feats = [rng.random((int(rng.integers(2, 8)), 10)).astype(np.float32)
             for _ in range(300)]
    y = np.asarray([f.sum() * 0.05 for f in feats], np.float32)

    host = MLPModelInternal(in_dim=10, hidden_dim=48, n_epoch=40,
                            fit_mode="host").fit_base(feats, y)
    scan = MLPModelInternal(in_dim=10, hidden_dim=48, n_epoch=40,
                            fit_mode="scan").fit_base(feats, y)
    ph = host.predict_on_features(feats)
    ps = scan.predict_on_features(feats)
    assert np.corrcoef(ph, ps)[0, 1] > 0.999
    # rmse-loss arm too (sigmoid head)
    host2 = MLPModelInternal(in_dim=10, hidden_dim=48, n_epoch=30,
                             loss_type="rmse",
                             fit_mode="host").fit_base(feats, y)
    scan2 = MLPModelInternal(in_dim=10, hidden_dim=48, n_epoch=30,
                             loss_type="rmse",
                             fit_mode="scan").fit_base(feats, y)
    assert np.corrcoef(host2.predict_on_features(feats),
                       scan2.predict_on_features(feats))[0, 1] > 0.999


def test_mlp_scan_fit_bf16_storage():
    """bf16 feature STORAGE on the scan path (HBM-bounded pretraining
    corpora; forward upcasts to f32) ranks like the f32-stored fit, and
    the stacked loader output is byte-identical to stacking the per-
    batch list (models/segment.py make_segment_batches stacked=True)."""
    import numpy as np
    import jax.numpy as jnp

    from vae_extent_search_tpu.models.segment import (
        MLPModelInternal, SegmentBatch, make_segment_batches)

    rng = np.random.default_rng(11)
    feats = [rng.random((int(rng.integers(2, 8)), 10)).astype(np.float32)
             for _ in range(300)]
    y = np.asarray([f.sum() * 0.05 for f in feats], np.float32)

    # stacked == jnp.stack(list) bytes (f32)
    lst = make_segment_batches(feats, y, 64)
    stk = make_segment_batches(feats, y, 64, stacked=True)
    assert isinstance(stk, SegmentBatch)
    for f in SegmentBatch._fields:
        a = jnp.stack([getattr(b, f) for b in lst])
        np.testing.assert_array_equal(np.asarray(a),
                                      np.asarray(getattr(stk, f)))

    f32m = MLPModelInternal(in_dim=10, hidden_dim=48, n_epoch=40,
                            fit_mode="scan").fit_base(feats, y)
    bf = MLPModelInternal(in_dim=10, hidden_dim=48, n_epoch=40,
                          fit_mode="scan")
    bf.scan_feature_dtype = "bfloat16"
    bf.fit_base(feats, y)
    p32 = f32m.predict_on_features(feats)
    p16 = bf.predict_on_features(feats)
    assert np.corrcoef(p32, p16)[0, 1] > 0.99

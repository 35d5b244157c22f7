"""In-repo histogram booster: the reference xgboost pack-sum protocol
executed for real (models/boost.py; reference xgb_model.py:120-250,
470-745) — objective gradients, eval callbacks, early stopping, and the
GBDT cost-model backend over ci_log-derived per-store features."""

import io
import re
from contextlib import redirect_stdout

import numpy as np
import pytest

from vae_extent_search_tpu.models import boost


def _pack_problem(n_prog=200, seed=0):
    rng = np.random.default_rng(seed)
    rows_list, labels, pack_ids = [], [], []
    for i in range(n_prog):
        k = int(rng.integers(2, 7))
        F = rng.random((k, 8)).astype(np.float32)
        rows_list.append(F)
        s = F.sum(0)
        labels.append(np.sin(3 * s[0]) + s[1] * s[2] + 0.5 * s[3])
        pack_ids.extend([i] * k)
    return (rows_list, np.asarray(labels, np.float32),
            np.asarray(pack_ids))


def test_plain_square_loss_regression():
    rng = np.random.default_rng(1)
    X = rng.random((500, 6)).astype(np.float32)
    y = (X[:, 0] * 2 + np.sin(5 * X[:, 1]) + X[:, 2] ** 2).astype(
        np.float32)
    dtrain = boost.DMatrix(X, label=y)
    bst = boost.train({"max_depth": 4, "eta": 0.3}, dtrain,
                      num_boost_round=60, verbose_eval=0)
    pred = bst.predict(dtrain)
    rmse = float(np.sqrt(np.mean((pred - y) ** 2)))
    base = float(y.std())
    assert rmse < 0.15 * base, (rmse, base)


def test_pack_sum_objective_learns_pack_labels():
    """The custom objective drives per-ROW predictions whose per-pack
    sums converge to the pack labels — the exact mechanism xgboost
    executes with pack_sum_square_error (xgb_model.py:528-556)."""
    rows_list, labels, pack_ids = _pack_problem()
    rows = np.concatenate(rows_list)
    dtrain = boost.DMatrix(rows, label=labels[pack_ids],
                           pack_ids=pack_ids,
                           group_sizes=[len(labels)])
    bst = boost.train(
        {"max_depth": 6, "eta": 0.2, "gamma": 0.003,
         "min_child_weight": 2},
        dtrain, num_boost_round=80, obj=boost.pack_sum_square_error,
        verbose_eval=0)
    pred = boost.pack_sum_predict_throughput(bst.predict(dtrain),
                                             pack_ids)
    rmse = float(np.sqrt(np.mean((pred - labels) ** 2)))
    assert rmse < 0.1 * labels.std(), (rmse, labels.std())
    name, score = boost.pack_sum_rmse(bst.predict(dtrain), dtrain)
    assert name == "rmse" and abs(score - rmse) < 1e-6
    name, apeak = boost.pack_sum_average_peak_score(1)(
        bst.predict(dtrain), dtrain)
    assert name == "a-peak@1" and apeak > 0.95


def test_eval_callback_format_and_early_stop():
    """Every-25-round eval lines must match the reference's logged
    format (docs/try_pretrained_models_on_aws_c59x.md:61-72:
    ``XGB iter:  25\\ttr-rmse: 0.103122\\ttr-a-peak@1: 0.718990``),
    skipping i%5==1 rounds like custom_callback:676; early stopping
    truncates to the best iteration."""
    rows_list, labels, pack_ids = _pack_problem(80, seed=3)
    rows = np.concatenate(rows_list)
    dtrain = boost.DMatrix(rows, label=labels[pack_ids],
                           pack_ids=pack_ids,
                           group_sizes=[len(labels)])
    buf = io.StringIO()
    with redirect_stdout(buf):
        bst = boost.train(
            {"max_depth": 6, "eta": 0.2}, dtrain, num_boost_round=120,
            obj=boost.pack_sum_square_error,
            fevals=[boost.pack_sum_rmse,
                    boost.pack_sum_average_peak_score(1)],
            evals=[(dtrain, "tr")], metric="tr-rmse",
            stopping_rounds=15, verbose_eval=25)
    lines = [ln for ln in buf.getvalue().splitlines() if ln]
    assert lines, "no eval output"
    pat = re.compile(
        r"^XGB iter: +\d+\ttr-rmse: \d+\.\d{6}\ttr-a-peak@1: "
        r"\d+\.\d{6}$")
    assert all(pat.match(ln) for ln in lines), lines
    # rmse on the printed lines is non-increasing overall
    rmses = [float(ln.split("\t")[1].split(": ")[1]) for ln in lines]
    assert rmses[-1] <= rmses[0]
    # early stop kept only up to the best iteration
    best_it = int(bst.attr("best_iteration"))
    assert len(bst.trees) == best_it + 1 or len(bst.trees) == 120


def test_gbdt_native_backend_on_ci_log_records():
    """End to end on a ci_log-derived per-store dataset: the native
    pack-sum backend must rank programs at least as well as the
    sklearn aggregate fallback (VERDICT: within tolerance)."""
    import os

    from vae_extent_search_tpu.features.per_store import (
        get_per_store_features_from_file,
    )
    from vae_extent_search_tpu.models.gbdt import GBDTModelInternal

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    log = os.path.join(repo, "result", "corpus", "resnet_18-B1-llvm.json")
    # the reference quadruple: (features, normalized_throughputs,
    # task_ids, min_latency)
    feats, y, _, _ = get_per_store_features_from_file(log)
    keep = [i for i, f in enumerate(feats) if len(f)]
    feats = [np.asarray(feats[i], np.float32) for i in keep]
    y = np.asarray(y, np.float32)[keep]
    n_tr = int(0.8 * len(y))

    def topk_recall(model):
        model.fit_base(feats[:n_tr], y[:n_tr], verbose=False)
        pred = model.predict_on_features(feats[n_tr:])
        yte = y[n_tr:]
        top = np.argsort(-pred)[:8]
        return float(np.max(yte[top]) / np.max(yte))

    score_native = topk_recall(GBDTModelInternal(backend="xgb",
                                                 n_estimators=80))
    score_sklearn = topk_recall(GBDTModelInternal(backend="sklearn",
                                                  n_estimators=80))
    assert score_native >= score_sklearn - 0.05, (
        score_native, score_sklearn)
    assert score_native > 0.6


def test_gbdt_xgb_backend_resolves_to_native_without_xgboost():
    from vae_extent_search_tpu.models.gbdt import HAS_XGB, GBDTModelInternal

    m = GBDTModelInternal(backend="xgb")
    assert m.backend == ("xgb" if HAS_XGB else "native")


def test_gbdt_lgb_backend_resolves_to_native_without_lightgbm():
    """lgbm_model.py runs the same pack-sum protocol (fobj/feval,
    lgbm_model.py:246-247), so absent lightgbm the in-repo booster —
    not the aggregate sklearn degrade — must take over."""
    import numpy as np

    from vae_extent_search_tpu.models.gbdt import HAS_LGB, LGBModelInternal

    m = LGBModelInternal(n_estimators=40)
    assert m.backend == ("lgb" if HAS_LGB else "native")
    rng = np.random.default_rng(5)
    feats = [rng.random((rng.integers(2, 5), 12), dtype=np.float32)
             for _ in range(60)]
    y = np.asarray([f.sum() * 0.01 for f in feats], np.float32)
    m.fit_base(feats, y)
    pred = m.predict_on_features(feats)
    assert np.corrcoef(pred, y)[0, 1] > 0.8


def test_gbdt_few_shot_modes():
    """The reference XGB few-shot surface (xgb_model.py:158-230:
    base_only / local_only_per_task / plus_per_task) drives the GBDT
    model through the shared few_shot_fit harness; the plus mode's
    residual model must improve on a base with a per-task offset."""
    import numpy as np

    from vae_extent_search_tpu.models.gbdt import GBDTModelInternal
    from vae_extent_search_tpu.models.segment import few_shot_fit

    rng = np.random.default_rng(2)
    feats_by, labels_by = {}, {}
    for t, offset in [("a", 0.0), ("b", 5.0)]:
        feats = [rng.random((1, 6)).astype(np.float32) for _ in range(60)]
        y = np.asarray([f.sum() + offset for f in feats], np.float32)
        feats_by[t], labels_by[t] = feats, y

    for mode in ("base_only", "local", "plus"):
        models = few_shot_fit(GBDTModelInternal, feats_by, labels_by,
                              mode=mode, in_dim=6, n_estimators=60)
        for t in feats_by:
            pred = models[t].predict_on_features(feats_by[t])
            rmse = float(np.sqrt(np.mean((pred - labels_by[t]) ** 2)))
            if mode == "base_only":
                continue  # shared model can't fit both offsets
            assert rmse < 0.5, (mode, t, rmse)
    # plus beats base_only on the offset task
    base = few_shot_fit(GBDTModelInternal, feats_by, labels_by,
                        mode="base_only", in_dim=6, n_estimators=60)
    plus = few_shot_fit(GBDTModelInternal, feats_by, labels_by,
                        mode="plus", in_dim=6, n_estimators=60)

    def rmse_of(models, t):
        pred = models[t].predict_on_features(feats_by[t])
        return float(np.sqrt(np.mean((pred - labels_by[t]) ** 2)))

    assert rmse_of(plus, "b") < rmse_of(base, "b")


def test_pack_sum_fevals_with_missing_pack_ids():
    """A program with zero feature rows contributes no pack id; the
    fevals must stay aligned per DISTINCT id instead of crashing on the
    bincount/unique length mismatch (review finding)."""
    X = np.random.default_rng(0).random((5, 4)).astype(np.float32)
    pack_ids = np.asarray([0, 0, 2, 2, 2])  # id 1 absent
    labels = np.asarray([1.0, 1.0, 3.0, 3.0, 3.0], np.float32)
    d = boost.DMatrix(X, label=labels, pack_ids=pack_ids)
    preds = np.asarray([0.5, 0.5, 1.0, 1.0, 1.0], np.float32)
    name, rmse = boost.pack_sum_rmse(preds, d)
    assert name == "rmse" and rmse == pytest.approx(0.0)
    name, score = boost.pack_sum_average_peak_score(1)(preds, d)
    assert name == "a-peak@1" and 0.0 < score <= 1.0


def test_gbdt_augmentation_and_weights():
    """use_data_argumentation (buffer-1/2 block swap, column-correct)
    and use_weight (max(y, 0.1) row weights) plumb through fit_base
    (reference xgb_model.py:323-336)."""
    rng = np.random.default_rng(4)
    from vae_extent_search_tpu.models.gbdt import GBDTModelInternal

    feats = [rng.random((3, 164)).astype(np.float32) for _ in range(40)]
    y = np.asarray([f[:, :3].sum() for f in feats], np.float32)
    m = GBDTModelInternal(backend="xgb", n_estimators=40)
    m.fit_base(feats, y, augment_buffer_swap=True, use_weight=True)
    pred = m.predict_on_features(feats)
    assert np.corrcoef(pred, y)[0, 1] > 0.8
    # swap columns of buffers 1<->2: an augmented-trained model should
    # be (near-)invariant to the permutation
    swapped = []
    for f in feats:
        g = np.array(f, copy=True)
        tmp = g[:, 75:93].copy()
        g[:, 75:93] = g[:, 93:111]
        g[:, 93:111] = tmp
        swapped.append(g)
    pred_sw = m.predict_on_features(swapped)
    assert np.corrcoef(pred, pred_sw)[0, 1] > 0.9


# ---------------------------------------------------------------------------
# TPU/device tree-growth engine (models/boost_tpu.py) — CPU-jax here;
# the engine is backend-agnostic XLA
# ---------------------------------------------------------------------------


def test_boost_tpu_matches_numpy_engine_plain():
    """Device-grown trees are structurally identical to the numpy
    grower on continuous data (same bins, same gains, same tie order),
    so ensemble predictions agree to f32 roundoff."""
    from vae_extent_search_tpu.models import boost_tpu

    rng = np.random.default_rng(7)
    X = rng.standard_normal((400, 9)).astype(np.float32)
    y = (2 * X[:, 0] + np.sin(X[:, 1]) + 0.1 * rng.standard_normal(400)
         ).astype(np.float32)
    params = {"max_depth": 4, "eta": 0.3}
    b1 = boost.train(params, boost.DMatrix(X, label=y),
                     num_boost_round=12, verbose_eval=0)
    b2 = boost_tpu.train(params, boost.DMatrix(X, label=y),
                         num_boost_round=12, verbose_eval=0)
    p1, p2 = b1.predict(X), b2.predict(X)
    assert np.abs(p1 - p2).max() < 1e-4, np.abs(p1 - p2).max()
    # first trees split identically (feature + float threshold)
    t1, t2 = b1.trees[0], b2.trees[0]
    assert t1.feature[0] == t2.feature[0]
    assert t1.threshold[0] == pytest.approx(t2.threshold[0])


def test_boost_tpu_pack_sum_protocol_parity():
    """The full reference protocol (pack-sum objective on device,
    rmse/a-peak fevals, early-stop bookkeeping) reproduces the numpy
    engine's scores; the returned Booster predicts through the same
    numpy trees (pickle-compatible)."""
    import pickle

    from vae_extent_search_tpu.models import boost_tpu

    rows_list, labels, pack_ids = _pack_problem(n_prog=100, seed=3)
    rows = np.concatenate(rows_list)

    def mk():
        return boost.DMatrix(rows, label=labels[pack_ids],
                             pack_ids=pack_ids,
                             group_sizes=[len(labels)])

    params = {"max_depth": 6, "eta": 0.2, "gamma": 0.003,
              "min_child_weight": 2}
    common = dict(num_boost_round=40, obj=boost.pack_sum_square_error,
                  fevals=[boost.pack_sum_rmse,
                          boost.pack_sum_average_peak_score(1)],
                  metric="tr-rmse", stopping_rounds=100, verbose_eval=0)
    d1, d2 = mk(), mk()
    b1 = boost.train(params, d1, evals=[(d1, "tr")], **common)
    b2 = boost_tpu.train(params, d2, evals=[(d2, "tr")], **common)
    p1 = boost.pack_sum_predict_throughput(b1.predict(d1), pack_ids)
    p2 = boost.pack_sum_predict_throughput(b2.predict(d2), pack_ids)
    r1 = float(np.sqrt(np.mean((p1 - labels) ** 2)))
    r2 = float(np.sqrt(np.mean((p2 - labels) ** 2)))
    assert abs(r1 - r2) < 0.05 * max(r1, 1e-6), (r1, r2)
    assert np.corrcoef(p1, p2)[0, 1] > 0.999
    # boosters round-trip through pickle like the numpy engine's
    blob = pickle.dumps(b2)
    assert np.allclose(pickle.loads(blob).predict(d2), b2.predict(d2))


def test_boost_tpu_foreign_eval_set_and_early_stop():
    """A held-out eval DMatrix is binned against the TRAIN thresholds
    (bin<=k ⇔ x<=edges[k]) so its per-round accumulated predictions
    equal tree.predict on raw floats; early stopping on the eval metric
    truncates the ensemble."""
    from vae_extent_search_tpu.models import boost_tpu

    rng = np.random.default_rng(11)
    X = rng.random((300, 6)).astype(np.float32)
    y = (X[:, 0] + X[:, 1] ** 2).astype(np.float32)
    Xv, yv = X[250:], y[250:]
    dtrain = boost.DMatrix(X[:250], label=y[:250])
    dval = boost.DMatrix(Xv, label=yv)

    captured = []

    def feval_rmse(preds, dm):
        captured.append(np.array(preds))
        return "rmse", float(np.sqrt(np.mean((preds - dm.label) ** 2)))

    # no early stop (stopping_rounds > rounds): the final captured
    # device accumulation must equal host float-threshold prediction
    # over the full untruncated ensemble — the bin<=k vs x<=edges[k]
    # equivalence of _bin_against
    bst = boost_tpu.train({"max_depth": 3, "eta": 0.4}, dtrain,
                          num_boost_round=30, fevals=[feval_rmse],
                          evals=[(dval, "te")], metric="te-rmse",
                          stopping_rounds=100, verbose_eval=0)
    assert len(bst.trees) == 30
    assert np.allclose(captured[-1], bst.predict(dval), atol=1e-4)
    assert bst.attr("best_iteration") is not None
    # and the early-stop path still truncates + stays finite
    captured.clear()
    bst2 = boost_tpu.train({"max_depth": 3, "eta": 0.4}, dtrain,
                           num_boost_round=30, fevals=[feval_rmse],
                           evals=[(dval, "te")], metric="te-rmse",
                           stopping_rounds=3, verbose_eval=0)
    assert np.isfinite(bst2.predict(dval)).all()


def test_gbdt_native_tpu_engine_selection(monkeypatch):
    """VES_BOOST_TPU=1 routes _fit_native through the device engine;
    the fitted model predicts and saves/loads exactly like the numpy
    engine (same Booster type)."""
    import pickle

    from vae_extent_search_tpu.models.gbdt import GBDTModelInternal

    rng = np.random.default_rng(5)
    feats = [rng.random((4, 16)).astype(np.float32) for _ in range(60)]
    y = np.asarray([f[:, :2].sum() for f in feats], np.float32)
    monkeypatch.setenv("VES_BOOST_TPU", "1")
    m = GBDTModelInternal(backend="xgb", n_estimators=30)
    m.fit_base(feats, y)
    assert m.backend == "native"
    pred = m.predict_on_features(feats)
    assert np.corrcoef(pred, y)[0, 1] > 0.9
    blob = pickle.dumps(m.model)
    assert np.allclose(pickle.loads(blob).predict(
        np.concatenate(feats)), m.model.predict(np.concatenate(feats)))
    monkeypatch.setenv("VES_BOOST_TPU", "0")
    m2 = GBDTModelInternal(backend="xgb", n_estimators=30)
    m2.fit_base(feats, y)
    pred2 = m2.predict_on_features(feats)
    assert np.corrcoef(pred, pred2)[0, 1] > 0.999


def test_boost_tpu_pallas_histogram_engine_parity():
    """The fused VMEM histogram kernel (ops/hist_pallas.py, interpret
    mode here) produces the same trees as the XLA matmul formulation
    through a full training run."""
    import os

    from vae_extent_search_tpu.models import boost_tpu

    rng = np.random.default_rng(9)
    X = rng.standard_normal((350, 11)).astype(np.float32)
    y = (X[:, 0] - 0.5 * X[:, 2] ** 2).astype(np.float32)
    params = {"max_depth": 4, "eta": 0.3}
    old = os.environ.get("VES_BOOST_HIST")
    try:
        os.environ["VES_BOOST_HIST"] = "xla"
        b1 = boost_tpu.train(params, boost.DMatrix(X, label=y),
                             num_boost_round=6, verbose_eval=0)
        os.environ["VES_BOOST_HIST"] = "pallas_interpret"
        b2 = boost_tpu.train(params, boost.DMatrix(X, label=y),
                             num_boost_round=6, verbose_eval=0)
    finally:
        if old is None:
            os.environ.pop("VES_BOOST_HIST", None)
        else:
            os.environ["VES_BOOST_HIST"] = old
    assert np.abs(b1.predict(X) - b2.predict(X)).max() < 1e-4
    for t1, t2 in zip(b1.trees, b2.trees):
        assert t1.feature == t2.feature


def test_hist_pallas_kernel_values():
    """Kernel histograms (interpret mode) equal a direct scatter,
    including bin-axis padding to full lanes and inert zero-g/h
    padding rows."""
    import jax.numpy as jnp

    from vae_extent_search_tpu.ops.hist_pallas import hist_pallas

    rng = np.random.default_rng(2)
    n, d, m, nb = 700, 9, 4, 40    # nb < 128 exercises lane padding
    binned = rng.integers(0, nb, (n, d)).astype(np.uint8)
    node = rng.integers(0, m, n).astype(np.int32)
    g = rng.standard_normal(n).astype(np.float32)
    h = rng.random(n).astype(np.float32)
    gh, hh = hist_pallas(jnp.asarray(binned), jnp.asarray(node),
                         jnp.asarray(g), jnp.asarray(h), m=m, nb=nb,
                         blk=256, fg=4, interpret=True)
    ref_g = np.zeros((d, m, nb), np.float32)
    ref_h = np.zeros((d, m, nb), np.float32)
    np.add.at(ref_g, (np.arange(d)[None, :], node[:, None],
                      binned), g[:, None])
    np.add.at(ref_h, (np.arange(d)[None, :], node[:, None],
                      binned), h[:, None])
    assert np.abs(np.asarray(gh) - ref_g).max() < 1e-4
    assert np.abs(np.asarray(hh) - ref_h).max() < 1e-4


def test_hist_pallas_kron_bit_identical():
    """The kron (hi/lo) decomposition of the full-width one-hot sums
    exactly the same products as the flat dot (masks and one-hots are
    exact 0/1 values) — only the dot's internal accumulation blocking
    may differ per backend, so equality is asserted to float-rounding
    tolerance here and at tree level in the engine-parity test."""
    import jax.numpy as jnp

    from vae_extent_search_tpu.ops.hist_pallas import (
        hist_pallas_packed, kron_plan, pack_bins_host,
        pack_bins_lane_major)

    rng = np.random.default_rng(5)
    n, d, nb, blk, fg = 700, 6, 256, 256, 4
    binned = rng.integers(0, nb, (d, n)).astype(np.uint8)
    g = rng.standard_normal(n).astype(np.float32)
    h = rng.random(n).astype(np.float32)
    packed = jnp.asarray(pack_bins_host(binned, fg=fg, blk=blk))
    lm = jnp.asarray(pack_bins_lane_major(binned, fg=fg, blk=blk))
    for m in (1, 2, 4, 8):
        node = jnp.asarray(rng.integers(0, m, n).astype(np.int32))
        flat = hist_pallas_packed(packed, node, jnp.asarray(g),
                                  jnp.asarray(h), d=d, m=m, nb=nb,
                                  blk=blk, fg=fg, interpret=True)
        for hc in (2, 4, 8, 16):
            kr = hist_pallas_packed(packed, node, jnp.asarray(g),
                                    jnp.asarray(h), d=d, m=m, nb=nb,
                                    blk=blk, fg=fg, interpret=True,
                                    kron_hc=hc, bins_lm=lm)
            for a, b in zip(flat, kr):
                a, b = np.asarray(a), np.asarray(b)
                assert np.allclose(a, b, rtol=1e-6, atol=1e-5), (m, hc)
    # the plan prefers kron at shallow levels and flat at deep ones
    assert kron_plan(1, 256) >= 2
    assert kron_plan(32, 256) == 0


def test_boost_tpu_kron_engine_parity():
    """VES_BOOST_KRON=1 (kron one-hots at shallow levels) grows the
    same trees as the XLA engine through a full training run, both with
    the tier ladder active (mixed binary/continuous columns) and with
    tiers disabled (all-continuous big tier)."""
    import os

    from vae_extent_search_tpu.models import boost_tpu

    rng = np.random.default_rng(11)
    n = 400
    Xc = rng.standard_normal((n, 8)).astype(np.float32)
    Xb = (rng.random((n, 20)) < 0.4).astype(np.float32)
    X = np.concatenate([Xc, Xb], axis=1)
    y = (Xc[:, 0] - 0.5 * Xc[:, 2] ** 2 + Xb[:, 3]).astype(np.float32)
    params = {"max_depth": 4, "eta": 0.3}
    saved = {k: os.environ.get(k) for k in
             ("VES_BOOST_HIST", "VES_BOOST_KRON", "VES_BOOST_TIER")}
    try:
        os.environ["VES_BOOST_HIST"] = "xla"
        ref = boost_tpu.train(params, boost.DMatrix(X, label=y),
                              num_boost_round=6, verbose_eval=0)
        os.environ["VES_BOOST_HIST"] = "pallas_interpret"
        os.environ["VES_BOOST_KRON"] = "1"
        for tier in ("", "0"):   # default ladder / tiers disabled
            if tier:
                os.environ["VES_BOOST_TIER"] = tier
            else:
                os.environ.pop("VES_BOOST_TIER", None)
            bk = boost_tpu.train(params, boost.DMatrix(X, label=y),
                                 num_boost_round=6, verbose_eval=0)
            assert np.abs(ref.predict(X) - bk.predict(X)).max() < 1e-4
            for t1, t2 in zip(ref.trees, bk.trees):
                assert t1.feature == t2.feature, tier
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_boost_tpu_scan_path_callback_parity():
    """The scan fast path (device metrics + post-hoc callback replay)
    reproduces the numpy engine's eval lines — same rounds, same
    metric names/order, values within f32 tolerance — including the
    a-peak argmax tie-break toward the largest pack index."""
    rng = np.random.default_rng(3)
    rows = rng.random((600, 8)).astype(np.float32)
    pack_ids = np.repeat(np.arange(150), 4)
    labels = (rows.reshape(150, 4, 8).sum((1, 2)) / 10).astype(np.float32)

    from vae_extent_search_tpu.models import boost_tpu

    def run(train_fn):
        d = boost.DMatrix(rows, label=labels[pack_ids], pack_ids=pack_ids,
                          group_sizes=[150])
        buf = io.StringIO()
        with redirect_stdout(buf):
            train_fn({"max_depth": 4, "eta": 0.5}, d, num_boost_round=40,
                     obj=boost.pack_sum_square_error,
                     fevals=[boost.pack_sum_rmse,
                             boost.pack_sum_average_peak_score(1)],
                     evals=[(d, "tr")], metric="tr-rmse",
                     stopping_rounds=100, verbose_eval=25)
        return buf.getvalue().strip().splitlines()

    lines_np = run(boost.train)
    lines_dev = run(boost_tpu.train)
    assert len(lines_np) == len(lines_dev) and len(lines_np) >= 2
    for a, b in zip(lines_np, lines_dev):
        fa = re.findall(r"([\w@-]+): ([\d.]+)", a)
        fb = re.findall(r"([\w@-]+): ([\d.]+)", b)
        assert [k for k, _ in fa] == [k for k, _ in fb]
        for (_, va), (_, vb) in zip(fa, fb):
            assert abs(float(va) - float(vb)) < 2e-5, (a, b)


def test_boost_tpu_sharded_matches_single_device():
    """Data-parallel GBDT on the 8-device CPU mesh: rows sharded,
    per-level histograms psum'd — the trees and callback metrics must
    match single-device training (and thus the numpy engine)."""
    import jax
    from jax.sharding import Mesh

    from vae_extent_search_tpu.models import boost_tpu

    rng = np.random.default_rng(12)
    rows = rng.standard_normal((600, 10)).astype(np.float32)
    pack_ids = np.repeat(np.arange(200), 3)
    labels = (rows.reshape(200, 3, 10).sum((1, 2)) / 8).astype(np.float32)

    def mk():
        return boost.DMatrix(rows, label=labels[pack_ids],
                             pack_ids=pack_ids, group_sizes=[200])

    params = {"max_depth": 4, "eta": 0.3}
    common = dict(num_boost_round=12, obj=boost.pack_sum_square_error,
                  fevals=[boost.pack_sum_rmse],
                  metric="tr-rmse", stopping_rounds=100, verbose_eval=0)
    d1 = mk()
    b1 = boost_tpu.train(params, d1, evals=[(d1, "tr")], **common)
    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    d2 = mk()
    b2 = boost_tpu.train(params, d2, evals=[(d2, "tr")], mesh=mesh,
                         **common)
    assert len(b1.trees) == len(b2.trees)
    p1, p2 = b1.predict(d1), b2.predict(d2)
    assert np.abs(p1 - p2).max() < 1e-4, np.abs(p1 - p2).max()
    for t1, t2 in zip(b1.trees[:4], b2.trees[:4]):
        assert t1.feature == t2.feature


def test_boost_tpu_tiered_histograms_parity():
    """Real per-store matrices are mostly one-hot columns (98/164
    binary); the low-cardinality tier packs nb//sw of them per MXU dot
    via lane-expanded bins. Mixed binary+continuous training through
    the tiered kernel (interpret) must match the XLA engine tree for
    tree, including splits ON binary columns."""
    import os

    from vae_extent_search_tpu.models import boost_tpu

    rng = np.random.default_rng(21)
    n = 500
    X = np.zeros((n, 40), np.float32)
    X[:, :30] = (rng.random((n, 30)) < 0.4)         # binary block
    X[:, 30:] = rng.standard_normal((n, 10))
    y = (2.0 * X[:, 3] - 1.5 * X[:, 17] + X[:, 35]
         + 0.05 * rng.standard_normal(n)).astype(np.float32)
    params = {"max_depth": 4, "eta": 0.3}
    old = os.environ.get("VES_BOOST_HIST")
    try:
        os.environ["VES_BOOST_HIST"] = "xla"
        b1 = boost_tpu.train(params, boost.DMatrix(X, label=y),
                             num_boost_round=8, verbose_eval=0)
        os.environ["VES_BOOST_HIST"] = "pallas_interpret"
        b2 = boost_tpu.train(params, boost.DMatrix(X, label=y),
                             num_boost_round=8, verbose_eval=0)
    finally:
        if old is None:
            os.environ.pop("VES_BOOST_HIST", None)
        else:
            os.environ["VES_BOOST_HIST"] = old
    assert np.abs(b1.predict(X) - b2.predict(X)).max() < 1e-4
    split_feats = set()
    for t1, t2 in zip(b1.trees, b2.trees):
        assert t1.feature == t2.feature
        assert np.allclose(t1.threshold, t2.threshold)
        split_feats.update(f for f in t1.feature if f >= 0)
    assert split_feats & set(range(30)), "no binary-column splits hit"


def test_boost_tpu_all_binary_corpus():
    """Every feature lands in the low-cardinality tier (d_big == 0) —
    the big-tier kernel must be skipped, splits still found, parity
    with the XLA engine kept."""
    import os

    from vae_extent_search_tpu.models import boost_tpu

    rng = np.random.default_rng(5)
    X = (rng.random((400, 24)) < 0.5).astype(np.float32)
    y = (X[:, 1] * 2 - X[:, 7] + 0.01 * rng.standard_normal(400)
         ).astype(np.float32)
    params = {"max_depth": 3, "eta": 0.4}
    old = os.environ.get("VES_BOOST_HIST")
    try:
        os.environ["VES_BOOST_HIST"] = "xla"
        b1 = boost_tpu.train(params, boost.DMatrix(X, label=y),
                             num_boost_round=6, verbose_eval=0)
        os.environ["VES_BOOST_HIST"] = "pallas_interpret"
        b2 = boost_tpu.train(params, boost.DMatrix(X, label=y),
                             num_boost_round=6, verbose_eval=0)
    finally:
        if old is None:
            os.environ.pop("VES_BOOST_HIST", None)
        else:
            os.environ["VES_BOOST_HIST"] = old
    assert np.abs(b1.predict(X) - b2.predict(X)).max() < 1e-4
    assert any(f >= 0 for t in b2.trees for f in t.feature)


def test_search_policy_reference_model_names(tmp_path):
    """The reference's cost-model names work in policy strings:
    'sketch.xgb[-no-update]' / 'sketch.lgbm' resolve to the GBDT
    internals, and a train_model-saved pickle loads back through
    make_search_policies --load-model (round-2 regression: these fell
    through to the sequence-model loader)."""
    import pickle

    from vae_extent_search_tpu.models.gbdt import (GBDTModelInternal,
                                                   LGBModelInternal)
    from vae_extent_search_tpu.search.cost_model import (
        LearnedCostModel, make_search_policies)

    policies, model = make_search_policies("sketch.xgb", [])
    assert isinstance(model.internal, GBDTModelInternal)
    _, model = make_search_policies("sketch.lgbm", [])
    assert isinstance(model.internal, LGBModelInternal)

    rng = np.random.default_rng(0)
    feats = [rng.random((3, 8)).astype(np.float32) for _ in range(30)]
    y = np.asarray([f.sum() for f in feats], np.float32)
    m = GBDTModelInternal(backend="xgb", n_estimators=20)
    m.use_workload_embedding = False
    m.fit_base(feats, y)
    path = str(tmp_path / "xgb.pkl")
    m.save(path)
    _, loaded = make_search_policies("sketch.xgb-no-update", [],
                                     load_model_file=path)
    assert isinstance(loaded.internal, GBDTModelInternal)
    pred = loaded.internal.predict_on_features(feats)
    assert np.corrcoef(pred, y)[0, 1] > 0.8
    # frozen: update must be a no-op
    loaded.update([], [])


def test_boost_tpu_weighted_pack_sum_parity():
    """Per-row weights (reference use_weight: max(y, 0.1) tiled over
    rows) flow through the device engine's weighted grad/hess path and
    match the numpy engine."""
    rows_list, labels, pack_ids = _pack_problem(n_prog=80, seed=8)
    rows = np.concatenate(rows_list)
    w = np.maximum(labels, 0.1)[pack_ids].astype(np.float32)

    from vae_extent_search_tpu.models import boost_tpu

    def mk():
        return boost.DMatrix(rows, label=labels[pack_ids],
                             pack_ids=pack_ids, weight=w,
                             group_sizes=[80])

    params = {"max_depth": 4, "eta": 0.3}
    b1 = boost.train(params, mk(), num_boost_round=15,
                     obj=boost.pack_sum_square_error, verbose_eval=0)
    b2 = boost_tpu.train(params, mk(), num_boost_round=15,
                         obj=boost.pack_sum_square_error, verbose_eval=0)
    p1 = boost.pack_sum_predict_throughput(b1.predict(rows), pack_ids)
    p2 = boost.pack_sum_predict_throughput(b2.predict(rows), pack_ids)
    assert np.corrcoef(p1, p2)[0, 1] > 0.999
    assert np.abs(p1 - p2).max() < 1e-3 * max(1.0, np.abs(p1).max())


def test_boost_tpu_sharded_tiered_matches_single_device():
    """Mesh + tiered histograms (binary-heavy columns, interpret-mode
    kernels): the sharded runner packs both tiers shard-row-wise and
    must reproduce single-device training exactly."""
    import os

    import jax
    from jax.sharding import Mesh

    from vae_extent_search_tpu.models import boost_tpu

    rng = np.random.default_rng(17)
    n = 500
    X = np.zeros((n, 30), np.float32)
    X[:, :24] = (rng.random((n, 24)) < 0.4)
    X[:, 24:] = rng.standard_normal((n, 6))
    pack_ids = np.repeat(np.arange(125), 4)
    labels = (X[:, 2] + X[:, 25]).reshape(125, 4).sum(1).astype(np.float32)

    def mk():
        return boost.DMatrix(X, label=labels[pack_ids],
                             pack_ids=pack_ids, group_sizes=[125])

    params = {"max_depth": 3, "eta": 0.3}
    common = dict(num_boost_round=8, obj=boost.pack_sum_square_error,
                  verbose_eval=0)
    old = os.environ.get("VES_BOOST_HIST")
    try:
        os.environ["VES_BOOST_HIST"] = "pallas_interpret"
        b1 = boost_tpu.train(params, mk(), **common)
        mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
        b2 = boost_tpu.train(params, mk(), mesh=mesh, **common)
    finally:
        if old is None:
            os.environ.pop("VES_BOOST_HIST", None)
        else:
            os.environ["VES_BOOST_HIST"] = old
    assert np.abs(b1.predict(X) - b2.predict(X)).max() < 1e-4
    for t1, t2 in zip(b1.trees, b2.trees):
        assert t1.feature == t2.feature


def test_load_model_pickle_dispatches_by_family(tmp_path):
    """eval_model_on_dataset takes whatever model family train_model
    saved — the generic loader must dispatch tree internals (pickled
    self) and JAX blobs (dict) correctly (round-2 regression: the
    script hardcoded MLPModelInternal.load and crashed on xgb pickles)."""
    from vae_extent_search_tpu.models import load_model_pickle
    from vae_extent_search_tpu.models.gbdt import GBDTModelInternal
    from vae_extent_search_tpu.models.segment import MLPModelInternal

    rng = np.random.default_rng(0)
    feats = [rng.random((2, 8)).astype(np.float32) for _ in range(30)]
    y = np.asarray([f.sum() for f in feats], np.float32)

    g = GBDTModelInternal(backend="xgb", n_estimators=15)
    g.use_workload_embedding = False
    g.fit_base(feats, y)
    gp = str(tmp_path / "g.pkl")
    g.save(gp)
    loaded = load_model_pickle(gp)
    assert isinstance(loaded, GBDTModelInternal)
    assert np.corrcoef(loaded.predict_on_features(feats), y)[0, 1] > 0.8

    m = MLPModelInternal(in_dim=8, hidden_dim=32, n_epoch=30)
    m.use_workload_embedding = False
    m.fit_base(feats, y)
    mp = str(tmp_path / "m.pkl")
    m.save(mp)
    assert isinstance(load_model_pickle(mp), MLPModelInternal)


def _tree_shape(tree):
    """(n_leaves, max_depth, set of (feature, threshold) splits)."""
    n_leaves, max_d, splits = 0, 0, set()
    stack = [(0, 0)]
    while stack:
        node, d = stack.pop()
        max_d = max(max_d, d)
        if tree.feature[node] < 0:
            n_leaves += 1
            continue
        splits.add((int(tree.feature[node]),
                    round(float(tree.threshold[node]), 6)))
        stack.append((tree.left[node], d + 1))
        stack.append((tree.right[node], d + 1))
    return n_leaves, max_d, splits


def test_lossguide_topology_differs_from_levelwise():
    """Leaf-wise (lossguide) growth spends its num_leaves budget on the
    globally best gains — on a corpus whose structure nests inside one
    half of feature 0 it must grow an unbalanced chain deeper than
    log2(num_leaves), while level-wise at the same leaf budget stays a
    balanced depth-2 heap (lgbm_model.py:250 num_leaves semantics vs
    xgboost-hist depth-wise)."""
    rng = np.random.default_rng(7)
    x = rng.random(4000).astype(np.float32)
    extra = rng.random((4000, 3)).astype(np.float32)  # no-gain noise
    X = np.column_stack([x, extra])
    # nested steps inside x<0.5; tiny slope on the right half
    y = (100.0 * (x < 0.125) + 50.0 * (x < 0.25) + 25.0 * (x < 0.5)
         + 0.01 * x).astype(np.float32)

    d_leaf = boost.DMatrix(X, label=y)
    bst_leaf = boost.train(
        {"grow_policy": "lossguide", "num_leaves": 4, "eta": 1.0,
         "min_data_in_leaf": 1},
        d_leaf, num_boost_round=1)
    nl, depth, splits_leaf = _tree_shape(bst_leaf.trees[0])
    assert nl == 4
    assert depth == 3  # chain: 0.5 -> 0.25 -> 0.125, all on one side

    d_lvl = boost.DMatrix(X, label=y)
    bst_lvl = boost.train({"max_depth": 2, "eta": 1.0}, d_lvl,
                          num_boost_round=1)
    nl2, depth2, splits_lvl = _tree_shape(bst_lvl.trees[0])
    assert depth2 <= 2
    assert splits_leaf != splits_lvl
    # the chain recovered all three nested thresholds
    feats = {f for f, _ in splits_leaf}
    assert feats == {0}
    thr = sorted(t for _, t in splits_leaf)
    assert np.allclose(thr, [0.125, 0.25, 0.5], atol=0.02)

    # growth-consistent routing: ensemble prediction reproduces y
    # (4 leaves capture the 4 steps; the 0.01*x slope stays as
    # within-leaf residual)
    pred = bst_leaf.predict(X)
    assert float(np.corrcoef(pred, y)[0, 1]) > 0.995


def test_lossguide_respects_num_leaves_and_gain_stop():
    """num_leaves caps every tree; on a zero-signal corpus no split has
    positive gain so the tree stays a stump."""
    rng = np.random.default_rng(3)
    X = rng.random((500, 6)).astype(np.float32)
    y = rng.normal(size=500).astype(np.float32)

    d = boost.DMatrix(X, label=y)
    bst = boost.train({"grow_policy": "lossguide", "num_leaves": 8,
                       "gamma": 10.0, "eta": 0.3}, d, num_boost_round=3)
    for t in bst.trees:
        nl, _, _ = _tree_shape(t)
        assert nl == 1  # gamma kills every candidate gain

    y2 = (X @ rng.random(6)).astype(np.float32)
    d2 = boost.DMatrix(X, label=y2)
    bst2 = boost.train({"grow_policy": "lossguide", "num_leaves": 8,
                        "eta": 0.3, "min_data_in_leaf": 1},
                       d2, num_boost_round=3)
    for t in bst2.trees:
        nl, _, _ = _tree_shape(t)
        assert nl <= 8


def test_lossguide_pack_sum_protocol_parity():
    """The full pack-sum protocol (objective + rmse/a-peak fevals +
    early stopping) runs unchanged on the lossguide grower — the LGB
    arm is the same protocol with lightgbm growth semantics
    (lgbm_model.py:241-249)."""
    rows_list, labels, pack_ids = _pack_problem(120, seed=4)
    rows = np.concatenate(rows_list)
    d = boost.DMatrix(rows, label=labels[pack_ids], pack_ids=pack_ids,
                      group_sizes=[len(labels)])
    out = io.StringIO()
    with redirect_stdout(out):
        bst = boost.train(
            {"grow_policy": "lossguide", "num_leaves": 31,
             "eta": 0.16, "min_child_weight": 4, "seed": 0,
             "feature_fraction": 0.84375, "bagging_fraction": 0.89435,
             "bagging_freq": 4},
            d, num_boost_round=120, obj=boost.pack_sum_square_error,
            fevals=[boost.pack_sum_rmse,
                    boost.pack_sum_average_peak_score(1)],
            evals=[(d, "tr")], metric="tr-rmse", stopping_rounds=100,
            verbose_eval=25)
    text = out.getvalue()
    assert re.search(r"tr-rmse:\s*\d", text) and "tr-a-peak@1" in text
    pred = np.bincount(pack_ids, weights=bst.predict(rows),
                       minlength=len(labels))
    assert float(np.corrcoef(pred, labels)[0, 1]) > 0.9
    # determinism: same seed -> identical ensemble
    d2 = boost.DMatrix(rows, label=labels[pack_ids], pack_ids=pack_ids,
                       group_sizes=[len(labels)])
    bst2 = boost.train(
        {"grow_policy": "lossguide", "num_leaves": 31, "eta": 0.16,
         "min_child_weight": 4, "seed": 0, "feature_fraction": 0.84375,
         "bagging_fraction": 0.89435, "bagging_freq": 4},
        d2, num_boost_round=len(bst.trees),
        obj=boost.pack_sum_square_error)
    assert np.allclose(bst2.predict(rows), bst.predict(rows))


def test_lgbm_model_selects_lossguide(monkeypatch):
    """LGBModelInternal drives _fit_native with the reference's tuned
    lightgbm params (lgbm_model.py:250-258) and the lossguide grower;
    the device engine delegates lossguide to the host grower."""
    from vae_extent_search_tpu.models import boost_tpu
    from vae_extent_search_tpu.models.gbdt import HAS_LGB, LGBModelInternal

    if HAS_LGB:
        pytest.skip("real lightgbm present; native path not taken")

    captured = {}
    real_train = boost.train

    def spy(params, *a, **kw):
        captured.update(params)
        return real_train(params, *a, **kw)

    monkeypatch.setattr(boost, "train", spy)
    rng = np.random.default_rng(9)
    feats = [rng.random((rng.integers(2, 5), 10), dtype=np.float32)
             for _ in range(80)]
    y = np.asarray([f.sum() * 0.02 for f in feats], np.float32)
    m = LGBModelInternal(n_estimators=60)
    m.fit_base(feats, y)
    assert captured["grow_policy"] == "lossguide"
    assert captured["num_leaves"] == 72
    assert abs(captured["eta"] - 0.1632095) < 1e-9
    assert np.corrcoef(m.predict_on_features(feats), y)[0, 1] > 0.8
    # every tree respects the num_leaves cap
    for t in m.model.trees:
        nl, _, _ = _tree_shape(t)
        assert nl <= 72

    # device engine delegation: identical ensemble from boost_tpu.train
    rows = np.concatenate(feats)
    pk = np.repeat(np.arange(len(feats)),
                   [len(f) for f in feats]).astype(np.int64)
    d1 = boost.DMatrix(rows, label=y[pk], pack_ids=pk,
                       group_sizes=[len(y)])
    d2 = boost.DMatrix(rows, label=y[pk], pack_ids=pk,
                       group_sizes=[len(y)])
    params = {"grow_policy": "lossguide", "num_leaves": 16,
              "eta": 0.2, "seed": 1}
    b1 = real_train(params, d1, num_boost_round=10,
                    obj=boost.pack_sum_square_error)
    b2 = boost_tpu.train(params, d2, num_boost_round=10,
                         obj=boost.pack_sum_square_error)
    assert np.allclose(b1.predict(rows), b2.predict(rows))


def test_boost_tpu_pack_cache_releases_device_memory():
    """Advisor finding (round 2/3): the DMatrix-lifetime pack cache must
    hold HOST arrays only — no device (HBM on chip) buffers may stay
    pinned to the DMatrix after train() returns, and re-training under a
    different engine/tier key must not accumulate packs (the cache keeps
    only the latest key)."""
    import gc

    import jax

    from vae_extent_search_tpu.models import boost_tpu

    rng = np.random.default_rng(3)
    X = rng.standard_normal((300, 8)).astype(np.float32)
    y = X[:, 0].astype(np.float32)
    d = boost.DMatrix(X, label=y)
    params = {"max_depth": 3, "eta": 0.3}

    gc.collect()
    live0 = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                for a in jax.live_arrays())
    b = boost_tpu.train(params, d, num_boost_round=4, verbose_eval=0)
    assert len(b.trees) == 4
    del b
    gc.collect()

    # 1) the cache itself holds only host numpy payloads
    cache = getattr(d, "_ves_pack_cache", None)
    assert cache is not None and len(cache) == 1
    for host_input, _meta in cache.values():
        parts = host_input if isinstance(host_input, tuple) else (host_input,)
        for p in parts:
            assert isinstance(p, np.ndarray), type(p)

    # 2) device live bytes return to (approximately) the pre-train
    # level: nothing corpus-sized stays resident once the booster and
    # round temporaries are gone (corpus is ~300*8*4 = 9.6 kB binned;
    # allow a small slack for cached scalars/compiled-constant buffers)
    live1 = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                for a in jax.live_arrays())
    assert live1 - live0 < 4096, (live0, live1)

    # 3) retraining under a different tier key evicts the old pack
    # rather than accumulating host copies
    import os
    old = os.environ.get("VES_BOOST_TIER")
    os.environ["VES_BOOST_TIER"] = "0"
    try:
        boost_tpu.train(params, d, num_boost_round=2, verbose_eval=0)
        assert len(d._ves_pack_cache) == 1
    finally:
        if old is None:
            os.environ.pop("VES_BOOST_TIER", None)
        else:
            os.environ["VES_BOOST_TIER"] = old

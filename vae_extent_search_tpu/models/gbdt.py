"""Gradient-boosted-tree cost model.

Parity target: cost_model/xgb_model.py XGBModelInternal — XGBoost over
per-store rows with the pack-sum trick (each store row is one tree sample;
a program's score is the sum over its pack; custom objective
pack_sum_square_error :528, eval pack_sum_rmse :558 / average peak score
:579; params depth 6, eta 0.2 :138-149).

When xgboost is importable we run the true pack-sum objective; otherwise
(this image ships no xgboost) we fall back to sklearn
GradientBoostingRegressor over per-program summed feature vectors — the
same segment-sum aggregation the MLP uses, trading the per-row objective
for availability. The public fit_base/predict surface is identical.
"""

from __future__ import annotations

import pickle
from typing import List, Optional

import numpy as np

try:
    import xgboost as xgb

    HAS_XGB = True
except ImportError:
    xgb = None
    HAS_XGB = False

try:
    import lightgbm as lgb

    HAS_LGB = True
except ImportError:
    lgb = None
    HAS_LGB = False


def _invalid_rows_mask(model, features_list):
    """Unlowerable states arrive as all-zero feature matrices
    (feature.py:114-116 / mlp_model.py:842-845 -> score -inf). The
    workload-embedding columns are appended AFTER that convention, so
    only the base columns decide validity."""
    emb = (
        getattr(model, "workload_embed_total_dim", 0)
        if getattr(model, "use_workload_embedding", False) else 0
    )
    out = []
    for f in features_list:
        base = f[:, : f.shape[1] - emb] if emb and len(f) else f
        out.append(len(f) == 0 or not np.any(base))
    return out


def _pack_ids(features_list) -> np.ndarray:
    ids = []
    for i, f in enumerate(features_list):
        ids.extend([i] * len(f))
    return np.asarray(ids, np.int64)


# past this many per-store rows, the native pack-sum protocol grows its
# trees on the accelerator (models/boost_tpu.py) when one is attached
_TPU_BOOST_MIN_ROWS = 200_000


class GBDTModelInternal:
    def __init__(self, max_depth: int = 6, learning_rate: float = 0.2,
                 n_estimators: int = 300, seed: int = 43,
                 backend: str = "auto", in_dim: Optional[int] = None):
        # in_dim is accepted (and unused — trees are shape-agnostic) so
        # the generic few-shot harness (models/segment.py few_shot_fit)
        # drives GBDT through the same base/local/plus modes the
        # reference xgb model exposes (xgb_model.py:158-230)
        self.max_depth = max_depth
        self.learning_rate = learning_rate
        self.n_estimators = n_estimators
        self.seed = seed
        if backend == "auto":
            backend = "xgb" if HAS_XGB else ("lgb" if HAS_LGB else "sklearn")
        if backend == "xgb" and not HAS_XGB:
            # no xgboost in the image: run the SAME pack-sum training
            # protocol on the in-repo histogram booster (models/boost.py)
            backend = "native"
        if backend == "lgb" and not HAS_LGB:
            # lgbm_model.py runs the same pack-sum protocol as the xgb
            # model (lgbm_model.py:246-247) — fall back to the in-repo
            # booster, not the aggregate sklearn degrade
            backend = "native"
        self.backend = backend
        self.use_xgb = backend == "xgb"
        self.model = None

    # ------------------------------------------------------------------
    def fit_base(self, features_list: List[np.ndarray], labels,
                 verbose=False, augment_buffer_swap: bool = False,
                 use_weight: bool = False):
        """``augment_buffer_swap``: duplicate every program with the
        per-store feature blocks of buffers 1 and 2 swapped (columns
        57+18..57+54) — the reference's ``use_data_argumentation``
        buffer-permutation augmentation (xgb_model.py:323-334; its
        row/column indexing slip fixed). ``use_weight``: per-row weight
        max(y, 0.1) so high-throughput programs dominate the objective
        (xgb_model.py:336)."""
        labels = np.asarray(labels, np.float32)
        if augment_buffer_swap:
            aug = []
            for f in features_list:
                g = np.array(f, copy=True)
                if g.shape[-1] >= 57 + 18 * 3:
                    tmp = g[:, 57 + 18:57 + 36].copy()
                    g[:, 57 + 18:57 + 36] = g[:, 57 + 36:57 + 54]
                    g[:, 57 + 36:57 + 54] = tmp
                aug.append(g)
            features_list = list(features_list) + aug
            labels = np.concatenate([labels, labels])
        self._row_weights = (
            np.maximum(labels, 0.1) if use_weight else None)
        if self.use_xgb:
            self._fit_xgb(features_list, labels)
        elif self.backend == "native":
            self._fit_native(features_list, labels, verbose)
        elif self.backend == "lgb":
            self._fit_lgb(features_list, labels)
        else:
            self._fit_sklearn(features_list, labels)
        return self

    def _aggregate(self, features_list) -> np.ndarray:
        # trailing workload-embedding columns (tiled per row, constant
        # within a program) must NOT be summed — summing turns them into
        # a noisy row-count proxy; keep the per-program constant instead
        emb = (
            getattr(self, "workload_embed_total_dim", 0)
            if getattr(self, "use_workload_embedding", False) else 0
        )
        out = np.zeros(
            (len(features_list), features_list[0].shape[1]), np.float32
        )
        for i, f in enumerate(features_list):
            if len(f):
                out[i] = f.sum(axis=0)
                if emb:
                    out[i, -emb:] = f[0, -emb:]
        return out

    def _drop_constant_cols(self, X: np.ndarray, fit: bool) -> np.ndarray:
        """Constant columns carry no split gain, but their mere presence
        shifts sklearn's random feature-visit order and re-breaks ties
        between the heavily-correlated per-store features — a single-task
        search with the (per-task-constant) workload embedding appended
        would follow a different trajectory than one without for RNG
        reasons alone. Dropping fit-time-constant columns makes the
        aggregate backends invariant to them; varying columns (the
        embedding across a multi-task dataset) are kept."""
        if fit:
            self._col_mask = (X != X[0:1]).any(axis=0)
            if not self._col_mask.any():
                self._col_mask[:] = True
        mask = getattr(self, "_col_mask", None)
        if mask is None or len(mask) != X.shape[1]:
            # model fitted before column dropping existed (old pickle)
            return X
        return X[:, mask]

    def _fit_sklearn(self, features_list, labels):
        X = self._drop_constant_cols(self._aggregate(features_list), True)
        if len(X) > 100_000:
            # the exact-split GradientBoostingRegressor is O(n log n)
            # per node PER FEATURE and ran >75 min on a 1.36M-program
            # multi-platform corpus (found the hard way); sklearn's
            # histogram estimator is the same model family at
            # corpus-scale speed (minutes). Same predict API, same
            # pickle path.
            from sklearn.ensemble import HistGradientBoostingRegressor

            self.model = HistGradientBoostingRegressor(
                max_depth=self.max_depth,
                learning_rate=self.learning_rate,
                max_iter=self.n_estimators, random_state=self.seed,
            )
            self.model.fit(X, labels,
                           sample_weight=getattr(self, "_row_weights",
                                                 None))
            return
        from sklearn.ensemble import GradientBoostingRegressor

        self.model = GradientBoostingRegressor(
            max_depth=self.max_depth, learning_rate=self.learning_rate,
            n_estimators=self.n_estimators, random_state=self.seed,
        )
        self.model.fit(X, labels,
                       sample_weight=getattr(self, "_row_weights", None))

    def _fit_lgb(self, features_list, labels):
        """LightGBM over per-program summed features (reference
        cost_model/lgbm_model.py LGBModelInternal; same aggregation
        trade-off as the sklearn fallback). Tuned/HPO params flow
        through _lgb_params so the bayesian tuning surface drives the
        real library too, not just the in-repo grower."""
        X = self._drop_constant_cols(self._aggregate(features_list), True)
        self.model = lgb.LGBMRegressor(
            max_depth=self.max_depth, learning_rate=self.learning_rate,
            n_estimators=self.n_estimators, random_state=self.seed,
            **self._lgb_params(),
        )
        self.model.fit(X, labels,
                       sample_weight=getattr(self, "_row_weights", None))

    def _lgb_params(self) -> dict:
        """Extra native-named lightgbm params (LGBMRegressor passes
        unknown kwargs through to the booster). Base model: none."""
        return {}

    def _fit_xgb(self, features_list, labels):
        rows = np.concatenate(features_list)
        pack_ids = _pack_ids(features_list)
        dmatrix = xgb.DMatrix(rows)
        w = getattr(self, "_row_weights", None)
        row_w = None if w is None else np.asarray(w, np.float64)[pack_ids]

        def pack_sum_square_error(preds, dtrain):
            """gradient of 0.5*(sum_pack(pred) - label)^2 per row, times
            the per-program weight tiled over its rows
            (xgb_model.py:528-573: grad/hess both scale by weight)."""
            sums = np.bincount(pack_ids, weights=preds,
                               minlength=len(labels))
            diff = sums[pack_ids] - labels[pack_ids]
            hess = np.ones_like(diff)
            if row_w is not None:
                return diff * row_w, hess * row_w
            return diff, hess

        self.model = xgb.train(
            {
                "max_depth": self.max_depth, "eta": self.learning_rate,
                "seed": self.seed, "verbosity": 0,
            },
            dmatrix, num_boost_round=self.n_estimators,
            obj=pack_sum_square_error,
        )
        self._train_shape = rows.shape[1]

    def _fit_native(self, features_list, labels, verbose=False):
        """The reference's full pack-sum protocol (xgb_model.py:120-250)
        on the in-repo booster: per-store rows, pack_sum_square_error
        objective, pack_sum_rmse + a-peak@N eval callbacks every 25
        rounds, best-iteration early stopping after 100.

        Tree growth engine: the numpy grower (models/boost.py) at
        search-loop scale; past ``_TPU_BOOST_MIN_ROWS`` rows with an
        accelerator attached, the same protocol runs its per-round work
        on device (models/boost_tpu.py) — that is what makes
        TenSet-pretraining-scale corpora (millions of per-store rows)
        trainable in-framework. ``VES_BOOST_TPU=1/0`` forces/forbids."""
        from . import boost

        rows = np.concatenate(features_list)
        pack_ids = _pack_ids(features_list)
        w = getattr(self, "_row_weights", None)
        dtrain = boost.DMatrix(
            rows, label=labels[pack_ids], pack_ids=pack_ids,
            weight=None if w is None else w[pack_ids],
            group_sizes=[len(features_list)])
        train_fn = self._native_train_fn(len(rows))
        self.model = train_fn(
            self._native_params(),
            dtrain, num_boost_round=self.n_estimators,
            obj=boost.pack_sum_square_error,
            fevals=[boost.pack_sum_rmse,
                    boost.pack_sum_average_peak_score(1)],
            evals=[(dtrain, "tr")], metric="tr-rmse",
            stopping_rounds=100,
            verbose_eval=25 if verbose else 0,
        )
        self._train_shape = rows.shape[1]

    def _native_params(self) -> dict:
        """Booster params for the in-repo engine — xgboost-faithful here
        (xgb_model.py:138-149 depth 6, eta 0.2); LGBModelInternal
        overrides with lightgbm's growth semantics."""
        return {
            "max_depth": self.max_depth, "eta": self.learning_rate,
            "gamma": 0.003, "min_child_weight": 2,
            "seed": self.seed,
        }

    @staticmethod
    def _native_train_fn(n_rows: int):
        """boost.train or (at scale, with an accelerator) the
        device-round boost_tpu.train — both produce the same
        boost.Booster, so saving/prediction are engine-agnostic."""
        import os

        force = os.environ.get("VES_BOOST_TPU")
        if force == "0":
            from . import boost
            return boost.train
        if force == "1":
            from . import boost_tpu
            return boost_tpu.train
        if n_rows >= _TPU_BOOST_MIN_ROWS:
            try:
                import jax
                # the device engine's Pallas kernel is written for TPU
                # Mosaic semantics — auto-route only on a real TPU
                # (VES_BOOST_TPU=1 still forces it elsewhere)
                if jax.default_backend() == "tpu":
                    from . import boost_tpu
                    return boost_tpu.train
            except Exception:  # pragma: no cover - jax init failure
                pass
        from . import boost
        return boost.train

    # ------------------------------------------------------------------
    def predict_on_features(self, features_list) -> np.ndarray:
        if not features_list:
            return np.zeros(0, np.float32)
        if self.backend == "native":
            rows = np.concatenate(features_list)
            pack_ids = _pack_ids(features_list)
            preds = self.model.predict(rows)
            out = np.bincount(pack_ids, weights=preds,
                              minlength=len(features_list)).astype(np.float32)
        elif self.use_xgb:
            rows = np.concatenate(features_list)
            pack_ids = _pack_ids(features_list)
            preds = self.model.predict(xgb.DMatrix(rows))
            out = np.bincount(pack_ids, weights=preds,
                              minlength=len(features_list)).astype(np.float32)
        else:
            out = self.model.predict(
                self._drop_constant_cols(self._aggregate(features_list),
                                         False)
            ).astype(np.float32)
        for i, bad in enumerate(_invalid_rows_mask(self, features_list)):
            if bad:
                out[i] = -np.inf
        return out

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @classmethod
    def load(cls, path: str):
        with open(path, "rb") as f:
            return pickle.load(f)


class LGBModelInternal(GBDTModelInternal):
    """LightGBM-semantics variant (reference cost_model/lgbm_model.py):
    the same pack_sum_square_error objective + fevals as the xgb model
    (lgbm_model.py:246-247) but with lightgbm's tree grower — best-first
    leaf-wise ("lossguide") growth capped by num_leaves, per-tree
    feature_fraction and bagging — and the reference's tuned params
    (lgbm_model.py:250-258: num_leaves 72, lr 0.1632095,
    feature_fraction 0.84375, bagging 0.89435/freq 4,
    min_sum_hessian_in_leaf 4). Uses the real lightgbm library when
    importable; otherwise the in-repo booster's lossguide grower
    (models/boost.py _grow_tree_leafwise)."""

    def __init__(self, params: Optional[dict] = None, **kw):
        # `params` mirrors the reference's tunable-params constructor
        # (lgbm_model.py LGBModelInternal(params=...), the surface the
        # bayesian HPO script drives): lightgbm-named keys override the
        # tuned defaults below
        self._params_override = dict(params or {})
        self._explicit_depth = "max_depth" in self._params_override
        for k in ("learning_rate", "max_depth", "n_estimators"):
            if k in self._params_override:
                kw[k] = self._params_override.pop(k)
        self._params_override.pop("boosting_type", None)  # always gbdt
        kw.setdefault("backend", "lgb")
        kw.setdefault("learning_rate", 0.1632095)
        super().__init__(**kw)

    def _native_params(self) -> dict:
        p = {
            "grow_policy": "lossguide",
            "num_leaves": 72,
            "eta": self.learning_rate,
            "feature_fraction": 0.84375,
            "bagging_fraction": 0.89435,
            "bagging_freq": 4,
            "min_child_weight": 4,  # min_sum_hessian_in_leaf
            "seed": self.seed,
        }
        if getattr(self, "_explicit_depth", False):  # old pickles: absent
            # absent key = unlimited depth (lightgbm's default); only an
            # explicit user override caps the lossguide grower
            p["max_depth"] = self.max_depth
        rename = {"min_sum_hessian_in_leaf": "min_child_weight"}
        for k, v in self._params_override.items():
            p[rename.get(k, k)] = v
        return p

    def _lgb_params(self) -> dict:
        """The same tuned defaults + overrides in lightgbm's own naming
        for the real-library backend (lgbm_model.py:250-258)."""
        p = {
            "num_leaves": 72,
            "feature_fraction": 0.84375,
            "bagging_fraction": 0.89435,
            "bagging_freq": 4,
            "min_sum_hessian_in_leaf": 4,
        }
        p.update(self._params_override)
        # already passed explicitly to LGBMRegressor
        for k in ("max_depth", "learning_rate", "n_estimators",
                  "random_state", "seed"):
            p.pop(k, None)
        return p


class RandomModelInternal:
    """Uniform-random predictions — the sanity baseline (reference
    cost_model/cost_model.py:87-113 RandomModelInternal)."""

    def __init__(self, seed: int = 0):
        self.seed = seed
        self.model = True  # "fit" from the start

    def fit_base(self, features_list, labels, verbose=False):
        return self

    def predict_on_features(self, features_list) -> np.ndarray:
        rng = np.random.default_rng(self.seed)
        return rng.random(len(features_list)).astype(np.float32)

    def save(self, path: str):
        with open(path, "wb") as f:
            pickle.dump(self, f)

    @classmethod
    def load(cls, path: str):
        with open(path, "rb") as f:
            return pickle.load(f)

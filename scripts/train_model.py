"""Train and evaluate cost models on a performance dataset.

Parity: reference scripts/train_model.py:33-175 — load dataset pickle(s),
split (within_task / by_task / by_target), train the requested models
("mlp", "mlp@lambdaRank", "gbdt", ...), report weighted RMSE / R2 /
pairwise accuracy / MAPE / peak@1 / peak@5 per model, save <name>.pkl.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vae_extent_search_tpu.data import Dataset
from vae_extent_search_tpu.models import metrics as M
from vae_extent_search_tpu.models.segment import MLPModelInternal


def evaluate_model(model, test_ds: Dataset):
    """Per-task metrics, weighted by task sample counts
    (reference train_model.py:33-76)."""
    names = ["RMSE", "R^2", "pairwise comparision accuracy", "mape",
             "average peak score@1", "average peak score@5"]
    rows = []
    weights = []
    for task in test_ds.tasks():
        feats = [np.asarray(f, np.float32) for f in test_ds.features[task]]
        labels = test_ds.throughputs[task]
        from vae_extent_search_tpu.models.embedding import embed_for_model

        feats = embed_for_model(model, feats, task.workload_key)
        preds = model.predict_on_features(feats)
        finite = np.isfinite(preds)
        preds = np.where(finite, preds, 0.0)
        rows.append([
            M.metric_rmse(preds, labels),
            M.metric_r_squared(preds, labels),
            M.metric_pairwise_comp_accuracy(preds, labels),
            M.metric_mape(preds, labels),
            M.metric_peak_score(preds, labels, 1),
            M.metric_peak_score(preds, labels, 5),
        ])
        weights.append(len(labels))
    if not rows:
        return dict(zip(names, [0.0] * len(names)))
    rows = np.asarray(rows)
    weights = np.asarray(weights, np.float64)
    weights /= weights.sum()
    return dict(zip(names, (rows * weights[:, None]).sum(axis=0).tolist()))


def make_model(spec: str, in_dim: int):
    parts = spec.split("@")
    kind = parts[0]
    if kind == "mlp":
        loss = parts[1] if len(parts) > 1 else "lambdaRank"
        return MLPModelInternal(in_dim=in_dim, loss_type=loss)
    if kind in ("lgb", "lgbm"):
        # "lgbm" is the reference's name (its train_model.py model
        # table); lightgbm growth semantics via LGBModelInternal
        from vae_extent_search_tpu.models.gbdt import LGBModelInternal

        return LGBModelInternal()
    if kind == "random":
        from vae_extent_search_tpu.models.gbdt import RandomModelInternal

        return RandomModelInternal()
    if kind in ("gbdt", "xgb"):
        from vae_extent_search_tpu.models.gbdt import GBDTModelInternal

        # "xgb" = the reference pack-sum protocol (real xgboost, or the
        # in-repo booster when absent); "gbdt" = fast aggregate backend
        return GBDTModelInternal(
            backend="xgb" if kind == "xgb" else "auto")
    if kind in ("lstm", "mha", "tabnet"):
        from vae_extent_search_tpu.models.variants import (
            SequenceModelInternal,
        )

        return SequenceModelInternal(arch=kind, in_dim=in_dim)
    raise ValueError(f"unknown model spec {spec}")


def train_zero_shot(dataset: Dataset, models: str, split_scheme: str,
                    seed: int = 0, verbose: bool = False,
                    train_ratio: float = 0.9,
                    use_workload_embedding: bool = True):
    if split_scheme == "within_task":
        train_set, test_set = dataset.random_split_within_task(
            train_ratio, seed=seed)
    elif split_scheme == "by_task":
        train_set, test_set = dataset.random_split_by_task(
            train_ratio, seed=seed)
    elif split_scheme == "by_target":
        targets = sorted({t.target for t in dataset.tasks()})
        train_set, test_set = dataset.random_split_by_target(targets[:-1])
    else:
        raise ValueError(split_scheme)

    print(f"Train set: {len(train_set)} samples / "
          f"{len(train_set.tasks())} tasks")
    print(f"Test set:  {len(test_set)} samples / "
          f"{len(test_set.tasks())} tasks")

    _KINDS = {"mlp", "gbdt", "xgb", "lgb", "random", "lstm", "mha",
              "tabnet"}
    specs = models.split(",")
    if len(specs) == 1 and "@" in models and \
            all(part in _KINDS for part in models.split("@")):
        # reference separator: --models mlp@xgb trains two models
        # (train_model.py:113); '@' otherwise selects the mlp loss
        specs = models.split("@")

    results = {}
    for name in specs:
        # reference default: models train with the workload embedding
        # appended per row (MLP 10 dims, tree models 9 raw tags)
        kind = name.split("@")[0]
        emb_dim = 10 if kind in ("mlp", "lstm", "mha", "tabnet") else 9
        feats, labels, _ = train_set.flatten(
            with_workload_embedding=use_workload_embedding,
            embed_total_dim=emb_dim,
        )
        in_dim = feats[0].shape[1] if feats else 164
        model = make_model(name, in_dim)
        model.use_workload_embedding = use_workload_embedding
        model.workload_embed_total_dim = emb_dim
        if hasattr(model, "fit_base_dataset"):
            model.fit_base_dataset(train_set, verbose=verbose)
        elif kind == "mlp":
            # crash-resume snapshot during training, the reference's
            # `tmp_mlp.pkl` contract (mlp_model.py:598)
            model.fit_base(feats, labels, verbose=verbose,
                           checkpoint_path="tmp_mlp.pkl")
        else:
            model.fit_base(feats, labels, verbose=verbose)
        eval_res = evaluate_model(model, test_set)
        print(f"===== {name} =====")
        # rank-loss scores are uncalibrated: absolute-error metrics on
        # them are garbage (R^2 ~ -1e5 on a healthy lambdaRank model),
        # so print n/a instead of polluting every scale-run log
        rank_scored = M.model_is_rank_scored(model)
        for k, v in eval_res.items():
            if rank_scored and k in M.CALIBRATION_METRIC_NAMES:
                print(f"{k}: n/a (rank loss {model.loss_type})")
            else:
                print(f"{k}: {v:.4f}")
        out = f"{name.replace('@', '_')}.pkl"
        model.save(out)
        print(f"saved -> {out}")
        results[name] = eval_res
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", nargs="+", type=str,
                   default=["dataset.pkl"])
    p.add_argument("--models", type=str, default="mlp")
    p.add_argument("--split-scheme", type=str, default="within_task",
                   choices=["within_task", "by_task", "by_target"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--train-ratio", type=float, default=0.9)
    p.add_argument("--no-workload-embedding", action="store_true",
                   help="train on raw per-store features without the "
                        "per-task workload tag embedding (reference "
                        "models default to embedding ON)")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args()

    dataset = Dataset()
    for path in args.dataset:
        with open(path, "rb") as f:
            dataset.update_from_dataset(pickle.load(f))
    train_zero_shot(dataset, args.models, args.split_scheme, args.seed,
                    args.verbose, train_ratio=args.train_ratio,
                    use_workload_embedding=not args.no_workload_embedding)


if __name__ == "__main__":
    main()

"""Hyperparameter optimization harness for cost models.

Parity: reference scripts/nni_hyperparameter_opt.py and
lightgbm_bayesian_hyperparameter_opt.py — tune cost-model hyperparameters
against dataset metrics. Neither NNI nor bayes_opt ships in this image, so
the search is a self-contained random-search + greedy local refinement
over the same spaces, reporting the metric the reference optimizes
(weighted peak score by default).
"""

import argparse
import os
import pickle
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.train_model import evaluate_model
from vae_extent_search_tpu.data import Dataset

SPACES = {
    "mlp": {
        "hidden_dim": [128, 256, 512],
        "lr": [3e-4, 7e-4, 1.5e-3],
        "loss_type": ["lambdaRank", "rankNet", "rmse"],
        "batch_size": [256, 512],
        "grad_clip": [0.25, 0.5, 1.0],
    },
    "gbdt": {
        "max_depth": [4, 6, 8, 10],
        "learning_rate": [0.05, 0.1, 0.2, 0.3],
        "n_estimators": [100, 300, 600],
    },
}


def build(model_kind, cfg, in_dim):
    if model_kind == "mlp":
        from vae_extent_search_tpu.models.segment import MLPModelInternal

        return MLPModelInternal(in_dim=in_dim, **cfg)
    from vae_extent_search_tpu.models.gbdt import GBDTModelInternal

    return GBDTModelInternal(**cfg)


def sample(space, rng):
    return {k: rng.choice(v) for k, v in space.items()}


def neighbors(space, cfg):
    out = []
    for k, vals in space.items():
        i = vals.index(cfg[k])
        for j in (i - 1, i + 1):
            if 0 <= j < len(vals):
                n = dict(cfg)
                n[k] = vals[j]
                out.append(n)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, default="dataset.pkl")
    p.add_argument("--model", type=str, default="mlp",
                   choices=list(SPACES.keys()))
    p.add_argument("--metric", type=str, default="average peak score@1")
    p.add_argument("--n-random", type=int, default=8)
    p.add_argument("--n-local", type=int, default=6)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    with open(args.dataset, "rb") as f:
        dataset: Dataset = pickle.load(f)
    train_set, test_set = dataset.random_split_within_task(0.9,
                                                           seed=args.seed)
    feats, labels, _ = train_set.flatten()
    in_dim = feats[0].shape[1] if feats else 164

    rng = random.Random(args.seed)
    space = SPACES[args.model]
    tried = {}

    def score(cfg):
        key = tuple(sorted(cfg.items()))
        if key in tried:
            return tried[key]
        model = build(args.model, cfg, in_dim)
        model.fit_base(feats, labels)
        res = evaluate_model(model, test_set)
        val = res[args.metric]
        tried[key] = val
        print(f"{cfg} -> {args.metric} = {val:.4f}")
        return val

    best_cfg, best_val = None, -np.inf
    for _ in range(args.n_random):
        cfg = sample(space, rng)
        v = score(cfg)
        if v > best_val:
            best_cfg, best_val = cfg, v

    for _ in range(args.n_local):
        improved = False
        for cand in neighbors(space, best_cfg):
            v = score(cand)
            if v > best_val:
                best_cfg, best_val = cand, v
                improved = True
        if not improved:
            break

    print(f"BEST: {best_cfg} -> {args.metric} = {best_val:.4f}")


if __name__ == "__main__":
    main()

"""Hyperparameter optimization harness for cost models.

Parity: reference scripts/nni_hyperparameter_opt.py and
lightgbm_bayesian_hyperparameter_opt.py — tune cost-model hyperparameters
against dataset metrics. Neither NNI nor bayes_opt ships in this image, so
the optimizers are self-contained: ``--algo local`` is random search +
greedy local refinement; ``--algo tpe`` is a Tree-structured Parzen
Estimator over the categorical spaces (the algorithm NNI's default tuner
runs): after the startup trials, trials split into the top-gamma "good"
set and the rest, per-parameter categorical densities l(x)/g(x) are
estimated with add-one smoothing, and the next trial maximizes the
expected-improvement surrogate over sampled candidates. Both report the
metric the reference optimizes (weighted peak score by default).
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


class TPE:
    """Categorical Tree-structured Parzen Estimator (Bergstra et al.
    2011, the NNI default): argmax over candidates of the likelihood
    ratio l(x)/g(x) between good-trial and bad-trial densities."""

    def __init__(self, space, rng, gamma=0.25, n_candidates=24,
                 n_startup=4, explore=0.15):
        self.space = space
        self.rng = rng
        self.gamma = gamma
        self.n_candidates = n_candidates
        self.n_startup = n_startup
        # per-parameter uniform-exploration probability: pure l/g argmax
        # re-samples the incumbent once one good trial dominates
        self.explore = explore
        self.history = []  # (cfg, value)

    def tell(self, cfg, value):
        self.history.append((cfg, value))

    def _density(self, cfgs, key):
        vals = self.space[key]
        counts = {v: 1.0 for v in vals}  # add-one smoothing prior
        for cfg, _ in cfgs:
            counts[cfg[key]] += 1.0
        total = sum(counts.values())
        return {v: c / total for v, c in counts.items()}

    def ask(self):
        if len(self.history) < self.n_startup:
            return sample(self.space, self.rng)
        ranked = sorted(self.history, key=lambda t: -t[1])
        n_good = max(1, int(len(ranked) * self.gamma))
        good, bad = ranked[:n_good], ranked[n_good:]
        l_d = {k: self._density(good, k) for k in self.space}
        g_d = {k: self._density(bad, k) for k in self.space}
        seen = {tuple(sorted(c.items())) for c, _ in self.history}
        best_cfg, best_ratio = None, -1.0
        best_new, best_new_ratio = None, -1.0
        for _ in range(self.n_candidates):
            # sample from l (good density) per parameter
            cfg = {}
            for k, vals in self.space.items():
                if self.rng.random() < self.explore:
                    cfg[k] = self.rng.choice(vals)
                else:
                    weights = [l_d[k][v] for v in vals]
                    cfg[k] = self.rng.choices(vals, weights=weights)[0]
            ratio = 1.0
            for k in self.space:
                ratio *= l_d[k][cfg[k]] / g_d[k][cfg[k]]
            if ratio > best_ratio:
                best_cfg, best_ratio = cfg, ratio
            if tuple(sorted(cfg.items())) not in seen \
                    and ratio > best_new_ratio:
                best_new, best_new_ratio = cfg, ratio
        # prefer the best UNSEEN candidate: re-running a measured trial
        # wastes the budget (the objective is deterministic here)
        return best_new if best_new is not None else best_cfg


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
    p.add_argument("--algo", type=str, default="local",
                   choices=["local", "tpe"])
    p.add_argument("--n-random", type=int, default=8)
    p.add_argument("--n-local", type=int, default=6)
    p.add_argument("--n-trials", type=int, default=24,
                   help="total TPE trials (--algo tpe)")
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
    if args.algo == "tpe":
        tuner = TPE(space, rng)
        for _ in range(args.n_trials):
            cfg = tuner.ask()
            v = score(cfg)
            tuner.tell(cfg, v)
            if v > best_val:
                best_cfg, best_val = cfg, v
        print(f"BEST: {best_cfg} -> {args.metric} = {best_val:.4f}")
        return best_cfg, best_val

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
    return best_cfg, best_val


if __name__ == "__main__":
    main()

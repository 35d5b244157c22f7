"""Evaluate a trained cost model as a network "dataset simulator".

Parity: reference scripts/eval_model_on_dataset.py — per network, the
top-k latency score = best_latency / (weighted latency of the model's
predicted top-k schedules) over cached featurized per-task datasets
(:19-73); reported for k=1 and k=5 per network.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vae_extent_search_tpu.data import Dataset
from vae_extent_search_tpu.models import load_model_pickle


def eval_cost_model_on_weighted_tasks(model, task_datasets, weights, top_ks):
    """reference eval_model_on_dataset.py:19-40."""
    best_latency = 0.0
    latencies = [0.0] * len(top_ks)
    for (task, weight) in zip(task_datasets, weights):
        ds, tsk = task
        feats = [np.asarray(f, np.float32) for f in ds.features[tsk]]
        labels = ds.throughputs[tsk]
        min_latency = ds.min_latency[tsk]
        from vae_extent_search_tpu.models.embedding import embed_for_model

        feats = embed_for_model(model, feats, tsk.workload_key)
        preds = model.predict_on_features(feats)
        real_values = labels[np.argsort(-preds)]
        real_latency = min_latency / np.maximum(real_values, 1e-10)
        for i, top_k in enumerate(top_ks):
            latencies[i] += np.min(real_latency[:top_k]) * weight
        best_latency += min_latency * weight
    return best_latency, latencies


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, required=True)
    p.add_argument("--datasets", nargs="+", required=True,
                   help="dataset pickle per network (task datasets)")
    p.add_argument("--top-ks", nargs="+", type=int, default=[1, 5])
    args = p.parse_args()

    model = load_model_pickle(args.model)
    for path in args.datasets:
        with open(path, "rb") as f:
            ds: Dataset = pickle.load(f)
        task_datasets = [(ds, t) for t in ds.tasks()]
        weights = [1.0] * len(task_datasets)
        best, latencies = eval_cost_model_on_weighted_tasks(
            model, task_datasets, weights, args.top_ks
        )
        print(f"=== {path} ===")
        for k, lat in zip(args.top_ks, latencies):
            score = best / lat if lat > 0 else 0.0
            print(f"top-{k} score: {score:.4f} "
                  f"(best {best * 1e3:.3f} ms vs picked {lat * 1e3:.3f} ms)")


if __name__ == "__main__":
    main()

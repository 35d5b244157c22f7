"""Evaluate a trained cost model as a network "dataset simulator".

Parity: reference scripts/eval_model_on_dataset.py — per network, the
top-k latency score = best_latency / (weighted latency of the model's
predicted top-k schedules) over cached featurized per-task datasets
(:19-73, cache :50-62, default 5 networks :133-140); reported for k=1
and k=5 per network. ``--networks`` mode mirrors the reference exactly
(task weights from the network's task pkl); ``--datasets`` evaluates
pre-built dataset pickles with unit weights.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vae_extent_search_tpu.data import Dataset, make_dataset_from_log_file
from vae_extent_search_tpu.models import load_model_pickle

DEFAULT_NETWORKS = ["resnet_50", "mobilenet_v2", "resnext_50",
                    "bert_tiny", "bert_base"]


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


def _network_task_datasets(network, target, cache_dir, min_sample_size=48):
    """Build (or load cached) the featurized per-task dataset of one
    network from its measure-record files (reference :50-62)."""
    from common import (MEASURE_RECORD_FOLDER, NETWORK_INFO_FOLDER,
                        clean_name)

    network_key = (network, [1, 224] if not network.startswith("bert") else
                   [1, 128])
    task_pkl = os.path.join(
        NETWORK_INFO_FOLDER, f"{clean_name((network_key, target))}.task.pkl")
    with open(task_pkl, "rb") as f:
        task_records, weights = pickle.load(f)

    cache = os.path.join(cache_dir, f"{clean_name((network_key, target))}.pkl")
    if not os.path.exists(cache):
        from vae_extent_search_tpu.search.platforms import (
            platform_for_target,
        )

        # records live either at the folder root (single-platform
        # pipelines) or under the per-platform subfolder that
        # measure_programs --target writes (reference per-platform
        # record folders); the EVAL target's platform decides which
        platform_folder = os.path.join(
            MEASURE_RECORD_FOLDER, platform_for_target(target).name)
        files = []
        for rec in task_records:
            wkl_key, tgt = rec[0], rec[1]
            kind = tgt.split(" ")[0].split("-")[0]
            name = f"{clean_name((wkl_key, kind))}.json"
            for folder in (platform_folder, MEASURE_RECORD_FOLDER):
                f = os.path.join(folder, name)
                if os.path.exists(f):
                    files.append(f)
                    break
            else:
                print(f"  missing record file for {wkl_key}; skipped")
        os.makedirs(cache_dir, exist_ok=True)
        make_dataset_from_log_file(files, cache, min_sample_size)
    with open(cache, "rb") as f:
        ds: Dataset = pickle.load(f)

    by_key = {}
    for rec, w in zip(task_records, weights):
        by_key[rec[0]] = float(w)
    task_datasets, task_weights = [], []
    for t in ds.tasks():
        if t.workload_key in by_key:
            task_datasets.append((ds, t))
            task_weights.append(by_key[t.workload_key])
    return task_datasets, task_weights


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, required=True)
    p.add_argument("--datasets", nargs="+", default=None,
                   help="dataset pickle per network (task datasets)")
    p.add_argument("--networks", nargs="*", default=None,
                   help="evaluate these networks from dataset/ record "
                        "files (reference mode; empty = the default 5)")
    p.add_argument("--target", type=str, default="llvm -mcpu=skylake-avx512")
    p.add_argument("--cache-dir", type=str, default="dataset/eval_cache")
    p.add_argument("--top-ks", nargs="+", type=int, default=[1, 5])
    args = p.parse_args()

    model = load_model_pickle(args.model)

    if args.networks is not None:
        networks = args.networks or DEFAULT_NETWORKS
        for network in networks:
            task_datasets, weights = _network_task_datasets(
                network, args.target, args.cache_dir)
            best, latencies = eval_cost_model_on_weighted_tasks(
                model, task_datasets, weights, args.top_ks)
            print(f"=== {network} ({len(task_datasets)} tasks) ===")
            for k, lat in zip(args.top_ks, latencies):
                score = best / lat if lat > 0 else 0.0
                print(f"top-{k} score: {score:.4f} "
                      f"(best {best * 1e3:.3f} ms vs picked {lat * 1e3:.3f} ms)")
        return

    for path in args.datasets or []:
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

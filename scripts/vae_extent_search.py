"""The VAE-extent-search experiment (offline record-replay arm).

Parity: scripts/pre_experiments/model_myself/vae_extent_search.py — load a
measure-record log for one task, extract extent features from the printed
schedules, pretrain a VAE, then run the active-learning search (predictor
retraining + mixed selection) until the recorded-optimal schedule is
found; write per-run and seed-averaged CSVs.

On TPU the scoring/selection path runs as one jitted program per phase
(see vae_extent_search_tpu/search/select.py).
"""

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from vae_extent_search_tpu.features import extent_features_from_records
from vae_extent_search_tpu.records import load_records
from vae_extent_search_tpu.search import (
    SelectionConfig,
    pretrain_pool_vae,
    run_active_search,
)
from vae_extent_search_tpu.search.active_loop import (
    expand_hyper_grid,
    filter_already_measured,
    run_gbdt_baseline_search,
)

# the default sweep grid (reference vae_extent_search.py:1658-1710 shape)
DEFAULT_GRID = {
    "measure_size": [32, 64],
    "weights": [(0.5, 0.3, 0.2), (0.4, 0.3, 0.3), (0.7, 0.2, 0.1)],
    "grad_num": [2, 4],
    "rand_num": [0],
    "uncertainty_topk": [64, 128],
}
GRID_KEY_FIELDS = ["measure_size", "weights", "uncertainty_topk",
                   "grad_num", "rand_num"]


def _featurize(records, features="extent"):
    """Input-mode ablation (reference design lineage: extent vectors vs
    full per-store feature rows — pre_experiments/model_myself/
    regression_mlp_feature.ipynb, vae_reg_feature_ansor*.ipynb)."""
    if features == "per_store":
        from vae_extent_search_tpu.features.per_store import (
            perstore_features_from_records,
        )

        return perstore_features_from_records(records)
    return extent_features_from_records(records)


def run_experiment(record_file, out_dir, measure_size=64, seeds=(2000,),
                   weights=(0.5, 0.3, 0.2), grad_num=2, rand_num=0,
                   uncertainty_topk=128, max_phases=60, vae_epochs=500,
                   reg_epochs=1000, latent_dim=64, hidden_dim=256,
                   init_mode="random", features="extent", verbose=False,
                   pretrained_vae_params=None, encoder_mode="vae"):
    records = load_records(record_file)
    feats, labels, kept = _featurize(records, features)
    print(f"{len(records)} records -> {feats.shape} features "
          f"(dim {feats.shape[1] if feats.size else 0})")

    os.makedirs(out_dir, exist_ok=True)
    tag = time.strftime("%m%d_%H%M")

    # Pretrain the pool VAE ONCE and share it across sampling seeds —
    # the reference's structure: the 500-epoch VAE pretrain runs at
    # script top level (vae_extent_search.py:442-509); only the
    # VAECostPredictor retrains inside the per-config loop (:1720-1892).
    if pretrained_vae_params is None and encoder_mode != "vib":
        t_vae = time.time()
        pretrained_vae_params = pretrain_pool_vae(
            feats, latent_dim=latent_dim, hidden_dim=hidden_dim,
            vae_epochs=vae_epochs, verbose=verbose,
            vae_beta=0.0 if encoder_mode == "ae" else 0.01,
            deterministic=encoder_mode == "ae",
        )
        print(f"{encoder_mode.upper()} pretrain ({vae_epochs} epochs): "
              f"{time.time() - t_vae:.1f}s (shared across seeds)")

    rows = []
    for seed in seeds:
        res = run_active_search(
            feats, labels,
            measure_size=measure_size,
            max_phases=max_phases,
            latent_dim=latent_dim, hidden_dim=hidden_dim,
            vae_epochs=vae_epochs, reg_epochs=reg_epochs,
            selection=SelectionConfig(
                num_select=measure_size,
                w_cost=weights[0], w_unc=weights[1], w_div=weights[2],
                grad_num=grad_num, rand_num=rand_num,
                uncertainty_topk=uncertainty_topk,
            ),
            sampling_seed=seed,
            init_mode=init_mode,
            encoder_mode=encoder_mode,
            verbose=verbose,
            pretrained_vae_params=pretrained_vae_params,
        )
        rows.append({
            "measure_size": measure_size,
            "weights": str(tuple(weights)),
            "uncertainty_topk": uncertainty_topk,
            "grad_num": grad_num,
            "rand_num": rand_num,
            "phase": res.phase,
            "used_time": round(res.used_time, 2),
            "train_size": res.train_size,
            "val_reg_r2": str([round(r, 4) for r in res.reg_r2_history]),
            # reference column semantics (vae_extent_search.py:1874):
            # the FINAL model's Recall@1 over the full pool, not the
            # search's found rate — that lives in "found"
            "top-1": 0 if res.final_recall_topk is None
            else int(res.final_recall_topk),
            # full-pool rank the final model gave the true optimum
            # (forensic for top-1 on noise-tied pools)
            "optimum_rank": "" if res.final_optimum_rank is None
            else res.final_optimum_rank,
            "found": int(res.found),
            "sampling_seed": seed,
        })
        print(f"seed {seed}: found={res.found} phase={res.phase} "
              f"train_size={res.train_size} time={res.used_time:.1f}s")

    out_csv = os.path.join(out_dir, f"vae_extent_search_{tag}.csv")
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)

    # seed-averaged summary (reference *_avg group-by CSVs)
    avg = {
        "measure_size": measure_size,
        "weights": str(tuple(weights)),
        "phase": np.mean([r["phase"] for r in rows]),
        "train_size": np.mean([r["train_size"] for r in rows]),
        "used_time": np.mean([r["used_time"] for r in rows]),
        "top-1": np.mean([r["top-1"] for r in rows]),
        "found": np.mean([r["found"] for r in rows]),
        "n_seeds": len(rows),
    }
    avg_csv = os.path.join(out_dir, "vae_extent_total_avg.csv")
    exists = os.path.exists(avg_csv)
    with open(avg_csv, "a", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(avg.keys()))
        if not exists:
            w.writeheader()
        w.writerow(avg)
    print("avg:", avg)
    return rows, avg


def run_gbdt_arm(record_file, out_dir, measure_size=64, seeds=(2000,),
                 max_phases=60, features="extent"):
    """The tree-model baseline arm (reference result_xgb corpus)."""
    records = load_records(record_file)
    feats, labels, _ = _featurize(records, features)
    os.makedirs(out_dir, exist_ok=True)
    rows = []
    for seed in seeds:
        res = run_gbdt_baseline_search(
            feats, labels, measure_size=measure_size, max_phases=max_phases,
            sampling_seed=seed,
        )
        rows.append({
            "measure_size": measure_size, "phase": res.phase,
            "train_size": res.train_size,
            "used_time": round(res.used_time, 2),
            "top-1": 0 if res.final_recall_topk is None
            else int(res.final_recall_topk),
            "optimum_rank": "" if res.final_optimum_rank is None
            else res.final_optimum_rank,
            "found": int(res.found), "sampling_seed": seed,
        })
        print(f"gbdt seed {seed}: found={res.found} phase={res.phase} "
              f"train_size={res.train_size} time={res.used_time:.1f}s")
    tag = time.strftime("%m%d_%H%M")
    out_csv = os.path.join(out_dir, f"gbdt_search_{tag}.csv")
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    return rows


def run_grid(record_file, out_dir, seeds, max_phases, vae_epochs,
             reg_epochs, features="extent", verbose=False):
    """Sweep the hyperparameter grid, skipping configs already present in
    the accumulated avg CSV (reference filter_already_measured)."""
    os.makedirs(out_dir, exist_ok=True)
    avg_csv = os.path.join(out_dir, "vae_extent_total_avg.csv")
    rows = expand_hyper_grid(DEFAULT_GRID)
    rows = filter_already_measured(rows, avg_csv, ["measure_size", "weights"])
    print(f"{len(rows)} grid configs to run")
    if not rows:
        return
    # no grid axis touches the VAE: pretrain once for the whole sweep
    feats, _, _ = _featurize(load_records(record_file), features)
    vae_params = pretrain_pool_vae(feats, vae_epochs=vae_epochs,
                                   verbose=verbose)
    for cfg in rows:
        print("config:", cfg)
        run_experiment(
            record_file, out_dir, cfg["measure_size"], seeds,
            cfg["weights"], cfg["grad_num"], cfg["rand_num"],
            cfg["uncertainty_topk"], max_phases=max_phases,
            vae_epochs=vae_epochs, reg_epochs=reg_epochs,
            features=features, verbose=verbose,
            pretrained_vae_params=vae_params,
        )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--record-file", type=str, required=True)
    p.add_argument("--out-dir", type=str, default="result")
    p.add_argument("--arm", type=str, default="vae",
                   choices=["vae", "gbdt", "grid"])
    p.add_argument("--measure-size", type=int, default=64)
    p.add_argument("--seeds", type=int, nargs="+",
                   default=list(range(2000, 2005)))
    p.add_argument("--weights", type=float, nargs=3, default=[0.5, 0.3, 0.2])
    p.add_argument("--grad-num", type=int, default=2)
    p.add_argument("--rand-num", type=int, default=0)
    p.add_argument("--uncertainty-topk", type=int, default=128)
    p.add_argument("--max-phases", type=int, default=60)
    p.add_argument("--vae-epochs", type=int, default=500)
    p.add_argument("--reg-epochs", type=int, default=1000)
    p.add_argument("--latent-dim", type=int, default=64)
    p.add_argument("--hidden-dim", type=int, default=256)
    p.add_argument("--init-mode", type=str, default="random",
                   choices=["random", "diversity", "kmeans"],
                   help="initial measured-set selection: random (the "
                        "reference default), farthest-point latent "
                        "diversity, or kmeans++ representatives")
    p.add_argument("--encoder", type=str, default="vae",
                   choices=["vae", "ae", "vib"],
                   help="design-lineage arm: VAE pretrain + "
                        "VAECostPredictor (the reference experiment), "
                        "plain-AE ablation (recon-only deterministic "
                        "pretrain, no KL; for_ablation/"
                        "ae_reg_feature.ipynb), or variational "
                        "information bottleneck (no pretrain, sampled z "
                        "+ Huber + cosine-warm-up KL; model_mid/"
                        "vib_mlp_*_v1.ipynb)")
    p.add_argument("--features", type=str, default="extent",
                   choices=["extent", "per_store"],
                   help="model input: printed-extent vectors (the "
                        "reference experiment) or flattened 164-dim "
                        "per-store feature rows (the reference's "
                        "'feature' input-mode ablation)")
    p.add_argument("--profile-dir", type=str,
                   default=os.environ.get("VES_TRACE_DIR"),
                   help="write a jax.profiler (TensorBoard) trace of "
                        "the run under this dir — the TPU-native "
                        "replacement for the reference's USE_NCU env "
                        "hook (vae_experiments/ansor.py:5,16); also "
                        "settable via VES_TRACE_DIR")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args()

    from vae_extent_search_tpu.utils import trace_profile
    with trace_profile(args.profile_dir,
                       enabled=args.profile_dir is not None):
        _dispatch(args)


def _dispatch(args):
    if args.arm == "gbdt":
        run_gbdt_arm(args.record_file, args.out_dir, args.measure_size,
                     tuple(args.seeds), args.max_phases,
                     features=args.features)
    elif args.arm == "grid":
        run_grid(args.record_file, args.out_dir, tuple(args.seeds),
                 args.max_phases, args.vae_epochs, args.reg_epochs,
                 features=args.features, verbose=args.verbose)
    else:
        run_experiment(
            args.record_file, args.out_dir, args.measure_size,
            tuple(args.seeds), tuple(args.weights), args.grad_num,
            args.rand_num, args.uncertainty_topk,
            max_phases=args.max_phases,
            vae_epochs=args.vae_epochs, reg_epochs=args.reg_epochs,
            latent_dim=args.latent_dim, hidden_dim=args.hidden_dim,
            init_mode=args.init_mode, features=args.features,
            verbose=args.verbose, encoder_mode=args.encoder,
        )


if __name__ == "__main__":
    main()

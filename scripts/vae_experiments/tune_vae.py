"""Online VAE tuning: generate candidates, measure live, retrain per phase.

Parity: reference scripts/vae_experiments/tune_vae.py — choose a task ->
``make_states`` generates ~2,000 unique candidates via the sketch policy
(tuning.py:9-62) -> per-store 164-dim features (tune_vae.py:94-97) ->
pretrain a SegmentVAE (200 epochs, lr 2e-4, beta 1e-4) -> per phase:
select 64 candidates (the reference ships a random-selection stub,
tuning.py:65-68; we additionally offer model-based selection), measure
with ProgramMeasurer, retrain the segment regression on all measured
(tune_vae.py:73-166).

Measurement: real hardware timing is an external adapter; built-in runner
is the analytic simulator (or --replay-log).
"""

import argparse
import os
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
)

import numpy as np

import jax
import jax.numpy as jnp

from vae_extent_search_tpu.features.per_store import (
    get_per_store_features_from_states,
)
from vae_extent_search_tpu.models.segment import (
    compute_fea_norm_vec,
    fit_segment_predictor,
    fit_segment_vae,
    init_segment_predictor_params,
    init_segment_vae_params,
    load_pretrained_segment_encoder,
    segment_predict_cost,
    segment_predictor_encode,
)
from vae_extent_search_tpu.records import SearchTask, make_workload_key
from vae_extent_search_tpu.search.measure import (
    AnalyticRunner,
    EmptyBuilder,
    ProgramMeasurer,
    RecordToFile,
)
from vae_extent_search_tpu.search.sketch import make_states


def flatten_features(features_list, fea_norm_vec=None):
    rows = np.concatenate(features_list).astype(np.float32)
    if fea_norm_vec is not None:
        rows = rows / fea_norm_vec
    seg_ids = np.concatenate(
        [np.full(len(f), i, np.int32) for i, f in enumerate(features_list)]
    )
    return jnp.asarray(rows), jnp.asarray(seg_ids), len(features_list)


def run_tuning(task: SearchTask, n_candidates=2000, measure_size=64,
               n_phases=10, vae_epochs=200, reg_epochs=300,
               runner=None, log_file="tune_vae.json", select="random",
               seed=2023, verbose=True, tune_vae_hparams=False):
    t0 = time.time()
    print(f"generating {n_candidates} candidate states ...")
    states = make_states(task, n_candidates, seed=seed)
    print(f"  got {len(states)} unique states in {time.time()-t0:.1f}s")

    feats = get_per_store_features_from_states(states, task)
    fea_norm = compute_fea_norm_vec(feats)
    rows, seg_ids, n_seg = flatten_features(feats, fea_norm)

    key = jax.random.PRNGKey(seed)
    in_dim = rows.shape[1]
    valid_all = jnp.ones(n_seg, bool)

    # ---- SegmentVAE pretraining ----
    k_vae, key = jax.random.split(key)
    if tune_vae_hparams:
        # KL/dim-targeted config search (reference
        # VAE_Trainer.hyperparameter_search)
        from vae_extent_search_tpu.models.segment import (
            search_segment_vae_hyperparams,
        )

        vae_params, best_cfg, _ = search_segment_vae_hyperparams(
            rows, seg_ids, valid_all, n_seg, in_dim,
            epochs=vae_epochs, seed=seed, verbose=verbose,
        )
        vae_dims = {"hidden_dim": best_cfg["hidden_dim"],
                    "latent_dim": best_cfg["latent_dim"]}
        if verbose:
            print(f"vae hparam search best: "
                  f"beta={best_cfg['beta']:g} lr={best_cfg['lr']:g} "
                  f"latent={best_cfg['latent_dim']} "
                  f"KL/dim={best_cfg['kl_per_dim']:.4f} "
                  f"R2={best_cfg['recon_r2']:.4f}")
    else:
        vae_dims = {}
        vae_params = init_segment_vae_params(k_vae, in_dim)
        vae_params, vae_losses = fit_segment_vae(
            vae_params, rows, seg_ids, valid_all, k_vae, n_seg, vae_epochs
        )
        if verbose:
            losses = np.asarray(vae_losses)
            print(f"vae pretrain: loss {losses[0]:.4f} -> "
                  f"{losses[-1]:.4f}")

    measurer = ProgramMeasurer(
        EmptyBuilder(), runner or AnalyticRunner(noise=0.2),
        callbacks=[RecordToFile(log_file)],
    )

    rng = np.random.default_rng(seed)
    measured = np.zeros(n_seg, bool)
    labels = np.zeros(n_seg, np.float32)

    pred_params = None
    for phase in range(n_phases):
        # ---- select ----
        remaining = np.where(~measured)[0]
        if len(remaining) == 0:
            break
        k = min(measure_size, len(remaining))
        if select == "random" or pred_params is None:
            sel = rng.choice(remaining, size=k, replace=False)
        else:
            mu, _, _ = segment_predictor_encode(pred_params, rows, seg_ids,
                                                n_seg)
            scores = np.asarray(segment_predict_cost(pred_params, mu))
            order = remaining[np.argsort(-scores[remaining])]
            sel = order[:k]

        # ---- measure ----
        batch_states = [states[i] for i in sel]
        results = measurer.measure(task, batch_states)
        for i, res in zip(sel, results):
            measured[i] = True
            cost = res.mean_cost if res.error_no == 0 else 1e10
            labels[i] = -np.log(cost + 1e-8)

        # ---- retrain regression on all measured ----
        k_init, k_fit, key = jax.random.split(key, 3)
        pred_params = init_segment_predictor_params(k_init, in_dim,
                                                    **vae_dims)
        pred_params = load_pretrained_segment_encoder(pred_params, vae_params)
        pred_params, info = fit_segment_predictor(
            pred_params, rows, seg_ids, jnp.asarray(labels),
            jnp.asarray(measured), k_fit, n_seg, reg_epochs,
        )
        if verbose:
            best_c = min(
                (measurer.best_cost.get(task.workload_key, float("inf")),)
            )
            print(f"phase {phase}: measured {int(measured.sum())}, "
                  f"best cost {best_c:.6g}, "
                  f"train loss {float(info['best_loss']):.4f}")

    return measurer.best_cost.get(task.workload_key), time.time() - t0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--workload-key", type=str, default=None)
    p.add_argument("--target", type=str, default="llvm -mcpu=skylake-avx512")
    p.add_argument("--n-candidates", type=int, default=2000)
    p.add_argument("--measure-size", type=int, default=64)
    p.add_argument("--n-phases", type=int, default=10)
    p.add_argument("--select", type=str, default="model",
                   choices=["random", "model"])
    p.add_argument("--log-file", type=str, default="tune_vae.json")
    p.add_argument("--seed", type=int, default=2023)
    p.add_argument("--runner", type=str, default="analytic",
                   help="any runner_from_spec spec: analytic | "
                        "analytic_hf | replay | command:<cmd> | "
                        "service:<host:port>")
    p.add_argument("--noise", type=float, default=0.2,
                   help="simulated-measurement jitter for the analytic "
                        "runners")
    p.add_argument("--tune-vae-hparams", action="store_true",
                   help="KL/dim-targeted VAE config search before the "
                        "phase loop (reference hyperparameter_search)")
    args = p.parse_args()

    wk = args.workload_key or make_workload_key(
        "conv2d_layer", (1, 14, 14, 128, 128, 3, 3, [1, 1], [1, 1])
    )
    task = SearchTask(wk, args.target)
    from vae_extent_search_tpu.search.measure import runner_from_spec

    runner = runner_from_spec(args.runner, noise=args.noise,
                              seed=args.seed)
    best, wall = run_tuning(
        task, args.n_candidates, args.measure_size, args.n_phases,
        select=args.select, log_file=args.log_file, seed=args.seed,
        runner=runner,
        tune_vae_hparams=args.tune_vae_hparams,
    )
    print(f"best cost: {best:.6g}  wall: {wall:.1f}s")


if __name__ == "__main__":
    main()

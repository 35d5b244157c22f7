"""The VAE-extent active-learning search loop (offline record-replay arm).

Parity target: the per-config experiment loop of
vae_extent_search.py:1720-1892 — init with ``measure_size`` random
candidates, then per phase: retrain the VAECostPredictor on the measured
set, select the next batch (select_programs), reveal recorded costs, stop
when the true-best candidate enters the measured set; log phase count,
train size, wall time and R2 histories.

On TPU the full candidate matrix lives in HBM once; phases only exchange
a [num_select] index vector with the host.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.metrics import metric_r_squared, pair_accuracy, recall_at_k
from ..models.predictor import (
    PredictorConfig,
    fit_predictor,
    init_predictor_params,
    load_pretrained_encoder,
    pred_forward,
)
from ..models.vae import train_vae
from .select import SelectionConfig, select_programs


def standardize(X: np.ndarray):
    """log1p + per-column standardization (reference
    vae_extent_search.py:394-397: np.log1p + sklearn StandardScaler)."""
    Xl = np.log1p(X.astype(np.float32))
    mean = Xl.mean(axis=0)
    std = Xl.std(axis=0)
    std = np.where(std < 1e-12, 1.0, std)
    return (Xl - mean) / std, (mean, std)


def _prepare_pool(features: np.ndarray, labels: np.ndarray,
                  bucket_shapes: bool, mesh):
    """Standardize + pad/bucket/shard the candidate pool exactly once.

    Shared by ``run_active_search`` and ``pretrain_pool_vae`` so a VAE
    pretrained outside the per-seed loop sees bit-identical inputs."""
    N = features.shape[0]
    X_scaled, _ = standardize(features)
    if bucket_shapes:
        D = X_scaled.shape[1]
        D_pad = -(-D // 8) * 8
        if D_pad != D:
            X_scaled = np.pad(X_scaled, ((0, 0), (0, D_pad - D)))
    target_n = N
    if bucket_shapes:
        target_n = max(256, -(-N // 256) * 256)
    if mesh is not None:
        per = mesh.shape["data"]
        target_n = -(-target_n // per) * per
    pad = target_n - N
    X = jnp.asarray(X_scaled)
    y_all = jnp.asarray(labels)
    if pad:
        X = jnp.concatenate([X, jnp.zeros((pad, X.shape[1]), X.dtype)])
        y_all = jnp.concatenate(
            [y_all, jnp.full((pad,), -1e9, y_all.dtype)]
        )
    if mesh is not None:
        from ..parallel.mesh import shard_batch

        X = shard_batch(X, mesh)
        y_all = shard_batch(y_all, mesh)
    return X, y_all, N, pad


def _host(a):
    """Fetch a device array to host numpy, tolerating multi-process
    global sharding: a row-sharded global array spans non-addressable
    devices, so it is reshard-gathered to fully-replicated first (a
    cross-host collective outside jit); addressable or replicated
    arrays fetch directly. Single-process runs hit the fast path."""
    import jax as _jax

    if isinstance(a, _jax.Array) and not a.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(
            multihost_utils.process_allgather(a, tiled=True))
    return np.asarray(a)


def _train_pool_vae(X, N: int, k_vae, train_seed: int, latent_dim: int,
                    hidden_dim: int, vae_lr: float, vae_beta: float,
                    vae_epochs: int, bucket_shapes: bool, verbose: bool,
                    deterministic: bool = False):
    """VAE pretraining on the (prepared) full candidate pool, 80/20 split
    (reference vae_extent_search.py:394-401,430-509)."""
    split_rng = np.random.default_rng(train_seed)
    perm = split_rng.permutation(N)
    n_tr = int(N * 0.8)
    X_tr, X_va = X[perm[:n_tr]], X[perm[n_tr:]]
    n_va = N - n_tr
    va_mask = None
    if bucket_shapes:
        # bucket the val split too (batchify buckets the train side)
        va_pad = max(256, -(-n_va // 256) * 256) - n_va
        if va_pad:
            X_va = jnp.concatenate(
                [X_va, jnp.zeros((va_pad, X_va.shape[1]), X_va.dtype)]
            )
        va_mask = jnp.arange(X_va.shape[0]) < n_va
    vae_params, _ = train_vae(
        k_vae, X_tr, X_va, latent_dim=latent_dim,
        hidden_dim=hidden_dim, lr=vae_lr, beta=vae_beta,
        epochs=vae_epochs, verbose=verbose, X_val_mask=va_mask,
        deterministic=deterministic,
    )
    return vae_params


def pretrain_pool_vae(
    features: np.ndarray,
    latent_dim: int = 64,
    hidden_dim: int = 256,
    vae_epochs: int = 500,
    vae_lr: float = 1e-3,
    vae_beta: float = 0.01,
    train_seed: int = 2023,
    bucket_shapes: bool = False,
    mesh=None,
    verbose: bool = False,
    deterministic: bool = False,
):
    """Pretrain the pool VAE ONCE for a candidate pool, to be shared by
    every config/sampling-seed of an experiment.

    This is the reference's actual structure: the 500-epoch VAE pretrain
    runs at script top level on the full pool
    (vae_extent_search.py:442-509) and the per-config active loop
    (:1720-1892) only retrains the VAECostPredictor — pass the returned
    params as ``run_active_search(pretrained_vae_params=...)``.  Params
    are bit-identical to the ones ``run_active_search`` would train
    itself (same prep, same PRNG stream)."""
    X, _, N, _ = _prepare_pool(
        features, np.zeros(features.shape[0], np.float32),
        bucket_shapes, mesh,
    )
    key = jax.random.PRNGKey(train_seed)
    k_vae, _ = jax.random.split(key)
    return _train_pool_vae(
        X, N, k_vae, train_seed, latent_dim, hidden_dim, vae_lr,
        vae_beta, vae_epochs, bucket_shapes, verbose, deterministic,
    )


@dataclass
class ActiveSearchResult:
    found: bool
    phase: int
    train_size: int
    used_time: float
    reg_r2_history: List[float] = field(default_factory=list)
    top1_hits: List[int] = field(default_factory=list)
    selected_order: List[int] = field(default_factory=list)
    # the reference CSV's ``top-{k}`` column (vae_extent_search.py:1874,
    # recall_at_k :833-837): does the FINAL model's top-k *prediction*
    # over the whole pool contain the true optimum — a model-quality
    # recall (reference averages 0.15-0.25), NOT the search's found
    # rate (which the stop rule drives to ~1.0 and which lives in
    # ``found``). None when the optimum was hit before any model was
    # trained (phase-0 init hit).
    final_recall_topk: Optional[int] = None
    # full-pool rank (1 = argmax) the final model assigns the true
    # optimum; None when no model was trained (phase-0 init hit)
    final_optimum_rank: Optional[int] = None


def run_active_search(
    features: np.ndarray,
    labels: np.ndarray,
    measure_size: int = 64,
    max_phases: int = 60,
    latent_dim: int = 64,
    hidden_dim: int = 256,
    vae_epochs: int = 500,
    vae_lr: float = 1e-3,
    vae_beta: float = 0.01,
    reg_epochs: int = 1000,
    reg_config: Optional[Dict] = None,
    selection: Optional[SelectionConfig] = None,
    sampling_seed: int = 2000,
    train_seed: int = 2023,
    stop_top_k: int = 1,
    pretrained_vae_params=None,
    mesh=None,
    bucket_shapes: bool = False,
    init_mode: str = "random",
    encoder_mode: str = "vae",
    verbose: bool = False,
) -> ActiveSearchResult:
    """Search until the true-best schedule is measured.

    features: [N, D] raw extent features; labels: [N] (-log mean cost,
    higher is better). With ``mesh``, the candidate axis is sharded over
    the mesh's "data" axis (training + scoring collectives ride ICI).
    ``bucket_shapes`` pads the feature dim to a multiple of 8 and the
    candidate axis to a multiple of 256 so a multi-task sweep reuses one
    compiled program per bucket instead of recompiling per task (padding
    is masked out of training, selection, and metrics).

    ``encoder_mode`` selects the design-lineage arm (reference notebook
    corpus, SURVEY §2.4):
      - "vae": VAE pretrain + VAECostPredictor (the headline experiment)
      - "ae": plain-autoencoder ablation — deterministic recon-only
        pretrain, no KL anywhere (for_ablation/ae_reg_feature.ipynb)
      - "vib": variational information bottleneck — NO pretrain/decoder;
        encoder+head train jointly per phase with sampled z, Huber
        regression and cosine-warm-up KL weight
        (model_mid/vib_mlp_*_v1.ipynb)
    """
    if encoder_mode not in ("vae", "ae", "vib"):
        raise ValueError(f"unknown encoder_mode {encoder_mode!r}")
    if encoder_mode == "vib" and init_mode != "random":
        raise ValueError("vib has no pretrained latent space for "
                         "diversity/kmeans init; use init_mode='random'")
    t0 = time.time()
    N = features.shape[0]
    X, y_all, N, pad = _prepare_pool(features, labels, bucket_shapes, mesh)
    N_pad = X.shape[0]

    true_best = int(np.argmax(labels))
    true_top_set = set(np.argsort(-labels)[:stop_top_k].tolist())

    # ---- VAE pretraining on the full candidate pool (80/20 split).
    # k_vae is split off unconditionally so per-phase keys are identical
    # whether the VAE was trained here or passed in pretrained (the
    # reference pretrains ONCE per pool at script top level,
    # vae_extent_search.py:442-509; pretrain_pool_vae mirrors that). ----
    key = jax.random.PRNGKey(train_seed)
    k_vae, key = jax.random.split(key)
    if encoder_mode == "vib":
        vae_params = None  # VIB trains encoder+head jointly, no pretrain
    elif pretrained_vae_params is None:
        vae_params = _train_pool_vae(
            X, N, k_vae, train_seed, latent_dim, hidden_dim, vae_lr,
            0.0 if encoder_mode == "ae" else vae_beta,
            vae_epochs, bucket_shapes, verbose,
            deterministic=encoder_mode == "ae",
        )
    else:
        vae_params = pretrained_vae_params

    # ---- init measured set (reference init alternatives: random /
    # farthest-point latent diversity :1112-1153 / kmeans++
    # representatives :1156-1208) ----
    rng = np.random.default_rng(sampling_seed)
    k_init_sel = jax.random.PRNGKey(sampling_seed)
    if init_mode == "random":
        init_idx = rng.choice(N, size=min(measure_size, N), replace=False)
    else:
        from ..models.vae import vae_encode
        from .select import farthest_point_init, kmeans_representative_init

        mu_all, _ = jax.jit(vae_encode)(vae_params, X)
        k = min(measure_size, N)
        if init_mode == "diversity":
            rem0 = jnp.arange(N_pad) < N
            init_idx = np.asarray(
                farthest_point_init(k_init_sel, mu_all, rem0, k))
        elif init_mode == "kmeans":
            # cluster real rows only (padding would form fake clusters)
            init_idx = np.asarray(
                kmeans_representative_init(k_init_sel, mu_all[:N], k))
        else:
            raise ValueError(f"unknown init_mode {init_mode!r}")
        # both inits guarantee distinct indices via availability masks;
        # keep the pick ORDER (selected_order records it)
        assert len(set(init_idx.tolist())) == len(init_idx), init_idx
    used_mask = np.zeros(N_pad, bool)
    used_mask[init_idx] = True
    selected_order = list(init_idx)

    # (select_programs itself forces the fused Pallas head off when the
    # candidate matrix arrives sharded over >1 device — see select.py)
    sel_cfg = selection or SelectionConfig(num_select=measure_size)
    result = ActiveSearchResult(False, 0, 0, 0.0)

    # check immediate hit
    if true_top_set & set(init_idx.tolist()):
        result.found = True
        result.phase = 0
        result.train_size = int(used_mask.sum())
        result.used_time = time.time() - t0
        # the init picks consumed measurement budget: record them like
        # every later phase does (callers replay/persist this order)
        result.selected_order = selected_order
        return result

    used = jnp.asarray(used_mask)
    remaining = ~used
    if pad:
        # padded rows are neither measured nor selectable
        remaining = remaining.at[N:].set(False)
    if mesh is not None:
        from ..parallel.mesh import shard_batch

        used = shard_batch(used, mesh)
        remaining = shard_batch(remaining, mesh)

    if reg_config is None:
        pred_cfg = PredictorConfig()
    elif isinstance(reg_config, PredictorConfig):
        pred_cfg = reg_config
    else:
        pred_cfg = PredictorConfig(**reg_config)
    if encoder_mode == "ae":
        # the AE ablation has no KL term in the predictor either
        pred_cfg = pred_cfg._replace(beta=0.0)
    elif encoder_mode == "vib":
        # sampled z + Huber reg + cosine-warm-up KL; no pretrained
        # encoder, so the encoder learns at the head's rate
        pred_cfg = pred_cfg._replace(
            stochastic_z=True, huber_reg=True, kld_cosine_warmup=True,
            encoder_lr=pred_cfg.head_lr,
        )

    # compact measured-set buffer for the diversity stage: passing the
    # center list in (the loop knows it exactly — init + every phase's
    # picks) lets select_programs skip the full-N mask compaction
    # (first_k_true), ~1.3 ms/phase at 262k candidates. Shapes stay
    # static across phases (one compile): fixed [max_centers] buffer +
    # count-based validity.
    center_buf = np.zeros(sel_cfg.max_centers, np.int32)
    center_n = min(len(selected_order), sel_cfg.max_centers)
    center_buf[:center_n] = selected_order[:center_n]
    center_pos = jnp.arange(sel_cfg.max_centers)

    k_sel = jax.random.PRNGKey(sampling_seed)
    for phase in range(1, max_phases + 1):
        # ---- retrain predictor on the measured set. The measured rows
        # are gathered into a compact power-of-two-bucketed buffer so
        # training cost scales with the measured set, not the pool: the
        # reference trains on the measured set only
        # (vae_extent_search.py:1315-1338 dataloaders over used_indices),
        # and full-pool masked training additionally pays an O(pool^2)
        # pair-loss matrix per epoch. Bucket shapes recompile only at
        # power-of-two growth points, shared across tasks in a sweep. ----
        k_init, k_train, key = jax.random.split(key, 3)
        params = init_predictor_params(
            k_init, X.shape[1], hidden_dim, latent_dim
        )
        if vae_params is not None:
            params = load_pretrained_encoder(params, vae_params)
        n_meas = len(selected_order)
        cap = 256
        while cap < n_meas:
            cap *= 2
        cap = min(cap, N_pad)
        if cap < N_pad:
            midx = np.zeros(cap, np.int32)
            midx[:n_meas] = selected_order
            Xm = X[jnp.asarray(midx)]
            ym = y_all[jnp.asarray(midx)]
            mmask = jnp.arange(cap) < n_meas
        else:
            Xm, ym, mmask = X, y_all, used
        params, _ = fit_predictor(
            params, Xm, ym, mmask, k_train, pred_cfg, reg_epochs
        )

        # validation R2 on the remaining (revealed only for diagnostics,
        # like the reference's val_reg_r2 column)
        all_pred, *_ = pred_forward(params, X, use_mean=True)
        all_pred_np = _host(all_pred)
        rem_np = _host(remaining)
        r2 = metric_r_squared(
            all_pred_np[rem_np], _host(y_all)[rem_np]
        )
        result.reg_r2_history.append(r2)
        # reference's per-phase Recall@k over the FULL pool (:1480);
        # the last phase's value lands in the CSV top-k column
        result.final_recall_topk = recall_at_k(
            all_pred_np[:N], labels, k=stop_top_k)
        # rank the model gives the true optimum over the full pool
        # (1 = argmax; forensic for the top-1 column — on pools with a
        # noise-tied plateau even a perfect predictor ranks the
        # recorded optimum ~uniformly within the plateau)
        pred_np = all_pred_np[:N]
        result.final_optimum_rank = int(
            np.sum(pred_np > pred_np[true_best])) + 1

        # ---- select next batch on device ----
        k_sel, sub = jax.random.split(k_sel)
        gate = int(np.sum(_host(used))) < sel_cfg.uncertainty_topk
        sel_idx, sel_valid, remaining, aux = select_programs(
            params, X, used, remaining, sub, sel_cfg,
            gate_uncertainty_to_remaining=gate,
            center_idx=jnp.asarray(center_buf),
            center_valid=center_pos < min(center_n, sel_cfg.max_centers),
        )
        sel = _host(sel_idx)[_host(sel_valid)]
        used = used.at[jnp.asarray(sel)].set(True)
        selected_order.extend(sel.tolist())
        # ring buffer: when capacity binds, the oldest centers are
        # overwritten so fresh picks always join the diversity center
        # set (the mask path re-ranked every phase; a frozen buffer
        # would exclude everything measured after saturation)
        for i in sel.tolist():
            center_buf[center_n % sel_cfg.max_centers] = i
            center_n += 1

        if verbose:
            print(f"phase {phase}: +{len(sel)} measured "
                  f"(total {int(np.sum(_host(used)))}), val R2 {r2:.3f}")

        result.top1_hits.append(int(bool(true_top_set & set(sel.tolist()))))
        if true_top_set & set(sel.tolist()):
            result.found = True
            result.phase = phase
            break
        result.phase = phase

    result.train_size = int(np.sum(_host(used)))
    result.used_time = time.time() - t0
    result.selected_order = selected_order
    return result


@dataclass
class OnlineSearchResult:
    best_index: int
    best_label: float
    n_measured: int
    phases: int
    used_time: float
    best_history: List[float] = field(default_factory=list)
    selected_order: List[int] = field(default_factory=list)


def run_active_search_online(
    features: np.ndarray,
    measure_fn,
    measure_size: int = 16,
    max_phases: int = 8,
    latent_dim: int = 64,
    hidden_dim: int = 256,
    vae_epochs: int = 500,
    vae_lr: float = 1e-3,
    vae_beta: float = 0.01,
    reg_epochs: int = 1000,
    reg_config: Optional[Dict] = None,
    selection: Optional[SelectionConfig] = None,
    sampling_seed: int = 2000,
    train_seed: int = 2023,
    pretrained_vae_params=None,
    select: str = "model",
    verbose: bool = False,
) -> OnlineSearchResult:
    """The ONLINE variant of run_active_search: labels are not known up
    front — ``measure_fn(pool_indices) -> labels`` measures candidates for
    real (higher label = better, the -log-cost convention).  This is the
    reference's live-measurement arm (vae_experiments/tune_vae.py:73-166)
    with its selection stub (tuning.py:65-68 picks randomly) replaced by
    the full offline-arm selection mix (select_programs); ``select=
    "random"`` reproduces the stub as a baseline arm.  There is no
    stop-on-optimum (the optimum is unknown); the loop runs the phase
    budget and reports the best measured candidate."""
    if select not in ("model", "random"):
        raise ValueError(f"unknown select {select!r}")
    t0 = time.time()
    N = features.shape[0]
    X, _, N, pad = _prepare_pool(
        features, np.zeros(N, np.float32), False, None)
    N_pad = X.shape[0]

    key = jax.random.PRNGKey(train_seed)
    k_vae, key = jax.random.split(key)
    if select == "random":
        vae_params = None
    elif pretrained_vae_params is None:
        vae_params = _train_pool_vae(
            X, N, k_vae, train_seed, latent_dim, hidden_dim, vae_lr,
            vae_beta, vae_epochs, False, verbose)
    else:
        vae_params = pretrained_vae_params

    rng = np.random.default_rng(sampling_seed)
    init_idx = rng.choice(N, size=min(measure_size, N), replace=False)
    labels = np.full(N_pad, -1e9, np.float32)  # unmeasured sentinel
    labels[init_idx] = measure_fn(init_idx.tolist())
    used_mask = np.zeros(N_pad, bool)
    used_mask[init_idx] = True
    selected_order = list(init_idx)

    result = OnlineSearchResult(0, -np.inf, 0, 0, 0.0)

    def note_best():
        meas = np.where(used_mask[:N])[0]
        b = meas[np.argmax(labels[meas])]
        result.best_index = int(b)
        result.best_label = float(labels[b])
        result.best_history.append(result.best_label)

    note_best()
    used = jnp.asarray(used_mask)
    remaining = ~used
    if pad:
        remaining = remaining.at[N:].set(False)

    pred_cfg = (reg_config if isinstance(reg_config, PredictorConfig)
                else PredictorConfig(**reg_config) if reg_config
                else PredictorConfig())
    sel_cfg = selection or SelectionConfig(num_select=measure_size)
    center_buf = np.zeros(sel_cfg.max_centers, np.int32)
    center_n = min(len(selected_order), sel_cfg.max_centers)
    center_buf[:center_n] = selected_order[:center_n]
    center_pos = jnp.arange(sel_cfg.max_centers)

    k_sel = jax.random.PRNGKey(sampling_seed)
    for phase in range(1, max_phases + 1):
        rem_np = np.where(~used_mask[:N])[0]
        if len(rem_np) == 0:
            break
        if select == "random":
            sel = rng.choice(rem_np, size=min(measure_size, len(rem_np)),
                             replace=False)
        else:
            # retrain the predictor on the measured set (bucketed gather,
            # same as the offline loop)
            k_init, k_train, key = jax.random.split(key, 3)
            params = init_predictor_params(
                k_init, X.shape[1], hidden_dim, latent_dim)
            if vae_params is not None:
                params = load_pretrained_encoder(params, vae_params)
            n_meas = len(selected_order)
            cap = 256
            while cap < n_meas:
                cap *= 2
            cap = min(cap, N_pad)
            if cap < N_pad:
                midx = np.zeros(cap, np.int32)
                midx[:n_meas] = selected_order
                Xm = X[jnp.asarray(midx)]
                ym = jnp.asarray(labels)[jnp.asarray(midx)]
                mmask = jnp.arange(cap) < n_meas
            else:
                Xm, ym, mmask = X, jnp.asarray(labels), used
            params, _ = fit_predictor(
                params, Xm, ym, mmask, k_train, pred_cfg, reg_epochs)

            k_sel, sub = jax.random.split(k_sel)
            gate = int(used_mask.sum()) < sel_cfg.uncertainty_topk
            sel_idx, sel_valid, remaining, _ = select_programs(
                params, X, used, remaining, sub, sel_cfg,
                gate_uncertainty_to_remaining=gate,
                center_idx=jnp.asarray(center_buf),
                center_valid=center_pos < min(center_n,
                                              sel_cfg.max_centers),
            )
            sel = _host(sel_idx)[_host(sel_valid)]

        labels[sel] = measure_fn(list(map(int, sel)))
        used_mask[sel] = True
        used = used.at[jnp.asarray(np.asarray(sel))].set(True)
        if select == "random":
            remaining = ~used
            if pad:
                remaining = remaining.at[N:].set(False)
        selected_order.extend(int(i) for i in sel)
        for i in sel:
            center_buf[center_n % sel_cfg.max_centers] = int(i)
            center_n += 1
        result.phases = phase
        note_best()
        if verbose:
            print(f"phase {phase}: +{len(sel)} measured "
                  f"(total {int(used_mask.sum())}), "
                  f"best label {result.best_label:.4f}")

    result.n_measured = int(used_mask.sum())
    result.used_time = time.time() - t0
    result.selected_order = selected_order
    return result


def run_gbdt_baseline_search(
    features: np.ndarray,
    labels: np.ndarray,
    measure_size: int = 64,
    max_phases: int = 60,
    eps_greedy: float = 0.05,
    sampling_seed: int = 2000,
    stop_top_k: int = 1,
) -> ActiveSearchResult:
    """The experiment's tree-model baseline arm: per phase, fit a GBDT on
    the measured set and pick 95% predicted-top-k + 5% eps-greedy random
    (reference vae_extent_search.py:843-865,1980-2307 xgb_select_indices
    with XGBModelInternal / raw xgboost over the same extent features)."""
    import time as _time

    from ..models.gbdt import GBDTModelInternal

    t0 = _time.time()
    N = features.shape[0]
    X = np.log1p(features.astype(np.float32))
    rng = np.random.default_rng(sampling_seed)
    true_top = set(np.argsort(-labels)[:stop_top_k].tolist())

    measured = np.zeros(N, bool)
    init = rng.choice(N, size=min(measure_size, N), replace=False)
    measured[init] = True
    result = ActiveSearchResult(False, 0, 0, 0.0)
    if true_top & set(init.tolist()):
        result.found = True
        result.train_size = int(measured.sum())
        result.used_time = _time.time() - t0
        return result

    n_rand = max(1, int(measure_size * eps_greedy))
    n_top = measure_size - n_rand
    for phase in range(1, max_phases + 1):
        tr = np.where(measured)[0]
        model = GBDTModelInternal(n_estimators=100)
        model.fit_base([X[i:i + 1] for i in tr], labels[tr])
        preds = model.predict_on_features([X[i:i + 1] for i in range(N)])
        remaining = np.where(~measured)[0]
        order = remaining[np.argsort(-preds[remaining])]
        sel = list(order[:min(n_top, len(order))])
        rest = np.setdiff1d(remaining, sel)
        if len(rest) and n_rand:
            sel.extend(rng.choice(rest, size=min(n_rand, len(rest)),
                                  replace=False).tolist())
        measured[sel] = True
        result.phase = phase
        result.top1_hits.append(int(bool(true_top & set(sel))))
        result.final_recall_topk = recall_at_k(preds, labels,
                                               k=stop_top_k)
        tb = int(np.argmax(labels))
        result.final_optimum_rank = int(np.sum(preds > preds[tb])) + 1
        if true_top & set(sel):
            result.found = True
            break
        if not (~measured).any():
            break
    result.train_size = int(measured.sum())
    result.used_time = _time.time() - t0
    return result


def expand_hyper_grid(grid: Dict, filters=None) -> List[Dict]:
    """Cartesian product of a dict-of-lists hyperparameter grid with
    optional row filters (reference vae_extent_search.py:1658-1710)."""
    import itertools

    keys = list(grid.keys())
    rows = []
    for values in itertools.product(*(grid[k] for k in keys)):
        row = dict(zip(keys, values))
        if filters and not all(f(row) for f in filters):
            continue
        rows.append(row)
    return rows


def filter_already_measured(rows: List[Dict], total_csv: str,
                            key_fields: List[str]) -> List[Dict]:
    """Drop configs already present in the accumulated result CSV
    (reference vae_extent_search.py:1524-1577)."""
    import csv as _csv
    import os as _os

    if not _os.path.exists(total_csv):
        return rows
    seen = set()
    with open(total_csv) as f:
        for rec in _csv.DictReader(f):
            seen.add(tuple(str(rec.get(k)) for k in key_fields))
    return [
        row for row in rows
        if tuple(str(row.get(k)) for k in key_fields) not in seen
    ]

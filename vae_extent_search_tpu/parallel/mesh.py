"""Device-mesh runtime: pjit shardings over ICI/DCN.

This layer is the TPU-native replacement for every scaling mechanism in the
reference (SURVEY §2.1): C++ ``support::parallel_for`` thread pools
(feature.cc:1378), the multiprocessing build pool (measure.py:706), the RPC
measurement fan-out, and the SSH collection fleet — all become shardings of
the candidate/task axes over a ``jax.sharding.Mesh``:

- axis "data":  candidate batches (DP) — scoring, MC-dropout, training
  batches shard here; gradients all-reduce over ICI.
- axis "model": the MLP hidden dimension (TP) — the 256/512-wide dense
  layers shard their output features; activations all-gather/reduce-scatter
  as XLA sees fit.

Multi-host: tasks shard over hosts (DCN) at the script layer (one task =
one independent search), exactly mirroring the reference's per-task shard
scripts (measure_programs.py --start/end/step-idx).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.predictor import (
    PredictorConfig,
    compute_total_loss,
    make_predictor_optimizer,
    mc_predict,
    pred_encode,
    predict_cost,
)


def make_mesh(n_devices: Optional[int] = None, data: Optional[int] = None,
              model: int = 1) -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if data is None:
        data = n // model
    dev_array = np.array(devices).reshape(data, model)
    return Mesh(dev_array, ("data", "model"))


def param_sharding(params: Dict, mesh: Mesh) -> Dict:
    """Shard the wide dense layers' output features over "model"; biases
    and narrow layers replicate."""

    def spec_for(path, x):
        # encoder/cost_predictor hidden weight matrices: shard out-features
        if x.ndim == 2 and x.shape[1] % mesh.shape["model"] == 0 \
                and x.shape[1] >= 2 * mesh.shape["model"]:
            return NamedSharding(mesh, P(None, "model"))
        if x.ndim == 1 and x.shape[0] % mesh.shape["model"] == 0 \
                and x.shape[0] >= 2 * mesh.shape["model"]:
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(lambda x: spec_for(None, x), params)


def shard_batch(x: jnp.ndarray, mesh: Mesh) -> jax.Array:
    """Place a [N, ...] batch with the N axis sharded over "data"."""
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def make_sharded_train_step(mesh: Mesh, config: PredictorConfig,
                            donate: bool = True):
    """One pjit-compiled full-batch train step: batch DP over "data",
    hidden-dim TP over "model"; XLA inserts the grad all-reduce (psum over
    ICI) and any activation collectives."""
    optimizer = make_predictor_optimizer(
        config.encoder_lr, config.head_lr, config.weight_decay,
        config.grad_clip,
    )
    cfg_dict = config.as_dict()

    def step(params, opt_state, X, y, mask, key):
        (loss, aux), grads = jax.value_and_grad(
            compute_total_loss, has_aux=True
        )(params, X, y, key, cfg_dict, mask)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    data_spec = NamedSharding(mesh, P("data"))
    data_spec2 = NamedSharding(mesh, P("data", None))

    def init_opt(params):
        return optimizer.init(params)

    jitted = jax.jit(
        step,
        in_shardings=(None, None, data_spec2, data_spec, data_spec, None),
        donate_argnums=(0, 1) if donate else (),
    )
    return jitted, init_opt


def sharded_score_candidates(mesh: Mesh):
    """The scoring megakernel sharded over candidates: encode + cost head +
    MC-dropout variance + z-grad norms in one pjit program. Per-candidate
    work is embarrassingly parallel over "data"; the later top-k merge
    happens in the (replicated-output) selection step via lax.top_k."""

    def score(params, X, key, T: int):
        mu, logvar = pred_encode(params, X)
        cost = predict_cost(params, mu)
        grad = jax.grad(lambda z: predict_cost(params, z).sum())(mu)
        gnorm = jnp.linalg.norm(grad, axis=-1)
        mc_mean, mc_var = mc_predict(params, X, key, T)
        return cost, gnorm, mc_var, mu

    data_spec = NamedSharding(mesh, P("data", None))
    return jax.jit(
        score,
        in_shardings=(None, data_spec, None),
        static_argnums=(3,),
    )

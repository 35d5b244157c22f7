"""Two-process COLLECTIVE-compute worker (spawned by test_multihost.py).

Where _mh_worker.py only proves the jax.distributed cluster forms and
tasks shard disjointly, this worker makes jitted collectives actually
cross the process boundary (SURVEY §5: DCN task sharding *plus* ICI
collectives; round-2 verdict item 3):

1. one global (data=4, model=2) mesh over 2 processes x 4 CPU devices;
2. the DPxTP predictor train step (parallel/mesh.py) — the grad
   all-reduce psums over a data axis that SPANS the two processes;
3. one fused-selection phase (search/select.py -> select_sharded.py) on
   candidates sharded over the cross-process data axis;
4. data-parallel GBDT (models/boost_tpu.py mesh path) — per-level
   histogram psums cross the boundary, every host grows the trees.

Each host reassembles its ADDRESSABLE shards of the results and writes
sha1 digests to its report; the test asserts the digests are
bit-identical across hosts (params/selection/trees all replicate or are
host-reconstructible because "model" never crosses a process).
"""

import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 4 virtual CPU devices per process; must precede any jax backend use
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

from vae_extent_search_tpu.parallel.multihost import (  # noqa: E402
    maybe_initialize_distributed,
)


def _assemble_local(arr):
    """Reassemble a global array from this host's addressable shards;
    asserts the host holds every element (true for replicated arrays
    and for "model"-sharded params on a mesh whose model axis stays
    within one process)."""
    import numpy as np

    out = np.zeros(arr.shape, np.asarray(arr.addressable_shards[0].data).dtype)
    filled = np.zeros(arr.shape, bool)
    for sh in arr.addressable_shards:
        out[sh.index] = np.asarray(sh.data)
        filled[sh.index] = True
    assert filled.all(), "host does not address the full array"
    return out


def main():
    report_path = sys.argv[1]
    pid, count = maybe_initialize_distributed()
    assert count == 2, count

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

    from vae_extent_search_tpu.models import (
        PredictorConfig,
        init_predictor_params,
    )
    from vae_extent_search_tpu.parallel import (
        make_mesh,
        make_sharded_train_step,
        shard_batch,
    )
    from vae_extent_search_tpu.parallel.mesh import param_sharding

    digests = {}

    # ---- 1+2. DPxTP train step over the global mesh ----
    # mesh rows (data axis) split 2 procs x 2 rows; model axis is
    # intra-process, so params stay host-reconstructible
    mesh = make_mesh(8, data=4, model=2)
    D, HIDDEN, LATENT = 16, 64, 32
    N = 64  # 16 rows per data shard
    key = jax.random.PRNGKey(0)
    params = init_predictor_params(key, D, hidden_dim=HIDDEN,
                                   latent_dim=LATENT)
    shardings = param_sharding(params, mesh)
    params = jax.tree_util.tree_map(jax.device_put, params, shardings)

    rng = np.random.default_rng(7)  # same data on both hosts
    X = shard_batch(jnp.asarray(rng.random((N, D)), jnp.float32), mesh)
    y = shard_batch(jnp.asarray(rng.random(N), jnp.float32), mesh)
    mask = shard_batch(jnp.ones((N,), bool), mesh)

    with mesh:
        step, init_opt = make_sharded_train_step(
            mesh, PredictorConfig(), donate=False)
        opt_state = init_opt(params)
        params2, _, loss = step(params, opt_state, X, y, mask, key)
        loss.block_until_ready()
    assert np.isfinite(float(loss))

    h = hashlib.sha1()
    for leaf in jax.tree_util.tree_leaves(params2):
        h.update(np.ascontiguousarray(_assemble_local(leaf)).tobytes())
    digests["train_params"] = h.hexdigest()
    digests["train_loss"] = float(loss)

    # ---- 3. fused sharded selection across the process boundary ----
    from vae_extent_search_tpu.search import SelectionConfig, select_programs

    D2, H2, L2, T2 = 16, 128, 8, 2
    N2 = 64
    sel_params = init_predictor_params(
        key, D2, hidden_dim=H2, latent_dim=L2, predictor_hidden=H2)
    X2 = jax.device_put(
        jnp.asarray(rng.random((N2, D2)), jnp.float32),
        NamedSharding(mesh, P("data", None)))
    used = jax.device_put(jnp.zeros((N2,), bool).at[:8].set(True),
                          NamedSharding(mesh, P("data")))
    bits = jax.device_put(
        jax.random.bits(key, (T2, N2, H2), jnp.uint32),
        NamedSharding(mesh, P(None, "data", None)))
    cfg = SelectionConfig(num_select=8, T_mc=T2, fused_interpret=True)
    sel, valid, _, _ = select_programs(
        sel_params, X2, used, ~used, key, cfg, mask_bits=bits)
    sel_np = _assemble_local(sel)
    valid_np = _assemble_local(valid)
    assert valid_np.any()
    digests["selection"] = hashlib.sha1(
        np.ascontiguousarray(sel_np[valid_np]).tobytes()).hexdigest()

    # ---- 4. data-parallel GBDT: histogram psum over both hosts ----
    from vae_extent_search_tpu.models import boost, boost_tpu

    rows_np = rng.random((320, 6)).astype(np.float32)
    pids = np.repeat(np.arange(80), 4)
    lbl = rows_np.reshape(-1, 4, 6).sum((1, 2)).astype(np.float32) / 10
    dmesh = Mesh(np.asarray(mesh.devices).reshape(-1), ("data",))
    bst = boost_tpu.train(
        {"max_depth": 3, "eta": 0.3},
        boost.DMatrix(rows_np, label=lbl[pids], pack_ids=pids),
        num_boost_round=3, obj=boost.pack_sum_square_error,
        verbose_eval=0, mesh=dmesh)
    assert len(bst.trees) == 3
    h = hashlib.sha1()
    for t in bst.trees:
        for a in (t.feature, t.threshold, t.left, t.right, t.value):
            h.update(np.ascontiguousarray(a).tobytes())
    digests["gbdt_trees"] = h.hexdigest()
    digests["gbdt_pred"] = hashlib.sha1(
        np.ascontiguousarray(bst.predict(rows_np)).tobytes()).hexdigest()

    digests["pid"] = pid
    with open(report_path, "w") as f:
        json.dump(digests, f)


if __name__ == "__main__":
    main()

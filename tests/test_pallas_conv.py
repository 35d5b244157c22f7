"""Conv2d self-tuning path: implicit-GEMM Pallas kernel, conv
state->config quotient, conv runner (ops/conv2d_pallas.py +
search/pallas_tuner.py conv half)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vae_extent_search_tpu.ops.conv2d_pallas import (
    conv_config_is_valid,
    conv_out_size,
    make_conv2d,
    predicted_conv_seconds,
    snap_conv_config_to_hw,
    xla_conv2d_reference,
)
from vae_extent_search_tpu.records import SearchTask, make_workload_key
from vae_extent_search_tpu.records.serde import (
    ERROR_INSTANTIATION,
    ERROR_NO_ERROR,
)
from vae_extent_search_tpu.search.measure import runner_from_spec
from vae_extent_search_tpu.search.pallas_tuner import (
    PallasConv2dRunner,
    state_to_conv_config,
)
from vae_extent_search_tpu.search.sketch import make_states


def _conv_task(N=1, H=56, W=56, CO=256, CI=256, KH=3, KW=3, pad=1):
    wk = make_workload_key(
        "conv2d_layer", (N, H, W, CO, CI, KH, KW, [1, 1], [pad, pad]))
    return SearchTask(wk, "llvm")


# ---------------------------------------------------------------------------
# kernel numerics (interpret mode; the chip path is the same code)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("cfg", [(1, 6, 128), (2, 6, 256), (4, 6, 128),
                                 (8, 6, 256)])
def test_conv_kernel_interpret_exact(cfg):
    # asymmetric CO != CI pins the (N, H, W, CO, CI, ...) arg order;
    # CI=256 exercises partial (128) and full channel blocks
    N, H, W, CO, CI, KH, KW, pad = 2, 8, 8, 6, 256, 3, 3, 1
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, H, W, CI)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((KH, KW, CI, CO)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(CO), jnp.float32)
    conv = make_conv2d(N, H, W, CO, CI, KH, KW, 1, pad, *cfg,
                       dtype_name="float32", interpret=True)
    got = conv(x, w, b)
    want = xla_conv2d_reference(N, H, W, CO, CI, KH, KW, 1, pad,
                                dtype_name="float32")(x, w, b)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-4


def test_conv_kernel_valid_padding_and_batch():
    # pad=0 ("valid"), batch > 1, rectangular image
    N, H, W, CO, CI, KH, KW, pad = 3, 10, 7, 2, 4, 3, 3, 0
    OH, OW = conv_out_size(H, KH, 1, pad), conv_out_size(W, KW, 1, pad)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((N, H, W, CI)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((KH, KW, CI, CO)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(CO), jnp.float32)
    conv = make_conv2d(N, H, W, CO, CI, KH, KW, 1, pad, 4, 2, 4,
                       dtype_name="float32", interpret=True)
    got = conv(x, w, b)
    assert got.shape == (N, OH, OW, CO)
    want = xla_conv2d_reference(N, H, W, CO, CI, KH, KW, 1, pad,
                                dtype_name="float32")(x, w, b)
    assert float(jnp.max(jnp.abs(got - want))) < 1e-4


def test_conv_kernel_bf16_inputs_f32_accum():
    N, H, W, CO, CI, KH, KW, pad = 1, 8, 8, 4, 8, 3, 3, 1
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((N, H, W, CI)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((KH, KW, CI, CO)), jnp.float32)
    b = jnp.asarray(rng.standard_normal(CO), jnp.float32)
    conv = make_conv2d(N, H, W, CO, CI, KH, KW, 1, pad, 2, 4, 8,
                       dtype_name="bfloat16", interpret=True)
    got = conv(x, w, b)
    want = xla_conv2d_reference(N, H, W, CO, CI, KH, KW, 1, pad,
                                dtype_name="bfloat16")(x, w, b)
    assert got.dtype == jnp.float32
    rel = float(jnp.max(jnp.abs(got - want))
                / (jnp.max(jnp.abs(want)) + 1e-30))
    assert rel < 1e-2  # same bf16 products, f32 accumulation


def test_conv_config_validity_and_snap():
    params = (1, 56, 56, 256, 256, 3, 3, 1, 1)  # N H W CO CI KH KW s p
    ok, _ = conv_config_is_valid(*params, 7, 128, 128)
    assert ok
    ok, why = conv_config_is_valid(*params, 3, 128, 128)
    assert not ok and "divide" in why
    ok, why = conv_config_is_valid(*params, 7, 64, 128)
    assert not ok and "128-aligned" in why
    ok, why = conv_config_is_valid(*params, 7, 128, 128, dtype=jnp.float32)
    assert ok
    # stride != 1 rejected
    ok, why = conv_config_is_valid(1, 56, 56, 256, 256, 3, 3, 2, 1,
                                   7, 128, 128)
    assert not ok and "stride" in why
    # VMEM blow-up
    big = (1, 112, 112, 1024, 1024, 3, 3, 1, 1)
    ok, why = conv_config_is_valid(*big, 112, 1024, 1024)
    assert not ok and "VMEM" in why

    # snapping: up to the nearest legal divisor, full-dim fallback
    assert snap_conv_config_to_hw(*params, 3, 60, 100) == (4, 128, 128)
    assert snap_conv_config_to_hw(*params, 56, 256, 256) == (56, 256, 256)
    assert snap_conv_config_to_hw(*params, 5, 200, 300) == (7, 256, 256)
    # CI/CO below 128: only the full dim is legal
    small = (1, 28, 28, 64, 64, 3, 3, 1, 1)
    assert snap_conv_config_to_hw(*small, 2, 3, 5) == (2, 64, 64)

    # tiny blocks blow up the predicted grid overhead
    assert (predicted_conv_seconds(*params, 1, 128, 128)
            > predicted_conv_seconds(*params, 28, 256, 256) * 5)


# ---------------------------------------------------------------------------
# state -> config quotient
# ---------------------------------------------------------------------------

def test_conv_state_to_config_pool():
    task = _conv_task()
    states = make_states(task, 60, seed=11)
    assert len(states) > 20
    n_ok = 0
    for st in states:
        raw, why = state_to_conv_config(st)
        assert raw is not None, why
        boh, bco, bci = raw
        # raw tile products divide the axes they tile (GA splits are
        # exact factorizations)
        assert 56 % boh == 0 and 256 % bco == 0 and 256 % bci == 0
        cfg = snap_conv_config_to_hw(1, 56, 56, 256, 256, 3, 3, 1, 1, *raw)
        n_ok += conv_config_is_valid(
            1, 56, 56, 256, 256, 3, 3, 1, 1, *cfg)[0]
    assert n_ok == len(states)


def test_conv_state_to_config_init_state():
    task = _conv_task()
    st = task.compute_dag.init_state.copy()
    raw, why = state_to_conv_config(st)
    # plain nest: outermost reduce is rc (order rc, ry, rx in the sum);
    # the whole channel reduction is inside the block
    assert why is None and raw[2] == 256


# ---------------------------------------------------------------------------
# runner
# ---------------------------------------------------------------------------

def _fake_time(*a):
    return predicted_conv_seconds(*a)


def test_conv_runner_caches_and_rejects():
    task = _conv_task()
    states = make_states(task, 40, seed=7)
    r = PallasConv2dRunner(time_fn=_fake_time)
    res = r.run(task, states)
    assert len(res) == len(states)
    assert any(x.error_no == ERROR_NO_ERROR for x in res)
    timed = r.n_timed
    r.run(task, states)
    assert r.n_timed == timed  # fully cached
    cfgs = {c for c, s, e in r.measured_configs() if e == ERROR_NO_ERROR}
    assert all(conv_config_is_valid(1, 56, 56, 256, 256, 3, 3, 1, 1, *c)[0]
               for c in cfgs)

    # a stride-2 workload maps but never validates
    wk2 = make_workload_key(
        "conv2d_layer", (1, 56, 56, 64, 64, 3, 3, [2, 2], [1, 1]))
    t2 = SearchTask(wk2, "llvm")
    st2 = t2.compute_dag.init_state.copy()
    res2 = PallasConv2dRunner(time_fn=_fake_time).run(t2, [st2])
    assert res2[0].error_no == ERROR_INSTANTIATION

    # non-conv workload refused outright
    wk3 = make_workload_key("matmul_auto_scheduler_test", (64, 64, 64))
    with pytest.raises(ValueError):
        PallasConv2dRunner.task_params(SearchTask(wk3, "llvm"))

    assert isinstance(runner_from_spec("pallas_conv2d"), PallasConv2dRunner)
    assert runner_from_spec("pallas_conv2d:float32").dtype == "float32"

"""Minimal functional NN layer library (pure pytrees + jax).

We deliberately avoid a module framework: params are nested dicts, apply
functions are pure, everything jits/vmaps/pjits cleanly. Initialization
matches torch.nn.Linear defaults (kaiming-uniform weights, uniform bias in
[-1/sqrt(fan_in), 1/sqrt(fan_in)]) so that training dynamics are comparable
to the reference PyTorch models.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp


def dense_init(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> Dict:
    kw, kb = jax.random.split(key)
    bound_w = math.sqrt(1.0 / in_dim) * math.sqrt(3.0)  # kaiming uniform a=√5
    w = jax.random.uniform(kw, (in_dim, out_dim), dtype, -bound_w, bound_w)
    bound_b = math.sqrt(1.0 / in_dim)
    b = jax.random.uniform(kb, (out_dim,), dtype, -bound_b, bound_b)
    return {"w": w, "b": b}


def dense(params: Dict, x: jnp.ndarray) -> jnp.ndarray:
    w, b = params["w"], params["b"]
    if w.dtype == jnp.bfloat16:
        # Mixed precision: bf16 matmul INPUTS (MXU-native rate) with f32
        # accumulation and f32 outputs. Bias-add/activations/reductions
        # downstream stay f32, so selection-critical rankings (top-k
        # scores, MC variance, k-center distances) never round through
        # bf16 intermediates — only matmul inputs are rounded, matching
        # the fused Pallas kernel's numerics (Mosaic requires 32-bit
        # matmul accumulators).
        y = jnp.dot(x.astype(jnp.bfloat16), w,
                    preferred_element_type=jnp.float32)
        return y + b.astype(jnp.float32)
    return x @ w + b


def mlp_init(key, dims: Sequence[int], dtype=jnp.float32) -> List[Dict]:
    """Stack of Linear layers with given [in, h1, ..., out] dims."""
    keys = jax.random.split(key, len(dims) - 1)
    return [
        dense_init(k, dims[i], dims[i + 1], dtype) for i, k in enumerate(keys)
    ]


def mlp_apply(layers: List[Dict], x: jnp.ndarray,
              final_activation: bool = False) -> jnp.ndarray:
    """Linear+ReLU stack; ReLU after every layer except (optionally) last."""
    n = len(layers)
    for i, layer in enumerate(layers):
        x = dense(layer, x)
        if i < n - 1 or final_activation:
            x = jax.nn.relu(x)
    return x


def dropout(key, x: jnp.ndarray, rate: float) -> jnp.ndarray:
    if rate <= 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def param_count(tree) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))

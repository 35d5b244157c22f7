"""Workload (task) embedding for cost models.

Parity target: ``get_workload_embedding`` (reference
cost_model/xgb_model.py:79-87 == lgbm_model.py:81-89): a 9-dim binary
vector marking whether each of nine op-tag substrings appears in
``str(ComputeDAG(workload_key_to_tensors(key)))``. The MLP pads it to 10
dims (slot 9 reserved for an optional target one-hot,
mlp_model.py:52-66) and tiles it onto every per-store feature row; the
XGB/LGBM models append the 9 raw dims per row (xgb_model.py:301-304).

Our DAG repr is op-name-only, so ``workload_dag_str`` synthesizes the
TVM-ish text the tags were written against: one line per compute op,
``name(ax0, ax1, ...) <comb>= ...`` where <comb> mirrors TVM's reduce
printing (``+=`` / ``max=`` / ``min=``). Tag semantics are preserved
because our workload library uses the TVM op names ('Conv2dOutput',
'T_softmax_maxelem', 'T_add', default 'compute' with lambda-named axes,
...) — e.g. 'compute(b, i, j)' still singles out batch_matmul and
'max' hits both softmax max-elem stages and max-pooling reductions.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

# exact reference tag list and order (xgb_model.py:80-81)
WORKLOAD_EMBED_TAGS = [
    "max", "min", "add", "Conv2dOutput", "conv2d_winograd",
    "DepthwiseConv2d", "dense", "softmax", "compute(b, i, j)",
]
WORKLOAD_EMBED_DIM = len(WORKLOAD_EMBED_TAGS)  # 9
# the MLP loader pads to 10 (slot 9 = optional target one-hot slot)
MLP_EMBED_DIM = 10

_CACHE: Dict[str, np.ndarray] = {}


def workload_dag_str(workload_key: str) -> str:
    """TVM-flavored DAG text for tag matching (see module docstring)."""
    from ..ir.dag import ComputeDAG
    from ..ir import expr as E
    from ..records.workload import workload_key_to_tensors

    dag = ComputeDAG(workload_key_to_tensors(workload_key))
    lines = []
    for op in dag.ops:
        if op.is_placeholder:
            continue
        axes = ", ".join(ax.name for ax in op.axes)
        body = getattr(op, "body", None)
        if isinstance(body, E.Reduce):
            comb = {"sum": "+=", "max": "max=", "min": "min="}.get(
                body.combiner, "=")
        else:
            comb = "="
        lines.append(f"{op.name}({axes}) {comb} ..")
    return "\n".join(lines)


def get_workload_embedding(workload_key: str) -> np.ndarray:
    """9-dim binary tag vector for a workload key (cached)."""
    emb = _CACHE.get(workload_key)
    if emb is None:
        try:
            dag_str = workload_dag_str(workload_key)
        except Exception:
            # unreconstructable key (e.g. unregistered hash): zero
            # embedding, same effect as no tag matching
            dag_str = ""
        emb = np.array(
            [1.0 if tag in dag_str else 0.0 for tag in WORKLOAD_EMBED_TAGS],
            np.float32,
        )
        _CACHE[workload_key] = emb
    return emb


def append_workload_embedding(features_list: Sequence[np.ndarray],
                              workload_keys: Sequence[str],
                              total_dim: int = MLP_EMBED_DIM
                              ) -> List[np.ndarray]:
    """Tile each program's task embedding onto its feature rows
    (SegmentDataLoader semantics, mlp_model.py:52-80). ``workload_keys``
    is per program (same length as ``features_list``); the 9 tag dims
    are zero-padded to ``total_dim``."""
    out = []
    for feats, key in zip(features_list, workload_keys):
        emb = get_workload_embedding(key)
        if total_dim > WORKLOAD_EMBED_DIM:
            emb = np.concatenate(
                [emb, np.zeros(total_dim - WORKLOAD_EMBED_DIM, np.float32)])
        feats = np.asarray(feats, np.float32)
        tiled = np.tile(emb, (len(feats), 1))
        out.append(np.concatenate([feats, tiled], axis=1)
                   if len(feats) else feats)
    return out

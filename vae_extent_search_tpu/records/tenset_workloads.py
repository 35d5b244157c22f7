"""Inference of TenSet relay-hash workloads from their argument signatures.

TenSet workload keys use a DAG hash + flattened I/O shapes (reference:
relay_integration.py:82-149 extracts tasks whose keys embed shapes, and
scripts/common.py:68-75 loads the hash->DAG registry from all_tasks.pkl).
Without that pickle we reconstruct the common TenSet op patterns from the
shape signature; known hashes can also be registered explicitly via
``workload.register_workload_shape_builder``.

Currently inferred patterns (extended as corpora require):
- NHWC conv2d [+ bias add] [+ relu] chains
"""

from __future__ import annotations

from typing import List, Optional

from ..ir import expr as E
from ..ir.tensor import Tensor, compute, placeholder, reduce_axis, sum_reduce


def _pad_nhwc(data, ph, pw, name="PaddedInput"):
    if ph == 0 and pw == 0:
        return data
    N, H, W, C = data.shape

    def fcompute(n, h, w, c):
        cond = E.And(
            (h.var >= ph, h.var < H + ph, w.var >= pw, w.var < W + pw)
        )
        return E.Select(
            cond, data[n.var, h.var - ph, w.var - pw, c.var], E.FloatImm(0.0)
        )

    return compute((N, H + 2 * ph, W + 2 * pw, C), fcompute, name)


def conv2d_nhwc_chain(data_shape, kernel_shape, out_shape,
                      extra_shapes=(), relu=False) -> List[Tensor]:
    """NHWC conv2d (stride inferred) + optional broadcast adds + relu."""
    N, H, W, CI = data_shape
    KH, KW, _, CO = kernel_shape
    _, OH, OW, _ = out_shape
    # infer stride and padding from shapes (square assumptions, TenSet style)
    stride = max(1, (H - 1) // max(1, OH - 1)) if OH > 1 else 1
    # H + 2p - KH = (OH - 1) * stride
    ph = ((OH - 1) * stride + KH - H) // 2
    ph = max(0, ph)
    pw = ((OW - 1) * stride + KW - W) // 2
    pw = max(0, pw)

    data = placeholder(data_shape, name="placeholder")
    kernel = placeholder(kernel_shape, name="placeholder")
    pad = _pad_nhwc(data, ph, pw)
    rh = reduce_axis(KH, "ry")
    rw = reduce_axis(KW, "rx")
    rc = reduce_axis(CI, "rc")

    def fconv(n, yy, xx, ff):
        return sum_reduce(
            pad[n.var, yy.var * stride + rh.var, xx.var * stride + rw.var, rc.var]
            * kernel[rh.var, rw.var, rc.var, ff.var],
            [rh, rw, rc],
        )

    cur = compute((N, OH, OW, CO), fconv, "Conv2dOutput")
    outs = [data, kernel]
    for shape in extra_shapes:
        extra = placeholder(shape, name="placeholder")
        outs.append(extra)
        prev = cur
        idx_map = _broadcast_index(shape, out_shape)
        cur = compute(
            out_shape,
            lambda n, h, w, c, prev=prev, extra=extra, idx_map=idx_map: (
                prev[n.var, h.var, w.var, c.var]
                + extra[tuple(idx_map((n.var, h.var, w.var, c.var)))]
            ),
            "T_add",
        )
    if relu:
        prev = cur
        cur = compute(
            out_shape,
            lambda n, h, w, c, prev=prev: E.Max(
                prev[n.var, h.var, w.var, c.var], E.FloatImm(0.0)
            ),
            "T_relu",
        )
    outs.append(cur)
    return outs


def _broadcast_index(src_shape, dst_shape):
    """Map dst indices onto a broadcastable src shape."""
    offset = len(dst_shape) - len(src_shape)

    def imap(idx):
        out = []
        for d, s in enumerate(src_shape):
            i = idx[d + offset]
            out.append(i if s > 1 else E.IntImm(0))
        return out

    return imap


def infer_tenset_workload(dag_hash: str, args) -> Optional[List[Tensor]]:
    """Best-effort reconstruction of a TenSet hash workload from its shape
    args. Returns None when the signature is not recognized."""
    # group the flat int list into 4-tuples / shape groups
    if not args or not all(isinstance(a, int) for a in args):
        return None
    # common signature: data(4) kernel(4) [extras(4)*] out(4)
    if len(args) % 4 == 0 and len(args) >= 12:
        shapes = [tuple(args[i:i + 4]) for i in range(0, len(args), 4)]
        data, kernel = shapes[0], shapes[1]
        out = shapes[-1]
        extras = shapes[2:-1]
        # NHWC conv heuristic: kernel KH==KW and channels line up
        if (
            kernel[2] == data[3]
            and out[3] == kernel[3]
            and out[0] == data[0]
        ):
            return conv2d_nhwc_chain(data, kernel, out, extras,
                                     relu=len(extras) > 0)
    return None

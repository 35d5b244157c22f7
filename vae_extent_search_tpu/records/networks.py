"""Network -> task-list definitions (the network grid).

Parity target: scripts/dump_network_info.py — build per-network task lists
+ weights for the benchmark grid (resnet/mobilenet/resnext/bert/dcgan x
batch sizes x image sizes, :139-204). The reference extracts tasks through
relay; we enumerate each architecture's distinct layer workloads directly
(standard published layer shapes) with multiplicity weights.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from .task import SearchTask
from .workload import make_workload_key

# (N,H,W,CO,CI,KH,KW,stride,pad) conv shapes with multiplicities
_RESNET50_CONVS = [
    # (H, W, CO, CI, KH, KW, stride, pad, weight)
    (224, 224, 64, 3, 7, 7, 2, 3, 1),
    (56, 56, 64, 64, 1, 1, 1, 0, 1),
    (56, 56, 64, 64, 3, 3, 1, 1, 3),
    (56, 56, 256, 64, 1, 1, 1, 0, 4),
    (56, 56, 64, 256, 1, 1, 1, 0, 2),
    (56, 56, 128, 256, 1, 1, 2, 0, 1),
    (28, 28, 128, 128, 3, 3, 1, 1, 4),
    (28, 28, 512, 128, 1, 1, 1, 0, 4),
    (28, 28, 128, 512, 1, 1, 1, 0, 3),
    (28, 28, 256, 512, 1, 1, 2, 0, 1),
    (14, 14, 256, 256, 3, 3, 1, 1, 6),
    (14, 14, 1024, 256, 1, 1, 1, 0, 6),
    (14, 14, 256, 1024, 1, 1, 1, 0, 5),
    (14, 14, 512, 1024, 1, 1, 2, 0, 1),
    (7, 7, 512, 512, 3, 3, 1, 1, 3),
    (7, 7, 2048, 512, 1, 1, 1, 0, 3),
    (7, 7, 512, 2048, 1, 1, 1, 0, 2),
]

_RESNET18_CONVS = [
    (224, 224, 64, 3, 7, 7, 2, 3, 1),
    (56, 56, 64, 64, 3, 3, 1, 1, 4),
    (56, 56, 128, 64, 3, 3, 2, 1, 1),
    (28, 28, 128, 128, 3, 3, 1, 1, 3),
    (28, 28, 256, 128, 3, 3, 2, 1, 1),
    (14, 14, 256, 256, 3, 3, 1, 1, 3),
    (14, 14, 512, 256, 3, 3, 2, 1, 1),
    (7, 7, 512, 512, 3, 3, 1, 1, 3),
]

_MOBILENET_V2_CONVS = [
    (224, 224, 32, 3, 3, 3, 2, 1, 1),
    (112, 112, 16, 32, 1, 1, 1, 0, 1),
    (112, 112, 96, 16, 1, 1, 1, 0, 1),
    (56, 56, 24, 96, 1, 1, 1, 0, 1),
    (56, 56, 144, 24, 1, 1, 1, 0, 2),
    (28, 28, 32, 144, 1, 1, 1, 0, 1),
    (28, 28, 192, 32, 1, 1, 1, 0, 3),
    (14, 14, 64, 192, 1, 1, 1, 0, 2),
    (14, 14, 384, 64, 1, 1, 1, 0, 4),
    (14, 14, 96, 384, 1, 1, 1, 0, 2),
    (14, 14, 576, 96, 1, 1, 1, 0, 3),
    (7, 7, 160, 576, 1, 1, 1, 0, 2),
    (7, 7, 960, 160, 1, 1, 1, 0, 3),
    (7, 7, 320, 960, 1, 1, 1, 0, 1),
    (7, 7, 1280, 320, 1, 1, 1, 0, 1),
]

# bert-style dense layers: (N_tokens, in, out, weight)
_BERT_BASE_MATMULS = [
    (128, 768, 768, 4 * 12),
    (128, 768, 3072, 12),
    (128, 3072, 768, 12),
]

# dcgan-style generator convs (as plain convs on the upsampled sizes)
_DCGAN_CONVS = [
    (4, 4, 512, 1024, 4, 4, 1, 1, 1),
    (8, 8, 256, 512, 4, 4, 1, 1, 1),
    (16, 16, 128, 256, 4, 4, 1, 1, 1),
    (32, 32, 64, 128, 4, 4, 1, 1, 1),
    (64, 64, 3, 64, 4, 4, 1, 1, 1),
]


def _scale_hw(convs, image_size: int):
    scale = image_size / 224.0
    out = []
    for (h, w, co, ci, kh, kw, s, p, wt) in convs:
        if h >= 7:  # spatial layers scale with the input image
            h2 = max(1, int(round(h * scale)))
            w2 = max(1, int(round(w * scale)))
        else:
            h2, w2 = h, w
        out.append((h2, w2, co, ci, kh, kw, s, p, wt))
    return out


NETWORK_CONVS = {
    "resnet_50": _RESNET50_CONVS,
    "resnet_18": _RESNET18_CONVS,
    "mobilenet_v2": _MOBILENET_V2_CONVS,
    "dcgan": _DCGAN_CONVS,
}


def build_network_keys() -> List[Tuple[str, Tuple]]:
    """The benchmark grid (reference dump_network_info.py:139-204):
    network x batch size x image size."""
    keys = []
    for batch_size in [1, 4, 8]:
        for image_size in [224, 240, 256]:
            for name in ["resnet_50", "mobilenet_v2", "resnext_50"]:
                keys.append((name, (batch_size, image_size)))
        for seq_length in [128]:
            for name in ["bert_base"]:
                keys.append((name, (batch_size, seq_length)))
    return keys


def get_network_tasks(name: str, batch_size: int = 1, image_size: int = 224,
                      target: str = "llvm") -> Tuple[List[SearchTask], List[float]]:
    """Tasks + weights for a named network."""
    tasks, weights = [], []
    if name in ("bert_base", "bert_tiny"):
        layers = _BERT_BASE_MATMULS
        if name == "bert_tiny":
            layers = [(n, i // 6, o // 6, w) for (n, i, o, w) in layers]
        for (n_tok, d_in, d_out, wt) in layers:
            key = make_workload_key(
                "matmul_add", (batch_size * n_tok, d_in, d_out, "float32")
            )
            tasks.append(SearchTask(key, target))
            weights.append(float(wt))
        return tasks, weights

    base = NETWORK_CONVS.get(name.replace("resnext_50", "resnet_50"))
    if base is None:
        base = NETWORK_CONVS.get(name)
    if base is None:
        raise ValueError(f"unknown network {name}")
    convs = _scale_hw(base, image_size)
    for (h, w, co, ci, kh, kw, s, p, wt) in convs:
        key = make_workload_key(
            "conv2d_layer", (batch_size, h, w, co, ci, kh, kw, [s, s], [p, p])
        )
        tasks.append(SearchTask(key, target))
        weights.append(float(wt))
    return tasks, weights

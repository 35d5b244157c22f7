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
    (56, 56, 256, 64, 1, 1, 1, 0, 4),
    (56, 56, 64, 64, 1, 1, 1, 0, 1),
    (56, 56, 64, 64, 3, 3, 1, 1, 3),
    (56, 56, 64, 256, 1, 1, 1, 0, 2),
    (56, 56, 512, 256, 1, 1, 2, 0, 1),
    (56, 56, 128, 256, 1, 1, 1, 0, 1),
    (56, 56, 128, 128, 3, 3, 2, 1, 1),
    (28, 28, 512, 128, 1, 1, 1, 0, 4),
    (28, 28, 128, 512, 1, 1, 1, 0, 3),
    (28, 28, 128, 128, 3, 3, 1, 1, 3),
    (28, 28, 1024, 512, 1, 1, 2, 0, 1),
    (28, 28, 256, 512, 1, 1, 1, 0, 1),
    (28, 28, 256, 256, 3, 3, 2, 1, 1),
    (14, 14, 1024, 256, 1, 1, 1, 0, 6),
    (14, 14, 256, 1024, 1, 1, 1, 0, 5),
    (14, 14, 256, 256, 3, 3, 1, 1, 5),
    (14, 14, 2048, 1024, 1, 1, 2, 0, 1),
    (14, 14, 512, 1024, 1, 1, 1, 0, 1),
    (14, 14, 512, 512, 3, 3, 2, 1, 1),
    (7, 7, 2048, 512, 1, 1, 1, 0, 3),
    (7, 7, 512, 2048, 1, 1, 1, 0, 2),
    (7, 7, 512, 512, 3, 3, 1, 1, 2),
]

_RESNET18_CONVS = [
    (224, 224, 64, 3, 7, 7, 2, 3, 1),
    (56, 56, 64, 64, 3, 3, 1, 1, 4),
    (56, 56, 128, 64, 1, 1, 2, 0, 1),
    (56, 56, 128, 64, 3, 3, 2, 1, 1),
    (28, 28, 128, 128, 3, 3, 1, 1, 3),
    (28, 28, 256, 128, 1, 1, 2, 0, 1),
    (28, 28, 256, 128, 3, 3, 2, 1, 1),
    (14, 14, 256, 256, 3, 3, 1, 1, 3),
    (14, 14, 512, 256, 1, 1, 2, 0, 1),
    (14, 14, 512, 256, 3, 3, 2, 1, 1),
    (7, 7, 512, 512, 3, 3, 1, 1, 3),
]

# depthwise layers: (H, W, C, KH, KW, stride, pad, weight)
_MOBILENET_V2_DEPTHWISE = [
    (112, 112, 32, 3, 3, 1, 1, 1),
    (112, 112, 96, 3, 3, 2, 1, 1),
    (56, 56, 144, 3, 3, 1, 1, 1),
    (56, 56, 144, 3, 3, 2, 1, 1),
    (28, 28, 192, 3, 3, 1, 1, 2),
    (28, 28, 192, 3, 3, 2, 1, 1),
    (14, 14, 384, 3, 3, 1, 1, 4),
    (14, 14, 576, 3, 3, 1, 1, 2),
    (14, 14, 576, 3, 3, 2, 1, 1),
    (7, 7, 960, 3, 3, 1, 1, 3),
]

_MOBILENET_V2_CONVS = [
    (224, 224, 32, 3, 3, 3, 2, 1, 1),
    (112, 112, 16, 32, 1, 1, 1, 0, 1),
    (112, 112, 96, 16, 1, 1, 1, 0, 1),
    (56, 56, 24, 96, 1, 1, 1, 0, 1),
    (56, 56, 144, 24, 1, 1, 1, 0, 2),
    (56, 56, 24, 144, 1, 1, 1, 0, 1),
    (28, 28, 32, 144, 1, 1, 1, 0, 1),
    (28, 28, 192, 32, 1, 1, 1, 0, 3),
    (28, 28, 32, 192, 1, 1, 1, 0, 2),
    (14, 14, 64, 192, 1, 1, 1, 0, 1),
    (14, 14, 384, 64, 1, 1, 1, 0, 4),
    (14, 14, 64, 384, 1, 1, 1, 0, 3),
    (14, 14, 96, 384, 1, 1, 1, 0, 1),
    (14, 14, 576, 96, 1, 1, 1, 0, 3),
    (14, 14, 96, 576, 1, 1, 1, 0, 2),
    (7, 7, 160, 576, 1, 1, 1, 0, 1),
    (7, 7, 960, 160, 1, 1, 1, 0, 3),
    (7, 7, 160, 960, 1, 1, 1, 0, 2),
    (7, 7, 320, 960, 1, 1, 1, 0, 1),
    (7, 7, 1280, 320, 1, 1, 1, 0, 1),
]

# mobilenet_v3_large: stem + inverted-residual expand/project 1x1 convs
_MOBILENET_V3_CONVS = [
    (224, 224, 16, 3, 3, 3, 2, 1, 1),
    (112, 112, 16, 16, 1, 1, 1, 0, 1),
    (112, 112, 64, 16, 1, 1, 1, 0, 1),
    (56, 56, 24, 64, 1, 1, 1, 0, 1),
    (56, 56, 72, 24, 1, 1, 1, 0, 2),
    (28, 28, 40, 72, 1, 1, 1, 0, 1),
    (28, 28, 120, 40, 1, 1, 1, 0, 2),
    (28, 28, 240, 40, 1, 1, 1, 0, 1),
    (14, 14, 80, 240, 1, 1, 1, 0, 1),
    (14, 14, 200, 80, 1, 1, 1, 0, 3),
    (14, 14, 480, 80, 1, 1, 1, 0, 1),
    (14, 14, 112, 480, 1, 1, 1, 0, 1),
    (14, 14, 672, 112, 1, 1, 1, 0, 2),
    (7, 7, 160, 672, 1, 1, 1, 0, 1),
    (7, 7, 960, 160, 1, 1, 1, 0, 2),
]

_MOBILENET_V3_DEPTHWISE = [
    (112, 112, 16, 3, 3, 1, 1, 1),
    (112, 112, 64, 3, 3, 2, 1, 1),
    (56, 56, 72, 3, 3, 2, 1, 1),
    (28, 28, 120, 5, 5, 1, 2, 2),
    (28, 28, 240, 3, 3, 2, 1, 1),
    (14, 14, 200, 3, 3, 1, 1, 3),
    (14, 14, 672, 5, 5, 2, 2, 2),
    (7, 7, 960, 5, 5, 1, 2, 2),
]


# bert scales: hidden size x layer count (reference dump_network_info
# grid: bert_{tiny,medium,base,large}); per layer the dense workloads are
# QKV/attn-out projections (4 per layer) and the two FFN matmuls
# (hidden_size, num_hidden_layers) per reference
# dump_network_info.py:66-75 config_dict; intermediate_size = 4*hidden
_BERT_DIMS = {
    "tiny": (512, 6, 8),
    "base": (768, 12, 12),
    "medium": (1024, 12, 16),
    "large": (1024, 24, 16),
}


def _bert_matmuls(seq_length: int, hidden: int, layers: int):
    return [
        (seq_length, hidden, hidden, 4 * layers),
        (seq_length, hidden, 4 * hidden, layers),
        (seq_length, 4 * hidden, hidden, layers),
    ]


def _bert_batch_matmuls(seq_length: int, hidden: int, layers: int,
                        heads: int):
    """The attention score (QK^T) and context (SV) batched matmuls —
    relay extracts these as topi batch_matmul with the head axis folded
    into the batch (reference python/tvm/topi/nn/batch_matmul.py:24)."""
    head_dim = hidden // heads
    return [
        # (B_factor, N, M, K, weight): scores = Q[s,d] @ K[s,d]^T
        (heads, seq_length, seq_length, head_dim, layers),
        # context = S[s,s] @ V[s,d]^T (relay transposes V for NT matmul)
        (heads, seq_length, head_dim, seq_length, layers),
    ]


# dcgan generator (relay/testing/dcgan.py get_net, ngf=128, 64x64 base):
# dense code->8192 then four 4x4/stride-2 transposed convs; entries are
# (H_in, W_in, CO, CI) per deconv stage at the 64-px base size.
_DCGAN_TCONVS = [
    (4, 4, 512, 1024),
    (8, 8, 256, 512),
    (16, 16, 128, 256),
    (32, 32, 3, 128),
]

# resnext50_32x4d: the bottleneck 3x3 convs are 32-group convolutions
# (torchvision resnext50_32x4d; reference dump_network_info.py:36-37);
# entries (H, W, C, stride, weight) with CO=CI=C, k3 p1 g32
_RESNEXT50_GROUP_CONVS = [
    (56, 56, 128, 1, 3),
    (56, 56, 256, 2, 1),
    (28, 28, 256, 1, 3),
    (28, 28, 512, 2, 1),
    (14, 14, 512, 1, 5),
    (14, 14, 1024, 2, 1),
    (7, 7, 1024, 1, 2),
]

# resnext50_32x4d plain convs: stem + bottleneck 1x1 reduce/expand +
# downsample projections (H, W, CO, CI, KH, KW, stride, pad, weight)
_RESNEXT50_CONVS = [
    (224, 224, 64, 3, 7, 7, 2, 3, 1),
    (56, 56, 128, 64, 1, 1, 1, 0, 1),
    (56, 56, 128, 256, 1, 1, 1, 0, 2),
    (56, 56, 256, 128, 1, 1, 1, 0, 3),
    (56, 56, 256, 64, 1, 1, 1, 0, 1),
    (56, 56, 256, 256, 1, 1, 1, 0, 1),
    (28, 28, 256, 512, 1, 1, 1, 0, 3),
    (28, 28, 512, 256, 1, 1, 1, 0, 4),
    (56, 56, 512, 256, 1, 1, 2, 0, 1),
    (28, 28, 512, 512, 1, 1, 1, 0, 1),
    (14, 14, 512, 1024, 1, 1, 1, 0, 5),
    (14, 14, 1024, 512, 1, 1, 1, 0, 6),
    (28, 28, 1024, 512, 1, 1, 2, 0, 1),
    (14, 14, 1024, 1024, 1, 1, 1, 0, 1),
    (7, 7, 1024, 2048, 1, 1, 1, 0, 2),
    (7, 7, 2048, 1024, 1, 1, 1, 0, 3),
    (14, 14, 2048, 1024, 1, 1, 2, 0, 1),
]


def _scale_hw(convs, image_size: int, base: int = 224):
    scale = image_size / float(base)
    out = []
    for (h, w, co, ci, kh, kw, s, p, wt) in convs:
        if h >= 7:  # spatial layers scale with the input image
            h2 = max(1, int(round(h * scale)))
            w2 = max(1, int(round(w * scale)))
        else:
            h2, w2 = h, w
        out.append((h2, w2, co, ci, kh, kw, s, p, wt))
    return out


# inception_v3 distinct conv shapes (299 input; representative branches)
_INCEPTION_V3_CONVS = [
    (299, 299, 32, 3, 3, 3, 2, 0, 1),
    (149, 149, 32, 32, 3, 3, 1, 0, 1),
    (147, 147, 64, 32, 3, 3, 1, 1, 1),
    (73, 73, 80, 64, 1, 1, 1, 0, 1),
    (73, 73, 192, 80, 3, 3, 1, 0, 1),
    (35, 35, 64, 192, 1, 1, 1, 0, 3),
    (35, 35, 96, 64, 3, 3, 1, 1, 6),
    (35, 35, 64, 256, 1, 1, 1, 0, 4),
    (35, 35, 48, 288, 1, 1, 1, 0, 2),
    (35, 35, 64, 48, 5, 5, 1, 2, 3),
    (17, 17, 192, 768, 1, 1, 1, 0, 8),
    (17, 17, 128, 768, 1, 1, 1, 0, 2),
    (17, 17, 192, 128, 1, 7, 1, 0, 4),
    (17, 17, 192, 192, 7, 1, 1, 0, 4),
    (8, 8, 320, 1280, 1, 1, 1, 0, 2),
    (8, 8, 384, 1280, 1, 1, 1, 0, 4),
    (8, 8, 448, 1280, 1, 1, 1, 0, 2),
    (8, 8, 384, 448, 3, 3, 1, 1, 2),
]

# densenet_121: stem + per-block 1x1 bottleneck / 3x3 growth convs +
# transitions (growth rate 32; representative channel counts per block)
_DENSENET_121_CONVS = [
    (224, 224, 64, 3, 7, 7, 2, 3, 1),
    (56, 56, 128, 64, 1, 1, 1, 0, 2),
    (56, 56, 32, 128, 3, 3, 1, 1, 6),
    (56, 56, 128, 256, 1, 1, 1, 0, 1),
    (28, 28, 128, 128, 1, 1, 1, 0, 4),
    (28, 28, 32, 128, 3, 3, 1, 1, 12),
    (28, 28, 256, 512, 1, 1, 1, 0, 1),
    (14, 14, 128, 256, 1, 1, 1, 0, 8),
    (14, 14, 32, 128, 3, 3, 1, 1, 24),
    (14, 14, 512, 1024, 1, 1, 1, 0, 1),
    (7, 7, 128, 512, 1, 1, 1, 0, 5),
    (7, 7, 32, 128, 3, 3, 1, 1, 16),
]


# resnet3d_18 (16-frame clips): (D, H, W, CO, CI, KD, KH, KW, stride,
# pad, weight) for conv3d_layer
_RESNET3D_18_CONVS = [
    (16, 112, 112, 64, 3, 3, 7, 7, 2, 1, 1),
    (16, 56, 56, 64, 64, 3, 3, 3, 1, 1, 4),
    (16, 56, 56, 128, 64, 3, 3, 3, 2, 1, 1),
    (8, 28, 28, 128, 128, 3, 3, 3, 1, 1, 3),
    (8, 28, 28, 256, 128, 3, 3, 3, 2, 1, 1),
    (4, 14, 14, 256, 256, 3, 3, 3, 1, 1, 3),
    (4, 14, 14, 512, 256, 3, 3, 3, 2, 1, 1),
    (2, 7, 7, 512, 512, 3, 3, 3, 1, 1, 3),
]

_WIDE_RESNET50_CONVS = [
    # wide_resnet50_2: bottleneck inner width doubled, expansion
    # channels unchanged (Zagoruyko & Komodakis 2016; torchvision
    # width_per_group=128) — traced via frontend/zoo.py
    (224, 224, 64, 3, 7, 7, 2, 3, 1),
    (56, 56, 256, 64, 1, 1, 1, 0, 1),
    (56, 56, 128, 64, 1, 1, 1, 0, 1),
    (56, 56, 128, 128, 3, 3, 1, 1, 3),
    (56, 56, 256, 128, 1, 1, 1, 0, 3),
    (56, 56, 128, 256, 1, 1, 1, 0, 2),
    (56, 56, 512, 256, 1, 1, 2, 0, 1),
    (56, 56, 256, 256, 1, 1, 1, 0, 1),
    (56, 56, 256, 256, 3, 3, 2, 1, 1),
    (28, 28, 512, 256, 1, 1, 1, 0, 4),
    (28, 28, 256, 512, 1, 1, 1, 0, 3),
    (28, 28, 256, 256, 3, 3, 1, 1, 3),
    (28, 28, 1024, 512, 1, 1, 2, 0, 1),
    (28, 28, 512, 512, 1, 1, 1, 0, 1),
    (28, 28, 512, 512, 3, 3, 2, 1, 1),
    (14, 14, 1024, 512, 1, 1, 1, 0, 6),
    (14, 14, 512, 1024, 1, 1, 1, 0, 5),
    (14, 14, 512, 512, 3, 3, 1, 1, 5),
    (14, 14, 2048, 1024, 1, 1, 2, 0, 1),
    (14, 14, 1024, 1024, 1, 1, 1, 0, 1),
    (14, 14, 1024, 1024, 3, 3, 2, 1, 1),
    (7, 7, 2048, 1024, 1, 1, 1, 0, 3),
    (7, 7, 1024, 2048, 1, 1, 1, 0, 2),
    (7, 7, 1024, 1024, 3, 3, 1, 1, 2),
]


NETWORK_CONVS = {
    "resnet_50": _RESNET50_CONVS,
    "resnet_18": _RESNET18_CONVS,
    "wide_resnet_50": _WIDE_RESNET50_CONVS,
    "mobilenet_v2": _MOBILENET_V2_CONVS,
    "mobilenet_v3": _MOBILENET_V3_CONVS,
    "inception_v3": _INCEPTION_V3_CONVS,
    "densenet_121": _DENSENET_121_CONVS,
    "resnext_50": _RESNEXT50_CONVS,
}


def build_network_keys() -> List[Tuple[str, Tuple]]:
    """The full benchmark grid of the reference's dump_network_info.py
    (:139-204): network family x batch size x image/seq size. (The
    reference file short-circuits after the resnet block with an early
    ``return``; this is the grid its dead code and README describe.)"""
    keys = []
    for batch_size in [1]:
        for image_size in [224, 240, 256]:
            for layer in [18, 50]:
                keys.append((f"resnet_{layer}", (batch_size, image_size)))
    for batch_size in [1, 4, 8]:
        for image_size in [224, 240, 256]:
            for name in ["mobilenet_v2", "mobilenet_v3",
                         "wide_resnet_50", "resnext_50"]:
                keys.append((name, (batch_size, image_size)))
    for batch_size in [1, 2, 4]:
        keys.append(("inception_v3", (batch_size, 299)))
        for image_size in [224, 240, 256]:
            keys.append(("densenet_121", (batch_size, image_size)))
        for image_size in [112, 128, 144]:
            keys.append(("resnet3d_18", (batch_size, image_size)))
        for seq_length in [64, 128, 256]:
            for scale in ["tiny", "medium", "base", "large"]:
                keys.append((f"bert_{scale}", (batch_size, seq_length)))
    for batch_size in [1, 4, 8]:
        for image_size in [64, 80, 96]:
            keys.append(("dcgan", (batch_size, image_size)))
    return keys


def get_network_tasks(name: str, batch_size: int = 1, image_size: int = 224,
                      target: str = "llvm") -> Tuple[List[SearchTask], List[float]]:
    """Tasks + weights for a named network."""
    tasks, weights = [], []
    if name.startswith("bert_"):
        # image_size carries the sequence length for bert grid keys
        hidden, n_layers, n_heads = _BERT_DIMS[name.split("_", 1)[1]]
        # 224 is the image-size default sentinel; bert keys carry the
        # sequence length in that slot
        seq = 128 if image_size == 224 else image_size
        for (n_tok, d_in, d_out, wt) in _bert_matmuls(seq, hidden,
                                                      n_layers):
            key = make_workload_key(
                "matmul_add", (batch_size * n_tok, d_in, d_out, "float32")
            )
            tasks.append(SearchTask(key, target))
            weights.append(float(wt))
        for (b_fac, n, m, k, wt) in _bert_batch_matmuls(
                seq, hidden, n_layers, n_heads):
            key = make_workload_key(
                "batch_matmul", (batch_size * b_fac, n, m, k, "float32")
            )
            tasks.append(SearchTask(key, target))
            weights.append(float(wt))
        return tasks, weights

    if name == "dcgan":
        # relay/testing/dcgan.py generator: dense + 4 transposed convs;
        # non-default image sizes scale the spatial grid (base 64)
        base_size = 64 if image_size == 224 else image_size
        bs4 = max(1, base_size // 16)
        key = make_workload_key(
            "matmul_add", (batch_size, 100, bs4 * bs4 * 1024, "float32")
        )
        tasks.append(SearchTask(key, target))
        weights.append(1.0)
        for i, (h, w, co, ci) in enumerate(_DCGAN_TCONVS):
            h2, w2 = bs4 * (h // 4), bs4 * (w // 4)
            key = make_workload_key(
                "conv2d_transpose_layer",
                (batch_size, h2, w2, co, ci, 4, 4, [2, 2], [1, 1]),
            )
            tasks.append(SearchTask(key, target))
            weights.append(1.0)
        return tasks, weights

    if name in ("resnet3d_18",):
        # 224 sentinel -> the family's native 112 input
        scale = 1.0 if image_size == 224 else image_size / 112.0
        for (d, h, w, co, ci, kd, kh, kw, s_, p_,
             wt) in _RESNET3D_18_CONVS:
            h2 = max(1, int(round(h * scale)))
            w2 = max(1, int(round(w * scale)))
            key = make_workload_key(
                "conv3d_layer",
                (batch_size, d, h2, w2, co, ci, kd, kh, kw, [s_, s_, s_],
                 [p_, p_, p_]),
            )
            tasks.append(SearchTask(key, target))
            weights.append(float(wt))
        return tasks, weights

    base = NETWORK_CONVS.get(name)
    if base is None:
        raise ValueError(f"unknown network {name}")
    base_size = {"inception_v3": 299}.get(name, 224)
    if image_size == 224 and base_size != 224:
        image_size = base_size  # default size means the family's native one
    convs = _scale_hw(base, image_size, base_size)
    for (h, w, co, ci, kh, kw, s, p, wt) in convs:
        key = make_workload_key(
            "conv2d_layer", (batch_size, h, w, co, ci, kh, kw, [s, s], [p, p])
        )
        tasks.append(SearchTask(key, target))
        weights.append(float(wt))
    if name == "resnext_50":
        scale = image_size / 224.0
        for (h, w, c, s, wt) in _RESNEXT50_GROUP_CONVS:
            h2 = max(1, int(round(h * scale)))
            w2 = max(1, int(round(w * scale)))
            key = make_workload_key(
                "group_conv2d_layer",
                (batch_size, h2, w2, c, c, 3, 3, [s, s], [1, 1], 32),
            )
            tasks.append(SearchTask(key, target))
            weights.append(float(wt))
    if name in ("mobilenet_v2", "mobilenet_v3"):
        scale = image_size / 224.0
        dw = _MOBILENET_V2_DEPTHWISE if name == "mobilenet_v2" \
            else _MOBILENET_V3_DEPTHWISE
        for (h, w, c, kh, kw, s, p, wt) in dw:
            h2 = max(1, int(round(h * scale)))
            w2 = max(1, int(round(w * scale)))
            key = make_workload_key(
                "depthwise_conv2d_layer",
                (batch_size, h2, w2, c, kh, kw, [s, s], [p, p]),
            )
            tasks.append(SearchTask(key, target))
            weights.append(float(wt))
    for key in _head_task_keys(name, batch_size, image_size):
        tasks.append(SearchTask(key, target))
        weights.append(1.0)
    return tasks, weights


# per-family (stem_maxpool?, feat_channels, extra_dense_in) for the
# non-conv tasks relay extraction also yields: stem max pool, global
# average pool, classifier dense(s) (torchvision model heads)
_NETWORK_HEADS = {
    "resnet_18": (True, 512, None),
    "resnet_50": (True, 2048, None),
    "wide_resnet_50": (True, 2048, None),
    "resnext_50": (True, 2048, None),
    "mobilenet_v2": (False, 1280, None),
    # mbv3-large: features end at 960, avgpool, dense 960->1280, 1280->1000
    "mobilenet_v3": (False, 960, 1280),
    "inception_v3": (False, 2048, None),
    "densenet_121": (True, 1024, None),
}

# densenet transition layers: 2x2/stride-2 average pools after each
# dense block (torchvision densenet121 _Transition); (H, C) at 224 px
_DENSENET_TRANSITION_POOLS = [(56, 128), (28, 256), (14, 512)]


def _head_task_keys(name: str, batch_size: int, image_size: int):
    """Workload keys for the non-conv layers of a conv-family network:
    stem max pool, global average pool, and the classifier matmul(s).
    Mirrors what the reference's relay task extraction yields beyond
    convolutions (dump_network_info.py get_network_with_key builds the
    full torchvision graph; complex reduce ops become their own tasks)."""
    head = _NETWORK_HEADS.get(name)
    if head is None:
        return
    stem_pool, feat_ch, extra_dense = head
    base = 299 if name == "inception_v3" else 224
    scale = image_size / float(base)
    if stem_pool:
        # 3x3/stride-2/pad-1 max pool on the post-stem 112-px, 64-ch map
        h = max(1, int(round(112 * scale)))
        yield make_workload_key(
            "max_pool2d_layer", (batch_size, h, h, 64, 3, 2, 1)
        )
    if name == "densenet_121":
        for (h, c) in _DENSENET_TRANSITION_POOLS:
            h2 = max(1, int(round(h * scale)))
            yield make_workload_key(
                "avg_pool2d_layer", (batch_size, h2, h2, c, 2, 2, 0)
            )
    # global average pool over the final feature map (7 px at 224 base,
    # 8 px at 299) then the classifier dense to 1000 classes
    fs = max(1, int(round((8 if base == 299 else 7) * scale)))
    yield make_workload_key(
        "avg_pool2d_layer", (batch_size, fs, fs, feat_ch, fs, 1, 0)
    )
    if extra_dense is not None:
        yield make_workload_key(
            "matmul_add", (batch_size, feat_ch, extra_dense, "float32")
        )
        feat_ch = extra_dense
    yield make_workload_key(
        "matmul_add", (batch_size, feat_ch, 1000, "float32")
    )

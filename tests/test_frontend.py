"""Model->task frontend: torch.fx tracing vs the static network grid.

The hand tables in records/networks.py describe what the reference's
relay extraction produces for the torchvision/transformers grid
(dump_network_info.py:27-62). The frontend must reproduce them from an
actual traced model graph — and generalize off-grid (any batch/size,
any fx-traceable architecture)."""

import pytest

torch = pytest.importorskip("torch")

from vae_extent_search_tpu.frontend import (  # noqa: E402
    build_zoo_model,
    extract_tasks_from_module,
)
from vae_extent_search_tpu.records.networks import (  # noqa: E402
    get_network_tasks,
)


def _task_dict(tasks, weights):
    return {t.workload_key: w for t, w in zip(tasks, weights)}


@pytest.mark.parametrize("name,shape", [
    ("resnet_18", (1, 3, 224, 224)),
    ("resnet_50", (1, 3, 224, 224)),
    ("wide_resnet_50", (1, 3, 224, 224)),
    ("resnext_50", (1, 3, 224, 224)),
    ("mobilenet_v2", (1, 3, 224, 224)),
    ("mobilenet_v3", (1, 3, 224, 224)),
    ("densenet_121", (1, 3, 224, 224)),
    ("inception_v3", (1, 3, 299, 299)),
    ("resnet3d_18", (1, 3, 16, 112, 112)),
    ("vgg_16", (1, 3, 224, 224)),
    ("dcgan", (1, 100)),
])
def test_traced_model_matches_static_table(name, shape):
    traced = _task_dict(*extract_tasks_from_module(
        build_zoo_model(name), shape))
    size = {"dcgan": 64, "inception_v3": 299,
            "resnet3d_18": 112}.get(name, 224)
    static = _task_dict(*get_network_tasks(name, 1, size))
    assert traced == static, {
        "traced_only": {k: v for k, v in traced.items()
                        if static.get(k) != v},
        "static_only": {k: v for k, v in static.items()
                        if traced.get(k) != v},
    }


def test_traced_bert_matches_static_table():
    """HF bert (transformers fx trace): encoder dense + attention
    batch-matmul tasks must equal the static bert grid; the only
    surplus is the real model's pooler dense on [CLS]."""
    transformers = pytest.importorskip("transformers")

    from vae_extent_search_tpu.frontend.torch_fx import (
        extract_tasks_from_hf,
    )

    hidden, layers, heads = 512, 6, 8  # bert_tiny dims
    cfg = transformers.BertConfig(
        hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=heads, intermediate_size=4 * hidden)
    traced = _task_dict(*extract_tasks_from_hf(
        transformers.BertModel(cfg), 1, 128))
    static = _task_dict(*get_network_tasks("bert_tiny", 1, 128))
    extra = {k: v for k, v in traced.items() if k not in static}
    missing = {k: v for k, v in static.items() if traced.get(k) != v}
    assert not missing, missing
    assert list(extra) == ['["matmul_add", 1, 512, 512, "float32"]'], extra


def test_traced_off_grid_shapes():
    """The frontend's point: shapes the static grid never enumerated
    (batch 2, 160 px) come straight from shape propagation."""
    import json

    tasks, weights = extract_tasks_from_module(
        build_zoo_model("resnet_18"), (2, 3, 160, 160))
    keys = [json.loads(t.workload_key) for t in tasks]
    convs = [k for k in keys if k[0] == "conv2d_layer"]
    assert all(k[1] == 2 for k in convs)  # batch propagated
    assert convs[0][2:4] == [160, 160]    # stem sees the real input
    # stride-2 stem + pool: layer1 convs run on 40x40 maps
    assert any(k[2:4] == [40, 40] for k in convs)


def test_traced_custom_module():
    """Any fx-traceable nn.Module works — no registry or table entry
    needed for a model family the grid has never seen."""
    import json

    import torch.nn as nn

    class Tiny(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv = nn.Conv2d(8, 16, 3, 2, 1)
            self.dw = nn.Conv2d(16, 16, 3, 1, 1, groups=16)
            self.fc = nn.Linear(16, 10)

        def forward(self, x):
            x = self.dw(self.conv(x))
            return self.fc(x.mean(dim=(2, 3)))

    tasks, weights = extract_tasks_from_module(Tiny(), (4, 8, 32, 32))
    ops = [json.loads(t.workload_key)[0] for t in tasks]
    assert ops == ["conv2d_layer", "depthwise_conv2d_layer",
                   "matmul_add"]
    assert weights == [1.0, 1.0, 1.0]

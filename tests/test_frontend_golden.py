"""Paper-derived golden task lists vs static tables vs zoo traces.

Breaks the round-2 circularity (networks.py tables were corrected from
zoo traces, then tested against them — both builder-authored): the
goldens in tests/data/golden_network_tasks.json are derived purely from
the published papers' stage tables (He/Zagoruyko/Xie/Sandler/Huang/
Radford/Devlin; see tools/derive_golden_tasks.py for the per-network
citations and derivations), matching the torchvision variants the
reference actually traced (dump_network_info.py:27-62). All three
sources must agree."""

import json
import os

import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "data", "golden_network_tasks.json")


def _load_golden():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


def _canon(table):
    """{canonical workload key -> weight} with json-canonical keys."""
    return {json.dumps(json.loads(k)): v for k, v in table.items()}


def _diff(a, b):
    return {
        "a_only": {k: v for k, v in a.items() if b.get(k) != v},
        "b_only": {k: v for k, v in b.items() if a.get(k) != v},
    }


@pytest.mark.parametrize("name", [
    "resnet_18", "resnet_50", "wide_resnet_50", "resnext_50",
    "mobilenet_v2", "densenet_121", "dcgan",
    "bert_tiny", "bert_base", "bert_large",
])
def test_static_table_matches_paper_golden(name):
    from vae_extent_search_tpu.records.networks import get_network_tasks

    golden = _canon(_load_golden()[name])
    size = {"dcgan": 64}.get(name, 224)
    if name.startswith("bert_"):
        size = 128
    tasks, weights = get_network_tasks(name, 1, size)
    static = _canon({t.workload_key: w for t, w in zip(tasks, weights)})
    assert static == golden, _diff(static, golden)


@pytest.mark.parametrize("name,shape", [
    ("resnet_18", (1, 3, 224, 224)),
    ("resnet_50", (1, 3, 224, 224)),
    ("mobilenet_v2", (1, 3, 224, 224)),
    ("resnext_50", (1, 3, 224, 224)),
    ("densenet_121", (1, 3, 224, 224)),
    ("dcgan", (1, 100)),
])
def test_zoo_trace_matches_paper_golden(name, shape):
    torch = pytest.importorskip("torch")

    from vae_extent_search_tpu.frontend import (
        build_zoo_model,
        extract_tasks_from_module,
    )

    golden = _canon(_load_golden()[name])
    tasks, weights = extract_tasks_from_module(
        build_zoo_model(name), shape)
    traced = _canon({t.workload_key: w for t, w in zip(tasks, weights)})
    assert traced == golden, _diff(traced, golden)


def test_golden_total_weights():
    """Sanity: block counts from the papers pin the total conv counts
    (e.g. resnet_50 = 1 stem + 16x3 bottleneck convs + 4 projections +
    2 pools + 1 fc = 56 weighted tasks)."""
    g = _load_golden()
    totals = {k: sum(v.values()) for k, v in g.items()}
    assert totals["resnet_18"] == 23   # 1+1 stem, 16 convs, 3 proj, 2 pool/fc... see tool
    assert totals["resnet_50"] == 56
    assert totals["wide_resnet_50"] == 56
    assert totals["resnext_50"] == 56
    assert totals["mobilenet_v2"] == 54
    assert totals["densenet_121"] == 126
    assert totals["bert_base"] == 96   # 12L x (4 proj + 2 ffn + 2 bmm)

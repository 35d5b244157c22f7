"""Population fingerprints of the sketch generator, pinned as self-goldens.

The reachability goldens (tests/test_sketch_goldens.py) prove every
reference-recorded state is *producible*; they cannot see a regression
that keeps states reachable but skews the POPULATION the generator
actually emits (e.g. a rule whose application probability silently
drops, a sketch variant that stops being enumerated, a tile-shape
distribution shift). The reference ships no population-level goldens
beyond its ci_logs, so these are self-goldens: a seeded generation run
per workload class x platform, summarized on three axes and committed
to tests/data/sketch_fingerprints.json. Any code change that moves the
population fails the pin; intentional generator changes regenerate via

    python tools/sketch_fingerprints.py        # rewrites the JSON

Fingerprint axes per (workload class, platform):
  rule_counts     — total step-kind histogram over the population
                    (every kind, annotations included: the init rules'
                    sampling distribution is part of the contract)
  variant_mix     — histogram of per-state structural kind-histograms
                    (which sketch variants appear, how often)
  tile_structures — histogram of per-state split-shape signatures
                    (how tiling lengths distribute across stages)

Everything is derived from a fixed seed, so comparison is exact.
"""

import json
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vae_extent_search_tpu.records import SearchTask, make_workload_key
from vae_extent_search_tpu.search.sketch import make_states

FINGERPRINT_JSON = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "data", "sketch_fingerprints.json")

N_STATES = 96
SEED = 17

# Workload classes spanning the TenSet grid's op families (conv2d at
# batch 1 AND batch 8 — the full-grid dimension of VERDICT r4 ask 1 —
# matmul, batched matmul, depthwise, pooling, reduction/softmax
# (rfactor / cross-thread-reduction class), conv3d). Each runs on both
# platform kinds: llvm = CPU rule set, cuda = GPU rule set
# (sketch_policy.cc:96-147).
CLASSES = [
    ("conv2d_b1", "conv2d_layer",
     (1, 56, 56, 64, 64, 3, 3, [1, 1], [1, 1])),
    ("conv2d_b8", "conv2d_layer",
     (8, 224, 224, 32, 3, 3, 3, [2, 2], [1, 1])),
    ("matmul", "matmul_auto_scheduler_test", (512, 512, 512)),
    ("batch_matmul", "batch_matmul", (12, 128, 128, 64)),
    ("depthwise", "depthwise_conv2d_layer",
     (1, 112, 112, 32, 3, 3, [1, 1], [1, 1])),
    ("max_pool", "max_pool2d_auto_scheduler_test", (1, 56, 56, 64, 1)),
    ("softmax", "softmax_nm_auto_scheduler_test", (64, 1024)),
    ("conv3d", "conv3d_layer",
     (1, 16, 56, 56, 64, 64, 3, 3, 3, [1, 1], [1, 1])),
]
TARGETS = [("llvm", "llvm"), ("cuda", "cuda")]


def split_shape_signature(step_records):
    """Per-state tiling fingerprint: sorted (stage_id, n_lengths) of
    every SplitStep (the test_sketch_goldens sp_shape axis)."""
    return tuple(sorted(
        (s[1], len(s[4])) for s in step_records if s[0] == "SP"))


def population_fingerprint(task: SearchTask, n: int = N_STATES,
                           seed: int = SEED) -> dict:
    states = make_states(task, n, seed=seed)
    rule_counts = Counter()
    variant_mix = Counter()
    tile_structures = Counter()
    for st in states:
        recs = [s.to_record() for s in st.transform_steps]
        kinds = Counter(s[0] for s in recs)
        rule_counts.update(kinds)
        variant_mix[json.dumps(sorted(kinds.items()))] += 1
        tile_structures[json.dumps(split_shape_signature(recs))] += 1
    return {
        "n_states": len(states),
        "rule_counts": dict(sorted(rule_counts.items())),
        "variant_mix": dict(sorted(variant_mix.items())),
        "tile_structures": dict(sorted(tile_structures.items())),
    }


def compute_all() -> dict:
    out = {}
    for cls_name, fn_name, args in CLASSES:
        wk = make_workload_key(fn_name, args)
        for tgt_name, target in TARGETS:
            task = SearchTask(wk, target)
            out[f"{cls_name}/{tgt_name}"] = population_fingerprint(task)
            print(f"{cls_name}/{tgt_name}: "
                  f"{out[f'{cls_name}/{tgt_name}']['n_states']} states, "
                  f"{len(out[f'{cls_name}/{tgt_name}']['variant_mix'])} "
                  f"variants", flush=True)
    return out


def main():
    fps = compute_all()
    os.makedirs(os.path.dirname(FINGERPRINT_JSON), exist_ok=True)
    with open(FINGERPRINT_JSON, "w") as f:
        json.dump(fps, f, indent=1, sort_keys=True)
    print(f"wrote {FINGERPRINT_JSON} ({len(fps)} fingerprints)")


if __name__ == "__main__":
    main()

"""Dump network task info for the benchmark grid.

Parity: reference scripts/dump_network_info.py — builds per-network task
lists for the network grid and writes ``*.task.pkl`` files plus the global
``all_tasks.pkl`` registry (:139-241).
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.common import NETWORK_INFO_FOLDER, clean_name
from vae_extent_search_tpu.records.networks import (
    build_network_keys,
    get_network_tasks,
)


def trace_model_tasks(name: str, batch_size: int, image_size: int,
                      seq_length: int, target: str):
    """Graph-trace a real model (frontend/) instead of the static
    tables — the reference's relay extraction path
    (relay_integration.py:82-149)."""
    if name.startswith("bert_"):
        from transformers import BertConfig, BertModel

        from vae_extent_search_tpu.frontend.torch_fx import (
            extract_tasks_from_hf,
        )
        from vae_extent_search_tpu.records.networks import _BERT_DIMS

        hidden, layers, heads = _BERT_DIMS[name.split("_", 1)[1]]
        cfg = BertConfig(
            hidden_size=hidden, num_hidden_layers=layers,
            num_attention_heads=heads, intermediate_size=4 * hidden,
            max_position_embeddings=max(512, seq_length))
        return extract_tasks_from_hf(BertModel(cfg), batch_size,
                                     seq_length, target)

    from vae_extent_search_tpu.frontend import (
        build_zoo_model,
        extract_tasks_from_module,
    )

    if name == "dcgan":
        from vae_extent_search_tpu.frontend.zoo import _make_dcgan

        # 224 is the image-size default sentinel; dcgan's native base
        # is 64 px (matches get_network_tasks' convention)
        model = _make_dcgan(64 if image_size == 224 else image_size)
        shape = (batch_size, 100)
    else:
        model = build_zoo_model(name)
        shape = (batch_size, 3, image_size, image_size)
    return extract_tasks_from_module(model, shape, target)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--target", type=str, default="llvm")
    p.add_argument("--networks", nargs="*", default=None)
    p.add_argument("--from-model", type=str, default=None,
                   help="trace a real model graph (zoo/HF name) instead "
                        "of using the static shape tables")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--image-size", type=int, default=224)
    p.add_argument("--seq-length", type=int, default=128)
    args = p.parse_args()

    if args.from_model:
        name = args.from_model
        tasks, weights = trace_model_tasks(
            name, args.batch_size, args.image_size, args.seq_length,
            args.target)
        os.makedirs(NETWORK_INFO_FOLDER, exist_ok=True)
        size = args.seq_length if name.startswith("bert_") \
            else args.image_size
        network_key = (name, [args.batch_size, size])
        out = os.path.join(
            NETWORK_INFO_FOLDER,
            clean_name((network_key, args.target)) + ".task.pkl",
        )
        with open(out, "wb") as f:
            pickle.dump(([t.to_record() for t in tasks], weights), f)
        for t, w in zip(tasks, weights):
            print(f"  w={w:g}  {t.workload_key}")
        print(f"{name} (traced): {len(tasks)} tasks -> {out}")
        return

    os.makedirs(NETWORK_INFO_FOLDER, exist_ok=True)
    all_tasks = {}
    keys = build_network_keys()
    if args.networks:
        keys = [k for k in keys if k[0] in args.networks]

    for name, shape_args in keys:
        try:
            tasks, weights = get_network_tasks(
                name, *shape_args, target=args.target
            )
        except ValueError:
            continue
        network_key = (name, list(shape_args))
        out = os.path.join(
            NETWORK_INFO_FOLDER,
            clean_name((network_key, args.target)) + ".task.pkl",
        )
        with open(out, "wb") as f:
            pickle.dump(([t.to_record() for t in tasks], weights), f)
        for t in tasks:
            all_tasks[(t.workload_key, t.target)] = t.to_record()
        print(f"{name} {shape_args}: {len(tasks)} tasks -> {out}")

    # all_tasks.pkl is the GLOBAL registry across platforms (the
    # reference's spans all its hardware targets): merge with any
    # existing registry so a cuda grid dump does not clobber the llvm
    # one — this-run tasks win on key collisions
    reg_path = os.path.join(NETWORK_INFO_FOLDER, "all_tasks.pkl")
    if os.path.exists(reg_path):
        with open(reg_path, "rb") as f:
            for rec in pickle.load(f):
                all_tasks.setdefault((rec[0], rec[1]), rec)
    with open(reg_path, "wb") as f:
        pickle.dump(list(all_tasks.values()), f)
    print(f"all_tasks.pkl: {len(all_tasks)} unique tasks")


if __name__ == "__main__":
    main()

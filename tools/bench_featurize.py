"""Featurization-throughput benchmark: native vs Python extent pipeline.

Reference comparison (BASELINE.md): the C++ per-store featurizer processes
~77k records/s on a 36-vCPU c5.9xlarge (~2.1k records/s/core). This tool
measures our native extent pipeline (mmap parse + schedule replay + bound
inference + extent extraction) in records/s/core.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    from vae_extent_search_tpu.records import SearchTask, make_workload_key
    from vae_extent_search_tpu.records.fast_parser import (
        featurize_extents_native,
    )
    from vae_extent_search_tpu.search.measure import (
        AnalyticRunner,
        EmptyBuilder,
        ProgramMeasurer,
        RecordToFile,
    )
    from vae_extent_search_tpu.search.sketch import make_states

    path = "/tmp/bench_featurize_records.json"
    if not os.path.exists(path):
        task = SearchTask(
            make_workload_key(
                "conv2d_layer", (1, 14, 14, 128, 128, 3, 3, [1, 1], [1, 1])
            ),
            "cuda -keys=cuda,gpu",
        )
        states = make_states(task, 4000, evo_population=1024,
                             min_population=100, seed=1)
        measurer = ProgramMeasurer(
            EmptyBuilder(), AnalyticRunner(noise=0.2),
            callbacks=[RecordToFile(path)],
        )
        for s in range(0, len(states), 256):
            measurer.measure(task, states[s:s + 256])
        print(f"generated {len(states)} records")

    # warm (registry/dag caches)
    featurize_extents_native(path, python_fallback=False)
    t0 = time.perf_counter()
    vecs, labels, status = featurize_extents_native(path,
                                                    python_fallback=False)
    dt = time.perf_counter() - t0
    n = len(labels)
    ok = int((status == 0).sum())
    print(f"native: {n} records in {dt*1000:.0f}ms = {n/dt:,.0f} rec/s/core "
          f"({ok} native-ok)")
    print(f"reference per-core baseline: ~2,100 rec/s/core "
          f"(77k rec/s on 36 vCPU); ours = {n/dt/2100:.1f}x per core")

    # per-store 164-dim featurizer (the reference's actual feature.cc path)
    from vae_extent_search_tpu.records.fast_parser import (
        featurize_perstore_native,
    )

    featurize_perstore_native(path, python_fallback=False)  # warm
    t0 = time.perf_counter()
    feats, status = featurize_perstore_native(path, python_fallback=False)
    dt = time.perf_counter() - t0
    ok = int((status == 0).sum())
    print(f"per-store native: {n} records in {dt*1000:.0f}ms = "
          f"{n/dt:,.0f} rec/s/core ({ok} native-ok); "
          f"= {n/dt/2100:.1f}x reference per core")


if __name__ == "__main__":
    main()

"""Two-process multihost test worker (spawned by test_multihost.py).

Joins the jax.distributed cluster from VES_* env vars, takes its
disjoint task shard of the given record corpus, and writes the shard
to its own append-only log — the per-host half of the DCN sweep
contract (parallel/multihost.py)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vae_extent_search_tpu.parallel.multihost import (  # noqa: E402
    maybe_initialize_distributed,
    shard_tasks,
)


def main():
    corpus, out_log, report = sys.argv[1], sys.argv[2], sys.argv[3]
    pid, count = maybe_initialize_distributed()
    assert count == 2, count

    with open(corpus) as f:
        lines = [ln.rstrip("\n") for ln in f if ln.strip()][:8]
    my_lines = shard_tasks(lines)

    # cross-process agreement: every process must see the same global
    # device list (the DCN cluster actually formed)
    import jax

    n_global = len(jax.devices())
    n_local = len(jax.local_devices())

    with open(out_log, "w") as f:
        for ln in my_lines:
            f.write(ln + "\n")
    with open(report, "w") as f:
        json.dump({"pid": pid, "count": count, "n": len(my_lines),
                   "global_devices": n_global,
                   "local_devices": n_local}, f)


if __name__ == "__main__":
    main()

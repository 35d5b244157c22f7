"""Multi-host runtime: jax.distributed init + DCN-level task sharding.

The reference scales measurement across machines with an SSH fleet
(scripts/collect_aws/collect_master.py fans out per-task shards of
measure_programs.py; the RPC tracker fans out single measurements).
The TPU-native equivalent is a JAX multi-host pod: every host runs the
same program, ``jax.distributed.initialize`` wires the cluster over
DCN, tasks shard disjointly by ``process_index`` (one task = one
independent search — exactly the reference's --start/end/step-idx
contract), and the per-host append-only record logs merge afterwards
(records stay v0.6 bit-compatible, so merging is line concatenation +
dedup).

Env contract (mirrors jax's own cluster-env conventions):

- ``VES_COORDINATOR``   host:port of process 0's coordinator service
- ``VES_NUM_PROCESSES`` total process count
- ``VES_PROCESS_ID``    this process's id (0-based)

When none are set (single host, or an environment like Cloud TPU where
jax auto-detects the cluster), ``maybe_initialize_distributed`` is a
no-op that just reports (process_index, process_count).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple


def maybe_initialize_distributed(
        coordinator: Optional[str] = None,
        num_processes: Optional[int] = None,
        process_id: Optional[int] = None,
        timeout_s: int = 60) -> Tuple[int, int]:
    """Initialize jax.distributed when a cluster is configured; return
    (process_index, process_count).

    Explicit args win over the VES_* env vars; with neither present
    this is a no-op (jax may still auto-detect a TPU pod environment
    through its own cluster plugins on import)."""
    import jax

    coordinator = coordinator or os.environ.get("VES_COORDINATOR")
    if coordinator:
        num_processes = int(num_processes
                            or os.environ["VES_NUM_PROCESSES"])
        process_id = int(process_id
                         if process_id is not None
                         else os.environ["VES_PROCESS_ID"])
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
            initialization_timeout=timeout_s,
        )
    return jax.process_index(), jax.process_count()


def shard_tasks(tasks: Sequence, process_index: Optional[int] = None,
                process_count: Optional[int] = None) -> List:
    """This host's disjoint round-robin task shard. Round-robin (not
    contiguous blocks) so the grid's expensive networks spread evenly —
    the same layout the reference's collect_master uses for its
    per-worker file shards."""
    if process_index is None or process_count is None:
        import jax

        process_index = jax.process_index()
        process_count = jax.process_count()
    return list(tasks)[process_index::process_count]


def merge_record_logs(in_paths: Sequence[str], out_path: str,
                      dedup: bool = True) -> int:
    """Concatenate per-host record logs into one (the post-sweep gather
    step — reference collect_master zips+scps worker logs home).
    Returns the number of lines written. Lines are already v0.6
    bit-compatible JSON; dedup drops byte-identical lines (a re-run
    host appends duplicates, same as the reference's append-only
    logs)."""
    seen = set()
    if dedup and os.path.exists(out_path):
        # idempotence: a retried gather must not double-count lines
        # already merged
        with open(out_path) as f:
            seen.update(ln.rstrip("\n") for ln in f if ln.strip())
    out_real = os.path.realpath(out_path)
    n = 0
    with open(out_path, "a") as out:
        for path in in_paths:
            if not os.path.exists(path) \
                    or os.path.realpath(path) == out_real:
                continue
            with open(path) as f:
                for line in f:
                    line = line.rstrip("\n")
                    if not line:
                        continue
                    if dedup:
                        if line in seen:
                            continue
                        seen.add(line)
                    out.write(line + "\n")
                    n += 1
    return n

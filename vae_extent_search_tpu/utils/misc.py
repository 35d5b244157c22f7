"""Small shared utilities.

Parity targets: python/tvm/auto_scheduler/utils.py (array_mean :415,
to_str_round :415-440), vae_experiments/util_manager.py (PathManager
:125-210, seed_everything :17-25), and the tracing story of SURVEY §5
(wall-clock instrumentation + jax.profiler traces as the TPU equivalent of
the reference's inline timers / USE_NCU hook).
"""

from __future__ import annotations

import contextlib
import os
import random
import time
from typing import Optional


def seed_everything(seed: int = 2023):
    """Global seeding (reference util_manager.py:17-25; torch parts become
    the jax PRNG keys callers derive from the seed)."""
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    import numpy as np

    np.random.seed(seed)
    return seed


def array_mean(arr) -> float:
    """Mean of a cost array (reference utils.py array_mean)."""
    vals = [float(x) for x in arr]
    return sum(vals) / max(1, len(vals))


def to_str_round(x, decimal: int = 6):
    """Readable rounded rendering of nested floats (reference utils.py)."""
    if isinstance(x, (list, tuple)):
        return "[" + ", ".join(to_str_round(e, decimal) for e in x) + "]"
    if isinstance(x, dict):
        return str({k: to_str_round(v, decimal) for k, v in x.items()})
    if isinstance(x, (int,)):
        return str(x)
    if isinstance(x, float):
        fmt = "%%.%df" % decimal
        return fmt % x
    return str(x)


@contextlib.contextmanager
def trace_profile(logdir: Optional[str] = None, enabled: bool = True):
    """jax.profiler trace scope — the TPU-native replacement for the
    reference's USE_NCU Nsight hook (vae_experiments/ansor.py:5,16) and
    inline GA timers (sketch_policy.cc:568-580). Produces a TensorBoard-
    loadable trace under ``logdir``."""
    if not enabled or logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PathManager:
    """Experiment artifact path scheme (reference util_manager.py:125-210:
    json/tsv/tasks-pkl path derivation from network + target names)."""

    def __init__(self, root: str = "dataset", network: str = "network",
                 target: str = "llvm"):
        self.root = root
        self.network = network
        self.target_kind = target.split()[0] if target else target

    def _clean(self, x) -> str:
        x = str(x)
        for ch in (" ", '"', "/"):
            x = x.replace(ch, "")
        return x

    @property
    def network_info_dir(self):
        return os.path.join(self.root, "network_info")

    @property
    def to_measure_dir(self):
        return os.path.join(self.root, "to_measure_programs")

    @property
    def records_dir(self):
        return os.path.join(self.root, "measure_records")

    def task_pkl(self):
        return os.path.join(
            self.network_info_dir,
            self._clean((self.network, self.target_kind)) + ".task.pkl",
        )

    def record_log(self, workload_key: str):
        return os.path.join(
            self.records_dir,
            self._clean((workload_key, self.target_kind)) + ".json",
        )

    def latency_tsv(self):
        return os.path.join(self.root, f"{self.network}_total_latency.tsv")

    def makedirs(self):
        for d in (self.network_info_dir, self.to_measure_dir,
                  self.records_dir):
            os.makedirs(d, exist_ok=True)
        return self

    # -- cached task lists (reference util_manager.py:183-210:
    #    tasks_pkl_check / save / use) --
    def tasks_pkl_check(self) -> bool:
        return os.path.exists(self.task_pkl())

    def tasks_pkl_save(self, tasks, weights):
        import pickle

        self.makedirs()
        with open(self.task_pkl(), "wb") as f:
            pickle.dump(([t.to_record() for t in tasks], list(weights)), f)

    def tasks_pkl_use(self):
        """(tasks, weights) from the cache, or None."""
        import pickle

        if not self.tasks_pkl_check():
            return None
        from ..records.task import SearchTask

        with open(self.task_pkl(), "rb") as f:
            recs, weights = pickle.load(f)
        return [SearchTask.from_record(r) for r in recs], weights


class RotatingLog:
    """Size-capped debug log (reference util_manager.py:217-258
    GDBManager rotation)."""

    def __init__(self, path: str, max_bytes: int = 4 * 1024 * 1024,
                 keep: int = 3):
        self.path = path
        self.max_bytes = max_bytes
        self.keep = keep

    def write(self, line: str):
        if os.path.exists(self.path) and \
                os.path.getsize(self.path) > self.max_bytes:
            # shift name.(i) -> name.(i+1), dropping the oldest
            for i in range(self.keep - 1, 0, -1):
                src = f"{self.path}.{i}"
                if os.path.exists(src):
                    os.replace(src, f"{self.path}.{i + 1}")
            os.replace(self.path, f"{self.path}.1")
        with open(self.path, "a") as f:
            f.write(f"[{time.strftime('%H:%M:%S')}] {line}\n")


def call_func_with_timeout(timeout: float, func, args=(), kwargs=None):
    """Run ``func`` in a child process with a hard timeout (reference
    utils.py:306 call_func_with_timeout + kill_child_processes): returns
    the result, or a TimeoutError/Exception instance on failure. Used
    around external builders/runners that may hang."""
    import multiprocessing as mp

    def _worker(q, func, args, kwargs):
        try:
            q.put(("ok", func(*args, **(kwargs or {}))))
        except Exception as e:  # pragma: no cover - child-side
            q.put(("err", repr(e)))

    ctx = mp.get_context("fork")
    q = ctx.Queue(1)
    proc = ctx.Process(target=_worker, args=(q, func, args, kwargs))
    proc.start()
    proc.join(timeout)
    if proc.is_alive():
        proc.terminate()
        proc.join()
        return TimeoutError(f"timed out after {timeout}s")
    try:
        kind, payload = q.get_nowait()
    except Exception:
        return RuntimeError("child produced no result")
    if kind == "err":
        return RuntimeError(payload)
    return payload

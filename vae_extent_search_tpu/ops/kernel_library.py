"""Tuned-kernel dispatch: ApplyHistoryBest for the framework's own kernels.

The reference's production story is two-stage: tune once, then every
``relay.build`` consults ``ApplyHistoryBest`` to compile with the best
recorded schedule (reference python/tvm/auto_scheduler/dispatcher.py:149-308,
mirrored in records/dispatcher.py).  The TPU-native analogue closes the
self-tuning loop (scripts/tune_pallas_kernel.py): tuning logs hold measured
Pallas schedules — the state IS the schedule, the cost IS seconds of the
Pallas kernel it quotients onto — and this library replays them into block
configs so the framework's own matmul/conv2d calls run tuned, falling back
to XLA when no record matches.

Query semantics match the reference dispatcher: exact (workload name, args)
first, then the min dis-factor-scaled compatible workload
(reference utils.py:82-130), with the record's ``-model=<dtype>`` target
attribute playing the reference's best_by_model role (dispatcher.py:227-261:
records partition by hardware model; here the "model" is the operand dtype
the kernel was timed with).
"""

from __future__ import annotations

import os
import threading
from typing import Dict, Iterable, Optional, Tuple

from ..records.dispatcher import (
    calc_workload_dis_factor,
    decode_workload_key_flat,
    target_model_of,
)
from ..records.serde import MeasureRecord, iter_records
from ..records.workload import make_workload_key

# One tuning-log record provides a block config for any query whose args it
# divides (the reference accepts any finite dis-factor, dispatcher.py:263-308)
# — but a config tuned for a 16x-larger problem is a poor prior, so cap it.
MAX_DIS_FACTOR = 1024.0


class PallasKernelLibrary:
    """Best tuned Pallas schedule per (workload, dtype) from measure logs."""

    def __init__(self, records: Optional[Iterable[MeasureRecord]] = None,
                 include_compatible: bool = True):
        self.include_compatible = include_compatible
        # (name, flat args, dtype) -> (mean cost seconds, MeasureRecord)
        self._best: Dict[tuple, Tuple[float, MeasureRecord]] = {}
        self._config_cache: Dict[tuple, Optional[Tuple[int, ...]]] = {}
        if records is not None:
            self.update(records)

    @classmethod
    def from_file(cls, path: str, **kw) -> "PallasKernelLibrary":
        return cls(iter_records(path), **kw)

    @classmethod
    def from_files(cls, paths: Iterable[str], **kw) -> "PallasKernelLibrary":
        lib = cls(**kw)
        for p in paths:
            lib.update(iter_records(p))
        return lib

    def __len__(self) -> int:
        return len(self._best)

    def update(self, records: Iterable[MeasureRecord]):
        for rec in records:
            if rec.res.error_no != 0:
                continue
            name, args = decode_workload_key_flat(rec.inp.task.workload_key)
            if args is None:
                continue
            dtype = target_model_of(rec.inp.task.target)
            key = (name, args, dtype)
            cost = rec.res.mean_cost
            cur = self._best.get(key)
            if cur is None or cost < cur[0]:
                self._best[key] = (cost, rec)
        self._config_cache.clear()

    # -- dispatcher-semantics query --------------------------------------

    def query(self, workload_key: str, dtype: str = "bfloat16",
              ) -> Optional[MeasureRecord]:
        """Best record for the workload: exact args, else min
        dis-factor-scaled compatible args (reference dispatcher.py:263-308).
        Records tuned under a different dtype never match — block validity
        (sublane alignment, VMEM) is dtype-dependent."""
        name, args = decode_workload_key_flat(workload_key)
        exact = self._best.get((name, args, dtype))
        if exact is not None:
            return exact[1]
        if not self.include_compatible or args is None:
            return None
        best_score, best_rec = float("inf"), None
        for (r_name, r_args, r_dtype), (cost, rec) in self._best.items():
            if r_name != name or r_dtype != dtype:
                continue
            factor = calc_workload_dis_factor((name, args), (r_name, r_args))
            if factor > MAX_DIS_FACTOR:
                continue
            score = factor * cost
            if score < best_score:
                best_score, best_rec = score, rec
        return best_rec

    def query_nearest(self, workload_key: str, dtype: str = "bfloat16",
                      max_log_ratio: float = None,
                      ) -> Optional[MeasureRecord]:
        """Nearest tuned record by log-shape distance (sum of
        |log(query_arg / record_arg)| over numeric args).

        The reference's divisibility-based dis-factor is the right
        compatibility rule for conv/matmul schedules (a tile plan for N
        divides onto N/2), but it is meaningless for the framework's own
        kernel families whose args are row counts and feature censuses
        (gbdt_hist_layer) or pool sizes (fused_head_layer) — 800k rows
        is not "incompatible" with a ladder tuned at 120k rows just
        because 800000 % 120000 != 0. Those configs re-plan/re-snap onto
        the query shape anyway (plan_tiers_multi / snap_fused_config),
        so the tuned record is a transferable prior and the nearest
        shape is the best one."""
        import math

        if max_log_ratio is None:
            max_log_ratio = math.log(MAX_DIS_FACTOR)
        name, args = decode_workload_key_flat(workload_key)
        exact = self._best.get((name, args, dtype))
        if exact is not None:
            return exact[1]
        if args is None:
            return None
        best_d, best_rec = float("inf"), None
        for (r_name, r_args, r_dtype), (cost, rec) in self._best.items():
            if r_name != name or r_dtype != dtype or r_args is None \
                    or len(r_args) != len(args):
                continue
            d, ok = 0.0, True
            for ta, a in zip(args, r_args):
                num = (isinstance(ta, (int, float))
                       and isinstance(a, (int, float)))
                if num and ta > 0 and a > 0:
                    d += abs(math.log(ta / a))
                elif ta != a:
                    ok = False
                    break
            if ok and d <= max_log_ratio and d < best_d:
                best_d, best_rec = d, rec
        return best_rec

    # -- workload-specific config lookups ---------------------------------

    def matmul_config(self, M: int, N: int, K: int,
                      dtype: str = "bfloat16",
                      ) -> Optional[Tuple[int, int, int]]:
        """Tuned (bm, bn, bk) for an [M,K]@[K,N] matmul, snapped onto the
        query shape's Mosaic-legal lattice (a compatible record tuned at a
        larger shape re-snaps to divisors of THIS shape, the same way the
        reference applies a compatible schedule to the queried workload)."""
        import jax.numpy as jnp

        from .matmul_pallas import config_is_valid, snap_config_to_hw
        from ..search.pallas_tuner import state_to_matmul_config

        cache_key = ("matmul", M, N, K, dtype)
        if cache_key in self._config_cache:
            return self._config_cache[cache_key]
        # workload arg order per records/workload_library.py:77
        # matmul_auto_scheduler_test(N=M_pallas, M=N_pallas, K)
        wk = make_workload_key("matmul_auto_scheduler_test", (M, N, K))
        cfg: Optional[Tuple[int, int, int]] = None
        rec = self.query(wk, dtype)
        if rec is not None:
            raw, _why = state_to_matmul_config(rec.inp.recover_state())
            if raw is not None:
                snapped = snap_config_to_hw(M, N, K, *raw,
                                            dtype=jnp.dtype(dtype))
                if config_is_valid(M, N, K, *snapped,
                                   dtype=jnp.dtype(dtype))[0]:
                    cfg = snapped
        self._config_cache[cache_key] = cfg
        return cfg

    def conv2d_config(self, N: int, H: int, W: int, CO: int, CI: int,
                      KH: int, KW: int, stride: int, pad: int,
                      dtype: str = "bfloat16",
                      ) -> Optional[Tuple[int, int, int]]:
        """Tuned (boh, bco, bci) for a conv2d_layer workload."""
        import jax.numpy as jnp

        from .conv2d_pallas import (conv_config_is_valid,
                                    snap_conv_config_to_hw)
        from ..search.pallas_tuner import state_to_conv_config

        params = (N, H, W, CO, CI, KH, KW, stride, pad)
        cache_key = ("conv2d",) + params + (dtype,)
        if cache_key in self._config_cache:
            return self._config_cache[cache_key]
        wk = make_workload_key(
            "conv2d_layer",
            (N, H, W, CO, CI, KH, KW, [stride, stride], [pad, pad]))
        cfg: Optional[Tuple[int, int, int]] = None
        rec = self.query(wk, dtype)
        if rec is not None:
            raw, _why = state_to_conv_config(rec.inp.recover_state())
            if raw is not None:
                snapped = snap_conv_config_to_hw(
                    *params, *raw, dtype=jnp.dtype(dtype))
                if conv_config_is_valid(*params, *snapped,
                                        dtype=jnp.dtype(dtype))[0]:
                    cfg = snapped
        self._config_cache[cache_key] = cfg
        return cfg

    def fused_head_config(self, N: int, D: int, H: int, L: int, T: int,
                          dtype: str = "bfloat16",
                          ) -> Optional[Tuple[int, int]]:
        """Tuned (block, mc_chunk) for the fused selection-head kernel
        (ops/fused_head_pallas.py), re-snapped onto the query shape's
        lattice like matmul_config."""
        import jax.numpy as jnp

        from .fused_head_pallas import snap_fused_config
        from ..search.pallas_tuner import state_to_fusedhead_config

        cache_key = ("fused_head", N, D, H, L, T, dtype)
        if cache_key in self._config_cache:
            return self._config_cache[cache_key]
        wk = make_workload_key("fused_head_layer", (N, D, H, L, T))
        cfg: Optional[Tuple[int, int]] = None
        rec = self.query_nearest(wk, dtype)
        if rec is not None:
            raw, _why = state_to_fusedhead_config(rec.inp.recover_state())
            if raw is not None:
                cfg = snap_fused_config(N, D, H, L, T, *raw,
                                        dtype=jnp.dtype(dtype))
        self._config_cache[cache_key] = cfg
        return cfg

    def hist_ladder(self, R: int, F: int, c2: int, c16: int, c64: int,
                    c128: int) -> Optional[Tuple[int, ...]]:
        """Tuned histogram tier ladder for a (rows, feature-census)
        shape of the device GBDT (models/boost_tpu.py); () = flat.
        Returns None when no record matches — the caller keeps its
        hand-set default ladder."""
        from ..search.pallas_tuner import state_to_hist_ladder

        cache_key = ("hist_ladder", R, F, c2, c16, c64, c128)
        if cache_key in self._config_cache:
            return self._config_cache[cache_key]
        wk = make_workload_key("gbdt_hist_layer", (R, F, c2, c16, c64, c128))
        cfg: Optional[Tuple[int, ...]] = None
        # ladder records carry no dtype role; they are written with the
        # runner's default bfloat16 target model
        rec = self.query_nearest(wk, "bfloat16")
        if rec is not None:
            raw, _why = state_to_hist_ladder(rec.inp.recover_state())
            if raw is not None:
                cfg = raw
        self._config_cache[cache_key] = cfg
        return cfg

    # -- dispatching op builders ------------------------------------------

    def matmul(self, M: int, N: int, K: int, dtype: str = "bfloat16",
               interpret: bool = False):
        """``(fn(a[M,K], b[K,N]) -> c[M,N] f32, provenance)`` — the tuned
        Pallas kernel when a record matches, XLA's dot otherwise (the
        reference's ApplyHistoryBestOrSample fallback role,
        dispatcher.py:179-258, minus sampling: XLA is already a strong
        default on TPU, random schedules are not)."""
        cfg = self.matmul_config(M, N, K, dtype)
        if cfg is not None:
            from .matmul_pallas import make_matmul

            return (make_matmul(M, N, K, *cfg, dtype_name=dtype,
                                interpret=interpret),
                    ("pallas",) + cfg)
        import jax.numpy as jnp

        jdt = jnp.dtype(dtype)

        def mm(a, b):
            return jnp.dot(a.astype(jdt), b.astype(jdt),
                           preferred_element_type=jnp.float32)

        return mm, ("xla",)

    def conv2d(self, N: int, H: int, W: int, CO: int, CI: int,
               KH: int, KW: int, stride: int, pad: int,
               dtype: str = "bfloat16", interpret: bool = False):
        """``(fn(x, w, bias) -> relu(conv+bias), provenance)``."""
        params = (N, H, W, CO, CI, KH, KW, stride, pad)
        cfg = self.conv2d_config(*params, dtype=dtype)
        if cfg is not None:
            from .conv2d_pallas import make_conv2d

            return (make_conv2d(*params, *cfg, dtype_name=dtype,
                                interpret=interpret),
                    ("pallas",) + cfg)
        from .conv2d_pallas import xla_conv2d_reference

        return xla_conv2d_reference(*params, dtype_name=dtype), ("xla",)


# -- process-default library (env-configured, like the reference's global
#    DispatchContext.current that relay.build consults implicitly) ----------

LIBRARY_ENV = "VES_KERNEL_LIBRARY"
# `VES_KERNEL_LIBRARY=none|off|0` disables dispatch entirely (every call
# falls back to the hand defaults / XLA)
LIBRARY_OFF_VALUES = frozenset({"none", "off", "0"})
_default_lock = threading.Lock()
_default: Optional[PallasKernelLibrary] = None
_default_env: Optional[str] = None


def committed_log_paths() -> list:
    """The tuning logs shipped with the repo (``result/selftune/*.json``
    at the repo root): chip-measured schedules for the framework's own
    fused-head, GBDT-histogram, matmul and conv2d kernels
    (docs/SELF_TUNING.md). Empty when the package runs detached from
    the repo checkout."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    d = os.path.join(root, "result", "selftune")
    if not os.path.isdir(d):
        return []
    return sorted(os.path.join(d, f) for f in os.listdir(d)
                  if f.endswith(".json"))


def default_library() -> PallasKernelLibrary:
    """The process-wide library. Like the reference, where every
    ``relay.build`` implicitly consults ApplyHistoryBest
    (dispatcher.py:149-261), tuned records apply by default: with
    ``VES_KERNEL_LIBRARY`` unset (or empty) the committed tuning logs
    (``result/selftune/``) load. Set it to an ``os.pathsep``-separated
    list of tuning logs to use those instead, or to ``none``/``off``/``0``
    to disable dispatch (hand defaults / XLA everywhere). Reloads when
    the env var changes."""
    global _default, _default_env
    env = os.environ.get(LIBRARY_ENV, "")
    with _default_lock:
        if _default is None or env != _default_env:
            if env.strip().lower() in LIBRARY_OFF_VALUES:
                paths = []
            elif env == "":
                paths = committed_log_paths()
            else:
                paths = [p for p in env.split(os.pathsep)
                         if p and os.path.exists(p)]
            _default = PallasKernelLibrary.from_files(paths)
            _default_env = env
        return _default


def tuned_matmul(M: int, N: int, K: int, dtype: str = "bfloat16",
                 interpret: bool = False):
    """Dispatch an [M,K]@[K,N] matmul through the default library."""
    return default_library().matmul(M, N, K, dtype, interpret=interpret)


def tuned_conv2d(N: int, H: int, W: int, CO: int, CI: int,
                 KH: int, KW: int, stride: int, pad: int,
                 dtype: str = "bfloat16", interpret: bool = False):
    """Dispatch a conv2d+bias+relu through the default library."""
    return default_library().conv2d(N, H, W, CO, CI, KH, KW, stride, pad,
                                    dtype, interpret=interpret)


def tuned_fused_head_config(N: int, D: int, H: int, L: int, T: int,
                            dtype: str = "bfloat16",
                            ) -> Optional[Tuple[int, int]]:
    """Tuned (block, mc_chunk) for the fused selection head, or None
    (callers keep the hand defaults 1024/auto)."""
    return default_library().fused_head_config(N, D, H, L, T, dtype)


def tuned_hist_ladder(R: int, F: int, c2: int, c16: int, c64: int,
                      c128: int) -> Optional[Tuple[int, ...]]:
    """Tuned GBDT histogram tier ladder for a (rows, census) shape, or
    None (callers keep the default {2,16,64,128} ladder)."""
    return default_library().hist_ladder(R, F, c2, c16, c64, c128)

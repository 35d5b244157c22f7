"""ctypes binding for the native NDJSON record parser.

The native layer (csrc/record_parser.cpp) mmaps a record log and emits
flat arrays: an int32 step-token stream + per-record offsets/costs and an
interned string pool — the TPU-era equivalent of the reference's C++
RecordReader hot loop (measure_record.cc:328-371). ``load_records_fast``
reconstructs the same MeasureRecord objects as ``serde.load_records`` but
parses natively; ``load_raw`` returns the flat arrays for zero-copy
pipelines (e.g., batch replay / featurization without Python objects).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB = None

_STEP_KINDS = ["AN", "FU", "PR", "RE", "SP", "FSP", "FFSP", "SA", "CA",
               "CI", "CR", "CHR", "CHW", "RF"]


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "native", "libves_native.so")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"{path} missing — run scripts/build_native.sh"
        )
    lib = ctypes.CDLL(path)
    lib.ves_parse_file.restype = ctypes.c_void_p
    lib.ves_parse_file.argtypes = [ctypes.c_char_p, ctypes.c_int64]
    for name, restype in [
        ("ves_num_records", ctypes.c_int64),
        ("ves_num_tasks", ctypes.c_int64),
        ("ves_num_step_tokens", ctypes.c_int64),
        ("ves_string_pool_size", ctypes.c_int64),
        ("ves_num_strings", ctypes.c_int64),
    ]:
        getattr(lib, name).restype = restype
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    for name, ctype in [
        ("ves_step_tokens", ctypes.c_int32),
        ("ves_rec_task_id", ctypes.c_int32),
        ("ves_rec_error_no", ctypes.c_int32),
        ("ves_task_wkl_str", ctypes.c_int32),
        ("ves_task_target_str", ctypes.c_int32),
        ("ves_rec_step_begin", ctypes.c_int64),
        ("ves_rec_step_end", ctypes.c_int64),
        ("ves_string_offsets", ctypes.c_int64),
        ("ves_rec_mean_cost", ctypes.c_double),
        ("ves_rec_first_cost", ctypes.c_double),
    ]:
        getattr(lib, name).restype = ctypes.POINTER(ctype)
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.ves_string_pool.restype = ctypes.POINTER(ctypes.c_char)
    lib.ves_string_pool.argtypes = [ctypes.c_void_p]
    lib.ves_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


class RawRecords:
    """Flat parsed arrays (copies owned by numpy; native handle freed)."""

    def __init__(self, handle, lib):
        n = lib.ves_num_records(handle)
        nt = lib.ves_num_step_tokens(handle)
        ns = lib.ves_num_strings(handle)
        ntask = lib.ves_num_tasks(handle)
        self.step_tokens = np.ctypeslib.as_array(
            lib.ves_step_tokens(handle), (max(nt, 1),)
        )[:nt].copy()
        self.step_begin = np.ctypeslib.as_array(
            lib.ves_rec_step_begin(handle), (max(n, 1),))[:n].copy()
        self.step_end = np.ctypeslib.as_array(
            lib.ves_rec_step_end(handle), (max(n, 1),))[:n].copy()
        self.task_id = np.ctypeslib.as_array(
            lib.ves_rec_task_id(handle), (max(n, 1),))[:n].copy()
        self.mean_cost = np.ctypeslib.as_array(
            lib.ves_rec_mean_cost(handle), (max(n, 1),))[:n].copy()
        self.first_cost = np.ctypeslib.as_array(
            lib.ves_rec_first_cost(handle), (max(n, 1),))[:n].copy()
        self.error_no = np.ctypeslib.as_array(
            lib.ves_rec_error_no(handle), (max(n, 1),))[:n].copy()
        pool = ctypes.string_at(
            lib.ves_string_pool(handle), lib.ves_string_pool_size(handle)
        )
        offs = np.ctypeslib.as_array(
            lib.ves_string_offsets(handle), (max(ns, 1),))[:ns].copy()
        self.strings = []
        for i in range(ns):
            end = offs[i + 1] - 1 if i + 1 < ns else len(pool) - 1
            self.strings.append(pool[offs[i]:end].decode())
        self.task_workload = [
            self.strings[i]
            for i in np.ctypeslib.as_array(
                lib.ves_task_wkl_str(handle), (max(ntask, 1),))[:ntask]
        ]
        self.task_target = [
            self.strings[i]
            for i in np.ctypeslib.as_array(
                lib.ves_task_target_str(handle), (max(ntask, 1),))[:ntask]
        ]

    def __len__(self):
        return len(self.task_id)

    def decode_steps(self, rec_idx: int) -> List[list]:
        """Step records (same structure as json) for one record."""
        toks = self.step_tokens
        i = int(self.step_begin[rec_idx])
        end = int(self.step_end[rec_idx])
        out = []
        while i < end:
            kind = _STEP_KINDS[toks[i]]
            n = int(toks[i + 1])
            i += 2
            args = []
            j = i
            while j < i + n:
                v = int(toks[j])
                if v <= -1000000:
                    args.append(self.strings[-1000000 - v])
                    j += 1
                elif v < 0:  # list marker -(len+1)
                    ln = -v - 1
                    args.append([int(x) for x in toks[j + 1:j + 1 + ln]])
                    j += 1 + ln
                else:
                    args.append(v)
                    j += 1
            i += n
            out.append([kind] + args)
        return out


def load_raw(path: str, max_lines: int = -1) -> RawRecords:
    lib = _load_lib()
    handle = lib.ves_parse_file(path.encode(), max_lines)
    if not handle:
        raise IOError(f"native parse failed for {path}")
    try:
        return RawRecords(handle, lib)
    finally:
        lib.ves_free(handle)


def load_records_fast(path: str, max_lines: Optional[int] = None):
    """MeasureRecord list via the native parser (serde-compatible)."""
    from .serde import MeasureInput, MeasureRecord, MeasureResult
    from .task import SearchTask

    raw = load_raw(path, -1 if max_lines is None else max_lines)
    tasks = [
        SearchTask(wk, tgt)
        for wk, tgt in zip(raw.task_workload, raw.task_target)
    ]
    out = []
    for i in range(len(raw)):
        steps = raw.decode_steps(i)
        res = MeasureResult([float(raw.mean_cost[i])],
                            int(raw.error_no[i]), 0.0, 0.0)
        out.append(MeasureRecord(
            MeasureInput(tasks[raw.task_id[i]], steps), res
        ))
    return out


# ---------------------------------------------------------------------------
# Native batch extent featurization (csrc/extent_featurizer.cpp)
# ---------------------------------------------------------------------------


def _load_fx(lib):
    if getattr(lib, "_fx_ready", False):
        return lib
    lib.ves_featurize_extents.restype = ctypes.c_void_p
    lib.ves_featurize_extents.argtypes = [
        ctypes.POINTER(ctypes.c_int32),  # task desc
        ctypes.POINTER(ctypes.c_int32),  # step tokens
        ctypes.POINTER(ctypes.c_int64),  # rec begin
        ctypes.POINTER(ctypes.c_int64),  # rec end
        ctypes.c_int64,                  # n recs
        ctypes.POINTER(ctypes.c_char),   # string pool
        ctypes.POINTER(ctypes.c_int64),  # string offsets
        ctypes.c_int,                    # n threads
    ]
    lib.ves_fx_extents.restype = ctypes.POINTER(ctypes.c_float)
    lib.ves_fx_extents.argtypes = [ctypes.c_void_p]
    lib.ves_fx_num_extents.restype = ctypes.c_int64
    lib.ves_fx_num_extents.argtypes = [ctypes.c_void_p]
    lib.ves_fx_offsets.restype = ctypes.POINTER(ctypes.c_int64)
    lib.ves_fx_offsets.argtypes = [ctypes.c_void_p]
    lib.ves_fx_status.restype = ctypes.POINTER(ctypes.c_int32)
    lib.ves_fx_status.argtypes = [ctypes.c_void_p]
    lib.ves_fx_free.argtypes = [ctypes.c_void_p]
    lib._fx_ready = True
    return lib


def featurize_extents_native(path: str, n_threads: int = 1,
                             python_fallback: bool = True):
    """Batch extent featurization through the native pipeline.

    Returns (extent vectors: list of float32 arrays, labels [n] float32,
    statuses [n] int32: 0 native, 1 python-fallback, 2 error/skipped).
    Labels are -log(mean cost + 1e-8); error records and costs > 1e6 get
    status 2 (reference print_programs.py:23 filter).
    """
    from ..features.extent import label_from_costs
    from .serde import record_from_json
    from .task_desc import NonAffineError, build_task_desc
    from .workload import workload_key_to_dag

    lib = _load_fx(_load_lib())

    # parse once; keep the handle alive during featurization
    handle = lib.ves_parse_file(path.encode(), -1)
    if not handle:
        raise IOError(f"native parse failed for {path}")
    try:
        raw = RawRecords(handle, lib)
        n = len(raw)
        if n == 0:
            return [], np.zeros(0, np.float32), np.zeros(0, np.int32)
        dag = workload_key_to_dag(raw.task_workload[0])
        try:
            desc = build_task_desc(dag)
            native_ok = True
        except NonAffineError:
            native_ok = False

        vecs = [None] * n
        statuses = np.full(n, 2, np.int32)
        labels = np.zeros(n, np.float32)
        for i in range(n):
            ok = raw.error_no[i] == 0 and raw.first_cost[i] <= 1e6
            if ok:
                labels[i] = label_from_costs([raw.mean_cost[i]])
                statuses[i] = 1  # provisional: python fallback

        if native_ok:
            step_tokens = np.ascontiguousarray(raw.step_tokens)
            begin = np.ascontiguousarray(raw.step_begin)
            end = np.ascontiguousarray(raw.step_end)
            pool = "\x00".join(raw.strings).encode() + b"\x00"
            offs = np.zeros(len(raw.strings), np.int64)
            o = 0
            for k, s in enumerate(raw.strings):
                offs[k] = o
                o += len(s.encode()) + 1
            fx = lib.ves_featurize_extents(
                desc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                step_tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                begin.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                end.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                n,
                pool,
                offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                n_threads,
            )
            try:
                total = lib.ves_fx_num_extents(fx)
                ext = np.ctypeslib.as_array(
                    lib.ves_fx_extents(fx), (max(total, 1),))[:total].copy()
                fx_offs = np.ctypeslib.as_array(
                    lib.ves_fx_offsets(fx), (n + 1,)).copy()
                fx_status = np.ctypeslib.as_array(
                    lib.ves_fx_status(fx), (max(n, 1),))[:n].copy()
            finally:
                lib.ves_fx_free(fx)
            for i in range(n):
                if statuses[i] == 2:
                    continue
                if fx_status[i] == 0:
                    vecs[i] = ext[fx_offs[i]:fx_offs[i + 1]]
                    statuses[i] = 0
    finally:
        lib.ves_free(handle)

    if python_fallback:
        from ..features.extent import extent_vector
        from .serde import MeasureInput
        from .task import SearchTask

        tasks = [SearchTask(wk, tgt)
                 for wk, tgt in zip(raw.task_workload, raw.task_target)]
        for i in range(n):
            if statuses[i] != 1:
                continue
            try:
                inp = MeasureInput(tasks[raw.task_id[i]],
                                   raw.decode_steps(i))
                st = inp.recover_state(infer_bound=True)
                vecs[i] = extent_vector(st)
                statuses[i] = 0
            except Exception:
                statuses[i] = 2
    return vecs, labels, statuses

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
    # VES_NATIVE_LIB: point at an alternate build (A/B perf comparisons,
    # VES_PROF-instrumented builds) without touching the installed .so
    override = os.environ.get("VES_NATIVE_LIB")
    path = override or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "native", "libves_native.so")
    if override and not os.path.exists(override):
        # an explicit override must fail fast: build_native.sh only
        # produces the default .so, so auto-building here would burn
        # ~20 s and still not satisfy the requested path
        raise FileNotFoundError(
            f"VES_NATIVE_LIB={override} does not exist")
    if not os.path.exists(path):
        # build on first use (the binary is not committed); g++ is part
        # of the toolchain contract, build takes ~20 s once. An
        # exclusive flock serializes concurrent first users (multi-host
        # tests / sharded sweeps) so nobody dlopens a half-written .so.
        import fcntl
        import subprocess

        script = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), "scripts",
            "build_native.sh")
        lock_path = path + ".buildlock"
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            with open(lock_path, "w") as lock:
                fcntl.flock(lock, fcntl.LOCK_EX)
                if not os.path.exists(path):  # loser re-checks
                    subprocess.run(["bash", script], check=True,
                                   capture_output=True, timeout=600)
        except Exception as e:
            raise FileNotFoundError(
                f"{path} missing and auto-build failed "
                f"({e}) — run scripts/build_native.sh") from None
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

        def arr(ptr, count, dtype):
            # an empty std::vector's data() may be NULL — as_array on a
            # NULL pointer raises even for a zero-length view
            if count == 0 or not ptr:
                return np.zeros(0, dtype)
            return np.ctypeslib.as_array(ptr, (count,)).copy()

        self.step_tokens = arr(lib.ves_step_tokens(handle), nt, np.int32)
        self.step_begin = arr(lib.ves_rec_step_begin(handle), n, np.int64)
        self.step_end = arr(lib.ves_rec_step_end(handle), n, np.int64)
        self.task_id = arr(lib.ves_rec_task_id(handle), n, np.int32)
        self.mean_cost = arr(lib.ves_rec_mean_cost(handle), n, np.float64)
        self.first_cost = arr(lib.ves_rec_first_cost(handle), n,
                              np.float64)
        self.error_no = arr(lib.ves_rec_error_no(handle), n, np.int32)
        psize = lib.ves_string_pool_size(handle)
        pool = (ctypes.string_at(lib.ves_string_pool(handle), psize)
                if psize else b"")
        offs = arr(lib.ves_string_offsets(handle), ns, np.int64)
        self.strings = []
        for i in range(ns):
            end = offs[i + 1] - 1 if i + 1 < ns else len(pool) - 1
            self.strings.append(pool[offs[i]:end].decode())
        self.task_workload = [
            self.strings[i]
            for i in arr(lib.ves_task_wkl_str(handle), ntask, np.int32)
        ]
        self.task_target = [
            self.strings[i]
            for i in arr(lib.ves_task_target_str(handle), ntask, np.int32)
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
                    # -1 inside a list = JSON null (undefined split
                    # length); legitimate step-list values are all >= 0
                    args.append([None if x == -1 else int(x)
                                 for x in toks[j + 1:j + 1 + ln]])
                    j += 1 + ln
                else:
                    args.append(v)
                    j += 1
            i += n
            out.append([kind] + args)
        return out


# detection-scan read size for _repair_glued_lines (patchable in tests
# to exercise chunk-boundary overlap handling)
_REPAIR_SCAN_CHUNK = 16 << 20


def _repair_glued_lines(path: str) -> str:
    """Kill-corrupted append logs can hold several records per line (a
    truncated write with the next append glued on). The native parser
    is one-record-per-line, so repair such files into a temp copy:
    newline before every mid-line record opener. The opener byte string
    '{"i": ' cannot occur inside a record (it would be escaped there),
    so the split is exact; truncated fragments end up on their own
    lines, which the strict parser skips — every intact record
    survives, matching serde.iter_records' recovery. Returns ``path``
    unchanged for healthy files after a CHUNKED detection scan (multi-GB
    corpora must not be slurped into RSS on the common healthy path)."""
    opener = b'{"i": '
    dirty = False
    chunk_size = _REPAIR_SCAN_CHUNK
    with open(path, "rb") as f:
        prev_tail = b"\n"
        while not dirty:
            chunk = f.read(chunk_size)
            if not chunk:
                break
            buf = prev_tail + chunk  # overlap catches split openers
            pos = buf.find(opener, 1)
            while pos != -1:
                if buf[pos - 1:pos] != b"\n":
                    dirty = True
                    break
                pos = buf.find(opener, pos + 1)
            prev_tail = buf[-(len(opener)):]
    if not dirty:
        return path
    with open(path, "rb") as f:
        data = f.read()
    import tempfile

    out = []
    start = 0
    pos = data.find(opener, 1)
    while pos != -1:
        if data[pos - 1:pos] != b"\n":
            out.append(data[start:pos])
            out.append(b"\n")
            start = pos
        pos = data.find(opener, pos + 1)
    out.append(data[start:])
    tmp = tempfile.NamedTemporaryFile(
        suffix=".json", prefix="ves_repair_", delete=False)
    tmp.write(b"".join(out))
    tmp.close()
    return tmp.name


def load_raw(path: str, max_lines: int = -1) -> RawRecords:
    lib = _load_lib()
    repaired = _repair_glued_lines(path)
    try:
        handle = lib.ves_parse_file(repaired.encode(), max_lines)
    finally:
        if repaired != path:
            os.unlink(repaired)
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
    # v2: full-expression demand propagation (handles non-affine DAGs);
    # task desc may be None
    lib.ves_featurize_extents2.restype = ctypes.c_void_p
    lib.ves_featurize_extents2.argtypes = [
        ctypes.POINTER(ctypes.c_int32),  # task desc (nullable)
        ctypes.POINTER(ctypes.c_int32),  # expr desc
        ctypes.POINTER(ctypes.c_int32),  # step tokens
        ctypes.POINTER(ctypes.c_int64),  # rec begin
        ctypes.POINTER(ctypes.c_int64),  # rec end
        ctypes.c_int64,                  # n recs
        ctypes.POINTER(ctypes.c_char),   # string pool
        ctypes.POINTER(ctypes.c_int64),  # string offsets
        ctypes.c_int,                    # n threads
    ]
    for pre in ("ves_fx", "ves_fx2"):
        getattr(lib, pre + "_extents").restype = ctypes.POINTER(
            ctypes.c_float)
        getattr(lib, pre + "_extents").argtypes = [ctypes.c_void_p]
        getattr(lib, pre + "_num_extents").restype = ctypes.c_int64
        getattr(lib, pre + "_num_extents").argtypes = [ctypes.c_void_p]
        getattr(lib, pre + "_offsets").restype = ctypes.POINTER(
            ctypes.c_int64)
        getattr(lib, pre + "_offsets").argtypes = [ctypes.c_void_p]
        getattr(lib, pre + "_status").restype = ctypes.POINTER(
            ctypes.c_int32)
        getattr(lib, pre + "_status").argtypes = [ctypes.c_void_p]
        getattr(lib, pre + "_free").argtypes = [ctypes.c_void_p]
    lib._fx_ready = True
    return lib


def featurize_extents_native(path: str, n_threads: int = 1,
                             python_fallback: bool = True):
    """Batch extent featurization through the native pipeline.

    Returns (extent vectors: list of float32 arrays, labels [n] float32,
    statuses [n] int32: 0 native, 1 python-fallback, 2 error/skipped).
    Labels are -log(mean cost + 1e-8); error records and costs > 1e6 get
    status 2 (reference print_programs.py:23 filter). Records are grouped
    by task; non-affine DAGs run through the full-expression demand path
    (ves_featurize_extents2).
    """
    from ..features.extent import label_from_costs
    from .expr_desc import build_expr_desc
    from .task_desc import NonAffineError, build_task_desc
    from .workload import workload_key_to_dag

    lib = _load_fx(_load_lib())
    raw = load_raw(path, -1)
    n = len(raw)
    if n == 0:
        return [], np.zeros(0, np.float32), np.zeros(0, np.int32)

    vecs = [None] * n
    statuses = np.full(n, 2, np.int32)
    labels = np.zeros(n, np.float32)
    for i in range(n):
        if raw.error_no[i] == 0 and raw.first_cost[i] <= 1e6:
            labels[i] = label_from_costs([raw.mean_cost[i]])
            statuses[i] = 1  # provisional: python fallback

    pool, offs = _string_pool_arrays(raw.strings)
    step_tokens = np.ascontiguousarray(raw.step_tokens)

    for tid in range(len(raw.task_workload)):
        idx = np.nonzero((raw.task_id == tid) & (statuses == 1))[0]
        if len(idx) == 0:
            continue
        try:
            dag = workload_key_to_dag(raw.task_workload[tid])
            edesc = np.ascontiguousarray(build_expr_desc(dag))
        except Exception:
            continue  # python fallback for the whole task
        try:
            desc = build_task_desc(dag)
            desc_ptr = desc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        except NonAffineError:
            desc_ptr = None  # v2 derives the op table from the expr desc
        begin = np.ascontiguousarray(raw.step_begin[idx])
        end = np.ascontiguousarray(raw.step_end[idx])
        fx = lib.ves_featurize_extents2(
            desc_ptr,
            edesc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            step_tokens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            begin.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            end.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            len(idx),
            pool,
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            n_threads,
        )
        try:
            total = lib.ves_fx2_num_extents(fx)
            if total > 0:
                ext = np.ctypeslib.as_array(
                    lib.ves_fx2_extents(fx), (total,)).copy()
            else:
                ext = np.zeros(0, np.float32)
            fx_offs = np.ctypeslib.as_array(
                lib.ves_fx2_offsets(fx), (len(idx) + 1,)).copy()
            fx_status = np.ctypeslib.as_array(
                lib.ves_fx2_status(fx), (max(len(idx), 1),))[:len(idx)].copy()
        finally:
            lib.ves_fx2_free(fx)
        for k, rec in enumerate(idx):
            if fx_status[k] == 0:
                vecs[rec] = ext[fx_offs[k]:fx_offs[k + 1]]
                statuses[rec] = 0

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


# ---------------------------------------------------------------------------
# Native batch per-store featurization (csrc/per_store_featurizer.cpp)
# ---------------------------------------------------------------------------


def _load_ps(lib):
    if getattr(lib, "_ps_ready", False):
        return lib
    lib.ves_featurize_perstore.restype = ctypes.c_void_p
    lib.ves_featurize_perstore.argtypes = [
        ctypes.POINTER(ctypes.c_int32),  # task desc (affine)
        ctypes.POINTER(ctypes.c_int32),  # expr desc (full trees)
        ctypes.POINTER(ctypes.c_int32),  # step tokens
        ctypes.POINTER(ctypes.c_int64),  # rec begin
        ctypes.POINTER(ctypes.c_int64),  # rec end
        ctypes.c_int64,                  # n recs
        ctypes.POINTER(ctypes.c_char),   # string pool
        ctypes.POINTER(ctypes.c_int64),  # string offsets
        ctypes.c_int,                    # is_gpu
        ctypes.c_int,                    # cache line size
        ctypes.c_int,                    # n threads
        ctypes.c_int,                    # mode: 0 full, 1 keys+validity
    ]
    lib.ves_ps_features.restype = ctypes.POINTER(ctypes.c_float)
    lib.ves_ps_features.argtypes = [ctypes.c_void_p]
    lib.ves_ps_num_rows.restype = ctypes.c_int64
    lib.ves_ps_num_rows.argtypes = [ctypes.c_void_p]
    lib.ves_ps_offsets.restype = ctypes.POINTER(ctypes.c_int64)
    lib.ves_ps_offsets.argtypes = [ctypes.c_void_p]
    lib.ves_ps_status.restype = ctypes.POINTER(ctypes.c_int32)
    lib.ves_ps_status.argtypes = [ctypes.c_void_p]
    lib.ves_ps_keys.restype = ctypes.POINTER(ctypes.c_uint64)
    lib.ves_ps_keys.argtypes = [ctypes.c_void_p]
    lib.ves_ps_free.argtypes = [ctypes.c_void_p]
    lib._ps_ready = True
    return lib


def _string_pool_arrays(strings):
    pool = b"\x00".join(s.encode() for s in strings) + b"\x00"
    offs = np.zeros(max(len(strings), 1), np.int64)
    o = 0
    for k, s in enumerate(strings):
        offs[k] = o
        o += len(s.encode()) + 1
    return pool, offs


def _perstore_call(lib, task, tok_arr, begin, end, pool, offs,
                   n_threads, mode: int = 0):
    """One native per-store batch call for a single task's records.

    Returns (rows [total,164], ps_offs [n+1], ps_status [n], keys [n]) or
    None when the task's descriptors cannot be built (caller falls back
    to python for the whole group). ``mode=1`` skips store building +
    feature emission: keys + bound-inference validity only (rows come
    back empty) — the GA pool path under a feature-free cost model."""
    from ..features.per_store import FEATURE_VEC_LEN

    try:
        # cached per task: affine descriptor (None for non-affine DAGs —
        # the native side then derives the op table from the expression
        # descriptor and runs demand over full expression trees) + the
        # full-expression descriptor
        desc, edesc = _TaskDescCache.get(task)
    except Exception:
        return None
    desc_ptr = (desc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
                if desc is not None else None)
    n = len(begin)
    h = lib.ves_featurize_perstore(
        desc_ptr,
        edesc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tok_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        begin.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        end.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        pool,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        int(task.is_gpu),
        int(task.hardware_params.cache_line_bytes),
        n_threads,
        mode,
    )
    try:
        total = lib.ves_ps_num_rows(h)
        if total > 0:
            rows = np.ctypeslib.as_array(
                lib.ves_ps_features(h), (total * FEATURE_VEC_LEN,)
            ).reshape(-1, FEATURE_VEC_LEN).copy()
        else:
            rows = np.zeros((0, FEATURE_VEC_LEN), np.float32)
        ps_offs = np.ctypeslib.as_array(
            lib.ves_ps_offsets(h), (n + 1,)).copy()
        ps_status = np.ctypeslib.as_array(
            lib.ves_ps_status(h), (max(n, 1),))[:n].copy()
        keys = np.ctypeslib.as_array(
            lib.ves_ps_keys(h), (max(n, 1),))[:n].copy()
    finally:
        lib.ves_ps_free(h)
    return rows, ps_offs, ps_status, keys


def featurize_perstore_native(path: str, n_threads: int = 1,
                              python_fallback: bool = True,
                              max_lines: int = -1, raw=None):
    """Batch per-store (164-dim) featurization through the native pipeline.

    Returns (features: list of [n_stores_i, 164] float32 arrays, statuses
    [n] int32: 0 native, 1 python-fallback used (or needed), 2 error).
    Records are grouped by task (a log may hold many tasks); tasks whose
    DAG has non-affine accesses are shipped via the full-expression
    descriptor, so winograd et al. still run natively.

    ``raw`` lets a caller that already parsed the file (RawRecords of
    the same path/max_lines) skip the second mmap+parse pass.
    """
    from ..features.per_store import get_per_store_features_from_state
    from .serde import MeasureInput
    from .task import SearchTask

    lib = _load_ps(_load_fx(_load_lib()))
    if raw is None:
        raw = load_raw(path, max_lines)
    n = len(raw)
    feats = [None] * n
    statuses = np.full(max(n, 1), 1, np.int32)[:n]
    if n == 0:
        return feats, statuses

    pool, offs = _string_pool_arrays(raw.strings)
    step_tokens = np.ascontiguousarray(raw.step_tokens)
    tasks = [SearchTask(wk, tgt)
             for wk, tgt in zip(raw.task_workload, raw.task_target)]

    for tid in range(len(tasks)):
        idx = np.nonzero(raw.task_id == tid)[0]
        if len(idx) == 0:
            continue
        res = _perstore_call(
            lib, tasks[tid], step_tokens,
            np.ascontiguousarray(raw.step_begin[idx]),
            np.ascontiguousarray(raw.step_end[idx]),
            pool, offs, n_threads,
        )
        if res is None:
            continue  # python fallback for the whole task
        rows, ps_offs, ps_status, _ = res
        for k, rec in enumerate(idx):
            if ps_status[k] == 0:
                feats[rec] = rows[ps_offs[k]:ps_offs[k + 1]]
                statuses[rec] = 0
            else:
                statuses[rec] = ps_status[k]

    if python_fallback:
        for i in range(n):
            if statuses[i] != 1:
                continue
            try:
                inp = MeasureInput(tasks[raw.task_id[i]],
                                   raw.decode_steps(i))
                st = inp.recover_state(infer_bound=True)
                feats[i] = get_per_store_features_from_state(
                    st, inp.task)
                statuses[i] = 0
            except Exception:
                statuses[i] = 2
    return feats, statuses


def perstore_dataset_native(path: str, max_lines: int = -1,
                            n_threads: int = 1):
    """Native equivalent of per_store.get_per_store_features_from_file:
    (features, normalized_throughputs, task_ids, min_costs), with the same
    zero-row error convention and per-task min-cost normalization
    (reference feature.cc:1457-1535)."""
    from ..features.per_store import FEATURE_VEC_LEN

    raw = load_raw(path, max_lines)  # parsed once, shared with featurize
    feats, statuses = featurize_perstore_native(
        path, n_threads=n_threads, python_fallback=True,
        max_lines=max_lines, raw=raw)
    n = len(raw)
    task_keys = {}
    task_ids = np.zeros(n, np.int32)
    costs = np.zeros(n, np.float64)
    min_costs = []
    for i in range(n):
        key = (raw.task_workload[raw.task_id[i]],
               raw.task_target[raw.task_id[i]])
        if key not in task_keys:
            task_keys[key] = len(task_keys)
            min_costs.append(float("inf"))
        tid = task_keys[key]
        task_ids[i] = tid
        c = float(raw.mean_cost[i]) if raw.error_no[i] == 0 else float("inf")
        costs[i] = c
        if c < min_costs[tid]:
            min_costs[tid] = c
    out_feats = []
    for i in range(n):
        f = feats[i]
        if f is None or statuses[i] == 2 or f.shape[0] == 0:
            f = np.zeros((1, FEATURE_VEC_LEN), np.float32)
        out_feats.append(f)
    throughputs = np.asarray(
        [
            (min_costs[t] / c) if np.isfinite(c) and c > 0 else 0.0
            for t, c in zip(task_ids, costs)
        ],
        np.float32,
    )
    return (out_feats, throughputs, task_ids,
            np.asarray(min_costs, np.float32))


def _encode_steps(step_records, strings, string_index, out,
                  frag_cache=None):
    """Encode step records into the native token stream (the same format
    record_parser.cpp emits: [kind, n_tokens, args...]; lists as -(len+1)
    markers; strings as -1000000-id; None as -1).

    ``frag_cache``: optional dict for per-record token fragments, keyed
    by id(rec) with the record pinned in the value (GA children share
    all but the mutated step record with their parent by REFERENCE, so
    a persistent cache + persistent string pool turns re-encoding of a
    generation batch into list extends). Callers that pass it must keep
    ``strings``/``string_index`` alive alongside — fragments embed
    string-pool ids."""
    for rec in step_records:
        if frag_cache is not None:
            hit = frag_cache.get(id(rec))
            if hit is not None and hit[0] is rec:
                out.extend(hit[1])
                continue
            frag_start = len(out)
        kind = _STEP_KINDS.index(rec[0])
        toks = []
        for arg in rec[1:]:
            if isinstance(arg, bool):
                toks.append(int(arg))
            elif isinstance(arg, (int, np.integer)):
                toks.append(int(arg))
            elif arg is None:
                toks.append(-1)
            elif isinstance(arg, str):
                sid = string_index.get(arg)
                if sid is None:
                    sid = len(strings)
                    strings.append(arg)
                    string_index[arg] = sid
                toks.append(-1000000 - sid)
            elif isinstance(arg, (list, tuple)):
                toks.append(-(len(arg) + 1))
                toks.extend(-1 if x is None else int(x) for x in arg)
            else:
                raise TypeError(f"cannot encode step arg {arg!r}")
        out.append(kind)
        out.append(len(toks))
        out.extend(toks)
        if frag_cache is not None:
            frag_cache[id(rec)] = (rec, out[frag_start:])


def featurize_perstore_states_native(task, states, n_threads: int = 1,
                                     python_fallback: bool = True):
    """Per-store features for in-memory states through the native
    featurizer — the search-time hot loop of the learned cost model
    (reference feature.cc GetPerStoreFeaturesFromStates, called per
    evolutionary-search round). Returns a list of [n_stores_i, 164]
    arrays; states the native path cannot handle (rfactor) fall back to
    python; unlowerable states yield a single all-zero row."""
    from ..features.per_store import (
        FEATURE_VEC_LEN,
        get_per_store_features_from_state,
    )

    lib = _load_ps(_load_fx(_load_lib()))
    n = len(states)
    feats = [None] * n
    statuses = np.full(max(n, 1), 1, np.int32)[:n]
    res = None
    try:
        toks: List[int] = []
        begin = np.zeros(n, np.int64)
        end = np.zeros(n, np.int64)
        strings: List[str] = []
        string_index = {}
        for i, st in enumerate(states):
            begin[i] = len(toks)
            _encode_steps([s.to_record() for s in st.transform_steps],
                          strings, string_index, toks)
            end[i] = len(toks)
        tok_arr = np.asarray(toks if toks else [0], np.int32)
        pool, offs = _string_pool_arrays(strings)
        res = _perstore_call(lib, task, tok_arr, begin, end, pool, offs,
                             n_threads)
    except Exception:
        res = None

    if res is not None:
        rows, ps_offs, ps_status, _ = res
        for i in range(n):
            if ps_status[i] == 0 and ps_offs[i + 1] > ps_offs[i]:
                feats[i] = rows[ps_offs[i]:ps_offs[i + 1]]
                statuses[i] = 0
            else:
                statuses[i] = max(int(ps_status[i]), 1)

    for i in range(n):
        if statuses[i] == 0:
            continue
        if python_fallback and statuses[i] == 1:
            try:
                st = task.compute_dag.infer_bound(states[i])
                f = get_per_store_features_from_state(st, task)
                feats[i] = f if f.shape[0] else np.zeros(
                    (1, FEATURE_VEC_LEN), np.float32)
                statuses[i] = 0
                continue
            except Exception:
                pass
        feats[i] = np.zeros((1, FEATURE_VEC_LEN), np.float32)
    return feats


def featurize_perstore_inputs_native(inputs, n_threads: int = 1):
    """Per-store features for in-memory MeasureInputs (cost-model update
    path). Returns a list parallel to ``inputs``; entries are None where
    the native path could not handle the record (caller falls back to
    python per record)."""
    lib = _load_ps(_load_fx(_load_lib()))
    n = len(inputs)
    feats = [None] * n

    groups = {}
    for i, inp in enumerate(inputs):
        groups.setdefault(
            (inp.task.workload_key, inp.task.target), []
        ).append(i)

    for (wk, _tgt), idx in groups.items():
        try:
            toks: List[int] = []
            begin = np.zeros(len(idx), np.int64)
            end = np.zeros(len(idx), np.int64)
            strings: List[str] = []
            string_index = {}
            for k, i in enumerate(idx):
                begin[k] = len(toks)
                _encode_steps(inputs[i].step_records, strings,
                              string_index, toks)
                end[k] = len(toks)
        except Exception:
            continue
        tok_arr = np.asarray(toks if toks else [0], np.int32)
        pool, offs = _string_pool_arrays(strings)
        res = _perstore_call(lib, inputs[idx[0]].task, tok_arr, begin,
                             end, pool, offs, n_threads)
        if res is None:
            continue
        rows, ps_offs, ps_status, _ = res
        for k, i in enumerate(idx):
            if ps_status[k] == 0 and ps_offs[k + 1] > ps_offs[k]:
                feats[i] = rows[ps_offs[k]:ps_offs[k + 1]]
    return feats


class _TaskDescCache:
    """Per-task descriptor cache for repeated GA generations."""

    _cache = {}

    @classmethod
    def get(cls, task):
        key = (task.workload_key, task.target)
        hit = cls._cache.get(key)
        if hit is not None:
            return hit
        from .expr_desc import build_expr_desc
        from .task_desc import NonAffineError, build_task_desc
        from .workload import workload_key_to_dag

        dag = workload_key_to_dag(task.workload_key)
        edesc = np.ascontiguousarray(build_expr_desc(dag))
        try:
            desc = build_task_desc(dag)
        except NonAffineError:
            desc = None
        cls._cache[key] = (desc, edesc)
        return cls._cache[key]


def featurize_perstore_records_native(task, record_lists,
                                      n_threads: int = 1,
                                      encode_ctx=None,
                                      with_features: bool = True):
    """Per-store features + structural dedup keys for step-record lists
    (the native evolutionary-search generation batch). Returns
    (features list, keys uint64 [n], statuses int32 [n]); entries with
    status != 0 have features None and key 0 — the caller decides whether
    to python-fallback (rfactor) or discard (invalid child).

    ``encode_ctx``: optional ``make_encode_ctx()`` value shared across
    calls of one GA run — children reuse their parent's step-record
    objects, so per-record token fragments cache across generations
    (~25% of the generation batch cost is re-encoding otherwise).

    ``with_features=False`` skips store building + feature emission in
    the native pass (keys + replay/bound validity only, features all
    None) — pool generation under a feature-free cost model, where
    emit+stores are ~half the native per-record cost."""
    lib = _load_ps(_load_fx(_load_lib()))
    n = len(record_lists)
    feats = [None] * n
    keys = np.zeros(n, np.uint64)
    statuses = np.full(max(n, 1), 2, np.int32)[:n]
    if n == 0:
        return feats, keys, statuses

    toks: List[int] = []
    begin = np.zeros(n, np.int64)
    end = np.zeros(n, np.int64)
    if encode_ctx is None:
        strings, string_index, frag_cache = [], {}, None
    else:
        strings, string_index, frag_cache = encode_ctx
    for i, recs in enumerate(record_lists):
        begin[i] = len(toks)
        _encode_steps(recs, strings, string_index, toks, frag_cache)
        end[i] = len(toks)
    tok_arr = np.asarray(toks if toks else [0], np.int32)
    pool, offs = _string_pool_arrays(strings)

    res = _perstore_call(lib, task, tok_arr, begin, end, pool, offs,
                         n_threads, mode=0 if with_features else 1)
    if res is None:
        return feats, keys, statuses
    rows, ps_offs, ps_status, ps_keys = res
    for i in range(n):
        statuses[i] = ps_status[i]
        keys[i] = ps_keys[i]
        if not with_features:
            continue
        if ps_status[i] == 0 and ps_offs[i + 1] > ps_offs[i]:
            feats[i] = rows[ps_offs[i]:ps_offs[i + 1]]
        elif ps_status[i] == 0:
            statuses[i] = 2  # replayed but produced no stores
    return feats, keys, statuses


def make_encode_ctx():
    """Shared encoding context for featurize_perstore_records_native:
    (string pool, string index, per-record fragment cache). One per GA
    run — the string pool must stay alive as long as fragments do."""
    return ([], {}, {})


_AN_NAMES_CACHE: dict = {}


def _analytic_names(task):
    """(names pool bytes, offsets, counts int32 [n_ops*2]) for the
    native name-tracking replay, or None when the task has symbolic
    (data-dependent) extents — those print PrimExpr text the native
    printer does not reproduce (sparse workloads; python path)."""
    key = (task.workload_key, str(task.target))
    hit = _AN_NAMES_CACHE.get(key)
    if hit is not None:
        return hit
    from .workload import workload_key_to_dag

    dag = workload_key_to_dag(task.workload_key)
    names: List[str] = []
    counts: List[int] = []
    for op in dag.ops:
        names.append(op.name)
        axes = getattr(op, "axes", ()) or ()
        red = getattr(op, "reduce_axes", ()) or ()
        for d in list(axes) + list(red):
            if not isinstance(d.extent, (int, np.integer)):
                _AN_NAMES_CACHE[key] = None
                return None
            names.append(d.name)
        counts.extend([len(axes), len(red)])
    pool, offs = _string_pool_arrays(names)
    out = (pool, offs, np.asarray(counts, np.int32), len(dag.ops))
    _AN_NAMES_CACHE[key] = out
    return out


def _load_an(lib):
    if getattr(lib, "_an_ready", False):
        return lib
    lib.ves_analytic_batch.restype = ctypes.c_void_p
    lib.ves_analytic_batch.argtypes = [
        ctypes.POINTER(ctypes.c_int32),  # task desc (affine; may be null)
        ctypes.POINTER(ctypes.c_int32),  # expr desc
        ctypes.POINTER(ctypes.c_int32),  # step tokens
        ctypes.POINTER(ctypes.c_int64),  # rec begin
        ctypes.POINTER(ctypes.c_int64),  # rec end
        ctypes.c_int64,                  # n recs
        ctypes.POINTER(ctypes.c_char),   # string pool
        ctypes.POINTER(ctypes.c_int64),  # string offsets
        ctypes.POINTER(ctypes.c_char),   # names pool
        ctypes.POINTER(ctypes.c_int64),  # names offsets
        ctypes.POINTER(ctypes.c_int32),  # names counts (n_sp, n_rd per op)
        ctypes.c_int64,                  # n ops
        ctypes.c_int,                    # n threads
    ]
    for name, ctype in [
        ("ves_an_status", ctypes.c_int32),
        ("ves_an_text", ctypes.c_char),
        ("ves_an_text_offs", ctypes.c_int64),
        ("ves_an_stage_offs", ctypes.c_int64),
        ("ves_an_stage_rows", ctypes.c_int64),
        ("ves_an_iter_offs", ctypes.c_int64),
        ("ves_an_iter_rows", ctypes.c_int64),
    ]:
        getattr(lib, name).restype = ctypes.POINTER(ctype)
        getattr(lib, name).argtypes = [ctypes.c_void_p]
    lib.ves_an_free.argtypes = [ctypes.c_void_p]
    lib._an_ready = True
    return lib


def analytic_batch_native(task, record_lists, n_threads: int = 1):
    """Native batch for the analytic measurer: replay + bound inference
    with name tracking, returning per record the BYTE-EXACT printed
    state (State.to_str parity — the AnalyticRunner noise key) and a
    compact schedule summary (stage rows [S,3]: compute_at/-1
    placeholder/2 inlined, auto_unroll, n_iters; iter rows [I,2]:
    extent, annotation).

    Returns (statuses int32 [n], texts List[bytes], stage_rows
    List[int64 [S,3]], iter_rows List[int64 [I,2]]) or None when the
    native path is unavailable for this task (no lib, no descriptors,
    symbolic extents). Entries with status != 0 need the python path."""
    try:
        lib = _load_an(_load_ps(_load_fx(_load_lib())))
    except Exception:
        return None
    nm = _analytic_names(task)
    if nm is None:
        return None
    try:
        desc, edesc = _TaskDescCache.get(task)
    except Exception:
        return None
    names_pool, names_offs, names_counts, n_ops = nm

    n = len(record_lists)
    if n == 0:
        return (np.zeros(0, np.int32), [], [], [])
    toks: List[int] = []
    begin = np.zeros(n, np.int64)
    end = np.zeros(n, np.int64)
    strings, string_index = [], {}
    for i, recs in enumerate(record_lists):
        begin[i] = len(toks)
        _encode_steps(recs, strings, string_index, toks)
        end[i] = len(toks)
    tok_arr = np.asarray(toks if toks else [0], np.int32)
    pool, offs = _string_pool_arrays(strings)

    desc_ptr = (desc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
                if desc is not None else None)
    h = lib.ves_analytic_batch(
        desc_ptr,
        edesc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        tok_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        begin.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        end.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        pool,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        names_pool,
        names_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        names_counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        n_ops,
        n_threads,
    )
    try:
        statuses = np.ctypeslib.as_array(lib.ves_an_status(h),
                                         (max(n, 1),))[:n].copy()
        t_offs = np.ctypeslib.as_array(lib.ves_an_text_offs(h),
                                       (n + 1,)).copy()
        total_text = int(t_offs[-1])
        blob = (ctypes.string_at(lib.ves_an_text(h), total_text)
                if total_text else b"")
        s_offs = np.ctypeslib.as_array(lib.ves_an_stage_offs(h),
                                       (n + 1,)).copy()
        i_offs = np.ctypeslib.as_array(lib.ves_an_iter_offs(h),
                                       (n + 1,)).copy()
        n_st = int(s_offs[-1])
        n_it = int(i_offs[-1])
        st_rows = (np.ctypeslib.as_array(lib.ves_an_stage_rows(h),
                                         (max(n_st, 1) * 3,))
                   [:n_st * 3].reshape(-1, 3).copy())
        it_rows = (np.ctypeslib.as_array(lib.ves_an_iter_rows(h),
                                         (max(n_it, 1) * 2,))
                   [:n_it * 2].reshape(-1, 2).copy())
    finally:
        lib.ves_an_free(h)

    texts = [blob[t_offs[i]:t_offs[i + 1]] for i in range(n)]
    stage_rows = [st_rows[s_offs[i]:s_offs[i + 1]] for i in range(n)]
    iter_rows = [it_rows[i_offs[i]:i_offs[i + 1]] for i in range(n)]
    return statuses, texts, stage_rows, iter_rows

"""Schedule IR: step replay, bound inference, printer, record serde."""

import json
import os

import pytest

from tests.conftest import CI_LOGS
from vae_extent_search_tpu.ir import (
    ComputeDAG,
    apply_steps_to_state,
    step_from_record,
)
from vae_extent_search_tpu.ir.steps import SplitStep
from vae_extent_search_tpu.records import (
    load_records,
    make_workload_key,
    record_from_json,
    record_to_json,
    workload_key_to_dag,
)


def test_matmul_dag_structure():
    dag = workload_key_to_dag(make_workload_key("matmul_add", (64, 64, 64, "float32")))
    names = [op.name for op in dag.ops]
    assert names == ["A", "B", "matmul", "C", "out"]
    assert dag.flop_ct == pytest.approx(2 * 64**3 + 64 * 64)


def test_conv2d_layer_stage_order():
    key = make_workload_key("conv2d_layer", (1, 7, 7, 512, 512, 3, 3, [1, 1], [1, 1]))
    dag = workload_key_to_dag(key)
    names = [op.name for op in dag.ops]
    # stage ids must match the reference DAG for record replay
    # (conv2d.json steps: CI 5 = T_add, SP 3 = conv, FSP 6 = T_relu)
    assert names == [
        "data", "pad_temp", "kernel", "conv2d_nchw", "bias", "T_add", "T_relu",
    ]


def test_matmul_record_replay_extents():
    recs = load_records(os.path.join(CI_LOGS, "matmul.json"))
    assert len(recs) == 1
    st = recs[0].inp.recover_state(infer_bound=True)
    text = st.to_str(True)
    # verified by hand against te PassDownDomain semantics
    assert "parallel i.0@j.0@ (0,16384)" in text
    assert "for k.0 (0,256)" in text
    assert "vectorize j.3 (0,8)" in text
    assert "matmul auto_unroll: 8" in text
    # all extents defined
    assert "(None)" not in text


def test_conv2d_record_replay_structure():
    recs = load_records(os.path.join(CI_LOGS, "conv2d.json"))
    st = recs[0].inp.recover_state(infer_bound=True)
    text = st.to_str(True)
    assert text.startswith("Placeholder: data, kernel, bias\n")
    assert "blockIdx.x" in text and "threadIdx.x" in text
    assert "kernel.shared = ...\n" in text
    assert "pad_temp.shared = ...\n" in text
    assert "(None)" not in text
    # demand-clipped cache extents (kernel.shared tile = 48 elements,
    # matching the extent recorded in its SP step)
    assert "conv2d_nchw auto_unroll: 512" in text


def test_split_extent_golden_vs_recorded():
    """Every SplitStep in a record stores the iterator extent at step
    creation time (TVM InferBound ground truth)."""
    recs = load_records(os.path.join(CI_LOGS, "matmul.json"))
    rec = recs[0]
    dag = rec.inp.task.compute_dag
    st = dag.init_state.copy()
    checked = 0
    for srec in rec.inp.step_records:
        step = step_from_record(srec)
        if isinstance(step, SplitStep) and step.extent:
            it = st.stages[step.stage_id].iters[step.iter_id]
            got = it.range[1] if it.range else \
                dag.infer_bound(st).stages[step.stage_id].iters[step.iter_id].range[1]
            assert got == step.extent
            checked += 1
        st.transform_steps.append(step)
        step.apply_to_state(st)
    assert checked >= 3


def test_record_roundtrip_bitexact_steps():
    """Serialized steps must round-trip exactly for every step kind."""
    for name in ("matmul.json", "conv2d.json", "resnet-50-NHWC-B1-llvm.json"):
        with open(os.path.join(CI_LOGS, name)) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                rec = record_from_json(line)
                out = record_to_json(rec)
                orig = json.loads(line)
                ours = json.loads(out)
                assert ours["i"][1] == orig["i"][1], name  # steps identical
                assert ours["r"][0] == orig["r"][0]
                assert ours["i"][0][0] == orig["i"][0][0]


def test_trivial_loop_deletion_matches_printer_contract():
    recs = load_records(os.path.join(CI_LOGS, "matmul.json"))
    st = recs[0].inp.recover_state(infer_bound=True)
    full = st.to_str(False)
    trimmed = st.to_str(True)
    assert full.count("\n") > trimmed.count("\n")
    assert "(0,1)" not in trimmed


def test_print_steps_as_python():
    """ComputeDAG.print_steps_as_python renders a TVM-style schedule
    (reference compute_dag.cc:1202): axis headers + one call per step,
    with names tracked through splits and fuses."""
    from vae_extent_search_tpu.records import SearchTask, make_workload_key
    from vae_extent_search_tpu.search.sketch import make_states

    task = SearchTask(
        make_workload_key("conv2d_layer",
                          (1, 7, 7, 32, 32, 3, 3, [1, 1], [1, 1])),
        "cuda",
    )
    st = make_states(task, 2, evo_population=8, min_population=2, seed=4)[0]
    code = task.compute_dag.print_steps_as_python(st)
    assert "tuple(conv2d_nchw.op.axis)" in code
    assert ".split(" in code and ".fuse(" in code
    assert "te.thread_axis(\"threadIdx.x\")" in code
    assert code.count("\n") >= len(st.transform_steps)


def test_rewrite_layout_roundtrip():
    """rewrite_layout produces a DAG whose weight placeholder is tiled in
    schedule loop order (reference ComputeDAG::RewriteLayout), the repacked
    array matches the new shape, and the new DAG replays the same steps."""
    import numpy as np

    from vae_extent_search_tpu.ir.layout import rewrite_layout, transform_array
    from vae_extent_search_tpu.records import SearchTask, make_workload_key
    from vae_extent_search_tpu.search.sketch import make_states

    task = SearchTask(
        make_workload_key("conv2d_layer",
                          (1, 14, 14, 64, 64, 3, 3, [1, 1], [1, 1])),
        "llvm -mcpu=skylake-avx512",
    )
    states = make_states(task, 8, evo_population=16, min_population=8,
                         seed=3)
    dag = task.compute_dag
    n_done = 0
    for st in states:
        new_dag, layouts = rewrite_layout(dag, st)
        if not layouts:
            continue
        n_done += 1
        (orig, new), = layouts.values()
        # tile products reproduce the original extents per axis
        prods = {}
        for n, e in new:
            prods[n] = prods.get(n, 1) * e
        assert all(prods[n] == e for n, e in orig if n != "IntImm")
        w = np.zeros([e for _, e in orig], np.float32)
        assert transform_array(w, orig, new).shape == \
            tuple(e for _, e in new)
        assert abs(new_dag.flop_ct - dag.flop_ct) <= 1e-6 * dag.flop_ct
        # the rewritten DAG still replays and bound-infers the schedule
        recs = [s.to_record() for s in st.transform_steps]
        new_dag.infer_bound(new_dag.apply_steps(recs))
    assert n_done >= 3


def test_sparse_dense_replay_and_featurize():
    """The BSR sparse workload (data-dependent reduce extent + indirect
    reads, reference tutorials/auto_scheduler/tune_sparse_x86.py:81-92)
    replays its ci_log record exactly, prints the symbolic row-length
    loop, and featurizes without falling over."""
    import numpy as np

    from tests.conftest import CI_LOGS
    from vae_extent_search_tpu.features.extent import extent_vector
    from vae_extent_search_tpu.features.per_store import (
        get_per_store_features_from_measure_pairs,
    )
    from vae_extent_search_tpu.ir.steps import SplitStep, step_from_record
    from vae_extent_search_tpu.records import load_records

    path = os.path.join(CI_LOGS, "sparse_dense.json")
    if not os.path.exists(path):
        pytest.skip("reference ci_logs unavailable")
    rec = load_records(path)[0]
    dag = rec.inp.task.compute_dag

    # SP-extent oracle must be exact (only static iters are split)
    st = dag.init_state.copy()
    for srec in rec.inp.step_records:
        step = step_from_record(srec)
        if isinstance(step, SplitStep) and step.extent:
            bound = dag.infer_bound(st, relax_threads=False)
            got = bound.stages[step.stage_id].iters[step.iter_id].range[1]
            assert got == step.extent
        st.transform_steps.append(step)
        step.apply_to_state(st)

    bound = dag.infer_bound(st)
    text = bound.to_str()
    # the data-dependent loop prints symbolically (regex skips it)
    assert "elem_idx (0,(placeholder[(nb_j + 1)] - placeholder[nb_j]))" \
        in text
    # extent features: only integer extents, no crash
    vec = extent_vector(bound)
    assert vec.size > 0 and np.isfinite(vec).all()

    # per-store featurization: one row per store, finite values
    feats, tps, _, _ = get_per_store_features_from_measure_pairs(
        [rec.inp], [rec.res]
    )
    assert feats[0].shape == (3, 164)
    assert np.isfinite(feats[0]).all()
    assert tps[0] == 1.0

    # FLOP attr override (reference attrs={"FLOP": 2*M*nb*bs_r*K}) plus
    # the three elementwise stages (relu, bias add, relu)
    assert dag.flop_ct == 2.0 * 512 * 32 * 16 * 512 + 3 * 512 * 512

    # fresh sketch + GA generation on the sparse task must produce valid,
    # serializable, featurizable states (symbolic split extents follow te:
    # concrete inner factors, symbolic ceildiv outer, extent recorded 0)
    import json

    from vae_extent_search_tpu.search.sketch import make_states

    states = make_states(rec.inp.task, 6, evo_population=12,
                         min_population=4, seed=3)
    assert states
    json.dumps([s.to_record() for s in states[0].transform_steps])
    feats2 = get_per_store_features_from_measure_pairs(
        [rec.inp], [rec.res]
    )[0]
    assert np.isfinite(feats2[0]).all()


def test_iter_records_recovers_kill_corrupted_log(tmp_path):
    """A process killed mid-append leaves a truncated line and the next
    append continues ON it — record logs are the universal checkpoint
    (SURVEY §5), so the reader must recover every INTACT record from
    glued/truncated lines instead of raising (records/serde.py
    iter_records raw_decode resync)."""
    from vae_extent_search_tpu.records.serde import (load_records,
                                                     record_to_json)

    corpus = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "result", "corpus", "resnet_18-B1-llvm.json")
    src = load_records(corpus, max_lines=6)
    lines = [record_to_json(r) for r in src]
    corrupt = (lines[0] + "\n"
               + lines[1] + lines[2] + "\n"        # two glued, no newline
               + lines[3][:100] + lines[4] + "\n"  # truncated head + whole
               + lines[5][:50])                    # trailing truncation
    p = tmp_path / "corrupt.json"
    p.write_text(corrupt)
    recs = load_records(str(p))
    assert len(recs) == 4  # every intact record, nothing else
    good = {record_to_json(r) for r in (src[0], src[1], src[2], src[4])}
    assert {record_to_json(r) for r in recs} == good
    # the native parser recovers the same set (load_raw pre-repairs
    # glued lines into a temp copy before the strict C++ line parser)
    from vae_extent_search_tpu.records.fast_parser import (
        load_records_fast,
    )
    nrecs = load_records_fast(str(p))
    assert len(nrecs) == 4


def test_iter_records_tolerates_foreign_json_lines(tmp_path):
    """Syntactically valid JSON that is not a record shape (null, a
    number, a short/None "i" list — foreign writers, boundary-exact
    truncations) must be dropped by the recovery scan, not crash the
    whole read (TypeError/IndexError escaped the resync catch)."""
    from vae_extent_search_tpu.records.serde import (load_records,
                                                     record_to_json)

    corpus = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "result", "corpus", "resnet_18-B1-llvm.json")
    src = load_records(corpus, max_lines=2)
    p = tmp_path / "foreign.json"
    p.write_text("null\n"
                 "123\n"
                 + record_to_json(src[0]) + "\n"
                 + '{"i": [null, []]}\n'
                 + '{"i": "zzz", "r": 1}\n'
                 + record_to_json(src[1]) + "\n")
    recs = load_records(str(p))
    assert [record_to_json(r) for r in recs] == [record_to_json(s)
                                                 for s in src]


def test_repair_glued_scan_chunked(tmp_path, monkeypatch):
    """The glued-line detection scan is chunked (multi-GB healthy logs
    must not be slurped into RSS); openers straddling a chunk boundary
    are still detected via the overlap tail."""
    from vae_extent_search_tpu.records import fast_parser
    from vae_extent_search_tpu.records.serde import (load_records,
                                                     record_to_json)

    corpus = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "result", "corpus", "resnet_18-B1-llvm.json")
    src = load_records(corpus, max_lines=3)
    lines = [record_to_json(r) for r in src]
    p = tmp_path / "glued.json"
    p.write_text(lines[0] + "\n" + lines[1] + lines[2] + "\n")
    monkeypatch.setattr(fast_parser, "_REPAIR_SCAN_CHUNK", 7)
    out = fast_parser._repair_glued_lines(str(p))
    assert out != str(p)  # detected as dirty through tiny chunks
    recs = load_records(out)
    os.unlink(out)
    assert len(recs) == 3
    # healthy file: chunked scan returns the path itself
    h = tmp_path / "healthy.json"
    h.write_text("\n".join(lines) + "\n")
    assert fast_parser._repair_glued_lines(str(h)) == str(h)

// Shared native schedule-replay + bound-inference core.
//
// Extracted from the extent featurizer so both native featurizers (extent
// and per-store) run the same replay and demand-driven bound inference —
// the C++ mirror of vae_extent_search_tpu/ir/{steps,bound}.py. See
// extent_featurizer.cpp for the behavioral references.
#pragma once

#include <algorithm>
#include <cmath>
#include <functional>
#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace ves {


// ---------------------------------------------------------------------
// Task descriptor
// ---------------------------------------------------------------------

struct AffineIdx {
  std::vector<std::pair<int, long>> terms;  // (var_ref, coeff)
  long cst = 0;
};

struct ReadDesc {
  int src_op;
  std::vector<AffineIdx> idx;
};

struct OpDesc {
  int kind;  // 0 placeholder, 1 compute
  std::vector<long> dims;
  std::vector<long> reduce;
  std::vector<ReadDesc> reads;
};

struct TaskDesc {
  std::vector<OpDesc> ops;
};

inline TaskDesc parse_task_desc(const int32_t* d) {
  TaskDesc td;
  int p = 0;
  int n_ops = d[p++];
  td.ops.resize(n_ops);
  for (int i = 0; i < n_ops; ++i) {
    OpDesc& op = td.ops[i];
    op.kind = d[p++];
    int nd = d[p++];
    for (int j = 0; j < nd; ++j) op.dims.push_back(d[p++]);
    int nr = d[p++];
    for (int j = 0; j < nr; ++j) op.reduce.push_back(d[p++]);
    int nreads = d[p++];
    op.reads.resize(nreads);
    for (int r = 0; r < nreads; ++r) {
      ReadDesc& rd = op.reads[r];
      rd.src_op = d[p++];
      int nidx = d[p++];
      rd.idx.resize(nidx);
      for (int k = 0; k < nidx; ++k) {
        int nt = d[p++];
        for (int t = 0; t < nt; ++t) {
          int var_ref = d[p++];
          long coeff = d[p++];
          rd.idx[k].terms.emplace_back(var_ref, coeff);
        }
        rd.idx[k].cst = d[p++];
      }
    }
  }
  return td;
}

// ---------------------------------------------------------------------
// Loop state
// ---------------------------------------------------------------------

enum Annotation {
  ANN_NONE = 0, ANN_UNROLL, ANN_VECTORIZE, ANN_PARALLEL, ANN_VTHREAD,
  ANN_BLOCK_X, ANN_THREAD_X, ANN_BLOCK_Y, ANN_THREAD_Y, ANN_BLOCK_Z,
  ANN_THREAD_Z, ANN_TENSORIZE,
};
inline bool is_thread_ann(int a) {
  return a >= ANN_VTHREAD && a <= ANN_THREAD_Z;
}

enum ComputeAt { AT_ROOT = 0, AT_ITER = 1, AT_INLINED = 2 };

struct Iter {
  int uid;
  long extent;  // -1 = undefined
  int8_t kind;  // 0 spatial, 1 reduce, 2 mixed
  int8_t annotation = ANN_NONE;
};

struct Rel {
  int8_t kind;  // 0 split, 1 fuse
  int parent = -1, outer = -1, inner = -1, fused = -1;
  long factor = -1;  // -1 = undefined length
  bool by_nparts = false;
};

struct Stage {
  int op;
  int8_t compute_at = AT_ROOT;
  std::vector<Iter> iters;
  std::vector<Rel> rels;
  // root uid -> (dim index; spatial dims first, then reduce) + full extent
  std::vector<std::pair<int, long>> roots;  // (uid, extent)
  std::vector<int8_t> root_is_reduce;
  long auto_unroll = 0;
  bool is_shared = false;  // shared-scope cache stage
};

// one parsed step
struct Step {
  int kind;
  int stage_id = 0;
  int iter_id = 0;
  long extent = 0;
  std::vector<long> lengths;  // -1 entries = None
  bool inner_to_outer = true;
  std::vector<int> ids;  // fused_ids / after_ids / reader_ids / src_step_ids
  int src_step_id = 0, n_split = 0, level = 0;
  int target_stage_id = 0, target_iter_id = 0;
  long pragma_value = -1;  // auto_unroll value; -1 = other pragma
  bool pragma_skip = false;
  bool scope_is_shared = false;
};

enum StepKind {
  S_AN = 0, S_FU, S_PR, S_RE, S_SP, S_FSP, S_FFSP, S_SA, S_CA, S_CI, S_CR,
  S_CHR, S_CHW, S_RF,
};

struct State {
  std::vector<OpDesc> ops;  // extended by cache steps
  std::vector<Stage> stages;
  std::vector<int> attach_tgt, attach_pos;  // per stage; -1 = none
  std::vector<int> attach_seq;  // CA application order (python AttachMap
                                // appends attached stages in step order)
  int attach_counter = 0;
  std::vector<Step> steps;
  int uid = 0;
  bool failed = false;

  int fresh() { return uid++; }
};

inline long ceil_div(long a, long b) { return (a + b - 1) / b; }

inline void init_state(State& st, const TaskDesc& td) {
  st.ops = td.ops;
  st.stages.resize(td.ops.size());
  st.attach_tgt.assign(td.ops.size(), -1);
  st.attach_pos.assign(td.ops.size(), -1);
  st.attach_seq.assign(td.ops.size(), -1);
  for (size_t i = 0; i < td.ops.size(); ++i) {
    Stage& s = st.stages[i];
    s.op = static_cast<int>(i);
    if (td.ops[i].kind == 0) continue;  // placeholder: no iters
    for (size_t d = 0; d < td.ops[i].dims.size(); ++d) {
      int u = st.fresh();
      s.iters.push_back({u, td.ops[i].dims[d], 0, ANN_NONE});
      s.roots.emplace_back(u, td.ops[i].dims[d]);
      s.root_is_reduce.push_back(0);
    }
    for (size_t d = 0; d < td.ops[i].reduce.size(); ++d) {
      int u = st.fresh();
      s.iters.push_back({u, td.ops[i].reduce[d], 1, ANN_NONE});
      s.roots.emplace_back(u, td.ops[i].reduce[d]);
      s.root_is_reduce.push_back(1);
    }
  }
}

// attach-map position remap after split/fuse on (stage_id)
inline void update_attach_positions(State& st, int stage_id,
                             const std::vector<std::pair<int, int>>& remap) {
  for (size_t s = 0; s < st.stages.size(); ++s) {
    if (st.attach_tgt[s] == stage_id) {
      for (auto& fr : remap) {
        if (st.attach_pos[s] == fr.first) {
          st.attach_pos[s] = fr.second;
          break;
        }
      }
    }
  }
}

inline void apply_split_common(State& st, int stage_id, int iter_id,
                        const std::vector<long>& lengths,
                        bool inner_to_outer) {
  Stage& stage = st.stages[stage_id];
  Iter it = stage.iters[iter_id];
  int old_size = static_cast<int>(stage.iters.size());
  long tosplit = it.extent;

  std::vector<Iter> outs;
  for (size_t i = 0; i < lengths.size(); ++i) {
    long l = inner_to_outer ? lengths[lengths.size() - 1 - i] : lengths[i];
    Iter res{st.fresh(), -1, it.kind, ANN_NONE};
    if (l >= 0 && tosplit >= 0) {
      res.extent = l;
      tosplit = ceil_div(tosplit, l);
    } else {
      tosplit = -1;
      if (l < 0) st.failed = st.failed;  // non-concrete handled by caller
    }
    outs.push_back(res);
  }
  Iter last{st.fresh(), tosplit, it.kind, ANN_NONE};
  if (inner_to_outer) {
    outs.push_back(last);
    std::reverse(outs.begin(), outs.end());
  } else {
    outs.push_back(last);
  }

  // binary relation chains (see ir/steps.py _apply_split_common)
  size_t k = lengths.size();
  if (inner_to_outer) {
    int cur = it.uid;
    for (size_t j = k - 1; j >= 1; --j) {
      int tmp = st.fresh();
      stage.rels.push_back({0, cur, tmp, outs[j + 1].uid, -1,
                            lengths[j], false});
      cur = tmp;
      if (j == 1) break;
    }
    if (k >= 1) {
      stage.rels.push_back({0, cur, outs[0].uid, outs[1].uid, -1,
                            lengths[0], false});
    }
  } else {
    int cur = it.uid;
    for (size_t j = 0; j < k; ++j) {
      int inner = (j == k - 1) ? outs[j + 1].uid : st.fresh();
      stage.rels.push_back({0, cur, outs[j].uid, inner, -1, lengths[j],
                            true});
      cur = inner;
    }
  }

  stage.iters.erase(stage.iters.begin() + iter_id);
  stage.iters.insert(stage.iters.begin() + iter_id, outs.begin(), outs.end());

  std::vector<std::pair<int, int>> remap;
  for (int i = iter_id; i < old_size; ++i) {
    remap.emplace_back(i, i + static_cast<int>(lengths.size()));
  }
  update_attach_positions(st, stage_id, remap);
}

inline std::vector<long> extract_follow_split_lengths(const State& st,
                                               const Step& step) {
  const Step& src = st.steps[step.src_step_id];
  std::vector<long> lengths(src.lengths.begin(),
                            src.lengths.begin() +
                                std::min<size_t>(step.n_split - 1,
                                                 src.lengths.size()));
  long last = 1;
  for (size_t i = step.n_split - 1; i < src.lengths.size(); ++i) {
    if (src.lengths[i] < 0) { last = -1; break; }
    last *= src.lengths[i];
  }
  lengths.push_back(last);
  return lengths;
}

inline long extract_follow_fused_length(const State& st, const Step& step) {
  long ret = 1;
  for (int sid : step.ids) {
    const Step& src = st.steps[sid];
    if (step.level >= static_cast<int>(src.lengths.size()) ||
        src.lengths[step.level] < 0) {
      return -1;
    }
    ret *= src.lengths[step.level];
  }
  return ret;
}

inline void apply_cache_read(State& st, const Step& step) {
  int src_stage = step.stage_id;
  int src_op = st.stages[src_stage].op;
  // new op: identity read of src
  OpDesc cache;
  cache.kind = 1;
  cache.dims = st.ops[src_op].dims;
  ReadDesc rd;
  rd.src_op = src_op;
  for (size_t d = 0; d < cache.dims.size(); ++d) {
    AffineIdx ai;
    ai.terms.emplace_back(static_cast<int>(d), 1);
    rd.idx.push_back(ai);
  }
  cache.reads.push_back(rd);
  int new_op = static_cast<int>(st.ops.size());
  st.ops.push_back(cache);

  // retarget readers (pre-insertion stage ids)
  for (int rid : step.ids) {
    // reader ids are pre-insertion stage indices; the stage list is
    // untouched at this point, so they index directly
    int reader_op = st.stages[rid].op;
    for (auto& r : st.ops[reader_op].reads) {
      if (r.src_op == src_op) r.src_op = new_op;
    }
  }

  // insert the new stage after src_stage
  Stage s;
  s.op = new_op;
  for (size_t d = 0; d < cache.dims.size(); ++d) {
    int u = st.fresh();
    s.iters.push_back({u, cache.dims[d], 0, ANN_NONE});
    s.roots.emplace_back(u, cache.dims[d]);
    s.root_is_reduce.push_back(0);
  }
  s.is_shared = step.scope_is_shared;
  int added = src_stage + 1;
  st.stages.insert(st.stages.begin() + added, s);
  st.attach_tgt.insert(st.attach_tgt.begin() + added, -1);
  st.attach_pos.insert(st.attach_pos.begin() + added, -1);
  st.attach_seq.insert(st.attach_seq.begin() + added, -1);
  for (size_t i = 0; i < st.attach_tgt.size(); ++i) {
    if (static_cast<int>(i) != added && st.attach_tgt[i] >= added) {
      st.attach_tgt[i] += 1;
    }
  }
}

inline void apply_cache_write(State& st, const Step& step) {
  int tgt_stage = step.stage_id;
  int orig_op = st.stages[tgt_stage].op;
  // by value: push_back below may reallocate st.ops
  OpDesc orig = st.ops[orig_op];

  // cache op: the original computation (same dims/reduce/reads)
  OpDesc cache = orig;
  int cache_op = static_cast<int>(st.ops.size());
  st.ops.push_back(cache);

  // original becomes identity copy reading the cache op
  OpDesc copy;
  copy.kind = 1;
  copy.dims = orig.dims;
  ReadDesc rd;
  rd.src_op = cache_op;
  for (size_t d = 0; d < copy.dims.size(); ++d) {
    AffineIdx ai;
    ai.terms.emplace_back(static_cast<int>(d), 1);
    rd.idx.push_back(ai);
  }
  copy.reads.push_back(rd);
  int copy_op = static_cast<int>(st.ops.size());
  st.ops.push_back(copy);

  // fresh cache stage inserted at tgt_stage; target stage reset to copy op
  Stage cs;
  cs.op = cache_op;
  for (size_t d = 0; d < st.ops[cache_op].dims.size(); ++d) {
    int u = st.fresh();
    cs.iters.push_back({u, st.ops[cache_op].dims[d], 0, ANN_NONE});
    cs.roots.emplace_back(u, st.ops[cache_op].dims[d]);
    cs.root_is_reduce.push_back(0);
  }
  for (size_t d = 0; d < st.ops[cache_op].reduce.size(); ++d) {
    int u = st.fresh();
    cs.iters.push_back({u, st.ops[cache_op].reduce[d], 1, ANN_NONE});
    cs.roots.emplace_back(u, st.ops[cache_op].reduce[d]);
    cs.root_is_reduce.push_back(1);
  }

  Stage ns;
  ns.op = copy_op;
  for (size_t d = 0; d < copy.dims.size(); ++d) {
    int u = st.fresh();
    ns.iters.push_back({u, copy.dims[d], 0, ANN_NONE});
    ns.roots.emplace_back(u, copy.dims[d]);
    ns.root_is_reduce.push_back(0);
  }
  st.stages[tgt_stage] = ns;
  st.stages.insert(st.stages.begin() + tgt_stage, cs);
  st.attach_tgt.insert(st.attach_tgt.begin() + tgt_stage, -1);
  st.attach_pos.insert(st.attach_pos.begin() + tgt_stage, -1);
  st.attach_seq.insert(st.attach_seq.begin() + tgt_stage, -1);
  for (size_t i = 0; i < st.attach_tgt.size(); ++i) {
    if (static_cast<int>(i) != tgt_stage && st.attach_tgt[i] >= tgt_stage) {
      st.attach_tgt[i] += 1;
    }
  }
  // consumers of the original keep reading orig_op — but orig_op is now
  // the copy's identity...  consumers read `orig_op`; the table entry for
  // orig_op must become the copy op's content so their reads stay valid.
  st.ops[orig_op] = copy;
  // and the copy stage points at orig_op (not copy_op) for consistency
  st.stages[tgt_stage + 1].op = orig_op;
}

// rfactor: src -> src.rf (partial reduction; the factored split part
// becomes a spatial dim) + src (reduction of src.rf over that dim) —
// mirror of ir/steps.py RfactorStep.apply_to_state + dag._apply_rfactor.
// The rf op's affine reads are non-affine (floordiv/mod unflattening), so
// they stay empty; demand propagation must run through the
// full-expression hook (as the featurizers do).
inline bool apply_rfactor(State& st, const Step& step) {
  int n = static_cast<int>(st.steps.size());
  // context: steps[n-1] is this RF; steps[n-2] must be the reduce split
  if (n < 2 || st.steps[n - 2].kind != S_SP) return false;
  const Step& sp = st.steps[n - 2];
  if (sp.lengths.size() != 1 || sp.lengths[0] < 0) return false;
  int stage_id = step.stage_id;
  if (stage_id < 0 || stage_id >= static_cast<int>(st.stages.size())) {
    return false;
  }
  int src_op = st.stages[stage_id].op;
  OpDesc src = st.ops[src_op];  // by value: pushes below may reallocate
  int n_spatial = static_cast<int>(src.dims.size());
  if (src.reduce.empty()) return false;
  long total = 1;
  for (long r : src.reduce) total *= r;
  long inner_len = sp.lengths[0];
  long outer_len = ceil_div(total, inner_len);
  long rf_extent, other_extent;
  if (step.iter_id == n_spatial) {
    rf_extent = outer_len;
    other_extent = inner_len;
  } else if (step.iter_id == n_spatial + 1) {
    rf_extent = inner_len;
    other_extent = outer_len;
  } else {
    return false;
  }
  int fpos = step.level;  // factor_iter_id
  if (fpos < 0 || fpos > n_spatial) return false;

  // rf op: spatial dims with the rf axis inserted at fpos
  OpDesc rf;
  rf.kind = 1;
  rf.dims = src.dims;
  rf.dims.insert(rf.dims.begin() + fpos, rf_extent);
  rf.reduce = {other_extent};
  int rf_idx = static_cast<int>(st.ops.size());
  st.ops.push_back(rf);

  // the original op becomes a reduction of rf over the factored axis;
  // consumers keep reading src_op (its table slot is rewritten in place)
  OpDesc red;
  red.kind = 1;
  red.dims = src.dims;
  red.reduce = {rf_extent};
  ReadDesc rd;
  rd.src_op = rf_idx;
  for (int d = 0; d <= n_spatial; ++d) {
    AffineIdx ai;
    if (d == fpos) {
      ai.terms.emplace_back(n_spatial, 1);  // the new reduce var
    } else {
      int sd = d < fpos ? d : d - 1;
      ai.terms.emplace_back(sd, 1);
    }
    rd.idx.push_back(ai);
  }
  red.reads.push_back(rd);
  st.ops[src_op] = red;

  // fresh stages (python re-creates both from the new ops)
  auto make_stage = [&](int op_idx) {
    Stage s2;
    s2.op = op_idx;
    const OpDesc& od = st.ops[op_idx];
    for (size_t d = 0; d < od.dims.size(); ++d) {
      int u = st.fresh();
      s2.iters.push_back({u, od.dims[d], 0, ANN_NONE});
      s2.roots.emplace_back(u, od.dims[d]);
      s2.root_is_reduce.push_back(0);
    }
    for (size_t d = 0; d < od.reduce.size(); ++d) {
      int u = st.fresh();
      s2.iters.push_back({u, od.reduce[d], 1, ANN_NONE});
      s2.roots.emplace_back(u, od.reduce[d]);
      s2.root_is_reduce.push_back(1);
    }
    return s2;
  };
  int8_t ca_type = st.stages[stage_id].compute_at;
  Stage tgt = make_stage(src_op);
  tgt.compute_at = ca_type;
  st.stages[stage_id] = tgt;
  st.stages.insert(st.stages.begin() + stage_id, make_stage(rf_idx));
  st.attach_tgt.insert(st.attach_tgt.begin() + stage_id,
                       -1);
  st.attach_pos.insert(st.attach_pos.begin() + stage_id, -1);
  st.attach_seq.insert(st.attach_seq.begin() + stage_id, -1);
  for (size_t i = 0; i < st.attach_tgt.size(); ++i) {
    if (static_cast<int>(i) != stage_id && st.attach_tgt[i] >= stage_id) {
      st.attach_tgt[i] += 1;
    }
  }
  return true;
}

inline bool apply_step(State& st, const Step& step) {
  // bounds guards: mutated candidate schedules (native evolutionary
  // search) can carry out-of-range ids; mirror the python path where
  // apply_steps raises and the child is discarded
  if (step.stage_id < 0 ||
      step.stage_id >= static_cast<int>(st.stages.size())) {
    return false;
  }
  switch (step.kind) {
    case S_AN: {
      Stage& s = st.stages[step.stage_id];
      if (step.iter_id < 0 ||
          step.iter_id >= static_cast<int>(s.iters.size())) {
        return false;
      }
      s.iters[step.iter_id].annotation =
          static_cast<int8_t>(step.level);  // reuse .level = annotation
      return true;
    }
    case S_FU: {
      Stage& s = st.stages[step.stage_id];
      if (step.ids.empty()) return true;
      for (int id : step.ids) {
        if (id < 0 || id >= static_cast<int>(s.iters.size())) return false;
      }
      long ext = 1;
      int kind = s.iters[step.ids.front()].kind;
      bool defined = true;
      std::vector<int> uids;
      for (int id : step.ids) {
        const Iter& it = s.iters[id];
        uids.push_back(it.uid);
        if (it.extent < 0) defined = false;
        else ext *= it.extent;
        if (it.kind != kind) kind = 2;
      }
      Iter fused{st.fresh(), defined ? ext : -1, static_cast<int8_t>(kind),
                 ANN_NONE};
      if (uids.size() >= 2) {
        int cur = uids[0];
        for (size_t j = 1; j < uids.size(); ++j) {
          int f = (j == uids.size() - 1) ? fused.uid : st.fresh();
          s.rels.push_back({1, -1, cur, uids[j], f, -1, false});
          cur = f;
        }
      } else {
        s.rels.push_back({1, -1, uids[0], -1, fused.uid, -1, false});
      }
      int b = step.ids.front(), e = step.ids.back();
      int old_size = static_cast<int>(s.iters.size());
      s.iters.erase(s.iters.begin() + b, s.iters.begin() + e + 1);
      s.iters.insert(s.iters.begin() + b, fused);
      std::vector<std::pair<int, int>> remap;
      for (int i = 0; i < old_size; ++i) {
        if (i <= b) continue;
        else if (i > e) remap.emplace_back(i, i - e + b);
        else remap.emplace_back(i, b);
      }
      update_attach_positions(st, step.stage_id, remap);
      return true;
    }
    case S_PR: {
      if (step.pragma_skip) return true;
      if (step.pragma_value >= 0) {
        st.stages[step.stage_id].auto_unroll = step.pragma_value;
      }
      return true;
    }
    case S_RE: {
      Stage& s = st.stages[step.stage_id];
      std::vector<Iter> ni;
      for (int id : step.ids) {
        if (id < 0 || id >= static_cast<int>(s.iters.size())) return false;
      }
      for (int id : step.ids) ni.push_back(s.iters[id]);
      s.iters = std::move(ni);
      return true;
    }
    case S_SP:
      if (step.iter_id < 0 ||
          step.iter_id >=
              static_cast<int>(st.stages[step.stage_id].iters.size())) {
        return false;
      }
      apply_split_common(st, step.stage_id, step.iter_id, step.lengths,
                         step.inner_to_outer);
      return true;
    case S_FSP: {
      if (step.iter_id < 0 ||
          step.iter_id >=
              static_cast<int>(st.stages[step.stage_id].iters.size()) ||
          step.src_step_id < 0 ||
          step.src_step_id >= static_cast<int>(st.steps.size())) {
        return false;
      }
      auto lengths = extract_follow_split_lengths(st, step);
      apply_split_common(st, step.stage_id, step.iter_id, lengths, true);
      return true;
    }
    case S_FFSP: {
      if (step.iter_id < 0 ||
          step.iter_id >=
              static_cast<int>(st.stages[step.stage_id].iters.size())) {
        return false;
      }
      for (int sid : step.ids) {
        if (sid < 0 || sid >= static_cast<int>(st.steps.size())) {
          return false;
        }
      }
      long len = extract_follow_fused_length(st, step);
      apply_split_common(st, step.stage_id, step.iter_id, {len},
                         step.inner_to_outer);
      return true;
    }
    case S_SA:
      return true;  // storage align: no effect on extents
    case S_CA: {
      if (step.target_stage_id < 0 ||
          step.target_stage_id >= static_cast<int>(st.stages.size())) {
        return false;
      }
      Stage& s = st.stages[step.stage_id];
      for (auto& it : s.iters) it.extent = -1;
      s.compute_at = AT_ITER;
      st.attach_tgt[step.stage_id] = step.target_stage_id;
      st.attach_pos[step.stage_id] = step.target_iter_id;
      st.attach_seq[step.stage_id] = st.attach_counter++;
      return true;
    }
    case S_CI: {
      st.stages[step.stage_id].compute_at = AT_INLINED;
      st.attach_tgt[step.stage_id] = -1;
      return true;
    }
    case S_CR: {
      Stage& s = st.stages[step.stage_id];
      for (auto& it : s.iters) it.extent = -1;
      s.compute_at = AT_ROOT;
      st.attach_tgt[step.stage_id] = -1;
      return true;
    }
    case S_CHR:
      for (int rid : step.ids) {
        if (rid < 0 || rid >= static_cast<int>(st.stages.size())) {
          return false;
        }
      }
      apply_cache_read(st, step);
      return true;
    case S_CHW:
      apply_cache_write(st, step);
      return true;
    case S_RF:
      return apply_rfactor(st, step);
  }
  return false;
}

// ---------------------------------------------------------------------
// Bound inference (port of ir/bound.py)
// ---------------------------------------------------------------------

struct Bounds {
  // per stage: uid -> extent (dense arrays via uid index into vector)
  std::vector<std::vector<long>> ext;  // indexed by global uid (resized)
};

struct StageBounds {
  std::vector<char> dominates_thread;  // by uid

  void build(const State& st, const Stage& stage, int max_uid) {
    dominates_thread.assign(max_uid, 0);
    for (auto& it : stage.iters) {
      if (is_thread_ann(it.annotation)) dominates_thread[it.uid] = 1;
    }
    for (auto r = stage.rels.rbegin(); r != stage.rels.rend(); ++r) {
      if (r->kind == 0) {
        dominates_thread[r->parent] =
            dominates_thread[r->outer] | dominates_thread[r->inner];
      } else {
        char d = dominates_thread[r->fused];
        dominates_thread[r->outer] = d;
        if (r->inner >= 0) dominates_thread[r->inner] = d;
      }
    }
  }

  void pass_down(const Stage& stage, std::vector<long>& ext) const {
    for (auto& r : stage.rels) {
      if (r.kind == 0) {
        long p = ext[r.parent];
        if (p < 0 || r.factor < 0) continue;
        if (!r.by_nparts) {
          ext[r.inner] = dominates_thread[r.inner]
                             ? r.factor
                             : std::min(p, r.factor);
          ext[r.outer] = ceil_div(p, r.factor);
        } else {
          ext[r.outer] = dominates_thread[r.outer]
                             ? r.factor
                             : std::min(p, r.factor);
          ext[r.inner] = ceil_div(p, r.factor);
        }
      } else {
        long o = ext[r.outer];
        if (o < 0) continue;
        if (r.inner < 0) {
          ext[r.fused] = o;
        } else if (ext[r.inner] >= 0) {
          ext[r.fused] = o * ext[r.inner];
        }
      }
    }
  }

  void pass_up_local(const Stage& stage, const std::vector<long>& full,
                     std::vector<long>& local) const {
    for (auto r = stage.rels.rbegin(); r != stage.rels.rend(); ++r) {
      if (r->kind == 0) {
        long o = local[r->outer], i = local[r->inner];
        if (o < 0 || i < 0) continue;
        long p_full = full[r->parent];
        long stride = full[r->inner] >= 0 ? full[r->inner]
                                          : (r->factor >= 0 ? r->factor : 1);
        long p_local = o >= 1 ? (o - 1) * stride + i : i;
        if (p_full >= 0) {
          if (o == full[r->outer] && i == full[r->inner]) p_local = p_full;
          p_local = std::min(p_local, p_full);
        }
        local[r->parent] = p_local;
      } else {
        long fl = local[r->fused];
        if (fl < 0) continue;
        if (r->inner < 0) {
          local[r->outer] = fl;
          continue;
        }
        long f_full = full[r->fused];
        long i_full = full[r->inner] >= 0 ? full[r->inner] : 1;
        if (f_full >= 0 && fl == f_full) {
          local[r->outer] = full[r->outer] >= 0 ? full[r->outer] : fl;
          local[r->inner] = i_full;
        } else {
          local[r->inner] = i_full > 0 ? std::min(fl, i_full) : fl;
          local[r->outer] = i_full > 0 ? ceil_div(fl, i_full) : 1;
        }
      }
    }
  }
};

struct Interval {
  long lo, hi;
};

// optional full-expression read evaluator: (consumer op idx, dim
// intervals, demand accumulator) -> false on evaluation failure. When
// set it replaces the affine read tables for demand propagation (the
// python reference, ir/bound.py, always evaluates full expressions).
using ReadEvalHook = std::function<bool(
    int, const std::vector<struct Interval>&,
    std::vector<std::vector<struct Interval>>&)>;

struct InferCtx {
  const State* st;
  ReadEvalHook read_hook;
  bool fail = false;
  std::vector<StageBounds> sb;
  std::vector<std::vector<long>> full;     // per stage: uid -> extent
  std::vector<std::vector<long>> relaxed;  // thread-relaxed variant
  int max_uid;

  // demanded interval per op dim, filled during demand propagation
  // (op -> dim -> interval); -1 lo means unset
  std::vector<std::vector<Interval>> demand;

  void eval_read_intervals(const OpDesc& consumer,
                           const std::vector<Interval>& dim_iv,
                           int skip_op /*-1*/) {
    for (auto& rd : consumer.reads) {
      const OpDesc& src = st->ops[rd.src_op];
      std::vector<Interval>& dst = demand[rd.src_op];
      if (dst.empty()) {
        dst.assign(rd.idx.size(), {0, -1});
      }
      for (size_t d = 0; d < rd.idx.size(); ++d) {
        long lo = rd.idx[d].cst, hi = rd.idx[d].cst;
        for (auto& t : rd.idx[d].terms) {
          const Interval& iv = dim_iv[t.first];
          if (t.second >= 0) {
            lo += t.second * iv.lo;
            hi += t.second * iv.hi;
          } else {
            lo += t.second * iv.hi;
            hi += t.second * iv.lo;
          }
        }
        long cap = d < src.dims.size() ? src.dims[d] - 1
                                       : (1L << 40);
        lo = std::max(0L, lo);
        hi = std::min(cap, hi);
        if (hi < lo) { lo = 0; hi = 0; }
        if (dst[d].hi < dst[d].lo) {
          dst[d] = {lo, hi};
        } else {
          dst[d].lo = std::min(dst[d].lo, lo);
          dst[d].hi = std::max(dst[d].hi, hi);
        }
      }
    }
  }

  // demand for everything read inside (consumer stage, attach_pos);
  // relax_threads mirrors te NeedRelax for shared-scope producers
  // (thread-bound loops outside the attach point span their full range)
  void demanded_region(int consumer_id, int attach_pos,
                       bool relax_threads) {
    for (auto& d : demand) d.clear();
    const Stage& stage = st->stages[consumer_id];
    const std::vector<long>& f =
        relax_threads ? relaxed[consumer_id] : full[consumer_id];

    std::vector<long> local = f;
    for (size_t pos = 0; pos < stage.iters.size(); ++pos) {
      long e = f[stage.iters[pos].uid];
      if (e < 0) e = stage.iters[pos].extent >= 0 ? stage.iters[pos].extent : 1;
      int ann = stage.iters[pos].annotation;
      bool pinned = static_cast<int>(pos) <= attach_pos;
      // vthread / threadIdx.* relax; blockIdx never does
      if (pinned && relax_threads &&
          (ann == ANN_VTHREAD || ann == ANN_THREAD_X ||
           ann == ANN_THREAD_Y || ann == ANN_THREAD_Z)) {
        pinned = false;
      }
      local[stage.iters[pos].uid] = pinned ? 1 : e;
    }
    sb[consumer_id].pass_up_local(stage, f, local);

    // dim intervals of the consumer's op
    const OpDesc& op = st->ops[stage.op];
    size_t ndim = op.dims.size() + op.reduce.size();
    std::vector<Interval> dim_iv(ndim, {0, 0});
    for (size_t i = 0; i < stage.roots.size() && i < ndim; ++i) {
      long le = local[stage.roots[i].first];
      if (le < 0) le = stage.roots[i].second;
      dim_iv[i] = {0, std::max(0L, le - 1)};
    }
    if (read_hook) {
      if (!read_hook(stage.op, dim_iv, demand)) fail = true;
    } else {
      eval_read_intervals(op, dim_iv, -1);
    }

    // propagate through inlined stages (reverse stage order)
    for (int sid = static_cast<int>(st->stages.size()) - 1; sid >= 0; --sid) {
      const Stage& s2 = st->stages[sid];
      if (s2.compute_at != AT_INLINED) continue;
      const OpDesc& op2 = st->ops[s2.op];
      std::vector<Interval>& dem = demand[s2.op];
      if (dem.empty()) continue;
      size_t nd2 = op2.dims.size() + op2.reduce.size();
      std::vector<Interval> iv2(nd2, {0, 0});
      for (size_t d = 0; d < op2.dims.size() && d < dem.size(); ++d) {
        iv2[d] = dem[d].hi >= dem[d].lo ? dem[d] : Interval{0, 0};
      }
      for (size_t d = 0; d < op2.reduce.size(); ++d) {
        iv2[op2.dims.size() + d] = {0, op2.reduce[d] - 1};
      }
      if (read_hook) {
        if (!read_hook(s2.op, iv2, demand)) fail = true;
      } else {
        eval_read_intervals(op2, iv2, -1);
      }
    }
  }
};


// ---------------------------------------------------------------------
// Step-token decoding
// ---------------------------------------------------------------------

inline bool decode_steps(const int32_t* toks, int64_t begin, int64_t end,
                  const char* pool, const int64_t* str_offs,
                  std::vector<Step>& steps) {
  int64_t i = begin;
  while (i < end) {
    if (i + 2 > end) return false;  // truncated header
    Step s;
    s.kind = toks[i];
    int n = toks[i + 1];
    if (s.kind < 0 || s.kind > S_RF || n < 0 || i + 2 + n > end) {
      return false;  // corrupt stream
    }
    i += 2;
    std::vector<long> args;         // scalar args in order
    std::vector<std::vector<int>> lists;
    std::vector<int> list_pos;      // which scalar-arg position the list was at
    std::vector<int> str_ids;
    std::vector<int> str_pos;
    int64_t j = i;
    int argpos = 0;
    while (j < i + n) {
      int32_t v = toks[j];
      if (v <= -1000000) {
        str_ids.push_back(-1000000 - v);
        str_pos.push_back(argpos);
        ++j;
      } else if (v < 0) {
        int ln = -v - 1;
        if (j + 1 + ln > i + n) return false;  // list overruns the step
        std::vector<int> lst(toks + j + 1, toks + j + 1 + ln);
        lists.push_back(std::move(lst));
        list_pos.push_back(argpos);
        j += 1 + ln;
      } else {
        args.push_back(v);
        ++j;
      }
      ++argpos;
    }
    i += n;

    auto need = [&](size_t k) { return args.size() >= k; };
    switch (s.kind) {
      case S_AN:  // [stage, iter, annotation]
        if (!need(3)) return false;
        s.stage_id = args[0]; s.iter_id = args[1]; s.level = args[2];
        break;
      case S_FU:  // [stage, [ids]]
        if (!need(1)) return false;
        s.stage_id = args[0];
        s.ids = lists.empty() ? std::vector<int>{} : lists[0];
        break;
      case S_PR: {  // [stage, iter, "pragma"]
        if (!need(2)) return false;
        s.stage_id = args[0]; s.iter_id = args[1];
        s.pragma_value = -1;
        if (!str_ids.empty()) {
          const char* p = pool + str_offs[str_ids[0]];
          const char* marker = strstr(p, "auto_unroll_max_step");
          if (marker) {
            const char* dollar = strchr(p, '$');
            if (dollar) s.pragma_value = atol(dollar + 1);
          } else if (strstr(p, "debug_skip_region")) {
            s.pragma_skip = true;  // rare; extents unaffected enough
          }
        }
        break;
      }
      case S_RE:
        if (!need(1)) return false;
        s.stage_id = args[0];
        s.ids = lists.empty() ? std::vector<int>{} : lists[0];
        break;
      case S_SP: {  // [stage, iter, extent, [lengths], inner_to_outer]
        if (!need(4) || lists.empty()) return false;
        s.stage_id = args[0]; s.iter_id = args[1]; s.extent = args[2];
        for (int x : lists[0]) s.lengths.push_back(x);
        s.inner_to_outer = args[3] != 0;
        break;
      }
      case S_FSP:  // [stage, iter, src_step, n_split]
        if (!need(4)) return false;
        s.stage_id = args[0]; s.iter_id = args[1];
        s.src_step_id = args[2]; s.n_split = args[3];
        break;
      case S_FFSP:  // [stage, iter, [src_ids], level, factor_or_nparts]
        if (!need(4) || lists.empty()) return false;
        s.stage_id = args[0]; s.iter_id = args[1];
        s.ids = lists[0]; s.level = args[2];
        s.inner_to_outer = args[3] != 0;
        break;
      case S_SA:  // [stage, iter, factor, offset]
        if (!need(1)) return false;
        s.stage_id = args[0];
        break;
      case S_CA:  // [stage, target_stage, target_iter]
        if (!need(3)) return false;
        s.stage_id = args[0]; s.target_stage_id = args[1];
        s.target_iter_id = args[2];
        break;
      case S_CI:
      case S_CR:
        if (!need(1)) return false;
        s.stage_id = args[0];
        break;
      case S_CHR: {  // [stage, "scope", [reader_ids]]
        if (!need(1)) return false;
        s.stage_id = args[0];
        s.ids = lists.empty() ? std::vector<int>{} : lists[0];
        if (!str_ids.empty()) {
          const char* sc = pool + str_offs[str_ids[0]];
          s.scope_is_shared = strcmp(sc, "shared") == 0;
        }
        break;
      }
      case S_CHW:  // [stage, "scope"]
        if (!need(1)) return false;
        s.stage_id = args[0];
        break;
      case S_RF:
        if (!need(1)) return false;
        s.stage_id = args[0];
        s.iter_id = args.size() > 1 ? args[1] : 0;
        s.level = args.size() > 2 ? args[2] : 0;  // factor_iter_id
        break;
      default:
        return false;
    }
    steps.push_back(std::move(s));
  }
  return true;
}


// Run bound inference over the replayed state: fills each stage's iter
// extents and returns the per-(stage,pos) attachment lists for traversal.
struct InferResult {
  std::vector<std::vector<std::pair<int, int>>> attached;  // per stage
  bool ok = false;
};

inline InferResult infer_bounds(State& st,
                                ReadEvalHook read_hook = nullptr) {
  InferResult out;
  int max_uid = st.uid;
  InferCtx ctx;
  ctx.st = &st;
  ctx.read_hook = std::move(read_hook);
  ctx.max_uid = max_uid;
  ctx.sb.resize(st.stages.size());
  ctx.full.assign(st.stages.size(), {});
  ctx.relaxed.assign(st.stages.size(), {});
  ctx.demand.assign(st.ops.size(), {});
  for (size_t i = 0; i < st.stages.size(); ++i) {
    ctx.sb[i].build(st, st.stages[i], max_uid);
  }

  out.attached.resize(st.stages.size());
  for (size_t s = 0; s < st.stages.size(); ++s) {
    if (st.attach_tgt[s] >= 0) {
      out.attached[st.attach_tgt[s]].emplace_back(st.attach_pos[s],
                                                  static_cast<int>(s));
    }
  }
  // per position, attached stages in CA application order (python
  // AttachMap append order)
  for (auto& v : out.attached) {
    std::stable_sort(v.begin(), v.end(), [&](auto& a, auto& b) {
      if (a.first != b.first) return a.first < b.first;
      return st.attach_seq[a.second] < st.attach_seq[b.second];
    });
  }

  auto roots_from_demand = [&](const Stage& a_stage) {
    std::vector<long> roots(max_uid, -1);
    const std::vector<Interval>& dem = ctx.demand[a_stage.op];
    for (size_t i = 0; i < a_stage.roots.size(); ++i) {
      long fullext = a_stage.roots[i].second;
      if (!a_stage.root_is_reduce[i] && i < dem.size() &&
          dem[i].hi >= dem[i].lo) {
        roots[a_stage.roots[i].first] =
            std::min(dem[i].hi - dem[i].lo + 1, fullext);
      } else {
        roots[a_stage.roots[i].first] = fullext;
      }
    }
    return roots;
  };

  std::function<void(int, std::vector<long>&, std::vector<long>&)> process =
      [&](int sid, std::vector<long>& root_ext,
          std::vector<long>& relaxed_root_ext) {
        Stage& stage = st.stages[sid];
        std::vector<long> ext(max_uid, -1), rext(max_uid, -1);
        for (auto& kv : stage.roots) {
          ext[kv.first] = root_ext[kv.first] >= 0 ? root_ext[kv.first]
                                                  : kv.second;
          rext[kv.first] =
              relaxed_root_ext[kv.first] >= 0 ? relaxed_root_ext[kv.first]
                                              : kv.second;
        }
        ctx.sb[sid].pass_down(stage, ext);
        ctx.sb[sid].pass_down(stage, rext);
        ctx.full[sid] = ext;
        ctx.relaxed[sid] = rext;
        for (auto& it : stage.iters) {
          long e = ext[it.uid];
          it.extent = e >= 0 ? e : (it.extent >= 0 ? it.extent : 1);
        }
        for (auto& pa : out.attached[sid]) {
          int pos = pa.first, a_sid = pa.second;
          Stage& a_stage = st.stages[a_sid];
          ctx.demanded_region(sid, pos, a_stage.is_shared);
          std::vector<long> roots = roots_from_demand(a_stage);
          ctx.demanded_region(sid, pos, true);
          std::vector<long> r_roots = roots_from_demand(a_stage);
          process(a_sid, roots, r_roots);
        }
      };

  for (size_t sid = 0; sid < st.stages.size(); ++sid) {
    Stage& stage = st.stages[sid];
    if (st.ops[stage.op].kind == 0 || stage.compute_at != AT_ROOT) continue;
    std::vector<long> roots(max_uid, -1);
    std::vector<long> roots2(max_uid, -1);
    process(static_cast<int>(sid), roots, roots2);
  }
  out.ok = !ctx.fail;
  return out;
}

// structural hash of a replayed state: stage ops, compute locations,
// iterator extents/annotations and attachments — the native equivalent of
// dedup by State::ToStr (names are determined by ops and order)
inline uint64_t state_struct_hash(const State& st) {
  uint64_t h = 1469598103934665603ULL;  // FNV-1a
  auto mix = [&h](long v) {
    h ^= static_cast<uint64_t>(v);
    h *= 1099511628211ULL;
  };
  for (size_t sid = 0; sid < st.stages.size(); ++sid) {
    const Stage& s = st.stages[sid];
    mix(s.op);
    mix(s.compute_at);
    mix(s.auto_unroll);
    mix(st.attach_tgt[sid]);
    mix(st.attach_pos[sid]);
    mix(static_cast<long>(s.iters.size()));
    for (auto& it : s.iters) {
      mix(it.extent);
      mix(it.annotation);
      mix(it.kind);
    }
  }
  return h;
}

// print-order extent extraction over an inferred state (the VAE-extent
// feature: loop extents in print order + auto_unroll values,
// vae_extent_search.py:166-176)
inline void extract_extents(State& st, const InferResult& inf,
                            std::vector<float>& extents,
                            std::vector<float>& unrolls) {
  std::function<void(int)> extract = [&](int sid) {
    Stage& stage = st.stages[sid];
    if (stage.auto_unroll != 0) {
      unrolls.push_back(static_cast<float>(stage.auto_unroll));
    }
    for (size_t pos = 0; pos < stage.iters.size(); ++pos) {
      long e = stage.iters[pos].extent;
      if (e != 1 && e >= 0) {
        extents.push_back(static_cast<float>(e));
      }
      for (auto& pa : inf.attached[sid]) {
        if (pa.first == static_cast<int>(pos)) extract(pa.second);
      }
    }
  };
  for (size_t sid = 0; sid < st.stages.size(); ++sid) {
    if (st.ops[st.stages[sid].op].kind == 0 ||
        st.stages[sid].compute_at != AT_ROOT) {
      continue;
    }
    extract(static_cast<int>(sid));
  }
}

}  // namespace ves

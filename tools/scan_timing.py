"""Shared scan-based chip timing harness for the tools/ chip benchmarks.

Methodology (docs/ROUND_NOTES.md): on the tunneled backend, per-dispatch
timing carries a ~1-6 ms host gap per call, so every variant is timed as
K phases inside ONE compiled program — a `lax.scan` over K
independently-initialized parameter sets (stops XLA hoisting
loop-invariant work) — with variants interleaved across repetitions so
host drift hits them equally. bench.py carries its own self-contained
copy of this harness (the driver runs it standalone).
"""

import time

import jax
import jax.numpy as jnp


def stack_params(init_fn, key, k):
    """K independently-initialized parameter sets, stacked leaf-wise."""
    per_phase = [init_fn(jax.random.fold_in(key, 1000 + i))
                 for i in range(k)]
    return jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *per_phase)


def chain_of(one_phase, stacked):
    """jit of: scan `one_phase(params_i, key_i) -> f32 scalar` over the
    stacked parameter sets, summing the phase scalars (so no phase can
    be elided)."""
    @jax.jit
    def chain(key):
        def body(carry, p):
            k = jax.random.fold_in(key, carry[1])
            return (carry[0] + one_phase(p, k), carry[1] + 1), None
        (tot, _), _ = jax.lax.scan(body, (jnp.float32(0), 0), stacked)
        return tot
    return chain


def rtt_probe(n=10):
    """Median round-trip latency of a trivial jitted call + device_get."""
    trivial = jax.jit(lambda s: s + 1)
    float(trivial(jnp.float32(0)))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        float(trivial(jnp.float32(0)))
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def time_variants(variants, key, k_phases, reps=6, skip_broken=True):
    """Compile each (name, chain) once, then time them interleaved.
    Returns {name: best_seconds_per_phase}."""
    alive = []
    for name, fn in variants:
        try:
            float(fn(jax.random.fold_in(key, 0)))
            alive.append((name, fn))
        except Exception as e:  # noqa: BLE001 - report and continue
            if not skip_broken:
                raise
            print(f"  {name}: SKIP ({str(e)[:80]})")
    rtt = rtt_probe()
    res = {name: [] for name, _ in alive}
    for rep in range(reps):
        for name, fn in alive:
            t0 = time.perf_counter()
            float(fn(jax.random.fold_in(key, rep + 1)))
            res[name].append(
                max(time.perf_counter() - t0 - rtt, 1e-9) / k_phases)
    print(f"rtt={rtt*1e3:.2f} ms (best-of-{reps}, K={k_phases}, scan)")
    return {name: min(ts) for name, ts in res.items()}

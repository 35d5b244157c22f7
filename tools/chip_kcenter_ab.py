"""A/B the k-center pool core: fori_loop vs unrolled greedy steps.

The greedy loop is 12-13 iterations of [P]-sized ops — compute is
microseconds, so any difference is pure loop machinery. Scan-based
timing (one compiled program per window), interleaved per
docs/ROUND_NOTES.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax
    import jax.numpy as jnp

    from vae_extent_search_tpu.ops.kcenter import (
        NEG_INF,
        _sq_dist_block,
        k_center_greedy_pool_core,
    )

    P, C, D, K_SEL = 320, 4096, 64, 13
    KW = 32  # phases per window
    key = jax.random.PRNGKey(0)
    zs = jax.random.normal(key, (KW, P, D), jnp.float32)
    cs = jax.random.normal(jax.random.fold_in(key, 1), (KW, C, D),
                           jnp.float32)
    avail = jnp.ones((P,), bool)
    c_valid = jnp.ones((C,), bool)

    def unrolled_core(z_pool, avail, centers, c_valid, k):
        min_sq = _sq_dist_block(z_pool, centers, c_valid).min(axis=1)
        sel = []
        val = []
        for _ in range(k):
            score = jnp.where(avail, min_sq, NEG_INF)
            j = jnp.argmax(score)
            sel.append(jnp.int32(j))
            val.append(score[j] > NEG_INF / 2)
            avail = avail.at[j].set(False)
            d_new = jnp.maximum(jnp.sum((z_pool - z_pool[j]) ** 2, -1), 0.0)
            min_sq = jnp.minimum(min_sq, d_new)
        return jnp.stack(sel), jnp.stack(val)

    def chain(core):
        @jax.jit
        def run(zs, cs):
            def body(carry, zc):
                z, c = zc
                sel, val = core(z, avail, c, c_valid, K_SEL)
                return carry + sel.sum() + val.sum(), None
            (tot), _ = jax.lax.scan(body, jnp.int32(0), (zs, cs))
            return tot
        return run

    variants = [
        ("fori", chain(lambda *a: k_center_greedy_pool_core(*a[:4], k=a[4]))),
        ("unrolled", chain(unrolled_core)),
    ]
    for name, fn in variants:
        int(fn(zs, cs))  # compile

    # equality check
    a = jax.jit(lambda z, c: k_center_greedy_pool_core(
        z, avail, c, c_valid, K_SEL))(zs[0], cs[0])
    b = jax.jit(lambda z, c: unrolled_core(
        z, avail, c, c_valid, K_SEL))(zs[0], cs[0])
    assert (a[0] == b[0]).all() and (a[1] == b[1]).all(), (a, b)
    print("outputs identical")

    from scan_timing import rtt_probe
    rtt = rtt_probe()

    res = {name: [] for name, _ in variants}
    for rep in range(8):
        for name, fn in variants:
            t0 = time.perf_counter()
            int(fn(zs, cs))
            res[name].append(
                max(time.perf_counter() - t0 - rtt, 1e-9) / KW)
    print(f"P={P} C={C} k={K_SEL} rtt={rtt*1e3:.2f} ms")
    for name, _ in variants:
        print(f"  {name:10s} {min(res[name])*1e6:8.1f} us/call")


if __name__ == "__main__":
    main()

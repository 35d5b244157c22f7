"""Property tests for the symbolic integer-set engine (ir/intset.py).

The engine mirrors te's arith::IntervalSet semantics (src/arith/int_set.cc
EvalSet combiners). Soundness invariant: for any expression over vars with
known ranges, the symbolic interval's numeric bounds must contain every
value the expression can take; for point inputs the result must be exact.
"""

import itertools
import random

import pytest

from vae_extent_search_tpu.ir import expr as E
from vae_extent_search_tpu.ir.intset import (
    LF,
    SI,
    VarAtom,
    lf_floordiv,
    lf_floormod,
    sym_eval,
)


def _mk_vars(ranges):
    """[(Var, VarAtom, range)] for the given (lo, hi) ranges."""
    out = []
    for i, (lo, hi) in enumerate(ranges):
        v = E.Var(f"x{i}")
        out.append((v, VarAtom(v.name, lo, hi), (lo, hi)))
    return out


def _random_expr(rng, vars_, depth):
    if depth == 0 or rng.random() < 0.3:
        if rng.random() < 0.6 and vars_:
            return rng.choice(vars_)[0]
        return E.IntImm(rng.randint(-3, 9))
    a = _random_expr(rng, vars_, depth - 1)
    b = _random_expr(rng, vars_, depth - 1)
    k = rng.random()
    if k < 0.3:
        return E.Add(a, b)
    if k < 0.45:
        return E.Sub(a, b)
    if k < 0.6:
        return E.Mul(a, E.IntImm(rng.randint(0, 6)))
    if k < 0.75:
        return E.FloorDiv(a, E.IntImm(rng.randint(1, 5)))
    if k < 0.9:
        return E.FloorMod(a, E.IntImm(rng.randint(1, 5)))
    return E.Min(a, b) if k < 0.95 else E.Max(a, b)


def _eval_concrete(e, env):
    if isinstance(e, E.IntImm):
        return e.value
    if isinstance(e, E.Var):
        return env[e]
    if isinstance(e, E.Add):
        return _eval_concrete(e.a, env) + _eval_concrete(e.b, env)
    if isinstance(e, E.Sub):
        return _eval_concrete(e.a, env) - _eval_concrete(e.b, env)
    if isinstance(e, E.Mul):
        return _eval_concrete(e.a, env) * _eval_concrete(e.b, env)
    if isinstance(e, E.FloorDiv):
        return _eval_concrete(e.a, env) // _eval_concrete(e.b, env)
    if isinstance(e, E.FloorMod):
        return _eval_concrete(e.a, env) % _eval_concrete(e.b, env)
    if isinstance(e, E.Min):
        return min(_eval_concrete(e.a, env), _eval_concrete(e.b, env))
    if isinstance(e, E.Max):
        return max(_eval_concrete(e.a, env), _eval_concrete(e.b, env))
    raise AssertionError(type(e))


def test_sym_eval_sound_and_point_exact():
    """Fuzz: sym_eval's numeric bounds contain the true value range; when
    all vars are bound to points the result is exact."""
    rng = random.Random(7)
    for trial in range(300):
        nv = rng.randint(1, 3)
        ranges = [(0, rng.randint(1, 6)) for _ in range(nv)]
        vars_ = _mk_vars(ranges)
        var_atoms = {v: a for v, a, _ in vars_}
        e = _random_expr(rng, vars_, depth=3)

        # free-var (pinned) evaluation: must be exact per assignment after
        # substituting each var's value
        si = sym_eval(e, {}, var_atoms)
        lo_n, hi_n = si.nbound() if not si.everything else (None, None)

        domains = [range(lo, hi + 1) for _, _, (lo, hi) in vars_]
        true_vals = []
        for combo in itertools.product(*domains):
            env = {v: val for (v, _, _), val in zip(vars_, combo)}
            true_vals.append(_eval_concrete(e, env))
        tmin, tmax = min(true_vals), max(true_vals)

        if not si.everything:
            assert lo_n <= tmin and hi_n >= tmax, (
                trial, E.expr_str(e), (lo_n, hi_n), (tmin, tmax))

        # relaxed evaluation: every var bound to its full range
        env_si = {v: SI.range(lo, hi)
                  for (v, _, (lo, hi)) in vars_}
        si2 = sym_eval(e, env_si, var_atoms)
        if not si2.everything:
            lo2, hi2 = si2.nbound()
            assert lo2 <= tmin and hi2 >= tmax, (
                trial, E.expr_str(e), (lo2, hi2), (tmin, tmax))

        # point substitution must be exact
        combo = tuple(rng.choice(list(d)) for d in domains)
        env_pt = {v: SI.const(val) for (v, _, _), val in zip(vars_, combo)}
        si3 = sym_eval(e, env_pt, var_atoms)
        envc = {v: val for (v, _, _), val in zip(vars_, combo)}
        want = _eval_concrete(e, envc)
        assert si3.is_point() or si3.everything is False
        lo3, hi3 = si3.nbound()
        assert lo3 <= want <= hi3, (trial, E.expr_str(e), want, (lo3, hi3))
        if si3.is_point():
            assert lo3 == want == hi3


def test_floordiv_floormod_extraction_identities():
    """lf_floordiv/lf_floormod are exact value transforms: evaluating the
    result at any var assignment equals floor-div/mod of the input."""
    rng = random.Random(3)
    for _ in range(200):
        lo, hi = 0, rng.randint(1, 20)
        v = E.Var("v")
        a = VarAtom(v.name, lo, hi)
        coeff = rng.randint(-6, 12)
        cst = rng.randint(-10, 10)
        c = rng.randint(1, 7)
        f = LF.atom(a, coeff, cst)
        fd = lf_floordiv(f, c)
        fm = lf_floormod(f, c)
        for val in range(lo, hi + 1):
            env = {v.name: SI.const(val)}
            base = coeff * val + cst
            got_d = fd.subst(env)
            got_m = fm.subst(env)
            dlo, dhi = got_d.nbound()
            mlo, mhi = got_m.nbound()
            assert dlo <= base // c <= dhi, (coeff, cst, c, val)
            assert mlo <= base % c <= mhi, (coeff, cst, c, val)


def test_difference_cancellation():
    """Identical symbolic offsets cancel exactly in differences — the
    property te's Simplify provides for extent = max - min + 1."""
    v = E.Var("p")
    a = VarAtom(v.name, 0, 1000)
    # lo = 16*p, hi = 16*p + 15  ->  extent form = 16
    lo = LF.atom(a, 16)
    hi = LF.atom(a, 16, 15)
    ext = hi.sub(lo).addc(1)
    assert ext.is_const() == 16
    # with a floordiv atom: floordiv(p, 4)*3 cancels too
    fd = lf_floordiv(LF.atom(a, 1), 4)
    lo2 = fd.scale(3)
    hi2 = fd.scale(3).addc(7)
    assert hi2.sub(lo2).addc(1).is_const() == 8

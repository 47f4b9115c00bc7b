"""Double-single (ds) pair arithmetic in plain XLA f32.

A ds number is an unevaluated sum hi + lo of two f32 with |lo| <= ulp(hi)/2,
carrying ~2^-48 relative accuracy. On TPU, real f64 is software-emulated at
10-30x f32 cost; ds pair ops are a handful of native f32 VPU ops instead —
the fp64-grade CG loop (solver/gsel_solver.py pcg_gsel_ds) runs its vector
updates this way.

Error-free transforms: Knuth TwoSum (6 flops), Dekker TwoProd via Veltkamp
splitting (17 flops). References: Dekker 1971; Hida/Li/Bailey QD library.
All functions are elementwise over arrays.

PLATFORM CAVEAT (measured): XLA:TPU compiles these faithfully (on-chip:
ds_axpy error 1.5e-14; pair-state CG reaches true relres 3.8e-9 at
rtol=1e-10). XLA:CPU's fused vector loops recompute shared values per
consumer with FP contraction, silently collapsing the transforms to a
~1e-8 plateau — flags (--xla_allow_excess_precision=false,
--xla_cpu_enable_fast_math=false) and optimization barriers do NOT stop
it. On CPU, use real f64 (native there) or run un-jitted; the ds path
exists to replace 10-30x emulated f64 on TPU only.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DS(NamedTuple):
    hi: jax.Array
    lo: jax.Array


def two_sum(a, b):
    s = a + b
    bv = s - a
    err = (a - (s - bv)) + (b - bv)
    return s, err


def quick_two_sum(a, b):
    # requires |a| >= |b|
    s = a + b
    return s, b - (s - a)


def _split(a):
    c = a * 4097.0  # Veltkamp split constant for f32 (2^12 + 1)
    ah = c - (c - a)
    return ah, a - ah


def two_prod(a, b):
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


def ds_from_f64(x64) -> DS:
    hi = x64.astype(jnp.float32)
    return DS(hi, (x64 - hi.astype(jnp.float64)).astype(jnp.float32))


def ds_to_f64(x: DS):
    return x.hi.astype(jnp.float64) + x.lo.astype(jnp.float64)


def ds_add(x: DS, y: DS) -> DS:
    """Accurate (IEEE-style) double-single addition.

    The previous 'sloppy' variant (e = e + x.lo + y.lo in ONE f32 add)
    degrades to O(2^-24)-relative error under cancellation (x.hi ~
    -y.hi) — exactly the regime of CG's r -= alpha*q update as the
    residual decays. Measured consequence (round 4, heat_r20 sample,
    kappa ~1e6): the rr/ds tiers' convergence REBOUNDED at the ~1e-5
    level (7e-6 at iter 336 -> 1.2e-3 at 400 -> converged only at ~485
    vs the fp64 oracle's 339; the same body in pure f64 is smooth).
    The Briggs/Kahan-style add (two_sum on both components, two
    renormalizations, ~20 flops vs 11) keeps ~2^-47 relative error in
    all sign patterns; with it the ds trajectory tracks fp64."""
    s, e = two_sum(x.hi, y.hi)
    t, f = two_sum(x.lo, y.lo)
    e = e + t
    s, e = quick_two_sum(s, e)
    e = e + f
    hi, lo = quick_two_sum(s, e)
    return DS(hi, lo)


def ds_neg(x: DS) -> DS:
    return DS(-x.hi, -x.lo)

def ds_sub(x: DS, y: DS) -> DS:
    return ds_add(x, ds_neg(y))


def ds_mul(x: DS, y: DS) -> DS:
    p, e = two_prod(x.hi, y.hi)
    e = e + x.hi * y.lo + x.lo * y.hi
    hi, lo = quick_two_sum(p, e)
    return DS(hi, lo)


def ds_scale(a: DS, x: DS) -> DS:
    """a * x with a a (broadcastable) ds scalar."""
    return ds_mul(DS(jnp.broadcast_to(a.hi, x.hi.shape),
                     jnp.broadcast_to(a.lo, x.lo.shape)), x)


def ds_axpy(a: DS, x: DS, y: DS) -> DS:
    """y + a*x elementwise (the CG update primitive)."""
    return ds_add(y, ds_mul(DS(jnp.broadcast_to(a.hi, x.hi.shape),
                               jnp.broadcast_to(a.lo, x.lo.shape)), x))


def ds_dot_fast(x: DS, y: DS):
    """Cheap inner-loop pair dot: f32 elementwise hi*hi + cross terms,
    per-128-chunk f32 partials folded in f64 — ~f32-grade (1e-7)
    relative accuracy at a fraction of the compensated ds_dot's op
    count (the tree dot is ~7 VPU rounds; at n=9k it is 9.9 us of the
    49.7 us rds iteration — 3 dots = 60%). Iteration-count-neutral for
    the rr tiers' INNER dots (they only set alpha/beta and the
    early-exit check; the anchored TRUE-residual exit keeps the full
    ds_dot) — measured 149 = 149 on the worst-case heat sample
    (docs/PERF.md round-4b)."""
    p = x.hi * y.hi + x.hi * y.lo + x.lo * y.hi
    pad = (-p.shape[0]) % 128
    if pad:
        p = jnp.pad(p, (0, pad))
    return jnp.sum(
        jnp.sum(p.reshape(-1, 128), axis=1).astype(jnp.float64)
    )


def ds_dot(x: DS, y: DS):
    """<x, y> -> f64 scalar: TwoProd per element, compensated (error-free
    pairwise TwoSum tree) partial sums, exact f64 combination of the
    last 128-lane row of partials.

    The earlier plain-f32 chunk head sums left ~128*2^-24 relative error
    per chunk — f32-grade alpha/beta scalars inside the otherwise
    fp64-grade ds CG loop. The TwoSum tree keeps the head partials exact
    to ~2^-48 (errors recombined through the f64 channel).

    Layout note (round 3): the halving pairs CONTIGUOUS ROW HALVES of a
    [M, 128] view — contiguous sublane slices, no lane shuffles. The
    previous in-lane even/odd split (`p[:, ::2]`) cost 7 rounds of
    lane-strided gathers; measured ~9 us/dot at n=9k where the whole CG
    body is ~35 us (output/r3_prec_profile.json op_ds_dot_us)."""
    p, e = two_prod(x.hi.ravel(), y.hi.ravel())
    e = e + x.hi.ravel() * y.lo.ravel() + x.lo.ravel() * y.hi.ravel()
    pad = (-p.shape[0]) % 128
    if pad:
        p = jnp.pad(p, (0, pad))
        e = jnp.pad(e, (0, pad))
    p = p.reshape(-1, 128)
    err = jnp.sum(e.reshape(-1, 128))  # tiny terms: f32 sum is fine
    while p.shape[0] > 1:  # pairwise TwoSum halving over row halves
        m = p.shape[0]
        h = (m + 1) // 2
        if m % 2:
            p = jnp.concatenate([p, jnp.zeros((1, 128), p.dtype)], axis=0)
        s, t = two_sum(p[:h], p[h:])
        err = err + jnp.sum(t)
        p = s
    # exact f64 fold of the final 128 partials (exponent range of f32
    # fits f64, so the cast and the 128-term sum are exact in f64 up to
    # one rounding per add at 2^-53 — beyond the 2^-48 ds target)
    return jnp.sum(p[0].astype(jnp.float64)) + err.astype(jnp.float64)

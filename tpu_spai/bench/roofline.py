"""Isolated gsel-SpMV roofline measurement (shared by bench.py and
scripts/spmv_roofline.py).

Chained-differencing protocol (CLAUDE.md env rules): R SpMVs inside ONE
jitted `lax.scan` (power iteration on the 1/||A||_inf-prescaled matrix so
iterates stay bounded); per-SpMV seconds = (minT(R2)-minT(R1))/(R2-R1)
with min-of-N at both endpoints. Replaces bench.py's former 0.8x-CG-
iteration inference with a measured kernel time (VERDICT round-2 item 1).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import numpy as np


def build_heat(res: int):
    """RCM-ordered FEM heat operator on the unit tet box (bench matrix)."""
    import scipy.sparse as sp

    from ..datagen.meshes import unit_box_tet
    from ..dist.partition import rcm_permutation
    from ..native import laplacian, lumped_mass

    nodes, elems = unit_box_tet(res, res, res)
    a = sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(1e-2 * lumped_mass(nodes, elems))
    )
    a.sort_indices()
    perm = rcm_permutation(a)
    ap = a[perm][:, perm].tocsr()
    ap.sort_indices()
    return ap


def plane_bytes(g) -> tuple:
    """(bytes streamed in, bytes written out) per SpMV."""
    b_in = g.onehot.size + g.lidx.size + g.vals.size * 4
    b_out = g.n_steps * g.group * g.tile * 4
    return b_in, b_out


def measure_chain(fn, r1: int, r2: int, reps: int = 7) -> float:
    """min-of-N differenced per-step seconds for a chained program."""
    np.asarray(fn(r2))  # compile + warm both endpoints
    np.asarray(fn(r1))
    ts = {r1: [], r2: []}
    for _ in range(reps):
        for m in (r1, r2):
            t0 = time.perf_counter()
            np.asarray(fn(m))
            ts[m].append(time.perf_counter() - t0)
    return (min(ts[r2]) - min(ts[r1])) / (r2 - r1)


def measure_stream_gbps(
    m_floats: int = 24 * 2**20, reps: int = 5, return_attempts: bool = False,
    cap_gbps: Optional[float] = None,
):
    """Achievable HBM bandwidth via a chained axpby stream, measured
    IN-PROCESS — the phase-normalization denominator (VERDICT r3 weak
    item 1 / round-4 item 4).

    The shared v5e worker has multi-minute ~2-3x performance phases
    (CLAUDE.md): a roofline fraction against the NOMINAL 819 GB/s mixes
    kernel quality with worker phase. `spmv_gbps / stream_gbps`
    co-measured in one process is phase-invariant: both numerators ride
    the same phase. y_{k+1} = a*y_k + x with 96 MB operands (>> VMEM, so
    every step restreams: read y + read x + write y = 3 arrays)."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((m_floats,), jnp.float32)
    y0 = jnp.zeros((m_floats,), jnp.float32)

    @partial(jax.jit, static_argnums=2)
    def chain(y, xv, r):
        def body(yc, _):
            return 0.999 * yc + xv, None

        y, _ = jax.lax.scan(body, y, None, length=r)
        return y

    # best-of-attempts: a single differencing can straddle a worker
    # phase boundary and report nonsense — observed 66.5 GB/s once
    # while the SpMV later streamed at 379 (r4_queue7.log), and under
    # fast phase-thrash even NEGATIVE or >nominal rates (round-5:
    # attempts [1302.7, -657.3] on an 819 GB/s part, when the r2
    # endpoint rides a faster phase than r1). The denominator must be
    # the ACHIEVABLE bandwidth of this session: keep only physical
    # attempts (0 < rate <= 1.02 * nominal when cap_gbps is given) and
    # take their max; retry while everything is non-physical or
    # implausibly low.
    attempts = []
    for attempt in range(5):
        t = measure_chain(lambda m: chain(y0, x, m), 8, 48, reps=reps)
        attempts.append(3 * m_floats * 4 / t / 1e9)
        valid = [a for a in attempts
                 if a > 0 and (cap_gbps is None or a <= 1.02 * cap_gbps)]
        if attempt >= 1 and valid and max(valid) > 200.0:
            break
    valid = [a for a in attempts
             if a > 0 and (cap_gbps is None or a <= 1.02 * cap_gbps)]
    if not valid:
        # every differencing straddled a flip — surface the failure
        # rather than normalizing against an artifact
        raise RuntimeError(f"no physical STREAM attempt: {attempts}")
    best = max(valid)
    if return_attempts:
        return best, attempts
    return best


def bracketed_measure(time_fn, stream_fn, tol: float = 0.15,
                      max_slides: int = 2):
    """Time a kernel co-phased with its STREAM denominator.

    Runs ``stream_fn; time_fn; stream_fn``; if the two STREAM endpoints
    disagree by more than ``tol`` the worker phase flipped inside the
    window, so the window SLIDES (the later STREAM becomes the leading
    endpoint and the kernel is re-timed adjacent to it) up to
    ``max_slides`` times. Returns ``(t, s_pre, s_post, flipped)`` where
    ``flipped`` means the final bracket still disagrees."""
    s_pre = stream_fn()
    t = time_fn()
    s_post = stream_fn()
    for _ in range(max_slides):
        if abs(s_pre - s_post) <= tol * max(s_pre, s_post):
            break
        s_pre = s_post
        t = time_fn()
        s_post = stream_fn()
    flipped = abs(s_pre - s_post) > tol * max(s_pre, s_post)
    return t, s_pre, s_post, flipped


def spmv_roofline_row(res: int, hbm_gbps: float = 819.0,
                      reps: int = 7,
                      stream_gbps: Optional[float] = None,
                      paired_stream: bool = False) -> Optional[dict]:
    """Measured isolated-SpMV roofline entry for one heat size.

    With ``paired_stream`` the SpMV timing is BRACKETED by two quick
    STREAM measurements so numerator and denominator share the worker
    phase window (round-5: a session-global 3-attempt STREAM max caught
    a fast phase while the SpMVs ran a slow one — normalized 0.548 vs
    the co-phased 0.74 of round 4). If the bracket disagrees by >15%
    the phase flipped inside the window: slide the window (re-time the
    SpMV adjacent to the later STREAM) up to twice, then flag. The
    denominator is always STREAM — never the SpMV under test."""
    import jax
    import jax.numpy as jnp

    from ..kernels.gsel_pallas import gsel_spmv_pallas
    from ..solver.gsel_solver import build_gsel_csr

    a = build_heat(res)
    n, nnz = a.shape[0], a.nnz
    s = 1.0 / np.abs(a).sum(axis=1).max()
    a_s = (a * s).tocsr()
    g = build_gsel_csr(a_s)
    if g is None:
        return None
    b_in, b_out = plane_bytes(g)
    x0 = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)

    @partial(jax.jit, static_argnums=1)
    def chain(x, r):
        def body(xc, _):
            return gsel_spmv_pallas(g, xc), None

        y, _ = jax.lax.scan(body, x, None, length=r)
        return y

    r1, r2 = (100, 2100) if n < 50_000 else (50, 650)
    time_spmv = lambda: measure_chain(  # noqa: E731
        lambda m: chain(x0, m), r1, r2, reps=reps)
    s_pre = s_post = None
    window_flip = False
    if paired_stream:
        try:
            # compile both chain endpoints BEFORE the bracket window: at
            # n=117k the first warm call inside measure_chain costs
            # ~30-60 s of XLA compile, which would span worker-phase
            # flips inside the bracket by construction (the timed calls
            # themselves take ~2-4 s)
            np.asarray(chain(x0, r2))
            np.asarray(chain(x0, r1))
            t_spmv, s_pre, s_post, window_flip = bracketed_measure(
                time_spmv,
                lambda: measure_stream_gbps(reps=3, cap_gbps=hbm_gbps))
        except Exception:  # noqa: BLE001 — a failed STREAM bracket must
            # not cost the SpMV row itself; the caller falls back to its
            # session-global denominator (or reports unnormalized)
            s_pre = s_post = None
            t_spmv = time_spmv()
    else:
        t_spmv = time_spmv()
    bytes_total = b_in + b_out
    gbps = bytes_total / t_spmv / 1e9
    row = {
        "res": res,
        "n": n,
        "nnz": nnz,
        "slots": int(g.slots),
        "slot_inflation": round(g.slots / nnz, 3),
        "streamed_mb_per_spmv": round(bytes_total / 1e6, 3),
        "spmv_us": round(t_spmv * 1e6, 2),
        "gbps": round(gbps, 1),
        "roofline_frac": round(gbps / hbm_gbps, 4),
    }
    if paired_stream and s_pre is not None:
        local = max(s_pre, s_post)
        row["stream_gbps"] = round(local, 1)
        row["stream_bracket_gbps"] = [round(s_pre, 1), round(s_post, 1)]
        if window_flip:
            row["stream_window_flip"] = True
        row["roofline_frac_normalized"] = round(gbps / local, 4)
    elif stream_gbps:
        row["stream_gbps"] = round(stream_gbps, 1)
        row["roofline_frac_normalized"] = round(gbps / stream_gbps, 4)
    return row

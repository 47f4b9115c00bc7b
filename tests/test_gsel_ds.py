"""Double-single (fp64-grade) gsel SpMV + CG: accuracy vs f64 oracle.

The ds kernel must deliver ~2^-48 relative error per matvec (vs ~2^-24
f32), letting CG reach rtol=1e-10 TRUE residuals that the f32 path cannot.
"""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from tpu_spai.kernels.gsel import build_gsel, gsel_spmv_ds_xla, gsel_spmv_xla
from tpu_spai.kernels.gsel_pallas import gsel_spmv_ds_pallas
from tpu_spai.solver.gsel_solver import (
    GselSpaiPrecDS,
    build_gsel_csr,
    gsel_matvec_ds,
    pcg_gsel,
)


def _fem(res=7):
    from tpu_spai.datagen.meshes import unit_box_tet
    from tpu_spai.native import laplacian, lumped_mass
    from tpu_spai.dist.partition import rcm_permutation

    nodes, elems = unit_box_tet(res, res, res)
    a = sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(lumped_mass(nodes, elems))
    )
    perm = rcm_permutation(a)
    ap = a[perm][:, perm].tocsr()
    ap.sort_indices()
    return ap


def _split64(x):
    hi = x.astype(np.float32)
    return jnp.asarray(hi), jnp.asarray((x - hi.astype(np.float64)).astype(np.float32))


def test_ds_spmv_accuracy():
    a = _fem(6)
    n = a.shape[0]
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n)
    want = a.astype(np.float64) @ x
    g = build_gsel(a, double_single=True)
    xh, xl = _split64(x)
    scale = np.abs(want).max()

    # XLA reference (computes in real f64)
    yh, yl = gsel_spmv_ds_xla(g, xh, xl)
    got = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
    assert np.abs(got - want).max() / scale < 1e-14

    # Pallas kernel in interpret mode (the TwoProd/Kahan f32 path)
    yh, yl = gsel_spmv_ds_pallas(g, xh, xl, interpret=True)
    got = np.asarray(yh, np.float64) + np.asarray(yl, np.float64)
    err = np.abs(got - want).max() / scale
    assert err < 1e-12, err  # ~2^-48 target; f32 path would be ~1e-7

    # plain f32 path for contrast — must be much worse
    g32 = build_gsel(a)
    y32 = np.asarray(gsel_spmv_xla(g32, jnp.asarray(x, jnp.float32)))
    err32 = np.abs(y32 - want).max() / scale
    assert err32 > 10 * err


def test_ds_matvec_roundtrip():
    a = _fem(5)
    n = a.shape[0]
    x = np.random.default_rng(1).standard_normal(n)
    g = build_gsel_csr(a, double_single=True)
    y = np.asarray(gsel_matvec_ds(g, jnp.asarray(x), impl="xla"))
    want = a @ x
    assert np.abs(y - want).max() / np.abs(want).max() < 1e-14


def test_pcg_ds_reaches_tight_tolerance():
    a = _fem(6)
    n = a.shape[0]
    b = a @ np.ones(n)
    g = build_gsel_csr(a, double_single=True)
    res = pcg_gsel(
        g, jnp.asarray(b), rtol=1e-10, max_iter=5000, impl="xla", precision="ds"
    )
    assert bool(res.converged)
    x = np.asarray(res.x).reshape(-1)
    rel = np.linalg.norm(a @ x - b) / np.linalg.norm(b)
    assert rel < 1e-9, rel


def test_pcg_ds_spai_prec():
    from tpu_spai.native import fsai

    a = _fem(6)
    n = a.shape[0]
    b = a @ np.ones(n)
    g = build_gsel_csr(a, double_single=True)
    lhat = sp.csr_matrix(fsai(a).T)
    gl = build_gsel_csr(lhat, double_single=True)
    glt = build_gsel_csr(sp.csr_matrix(lhat.T), double_single=True)
    prec = GselSpaiPrecDS(gl, glt, jnp.float64(3e-3), impl="xla")
    r0 = pcg_gsel(g, jnp.asarray(b), rtol=1e-10, max_iter=5000, impl="xla",
                  precision="ds")
    r1 = pcg_gsel(g, jnp.asarray(b), prec=prec, rtol=1e-10, max_iter=5000,
                  impl="xla", precision="ds")
    assert bool(r1.converged)
    assert int(r1.iters) < int(r0.iters)
    x = np.asarray(r1.x).reshape(-1)
    rel = np.linalg.norm(a @ x - b) / np.linalg.norm(b)
    assert rel < 1e-9, rel


def test_ds_pair_arithmetic_unjitted():
    # the error-free transforms are exact when each op is its own program;
    # XLA:CPU *fused loops* recompute values per consumer with FP
    # contraction and break them (~1e-8 plateau) — XLA:TPU does not
    # (verified on-chip: ds_axpy err 1.5e-14, pair-state CG true relres
    # 3.8e-9 at rtol=1e-10, 212 us/iter). See kernels/ds.py docstring.
    import jax

    from tpu_spai.kernels.ds import DS, ds_add, ds_mul, ds_from_f64, ds_to_f64

    rng = np.random.default_rng(0)
    x64 = rng.standard_normal(512)
    y64 = rng.standard_normal(512)
    X = ds_from_f64(jnp.asarray(x64))
    Y = ds_from_f64(jnp.asarray(y64))
    al = ds_from_f64(jnp.float64(0.123456789012345))
    with jax.disable_jit():
        ab = DS(jnp.broadcast_to(al.hi, X.hi.shape),
                jnp.broadcast_to(al.lo, X.lo.shape))
        axp = ds_add(Y, ds_mul(ab, X))
    got = np.asarray(ds_to_f64(axp))
    err = np.abs(got - (y64 + 0.123456789012345 * x64)).max()
    assert err < 1e-13, err


def test_pcg_ds_pair_state_unjitted():
    # algorithmic check of the pair-state CG loop on CPU (un-jitted so
    # XLA:CPU fusion cannot degrade the pair arithmetic; see above)
    import jax

    from tpu_spai.solver.gsel_solver import pcg_gsel_ds

    a = _fem(4)
    n = a.shape[0]
    b = a @ np.ones(n)
    g = build_gsel_csr(a, double_single=True)
    with jax.disable_jit():
        res = pcg_gsel_ds(g, jnp.asarray(b), rtol=1e-10, max_iter=2000,
                          impl="xla")
    assert bool(res.converged)
    x = np.asarray(res.x).reshape(-1)
    rel = np.linalg.norm(a @ x - b) / np.linalg.norm(b)
    assert rel < 1e-9, rel


def test_residual_replacement_honest_stopping():
    # plain f32 CG "converges" by recurrence while the TRUE residual
    # stagnates at ~eps_f32*kappa on the ill-conditioned heat operator;
    # the residual-replacement solver must only exit on true convergence
    import scipy.sparse as sp

    from tpu_spai.datagen.meshes import unit_box_tet
    from tpu_spai.dist.partition import rcm_permutation
    from tpu_spai.native import laplacian, lumped_mass
    from tpu_spai.solver.gsel_solver import (
        build_gsel_csr,
        pcg_gsel,
        pcg_gsel_rr,
    )

    nodes, elems = unit_box_tet(12, 12, 12)
    a = sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(1e-2 * lumped_mass(nodes, elems))
    )
    perm = rcm_permutation(a)
    ap = a[perm][:, perm].tocsr()
    ap.sort_indices()
    n = ap.shape[0]
    b64 = ap @ np.ones(n)
    g = build_gsel_csr(ap, double_single=True)

    rf = pcg_gsel(
        g, jnp.asarray(b64, jnp.float32), rtol=1e-6, max_iter=20000,
        impl="xla", dot_dtype="chunk64",
    )
    xf = np.asarray(rf.x, np.float64).reshape(-1)
    true_f32 = np.linalg.norm(ap @ xf - b64) / np.linalg.norm(b64)

    rr = pcg_gsel_rr(g, jnp.asarray(b64), rtol=1e-6, max_iter=20000, impl="xla")
    xr = np.asarray(rr.x).reshape(-1)
    true_rr = np.linalg.norm(ap @ xr - b64) / np.linalg.norm(b64)

    assert bool(rr.converged)
    assert true_rr < 5e-6  # honest (f32 stalls ~1e-3..1e-2 here)
    assert true_rr < true_f32 / 50


def test_rr_grouped_matches_percycle():
    """The round-3 group-anchored rr loop (no per-iteration cond; see
    output/r3_prec_profile.json) must converge honestly with an
    iteration count close to the legacy percycle variant's."""
    import scipy.sparse as sp

    from tpu_spai.datagen.meshes import unit_box_tet
    from tpu_spai.dist.partition import rcm_permutation
    from tpu_spai.native import laplacian, lumped_mass
    from tpu_spai.solver.gsel_solver import build_gsel_csr, pcg_gsel_rr

    nodes, elems = unit_box_tet(10, 10, 10)
    a = sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(1e-2 * lumped_mass(nodes, elems))
    )
    perm = rcm_permutation(a)
    ap = a[perm][:, perm].tocsr()
    ap.sort_indices()
    n = ap.shape[0]
    b64 = ap @ np.ones(n)
    g = build_gsel_csr(ap, double_single=True)

    res = {}
    for mode in ("grouped", "percycle"):
        r = pcg_gsel_rr(
            g, jnp.asarray(b64), rtol=1e-6, max_iter=20000, impl="xla",
            anchor=mode,
        )
        x = np.asarray(r.x).reshape(-1)
        true = np.linalg.norm(ap @ x - b64) / np.linalg.norm(b64)
        assert bool(r.converged) and true < 5e-6, (mode, true)
        res[mode] = int(r.iters)
    # grouped may overshoot by < one group (16) plus normal rr jitter
    assert res["grouped"] <= res["percycle"] * 1.25 + 16, res


def test_ds_add_cancellation_accuracy():
    """Round-4 regression: the 'sloppy' double-single add degraded to
    O(2^-24)-relative error under cancellation (x ~ -y), the regime of
    CG's r -= alpha*q update — measured as a convergence REBOUND on
    heat_r20 (485 vs the fp64 oracle's 339 iterations). The accurate
    add must stay ~2^-47-relative in all sign patterns."""
    import numpy as np
    import jax.numpy as jnp

    from tpu_spai.kernels.ds import ds_add, ds_from_f64, ds_to_f64

    rng = np.random.default_rng(0)
    a64 = rng.standard_normal(4096)
    # near-cancelling partner: b ~ -a + 1e-6-relative perturbation
    b64 = -a64 * (1.0 + 1e-6 * rng.standard_normal(4096))
    A = ds_from_f64(jnp.asarray(a64))
    B = ds_from_f64(jnp.asarray(b64))
    s = np.asarray(ds_to_f64(ds_add(A, B)))
    # oracle: the exact f64 sum of the ds-REPRESENTED inputs (input
    # representation error is inherent to the format, not the add)
    want = np.asarray(ds_to_f64(A)) + np.asarray(ds_to_f64(B))
    rel = np.abs(s - want) / np.maximum(np.abs(want), 1e-300)
    # sloppy add failed this at ~2^-24-relative; accurate add is ~2^-47
    assert rel.max() < 1e-12, rel.max()


def test_rr_rebound_detection_and_escalation():
    """VERDICT r4 item 4: mask-rhs problems (||b|| ~ 1e-6 of
    ||A||*||x||, the Laplacian annihilating the mask) put the f32-A rr
    tier in the near-floor regime where its trajectory is bistable and
    anchors rebound. The solver must (a) count the rebounds, (b) when
    escalation fires, recover by re-running on the ds-A tier — still
    converging honestly on the TRUE residual."""
    import scipy.sparse as sp

    from tpu_spai.datagen.meshes import unit_box_tet
    from tpu_spai.dist.partition import rcm_permutation
    from tpu_spai.native import laplacian, lumped_mass
    from tpu_spai.solver.gsel_solver import build_gsel_csr, pcg_gsel_rr

    nodes, elems = unit_box_tet(12, 12, 12)
    a = sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(1e-2 * lumped_mass(nodes, elems))
    )
    perm = rcm_permutation(a)
    ap = a[perm][:, perm].tocsr()
    ap.sort_indices()
    n = ap.shape[0]
    # the bad-branch forcing: mask rhs + 1e-12-relative perturbation
    # (the trigger scale from docs/PERF.md round-4a)
    rng = np.random.default_rng(0)
    b64 = ap @ np.ones(n)
    b64 = b64 + 1e-12 * np.linalg.norm(b64) / np.sqrt(n) * (
        rng.standard_normal(n)
    )
    g = build_gsel_csr(ap, double_single=True)

    r_f32 = pcg_gsel_rr(
        g, jnp.asarray(b64), rtol=1e-6, max_iter=20000, impl="xla",
        escalate_on_rebound=False,
    )
    # the near-floor regime rebounds on the f32-A tier (measured 3 on
    # this operator) — the detection signal the escalation keys on
    assert int(r_f32.rebounds) >= 1, int(r_f32.rebounds)
    assert not r_f32.escalated

    r_esc = pcg_gsel_rr(
        g, jnp.asarray(b64), rtol=1e-6, max_iter=20000, impl="xla",
        escalate_on_rebound="force",
    )
    assert bool(r_esc.escalated)
    assert bool(r_esc.converged)
    x = np.asarray(r_esc.x).reshape(-1)
    true = np.linalg.norm(ap @ x - b64) / np.linalg.norm(b64)
    assert true < 5e-6, true
    # recovery = the escalated solve lands the ds-A trajectory
    r_ds = pcg_gsel_rr(
        g, jnp.asarray(b64), rtol=1e-6, max_iter=20000, impl="xla",
        spmv_precision="ds_a", escalate_on_rebound=False,
    )
    assert int(r_esc.iters) == int(r_ds.iters), (
        int(r_esc.iters), int(r_ds.iters)
    )


def test_rr_second_level_escalation_prec_ds():
    """Round 5: an rds (ds-A) trajectory that still rebounds escalates
    to the full-ds tier (ds factor applies over zero lo planes — exact,
    since the factor values are f32). Forced via escalate_on_rebound=
    'force' from the ds_a tier with an SPAI preconditioner attached."""
    import scipy.sparse as sp

    from tpu_spai.datagen.meshes import unit_box_tet
    from tpu_spai.dist.partition import rcm_permutation
    from tpu_spai.native import fsai, laplacian, lumped_mass
    from tpu_spai.solver.gsel_solver import (
        GselSpaiPrec,
        build_gsel_csr,
        pcg_gsel_rr,
        prec_with_ds_planes,
    )

    nodes, elems = unit_box_tet(10, 10, 10)
    a = sp.csr_matrix(
        laplacian(nodes, elems) + sp.diags(1e-2 * lumped_mass(nodes, elems))
    )
    perm = rcm_permutation(a)
    ap = a[perm][:, perm].tocsr()
    ap.sort_indices()
    n = ap.shape[0]
    lhat = sp.csr_matrix(fsai(ap).T)
    g = build_gsel_csr(ap, double_single=True)
    gl = build_gsel_csr(lhat)
    glt = build_gsel_csr(sp.csr_matrix(lhat.T).tocsr())
    prec = GselSpaiPrec(gl, glt, jnp.float32(3e-3), impl="xla")
    b64 = ap @ np.ones(n)

    # the upgraded prec applies identically on the hi planes
    pds = prec_with_ds_planes(prec)
    r32 = jnp.asarray(np.random.default_rng(1).standard_normal(n),
                      jnp.float32)
    y0 = np.asarray(prec(r32))
    y1 = np.asarray(pds(r32))
    assert np.allclose(y0, y1, rtol=1e-6, atol=1e-30)

    # forced full-ds escalation from the ds_a tier: converged, honest
    # TRUE residual, same count as a direct prec_ds run
    r_esc = pcg_gsel_rr(
        g, jnp.asarray(b64), prec=prec, rtol=1e-6, max_iter=20000,
        impl="xla", spmv_precision="ds_a", escalate_on_rebound="force",
    )
    r_direct = pcg_gsel_rr(
        g, jnp.asarray(b64), prec=pds, rtol=1e-6, max_iter=20000,
        impl="xla", spmv_precision="ds", escalate_on_rebound=False,
    )
    # escalation only fires when the probe rebounded; force semantics
    # keep the honest path either way
    assert bool(r_esc.converged)
    x = np.asarray(r_esc.x).reshape(-1)
    true = np.linalg.norm(ap @ x - b64) / np.linalg.norm(b64)
    assert true < 5e-6, true
    if bool(r_esc.escalated):
        assert int(r_esc.iters) == int(r_direct.iters), (
            int(r_esc.iters), int(r_direct.iters))

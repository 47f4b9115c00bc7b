"""Benchmark/inference entry point (~ reference infer.py).

Loads a trained checkpoint, then per test sample:
  * times preconditioner construction (jitted GNN forward on device),
  * runs CG under classical preconditioners {none, diagonal, ainv, ic,
    fsai} on the host (fp64 scipy + native factorizations) and on the TPU
    (device PCG) — the reference's cpu/cuda axis maps to cpu/tpu here,
  * runs the neural SPAI CG on host ("Neural") and device ("Neural+TPU"),
  * optional direct-solve baseline (enable_cholmod -> scipy splu),
and writes the two CSV schemas the reference's misc/ scripts consume
(infer_{prefix}{exp}_{-log10 rtol}.csv and all_infer_...).

Usage:
    python -m tpu_spai.cli.infer exp_name=heat data.prefix=generated/heat \
        pretrained=outputs/heat/checkpoints [rtol=1e-8] [rhs=mask|random|neighbour]
"""

from __future__ import annotations

import math
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

import tpu_spai  # noqa: F401
from ..bench import Timestat
from ..config import cli_config
from ..data.batching import collate
from ..logging_utils import get_logger
from ..solver import pcg
from ..solver.host_baselines import get_cg_iter_time, get_pcg_iter_time, direct_solve_time
from ..sparse.convert import csr_to_graph, graph_to_csr
from ..train import get_workspace
from ..train.checkpoints import latest_checkpoint, load_checkpoint
from .train import CONFIG_DIR, build_dataset

log = get_logger()


def build_rhs(kind: str, mask: np.ndarray, a_pattern, rng) -> np.ndarray:
    """RHS conventions (infer.py:296-307)."""
    m = mask.ravel().astype(np.float64)
    if kind in ("mask", "ones"):
        return m
    if kind == "random":
        return rng.standard_normal(len(m)) * m
    if kind == "neighbour":
        return (a_pattern @ (1 - m) + 0.1 * m) * m
    raise ValueError(f"Unknown rhs type: {kind}")


def main(argv=None):
    cfg = cli_config(argv if argv is not None else sys.argv[1:], CONFIG_DIR, "basic")
    # exp_name-based dataset selection (infer.py:168-208): the two external
    # families get their adapters; everything else reads the folder contract.
    if cfg.exp_name == "heatmultisource":
        from ..data.adapters import HeatMultiSourceDataset

        dataset = HeatMultiSourceDataset(
            n_domains=int(cfg.select("n_domains", 8)),
            steps_per_domain=int(cfg.select("steps_per_domain", 8)),
            seed=int(cfg.select("seed", 42)),
        )
    elif cfg.exp_name == "nif":
        from pathlib import Path as _P

        from ..data.adapters import NIFTorchDataset

        root = _P(cfg.select("data_path", "data/Random"))
        dataset = NIFTorchDataset(
            root / "test" if (root / "test").exists() else root,
            seed=int(cfg.select("seed", 42)),
        )
    else:
        dataset = build_dataset(cfg)
    ws_cls = get_workspace(cfg.select("workspace", "simple"))
    workspace = ws_cls(
        gnn=cfg.gnn,
        loss=cfg.loss,
        block_size=dataset.block_size,
        epsilon=float(cfg.epsilon),
    )
    scaled = workspace.name == "scaled"
    override_eps = cfg.select("override_epsilon")
    if override_eps is not None:
        # epsilon sweep support (misc/infer_all_precision_epsilon_override.sh)
        workspace.epsilon = float(override_eps)
        log.info(f"override epsilon -> {workspace.epsilon:.3e}")

    rtol = float(cfg.select("rtol", 1e-6))
    repeat = int(cfg.select("repeat", 1))
    rhs_kind = cfg.select("rhs", "mask")
    enable_cholmod = bool(cfg.select("enable_cholmod", False))
    out_dir = Path(cfg.select("out_dir", "output"))
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(int(cfg.select("seed", 42)))

    # dist_shards=N (SURVEY §2.10 as a product feature): adds a
    # "NeuralDist" row — sharded GNN construction + distributed SPAI-PCG
    # over an N-device mesh. With one local chip the mesh is N virtual
    # host (CPU) devices, so this must be configured before first jax
    # backend use; on real multi-chip hardware the same dist/gnn.py path
    # rides the chip mesh (see __graft_entry__.dryrun_multichip).
    dist_n = int(cfg.select("dist_shards", 0))
    # backend=cpu: host-baseline-only runs with NO device contact — for
    # problem scales where a device path faults the shared TPU worker
    # (armadillo b=3; see r3_sessionA.log) the host rows must still land
    host_only = str(cfg.select("backend", "")) == "cpu"
    if dist_n > 1 and not bool(cfg.select("dist_device_rows", False)):
        # A dist run forces the CPU backend (below), so its "+TPU" rows
        # would actually measure the xla-on-host solver tier — which
        # exhibits the anchor-noise bad branch (149 vs host 101 iters,
        # docs/PERF.md round-4a) that the real pallas path escapes via
        # rebound escalation. Mislabeled rows helped nobody: dist runs
        # now report host + NeuralDist rows only. Device-parity claims
        # live in the real-TPU CSVs (e.g. output/heat_r20_w48). Override
        # with dist_device_rows=true for the old behavior.
        host_only = True
        log.info("dist run: pseudo-device rows suppressed "
                 "(dist_device_rows=false)")
    if dist_n > 1 or host_only:
        import os

        if dist_n > 1:
            os.environ["XLA_FLAGS"] = (
                os.environ.get("XLA_FLAGS", "")
                + f" --xla_force_host_platform_device_count={dist_n}"
            )
        jax.config.update("jax_platforms", "cpu")
        log.info(
            f"CPU backend forced ({'dist mesh' if dist_n > 1 else 'host-only'})"
        )

    # restore params
    from ..data.folder import split_dataset

    tr, va = split_dataset(len(dataset), cfg.split["train"], seed=42)
    example = collate([dataset.get(va[0])])
    params = workspace.init_params(jax.random.key(0), example)
    pretrained = cfg.select("pretrained", "")
    if pretrained:
        ckpt = Path(pretrained)
        if ckpt.is_dir() and (ckpt / "latest.json").exists():
            ckpt = latest_checkpoint(ckpt)
        params = load_checkpoint(ckpt, params)
        log.info(f"Loaded pretrained model from {ckpt}")
    else:
        log.warning("no pretrained checkpoint given — benchmarking a random model")

    fwd = jax.jit(workspace.predict_blocks)
    # warmup (infer.py:271-275)
    for _ in range(int(cfg.select("warmup", 3))):
        fwd(params, example).block_until_ready()

    stats = Timestat()
    indices = va if cfg.select("dataloader", "test") in ("val", "test") else tr
    max_samples = int(cfg.select("max_samples", 0)) or len(indices)
    check_methods = [m for m in cfg.select("check_methods", ["none", "diagonal", "ainv", "ic"]) if m != "fsai"] + (
        ["fsai"] if "fsai" in cfg.select("check_methods", []) else []
    )

    # per-topology cache for the device-IC row: the level schedule +
    # plane geometry are PATTERN-only (one-time per dataset on
    # fixed-topology runs — VERDICT r3 item 8); per-sample work is the
    # host ic0 factorization + an O(nnz) value gather
    ic_topo_cache: dict = {}

    try:
        for count, i in enumerate(indices[:max_samples]):
            batch = collate([dataset.get(i)])
            n_valid = int(np.sum(np.asarray(batch.node_valid)))
            msize = n_valid * batch.block_size
            e_valid = int(np.sum(np.asarray(batch.edge_seg) == 0))
            ei = np.stack(
                [np.asarray(batch.graph.edge_row), np.asarray(batch.graph.edge_col)]
            )
            a_csr = graph_to_csr(
                ei[:, :e_valid],
                np.asarray(batch.graph.blocks)[:e_valid],
                msize,
                mask=np.asarray(batch.mask)[:n_valid],
            )
            a_ones = a_csr.copy()
            a_ones.data.fill(1.0)

            # preconditioner-construction time: device GNN forward
            prec_t = 0.0
            for _ in range(repeat):
                t0 = time.perf_counter()
                fwd(params, batch).block_until_ready()
                prec_t += time.perf_counter() - t0
            prec_t /= repeat
            l_csr = workspace.factor_csr(params, batch, n_valid_edges=e_valid)[
                :msize, :msize
            ]

            r = build_rhs(rhs_kind, np.asarray(batch.mask)[:n_valid], a_ones, rng)

            # classical baselines: host fp64 + device. The CPU rows leave
            # their raw factors in `fcache` so the device AINV/FSAI rows
            # below reuse them instead of refactorizing (the factorization
            # is timed once here — `cpu_prec_t` carries it to fact_t).
            fcache: dict = {}
            cpu_prec_t: dict = {}
            for method in check_methods:
                try:
                    it, p, s = get_cg_iter_time(
                        a_csr, r, rtol=rtol, repeat=repeat, method=method,
                        raise_on_fail=False, factor_out=fcache,
                    )
                    stats.put(f"PCG-{method}-cpu", s, p, it, msize)
                    cpu_prec_t[method] = p
                except Exception as e:  # noqa: BLE001
                    log.error(f"{method} failed: {e}")
            # device unpreconditioned + jacobi rows are filled from the gsel
            # section below (same kernels + precision tier as every other
            # device row); the first-generation graph-form path remains as
            # the fallback when the gsel build declines the pattern.
            _dev_simple_done: set = set()

            # neural SPAI: host + device
            it, _, sol = get_pcg_iter_time(
                a_csr, r, l_csr, workspace.epsilon, rtol=rtol, repeat=repeat,
                scaled=scaled,
            )
            stats.put("Neural", sol, prec_t, it, msize)

            # gsel fast-kernel solve of the host-built factor (production
            # device path, kernels/gsel_pallas; covers unbandable patterns
            # too). Reported as "Neural+TPU" — the analog of the
            # reference's Neural+CUDA column. (The first-generation
            # graph-form XLA solve that used to fill this row is ~50x
            # slower per iteration — solver/cg.pcg with spmv_xla — and is
            # still covered by tests/test_cg.py.)
            if bool(cfg.select("use_windowed", True)) and not host_only:
                try:
                    from ..dist.partition import rcm_permutation
                    from ..solver import (
                        GselSpaiPrec,
                        build_gsel_csr,
                        pcg_gsel,
                    )

                    # default device precision: 'rds' — residual-
                    # replacement CG with a double-single A-matvec and f32
                    # preconditioner apply. On-chip study (output/
                    # rds_study_tpu.csv): beats plain rr in wall-clock
                    # (33.0/34.8 vs 35.5/36.7 ms on heat_r20) at 1.4-1.6x
                    # host-fp64 iterations vs rr's 1.7-2.4x; stopping is
                    # fp64-grade TRUE residual in both. Override with
                    # +device_precision={rr,f32,c64,ds} for the sweeps.
                    dev_prec = str(cfg.select("device_precision", "rds"))
                    wperm = rcm_permutation(a_csr)
                    a_p = a_csr[wperm][:, wperm].tocsr()
                    a_p.sort_indices()
                    l_p = l_csr[wperm][:, wperm].tocsr()
                    l_p.sort_indices()
                    ds = dev_prec == "ds"
                    rr = dev_prec in ("rr", "rds")  # residual-replacement
                    ga_f = build_gsel_csr(a_p, double_single=ds or rr)
                    gl_f = build_gsel_csr(l_p, double_single=ds)
                    gl_t = build_gsel_csr(l_p.T.tocsr(), double_single=ds)
                    impl = (
                        "pallas"
                        if jax.default_backend() == "tpu"
                        else "xla"
                    )
                    # rr/rds advertise fp64-grade stopping: keep the RHS
                    # f64 end-to-end (f32 truncation here would perturb
                    # the system ~1e-7 vs the host fp64 oracle)
                    b_dt = jnp.float64 if (rr or ds) else jnp.float32
                    b_p = (
                        jnp.asarray((a_csr @ r)[wperm], dtype=b_dt)
                        if ga_f is not None
                        else None
                    )

                    def _timed_device_solve(prec_obj):
                        """(solve seconds, iters) on the gsel device path
                        under the selected device-precision tier (shared by
                        the neural row and the classical AINV/FSAI rows)."""
                        if rr:
                            from ..solver.gsel_solver import pcg_gsel_rr

                            spmv_p = (
                                "ds_a" if dev_prec == "rds" else "f32"
                            )

                            def _mk_rr(sp):
                                po = prec_obj
                                if sp == "ds" and po is not None:
                                    from ..solver.gsel_solver import (
                                        prec_with_ds_planes,
                                    )

                                    po = prec_with_ds_planes(po)
                                return lambda: pcg_gsel_rr(
                                    ga_f, b_p.astype(jnp.float64),
                                    prec=po, rtol=rtol,
                                    max_iter=msize, impl=impl,
                                    spmv_precision=sp,
                                    escalate_on_rebound=False,
                                )

                            solve_ = _mk_rr(spmv_p)
                            if impl == "pallas":
                                # probe-then-pin rebound recovery
                                # (VERDICT r4 item 4; pallas-only — the
                                # xla/CPU path's matvec rounding makes
                                # the counter noisy on healthy solves).
                                # Tier chain f32 -> ds_a (rds) -> ds:
                                # an rds solve that STILL rebounds has
                                # f32 preconditioner-apply noise as the
                                # remaining source (armadillo-scale
                                # Hessians) — pin the full-ds tier.
                                from ..solver.gsel_solver import (
                                    REBOUND_ESCALATE_THRESHOLD as _RT,
                                )

                                _tiers = ["f32", "ds_a", "ds"]
                                ti = _tiers.index(spmv_p)
                                while True:
                                    pr_ = solve_()
                                    if (int(pr_.rebounds) < _RT
                                            or ti + 1 >= len(_tiers)):
                                        break
                                    ti += 1
                                    log.info(
                                        "    rr rebound "
                                        f"x{int(pr_.rebounds)} detected "
                                        "- escalating device row to "
                                        f"{_tiers[ti]}"
                                    )
                                    solve_ = _mk_rr(_tiers[ti])
                        else:
                            kw2 = dict(rtol=rtol, max_iter=msize, impl=impl)
                            if ds:
                                kw2["precision"] = "ds"
                            else:
                                kw2["dot_dtype"] = "chunk64"
                                # c64: f64 carrier vectors over the f32
                                # SpMV (mixed refinement)
                                kw2["mixed"] = dev_prec == "c64"
                            solve_ = lambda: pcg_gsel(  # noqa: E731
                                ga_f, b_p, prec=prec_obj, **kw2
                            )
                        res_ = solve_()
                        np.asarray(res_.x)  # untimed full-x validation
                        t0_ = time.perf_counter()
                        for _ in range(repeat):
                            res_ = solve_()
                            # force with a SCALAR fetch: pulling the full
                            # x through the relay costs ~4-40 ms at
                            # 10-20 MB/s (tunnel artifact; the
                            # reference's native timers keep x on
                            # device — validate.py:80-86)
                            np.asarray(res_.iters)
                        return (time.perf_counter() - t0_) / repeat, float(
                            res_.iters
                        )

                    if ga_f is not None and gl_f is not None and gl_t is not None:
                        inv_d = (
                            jnp.asarray(1.0 / a_p.diagonal(), jnp.float32)
                            if scaled
                            else None
                        )
                        if ds:
                            from ..solver import GselSpaiPrecDS

                            wprec = GselSpaiPrecDS(
                                gl_f, gl_t, jnp.float64(workspace.epsilon),
                                inv_diag=inv_d,
                            )
                        else:
                            wprec = GselSpaiPrec(
                                gl_f, gl_t, jnp.float32(workspace.epsilon),
                                inv_diag=inv_d,
                            )
                        # residual-replacement mixed CG (rr default):
                        # f32-cost iterations, double-single re-anchoring —
                        # honest fp64-grade stopping (pcg_gsel_rr)
                        dtw, w_it = _timed_device_solve(wprec)
                        stats.put("Neural+TPU", dtw, prec_t, w_it, msize)

                        # +multi_rhs=K: batched K-column solve of the SAME
                        # operator (pcg_gsel_multi) — the planes stream once
                        # per iteration for all columns; 1.8-3.3x cheaper
                        # than K single solves at reference scales
                        # (docs/PERF.md round-1q). f32+chunk64 tier; the
                        # reference solves multi-RHS samples one column at
                        # a time (neural_cg/data.py:392-397). Reported
                        # solve time is PER COLUMN; iters is the column max.
                        k_rhs = int(cfg.select("multi_rhs", 0))
                        if k_rhs > 1:
                            from ..solver.gsel_solver import pcg_gsel_multi

                            mprec = (
                                GselSpaiPrec(
                                    gl_f, gl_t,
                                    jnp.float32(workspace.epsilon),
                                    inv_diag=inv_d,
                                )
                                if ds
                                else wprec
                            )
                            gt_cols = np.stack(
                                [np.asarray(r, np.float64)]
                                + [
                                    build_rhs("random", np.asarray(
                                        batch.mask)[:n_valid], a_ones, rng)
                                    for _ in range(k_rhs - 1)
                                ],
                                axis=1,
                            )
                            b_cols = jnp.asarray(
                                (a_csr @ gt_cols)[wperm], jnp.float32
                            )
                            msolve = lambda: pcg_gsel_multi(  # noqa: E731
                                ga_f, b_cols, prec=mprec, rtol=rtol,
                                max_iter=msize, impl=impl,
                            )
                            mres = msolve()
                            np.asarray(mres.x)
                            t0 = time.perf_counter()
                            for _ in range(repeat):
                                mres = msolve()
                                np.asarray(mres.x)
                            dtm = (time.perf_counter() - t0) / repeat
                            stats.put(
                                f"NeuralMRHS{k_rhs}+TPU", dtm / k_rhs,
                                prec_t, float(np.max(np.asarray(mres.iters))),
                                msize,
                            )

                    # classical AINV/FSAI device rows: both factors apply as
                    # two SpMVs (Z diag(1/p) Z^T / G^T G), so they ride the
                    # same gsel kernels + precision tier as the neural SPAI —
                    # the TPU analog of the reference's CUDA columns for
                    # these methods (infer.py:310-321, validate.py:54-86).
                    # The device IC row (PCG-ic-tpu, level-scheduled
                    # SpTRSV apply — kernels/sptrsv.py) is filled above.
                    # unpreconditioned + jacobi device rows on the same gsel
                    # kernels/tier (the old graph-form XLA path was ~20-50x
                    # slower per iteration; it remains the fallback below)
                    if ga_f is not None:
                        from ..solver import jacobi_prec

                        for method in ("none", "diagonal"):
                            if method not in check_methods:
                                continue
                            # per-method try/except: one failed row must not
                            # skip the rest of the gsel section (matches the
                            # ainv/fsai loop below)
                            try:
                                pr = (
                                    None
                                    if method == "none"
                                    else jacobi_prec(
                                        jnp.asarray(
                                            a_p.diagonal(), jnp.float32
                                        )
                                    )
                                )
                                dt_s, it_s = _timed_device_solve(pr)
                                stats.put(
                                    f"PCG-{method}-tpu", dt_s, 0.0, it_s,
                                    msize,
                                )
                                _dev_simple_done.add(method)
                            except Exception as e:  # noqa: BLE001
                                log.error(
                                    f"{method} device row failed: {e}"
                                )

                    if ga_f is not None:
                        import scipy.sparse as _sp

                        for method in ("ainv", "fsai"):
                            if method not in check_methods:
                                continue
                            try:
                                t0 = time.perf_counter()
                                if method == "ainv":
                                    if "ainv" in fcache:
                                        z, pdiag = fcache["ainv"]
                                    else:
                                        from ..native import ainv as _ainv

                                        z, pdiag = _ainv(a_csr)
                                    fwd_fac = _sp.csr_matrix(z)[wperm][
                                        :, wperm
                                    ].tocsr()
                                    inv_pd = jnp.asarray(
                                        (1.0 / pdiag)[wperm], jnp.float32
                                    )
                                else:
                                    if "fsai" in fcache:
                                        g_raw = fcache["fsai"]
                                    else:
                                        from ..native import fsai as _fsai

                                        g_raw = _fsai(a_csr)
                                    g_fac = _sp.csr_matrix(g_raw)[wperm][
                                        :, wperm
                                    ].tocsr()
                                    # M^-1 = G^T G: l_fwd = G^T, l_t = G
                                    fwd_fac = _sp.csr_matrix(g_fac.T).tocsr()
                                    inv_pd = None
                                if not np.all(np.isfinite(fwd_fac.data)) or (
                                    inv_pd is not None
                                    and not bool(
                                        np.all(np.isfinite(np.asarray(inv_pd)))
                                    )
                                ):
                                    # e.g. AINV breaks down on the synthetic
                                    # family (PARITY.md: >5000 iters / nan)
                                    log.warning(
                                        f"{method} factor non-finite; "
                                        "skipping TPU row"
                                    )
                                    continue
                                fwd_fac.sort_indices()
                                t_fac = _sp.csr_matrix(fwd_fac.T).tocsr()
                                t_fac.sort_indices()
                                gm_f = build_gsel_csr(fwd_fac, double_single=ds)
                                gm_t = build_gsel_csr(t_fac, double_single=ds)
                                # factorization cost: the CPU row already
                                # timed it when its factor was reused here
                                fact_t = time.perf_counter() - t0 + (
                                    cpu_prec_t.get(method, 0.0)
                                    if method in fcache
                                    else 0.0
                                )
                                if gm_f is None or gm_t is None:
                                    log.warning(
                                        f"{method} factor unbandable for the "
                                        "gsel device path; skipping TPU row"
                                    )
                                    continue
                                if ds:
                                    from ..solver import GselSpaiPrecDS

                                    mpre = GselSpaiPrecDS(
                                        gm_f, gm_t, jnp.float64(0.0),
                                        inv_diag=inv_pd,
                                    )
                                else:
                                    mpre = GselSpaiPrec(
                                        gm_f, gm_t, jnp.float32(0.0),
                                        inv_diag=inv_pd,
                                    )
                                dt_m, it_m = _timed_device_solve(mpre)
                                stats.put(
                                    f"PCG-{method}-tpu", dt_m, fact_t, it_m,
                                    msize,
                                )
                            except Exception as e:  # noqa: BLE001
                                log.error(f"{method} device row failed: {e}")

                    # device IC0 row: level-scheduled SpTRSV kernels
                    # (kernels/sptrsv.py) — the reference's CUDA 'ic'
                    # column (validate.py:54-86). The solve runs in the
                    # factor's padded level-major layout; its per-
                    # iteration cost is bounded by ~2x the level count of
                    # dependent grid steps (measured A/B:
                    # scripts/ic_device_ab.py).
                    if "ic" in check_methods and ga_f is not None:
                        try:
                            import dataclasses as _dc2
                            import hashlib as _hl

                            import scipy.sparse as _sp2

                            from ..kernels.sptrsv import (
                                IcPrec,
                                build_ic_layout,
                                build_ic_planes,
                            )

                            t0 = time.perf_counter()
                            if "ic" in fcache:
                                lfac = _sp2.csr_matrix(fcache["ic"])
                            else:
                                from ..native import ic0 as _ic0

                                lfac = _sp2.csr_matrix(_ic0(a_csr))
                            lfac.sort_indices()
                            tkey = _hl.sha1(
                                a_csr.indptr.tobytes()
                                + a_csr.indices.tobytes()
                            ).hexdigest()
                            cached = ic_topo_cache.get(tkey)
                            if cached is None:
                                ts = time.perf_counter()
                                lay = build_ic_layout(lfac)
                                ppos = lay["ppos"]
                                coo_a = a_csr.tocoo()
                                n_a = a_csr.nnz
                                # ids round-trip through f32 gsel value
                                # planes — exact only below 2^24
                                # (mirrors build_ic_layout's assert;
                                # ADVICE r4)
                                assert n_a + 1 < 2**24, (
                                    f"A nnz {n_a} too large for f32-exact "
                                    "entry ids in the IC device row"
                                )
                                ida = _sp2.csr_matrix(
                                    (np.arange(1, n_a + 1, dtype=np.float64),
                                     (ppos[coo_a.row], ppos[coo_a.col])),
                                    shape=(lay["n_pad"], lay["n_pad"]),
                                )
                                ga_id = build_gsel_csr(ida)
                                if ga_id is None:
                                    raise RuntimeError("padded A unbandable")
                                # slot -> A entry map (ids f32-exact); the
                                # padded-frame entry ORDER map a_ord undoes
                                # the coo->csr re-sort of the id matrix
                                a_map = np.rint(
                                    np.asarray(ga_id.vals)
                                ).astype(np.int64)
                                sched_t = time.perf_counter() - ts
                                log.info(
                                    "ic level schedule built in "
                                    f"{sched_t*1e3:.0f} ms (pattern-only, "
                                    "cached per topology)"
                                )
                                cached = (lay, ga_id, a_map, sched_t)
                                ic_topo_cache[tkey] = cached
                            lay, ga_id, a_map, _sched_t = cached
                            fwd_p, bwd_p, ppos = build_ic_planes(
                                lfac, layout=lay
                            )
                            avfull = np.concatenate(
                                [[0.0], a_csr.tocoo().data]
                            ).astype(np.float32)
                            ga_ic = _dc2.replace(
                                ga_id,
                                vals=jnp.asarray(
                                    avfull[a_map].reshape(a_map.shape)
                                ),
                            )
                            ic_fact_t = time.perf_counter() - t0 + (
                                cpu_prec_t.get("ic", 0.0)
                                if "ic" in fcache else 0.0
                            )
                            bp_ic = np.zeros(fwd_p.n_pad, np.float32)
                            bp_ic[ppos] = np.asarray(a_csr @ r)
                            icprec = IcPrec(fwd_p, bwd_p, impl=impl)
                            ic_solve = lambda: pcg_gsel(  # noqa: E731
                                ga_ic, jnp.asarray(bp_ic), prec=icprec,
                                rtol=rtol, max_iter=msize,
                                dot_dtype="chunk64", impl=impl,
                            )
                            icres = ic_solve()
                            np.asarray(icres.x)
                            t0 = time.perf_counter()
                            for _ in range(repeat):
                                icres = ic_solve()
                                np.asarray(icres.x)
                            dt_ic = (time.perf_counter() - t0) / repeat
                            stats.put(
                                "PCG-ic-tpu", dt_ic, ic_fact_t,
                                float(icres.iters), msize,
                            )
                        except Exception as e:  # noqa: BLE001
                            log.error(f"ic device row failed: {e}")

                    # fully on-device path: slot-layout GNN
                    # construction (gnn/slotted_block.py; b=1 is the
                    # trivial block case). The GNN message-passes over the
                    # block graph's ng=8 slot grid (plane traffic scales
                    # with K'), the solve runs on a separate ng=1
                    # cost-model solver grid, bridged by precomputed index
                    # planes — docs/PERF.md round-1g.
                    if workspace.name in ("simple", "scaled"):
                        import dataclasses as _dc

                        import scipy.sparse as sp

                        from ..gnn.slotted import (
                            fused_safe_group,
                            slot_scatter,
                        )
                        from ..gnn.slotted_block import (
                            build_block_slot_layout,
                            expand_block_planes,
                            scalar_scale_add,
                        )

                        b_sz = batch.block_size
                        bb = b_sz * b_sz
                        n_blk = n_valid
                        ei_v = ei[:, :e_valid]
                        # the slot grid must cover the RAW edge pattern
                        # (the GNN message-passes over every stored edge,
                        # masked or not) — the solver's wperm is computed
                        # on the Dirichlet-MASKED matrix, where boundary
                        # vertices are isolated and get ordered
                        # arbitrarily, blowing the raw-edge bandwidth up
                        # (poisson_pipe: 239 masked vs 22,884 raw)
                        a_blk = sp.csr_matrix(
                            (np.ones(e_valid), (ei_v[0], ei_v[1])),
                            shape=(n_blk, n_blk),
                        )
                        bperm = rcm_permutation(a_blk)
                        bpos = np.empty_like(bperm)
                        bpos[bperm] = np.arange(n_blk)
                        layout = build_block_slot_layout(
                            bpos[ei_v[0]], bpos[ei_v[1]], n_blk, b_sz
                        )
                        if layout is None:
                            log.warning(
                                "NeuralSlot row skipped: slot layout "
                                "infeasible (pattern too wide)"
                            )
                        if layout is not None and impl == "pallas":
                            from ..gnn.slotted import (
                                gnn_width_from_params,
                            )

                            pat = layout.sg.pattern
                            gsafe = fused_safe_group(
                                pat.k_width, pat.n_cols,
                                nf=gnn_width_from_params(params),
                                window=pat.window, q_chunks=pat.q_chunks,
                            )
                            if layout.sg.pattern.group > gsafe:
                                layout = build_block_slot_layout(
                                    bpos[ei_v[0]], bpos[ei_v[1]], n_blk,
                                    b_sz, group=gsafe,
                                )
                        if layout is not None:
                            from ..gnn.construct import make_slot_constructor

                            m_dof = (
                                np.asarray(batch.mask)[:n_valid][bperm]
                                .reshape(-1)
                            )

                            # the scoped-VMEM model (fused_safe_group) is
                            # marginal near the limit; retry with halved
                            # tile group on a compile-time VMEM OOM
                            sc = make_slot_constructor(
                                layout, params, batch, bperm, scaled, impl
                            )
                            fell_back = False
                            while True:
                                try:
                                    vf, vr = sc.construct()
                                    # host fetch forces compile + run
                                    # (block_until_ready is a relay no-op)
                                    np.asarray(vf.ravel()[0])
                                    break
                                except Exception as exc:  # noqa: BLE001
                                    # VMEM OOM surfaces as "Scoped
                                    # allocation", as a bare HTTP 500
                                    # when the remote-compile helper
                                    # dies, or RESOURCE_EXHAUSTED —
                                    # retry smaller, then unfused
                                    s_exc = str(exc)
                                    retryable = (
                                        "Scoped allocation" in s_exc
                                        or "remote_compile" in s_exc
                                        or "RESOURCE_EXHAUSTED" in s_exc
                                    )
                                    if not retryable or fell_back:
                                        raise
                                    gcur = layout.sg.pattern.group
                                    nxt = None
                                    if sc.gnn_impl == "fused" and gcur > 1:
                                        nxt = build_block_slot_layout(
                                            bpos[ei_v[0]], bpos[ei_v[1]],
                                            n_blk, b_sz,
                                            group=max(1, gcur // 2),
                                            window=layout.sg.pattern
                                            .window,
                                        )
                                    if nxt is not None:
                                        layout = nxt
                                        sc = make_slot_constructor(
                                            layout, params, batch, bperm,
                                            scaled, impl,
                                        )
                                    else:
                                        # wide GNNs (w48+) exceed the
                                        # fused kernel's VMEM even at
                                        # group=1: unfused gather kernel
                                        # + XLA MLP planes
                                        log.info(
                                            "fused GNN VMEM-bound; "
                                            "falling back to impl=pallas"
                                        )
                                        sc = make_slot_constructor(
                                            layout, params, batch, bperm,
                                            scaled, impl,
                                            gnn_impl="pallas",
                                        )
                                        fell_back = True
                            sg_b = layout.sg
                            s_sys, a_sys, _, _ = scalar_scale_add(
                                layout, m_dof, None
                            )
                            # honest construction time (round-3 protocol
                            # fix, VERDICT item 1): the WHOLE construction
                            # is one jitted program (gnn/construct.py);
                            # chained-scan differencing cancels the
                            # ~22.5 ms/dispatch relay cost that the old
                            # block_until_ready timing was measuring
                            # (output/r3_{relay_cost,prec_profile}.json)
                            prec_slot = sc.timed_construct_ms(
                                r1=2, r2=2 + 4 * max(1, repeat)
                            ) / 1e3

                            blocks64 = (
                                np.asarray(batch.graph.blocks)[:e_valid]
                                .reshape(-1, bb)
                                .astype(np.float64)
                            )
                            blocks_v = blocks64.astype(np.float32)
                            ap_sc = slot_scatter(sg_b, blocks_v)
                            a_vf, _ = expand_block_planes(
                                layout, ap_sc, ap_sc
                            )
                            a_lo = None
                            if rr:
                                # double-single A planes for the honest
                                # rr re-anchor: the mask scale/add values
                                # are exact {0,1}, so (hi, lo) stays an
                                # exact split of the f64 system matrix
                                lo_v = (
                                    blocks64 - blocks_v.astype(np.float64)
                                ).astype(np.float32)
                                lo_sc = slot_scatter(sg_b, lo_v)
                                a_lo, _ = expand_block_planes(
                                    layout, lo_sc, lo_sc
                                )
                            apl = _dc.replace(
                                layout.pattern,
                                vals=a_vf * s_sys + a_sys,
                                vals_lo=(
                                    None if a_lo is None else a_lo * s_sys
                                ),
                            )
                            sperm = (
                                bperm[:, None] * b_sz
                                + np.arange(b_sz)[None, :]
                            ).reshape(-1)
                            inv_d = (
                                jnp.asarray(
                                    1.0 / a_csr.diagonal()[sperm],
                                    jnp.float32,
                                )
                                if scaled
                                else None
                            )
                            # rr/rds: keep the RHS f64 end-to-end (fp64-
                            # grade stopping must not solve an f32-
                            # truncated system)
                            b_slot = jnp.asarray(
                                (a_csr @ r)[sperm],
                                dtype=jnp.float64 if rr else jnp.float32,
                            )
                            if rr:
                                # FUSED construct+solve: the GNN forward,
                                # plane expansion and the grouped-anchor
                                # rr/rds PCG compile into ONE program —
                                # a full neural solve pays one dispatch
                                # (~22.5 ms relay) instead of two
                                spmv_p = (
                                    "ds_a" if dev_prec == "rds" else "f32"
                                )
                                def _mk_slot_solve(sp):
                                    return lambda: sc.construct_and_solve(
                                        apl, b_slot,
                                        epsilon=float(workspace.epsilon),
                                        rtol=rtol, max_iter=msize,
                                        impl=impl, spmv_precision=sp,
                                        inv_diag=inv_d,
                                    )

                                slot_solve = _mk_slot_solve(spmv_p)
                                x_s, it_s, _rel, _cv, n_reb = slot_solve()
                                np.asarray(x_s)  # untimed validation
                                # probe-then-pin rebound recovery
                                # (VERDICT r4 item 4): tier chain
                                # f32 -> ds_a (rds) -> ds, as in the
                                # plane path above
                                from ..solver.gsel_solver import (
                                    REBOUND_ESCALATE_THRESHOLD as _RT,
                                )

                                if impl == "pallas":
                                    _tiers = ["f32", "ds_a", "ds"]
                                    ti = _tiers.index(spmv_p)
                                    while (int(n_reb) >= _RT
                                           and ti + 1 < len(_tiers)):
                                        ti += 1
                                        log.info(
                                            f"    rr rebound x{int(n_reb)}"
                                            " detected - escalating fused"
                                            f" solve to {_tiers[ti]}"
                                        )
                                        slot_solve = _mk_slot_solve(
                                            _tiers[ti]
                                        )
                                        x_s, it_s, _rel, _cv, n_reb = (
                                            slot_solve()
                                        )
                                        np.asarray(x_s)
                                t0 = time.perf_counter()
                                for _ in range(repeat):
                                    x_s, it_s, _rel, _cv, n_reb = (
                                        slot_solve()
                                    )
                                    np.asarray(it_s)  # scalar forcing
                                wall = (time.perf_counter() - t0) / repeat
                                # total (prec+solve) = the one-program
                                # wall-clock; construction reported from
                                # its chained measurement above
                                dts = max(wall - prec_slot, 0.0)
                                s_iters = float(np.asarray(it_s))
                            else:
                                lpl = _dc.replace(layout.pattern, vals=vf)
                                ltp = _dc.replace(
                                    layout.pattern, vals=vr
                                )
                                sprec = GselSpaiPrec(
                                    lpl, ltp,
                                    jnp.float32(workspace.epsilon),
                                    inv_diag=inv_d,
                                )
                                mx = dev_prec == "c64"
                                slot_solve = lambda: pcg_gsel(  # noqa: E731
                                    apl, b_slot, prec=sprec, rtol=rtol,
                                    max_iter=msize, dot_dtype="chunk64",
                                    impl=impl, mixed=mx,
                                )
                                sres = slot_solve()
                                np.asarray(sres.x)  # untimed validation
                                t0 = time.perf_counter()
                                for _ in range(repeat):
                                    sres = slot_solve()
                                    np.asarray(sres.iters)  # scalar
                                dts = (time.perf_counter() - t0) / repeat
                                s_iters = float(sres.iters)
                            stats.put(
                                "NeuralSlot+TPU", dts, prec_slot,
                                s_iters, msize,
                            )
                except Exception as e:  # noqa: BLE001
                    log.warning(f"gsel solve skipped: {e}")

            # LEGACY graph-form XLA device solve for the SpMV-only
            # methods when the gsel section didn't fill them (unbandable
            # pattern or use_windowed=false). RETIRED from the default
            # path (VERDICT r3 item 10): it reproducibly faults the
            # shared TPU worker at armadillo scale (b=3, n=17,454 —
            # r3_sessionA.log). Opt back in with +legacy_device_rows=true;
            # the gsel path is the only device solve issued by default.
            legacy_rows = bool(cfg.select("legacy_device_rows", False))
            for method in ("none", "diagonal"):
                if (not legacy_rows or method not in check_methods
                        or method in _dev_simple_done or host_only):
                    continue
                try:
                    from ..solver import jacobi_prec

                    ga = csr_to_graph(a_csr)
                    b_dev = jnp.asarray(a_csr @ r)
                    pr = None if method == "none" else jacobi_prec(ga)
                    res = pcg(ga, b_dev, prec=pr, rtol=rtol, max_iter=msize)
                    np.asarray(res.x)
                    t0 = time.perf_counter()
                    for _ in range(repeat):
                        res = pcg(
                            ga, b_dev, prec=pr, rtol=rtol, max_iter=msize
                        )
                        np.asarray(res.x)
                    dt = (time.perf_counter() - t0) / repeat
                    stats.put(
                        f"PCG-{method}-tpu", dt, 0.0, float(res.iters), msize
                    )
                except Exception as e:  # noqa: BLE001
                    log.error(f"graph-form {method} device row failed: {e}")

            # fully-distributed neural row (VERDICT r2 item 10): sharded
            # GNN construction + dist SPAI-PCG over the N-device mesh —
            # the multi-chip capability exercised through the product CLI
            if dist_n > 1 and workspace.name == "simple":
                try:
                    from jax.sharding import Mesh

                    from ..dist.gnn import (
                        dist_neural_pcg,
                        partition_gnn_inference,
                    )

                    import scipy.sparse as _sp3

                    b_sz2 = batch.block_size
                    t0 = time.perf_counter()
                    blocks_v2 = np.asarray(batch.graph.blocks)[:e_valid]
                    # RAW pattern with MASKED values: the GNN must see
                    # every stored edge, the solve the Dirichlet system
                    # (explicit zeros kept — sparse addition would prune)
                    a_raw = graph_to_csr(ei[:, :e_valid], blocks_v2, msize)
                    coo_raw = a_raw.tocoo()
                    a_dist = _sp3.csr_matrix(
                        (
                            np.asarray(
                                a_csr[coo_raw.row, coo_raw.col]
                            ).ravel(),
                            (coo_raw.row, coo_raw.col),
                        ),
                        shape=(msize, msize),
                    )
                    a_dist.sort_indices()
                    nfv = np.asarray(batch.x)[:n_valid].astype(np.float32)
                    efv = (
                        np.asarray(batch.edge_attr)[:e_valid]
                        .astype(np.float32)
                    )
                    # canonical block-coo order (the partition contract)
                    order = np.lexsort((ei[1, :e_valid], ei[0, :e_valid]))
                    pgnn, dpm = partition_gnn_inference(
                        a_dist, nfv, efv[order], n_shards=dist_n,
                        block_size=b_sz2,
                        mask_dof=np.asarray(batch.mask)[:n_valid]
                        .reshape(-1),
                    )
                    prep_t = time.perf_counter() - t0
                    dpm_s = (
                        dpm[:, None] * b_sz2 + np.arange(b_sz2)[None, :]
                    ).reshape(-1)
                    # f64 tier (default): this CLI row runs on a HOST-simulated
                    # mesh (CPU backend forced above), where ds pair
                    # arithmetic collapses under XLA:CPU fusion and the
                    # rr tier's iteration count is trajectory-bistable
                    # (103 vs 151 across sessions vs host 101 —
                    # kernels/ds.py caveat). Native f64 reproduces the
                    # host fp64 oracle deterministically; real TPU
                    # meshes use the rr tier (dist_precision=rr).
                    d_prec = str(cfg.select("dist_precision", "f64"))
                    bd = np.zeros(
                        dist_n * pgnn.pg_a.chunk,
                        np.float64 if d_prec in ("rr", "f64")
                        else np.float32,
                    )
                    bd[:msize] = (a_csr @ r)[dpm_s]
                    dmesh = Mesh(
                        np.array(jax.devices()[:dist_n]), ("shards",)
                    )
                    # checkpoint params are committed to one device;
                    # hand the mesh uncommitted host copies
                    params_h = jax.tree_util.tree_map(
                        lambda a_: np.asarray(a_), params
                    )
                    dist_solve = lambda: dist_neural_pcg(  # noqa: E731
                        workspace.model, params_h, pgnn,
                        jnp.asarray(bd.reshape(dist_n, -1)),
                        epsilon=float(workspace.epsilon), rtol=rtol,
                        max_iter=msize, impl="xla", mesh=dmesh,
                        precision=d_prec,
                    )
                    dres = dist_solve()
                    np.asarray(dres.x)
                    t0 = time.perf_counter()
                    for _ in range(repeat):
                        dres = dist_solve()
                        np.asarray(dres.x)
                    dtd = (time.perf_counter() - t0) / repeat
                    stats.put(
                        "NeuralDist", dtd, prep_t, float(dres.iters), msize
                    )
                except Exception as e:  # noqa: BLE001
                    log.warning(f"NeuralDist row skipped: {e}")

            if enable_cholmod:
                t0 = time.perf_counter()
                _, solve_t = direct_solve_time(a_csr, a_csr @ r)
                stats.put("Cholmod", solve_t, time.perf_counter() - t0 - solve_t, 1, msize)
    except KeyboardInterrupt:
        log.info("KeyboardInterrupt, stop testing.")

    stats.print(log.info)
    log_rtol = -int(math.log10(rtol))
    prefix = cfg.select("infer_prefix", "")
    exp_name = cfg.exp_name
    fname = out_dir / f"infer_{prefix}{exp_name}_{log_rtol}.csv"
    stats.timestat_to_dataframe().to_csv(fname, index=False)
    log.info(f"Inference statistics saved to {fname}")
    all_fname = out_dir / f"all_infer_{prefix}{exp_name}_{log_rtol}.csv"
    stats.all_time_stat().to_csv(all_fname, index=False)
    log.info(f"All inference statistics saved to {all_fname}")
    return stats


if __name__ == "__main__":
    main()

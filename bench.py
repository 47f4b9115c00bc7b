"""Benchmark harness — runs on the real TPU chip; prints ONE JSON line.

Primary metric (VERDICT round-2 item 2): END-TO-END WALL-CLOCK TO TRUE
rtol=1e-6 for the trained neural preconditioner — slot-layout GNN
construction + residual-replacement (rr) device solve, whose exit test
measures the TRUE residual with a double-single fp64-grade re-anchor, on
a real test sample of the flagship heat_r20 model (outputs/heat_r20_v2,
500-epoch budget). `vs_baseline` = reference 20.5 ms CUDA heat row
(misc/tab_to_latex_benchmark.py:13-14) / our total — >1 means faster
than the reference GPU.

Details carry:
  * a second e2e point at n≈50k (heat box res=36; the reference's large
    case is n=49,152 — misc/compute_stats.py:4-13, Neural+CUDA aggregate
    13.72 ms at 56 iters),
  * MEASURED isolated-SpMV roofline at n=15,625 and n=117,649 (chained
    scan differencing; bench/roofline.py — replaces the former
    0.8x-CG-iteration inference, VERDICT item 1),
  * preconditioned-iteration rate (round-1 continuity metric).

The production path is exercised through cli.infer itself (NeuralSlot+TPU
row), so this benchmarks what users run, not a bench-only pipeline.

Round-3 protocol (VERDICT items 1+2): construction + grouped-anchor
rds solve compile into ONE dispatched program (gnn/construct.py), so the
headline wall-clock pays the ~22.5 ms axon-relay dispatch floor exactly
once; the construction number is chained-differenced device time. The
relay floor (a test-tunnel artifact — output/r3_relay_cost.json) is
measured fresh each run and reported in detail, together with the
deployment-representative `e2e_device_ms` / `vs_baseline_device`.

Honest-timing protocol (docs/PERF.md): chained programs + host fetch;
min-of-N differencing where per-iteration costs are reported.
"""

import json
import os
import sys
import tempfile

import numpy as np

HBM_GBPS = {"v5 lite": 819.0, "v5e": 819.0, "v4": 1228.0, "v6e": 1640.0}
REF_HEAT_TOTAL_MS = 20.5  # reference CUDA heat row (113.4 iters)
REF_PCG_ITERS_PER_S = 113.4 / 0.0205

FAIL = {
    "metric": "neural_e2e_ms",
    "value": 0.0,
    "unit": "ms (construction + solve to true rtol=1e-6)",
    "vs_baseline": 0.0,
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _device_watchdog(seconds: int = 2400):
    # 2400 (round-5): a full run with BOTH infer compiles + a rebound
    # escalation recompile measured ~1200 s in a normal phase
    # (output/r5_bench_final.json.log); a slow-phase capture can double
    # compile times, and the watchdog must only catch a DOWN tunnel —
    # not a slow-but-progressing run.
    """Fail with one JSON line instead of hanging if the TPU tunnel is
    down (the axon worker can take ~10-40 min to recover)."""
    import signal

    def handler(signum, frame):
        print(json.dumps({**FAIL, "detail": {"error": "watchdog timeout"}}))
        sys.exit(0)

    signal.signal(signal.SIGALRM, handler)
    signal.alarm(seconds)
    return lambda: signal.alarm(0)


def _infer_neural_row(prefix, ckpt, out_dir, extra=()):
    """Run the production benchmark CLI on one sample; return the
    NeuralSlot+TPU row (prec ms, solve ms, iters, n) from its CSV."""
    import pandas as pd

    from tpu_spai.cli import infer as infer_cli

    args = [
        "exp_name=bench",
        f"data.prefix={prefix}",
        f"pretrained={ckpt}",
        "check_methods=[]",
        "max_samples=1",
        "repeat=2",
        f"out_dir={out_dir}",
        "warmup=1",
    ] + list(extra)
    infer_cli.main(args)
    df = pd.read_csv(os.path.join(out_dir, "all_infer_bench_6.csv"))
    row = df[df["Key"] == "NeuralSlot+TPU"]
    if len(row) == 0:
        return None
    r = row.iloc[0]
    return {
        "prec_ms": float(r["Precond Time (ms)"]),
        "solve_ms": float(r["Solve Time (ms)"]),
        "iters": float(r["#Iteration"]),
        "n": int(r["Matrix Size"]),
    }


def _relay_floor_ms():
    """Fixed wall-clock cost of ONE dispatched program through the axon
    relay (measured ~22.5 ms regardless of program/arg size —
    output/r3_relay_cost.json). Subtracted nowhere in the headline; used
    to report the deployment-representative device number alongside."""
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def tiny(x):
        return x.sum()

    x8 = jnp.ones(8, jnp.float32)
    np.asarray(tiny(x8))
    ts = []
    for _ in range(7):
        t0 = time.perf_counter()
        np.asarray(tiny(x8))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    import jax

    import tpu_spai  # noqa: F401

    cancel = _device_watchdog()
    import jax.numpy as jnp

    jnp.ones(8).sum().block_until_ready()  # first device contact
    cancel()
    cancel = _device_watchdog()

    dev = jax.devices()[0]
    plat = str(getattr(dev, "device_kind", "unknown")).lower()
    bw = next((v for k, v in HBM_GBPS.items() if k in plat), 819.0)
    log(f"device: {dev} ({plat}), HBM {bw} GB/s")

    detail = {}
    relay_ms = _relay_floor_ms()
    detail["relay_dispatch_floor_ms"] = round(relay_ms, 2)
    log(f"relay per-dispatch floor: {relay_ms:.1f} ms")

    # ---- 1) measured isolated SpMV roofline (items VERDICT-1) ----------
    # roofline_frac_normalized = spmv_gbps / co-measured STREAM gbps:
    # phase-invariant on the shared worker (the 0.42-0.69 multi-session
    # spread in docs/ROOFLINE.md §5 is worker phase, not kernel quality —
    # both numbers ride the same phase here). VERDICT r4 weak item 1:
    # the denominator is STREAM ONLY — the raw measurement and every
    # attempt are recorded; if an SpMV rate exceeds measured STREAM we
    # WARN and report the >1.0 fraction honestly instead of silently
    # substituting the kernel under test into its own denominator.
    from tpu_spai.bench.roofline import measure_stream_gbps, spmv_roofline_row

    try:
        stream, stream_attempts = measure_stream_gbps(
            return_attempts=True, cap_gbps=bw)
        log(f"co-measured STREAM: {stream:.0f} GB/s "
            f"({100*stream/bw:.0f}% of nominal {bw:.0f}; attempts "
            f"{[round(a, 1) for a in stream_attempts]})")
    except Exception as exc:  # noqa: BLE001
        stream, stream_attempts = None, []
        log(f"stream measurement failed: {exc}")

    rows = []
    for res in (24, 48):
        # paired_stream brackets each SpMV timing with its own STREAM
        # measurements so the normalized fraction is co-phased (the
        # session-global STREAM above is reported but not the
        # denominator — round-5: a phase flip between the global STREAM
        # and the SpMV block under-reported 0.55 where the co-phased
        # window reads ~0.74)
        row = spmv_roofline_row(res, hbm_gbps=bw, reps=5,
                                paired_stream=True)
        if row:
            rows.append(row)
    detail["stream_raw_gbps"] = round(stream, 1) if stream else None
    detail["stream_attempts_gbps"] = [round(a, 1) for a in stream_attempts]
    detail["stream_source"] = "stream" if stream else "failed"
    if stream:
        detail["stream_gbps"] = round(stream, 1)
    for row in rows:
        if row.get("roofline_frac_normalized") is None and stream:
            # bracket unavailable (exception path): session-global fallback
            row["stream_gbps"] = round(stream, 1)
            row["roofline_frac_normalized"] = round(row["gbps"] / stream, 4)
        if row.get("roofline_frac_normalized") is not None \
                and row["roofline_frac_normalized"] > 1.0:
            row["exceeds_stream"] = True
            log(f"WARNING: SpMV n={row['n']} rate {row['gbps']} GB/s "
                f"exceeds its bracketing STREAM {row['stream_gbps']} GB/s "
                f"— reporting the >1.0 fraction as-is")
        detail[f"spmv_n{row['n']}"] = row
        norm = row["roofline_frac_normalized"]
        log(f"SpMV n={row['n']}: {row['spmv_us']} us, "
            f"{row['gbps']} GB/s ({100*row['roofline_frac']:.0f}% "
            f"nominal, "
            + (f"{100*norm:.0f}% of stream)" if norm is not None
               else "stream unavailable)"))

    # ---- 2) trained-model end-to-end (heat_r20 w48, rr tier) ----------
    # VERDICT r4 item 1: the e2e headline runs the FSAI-parity model
    # (w48, 99.0 iters = host oracle — output/heat_r20_w48) through the
    # production CLI, not the faster-constructing 16-wide model.
    heat_cfg = [
        "data.is_fixed_topology=true", "data.has_shared_features=true",
        "data.use_node_features=true", "data.use_mask_as_node_feature=true",
        "data.load_into_memory=true",
    ]
    e2e = None
    with tempfile.TemporaryDirectory() as td:
        try:
            e2e = _infer_neural_row(
                "generated/heat_r20", "outputs/heat_r20_w48/checkpoints",
                td, extra=heat_cfg + ["gnn_features=48"],
            )
        except Exception as exc:  # noqa: BLE001
            log(f"heat_r20 e2e failed: {exc}")
    if e2e:
        total = e2e["prec_ms"] + e2e["solve_ms"]
        detail["e2e_heat_r20"] = {**e2e, "total_ms": round(total, 2)}
        log(f"heat_r20 e2e: {total:.1f} ms "
            f"(construct {e2e['prec_ms']:.2f} + solve {e2e['solve_ms']:.1f}, "
            f"{e2e['iters']:.0f} iters, n={e2e['n']})")

    # ---- 3) large case n≈50k (reference large row is n=49,152) --------
    # Model selection is MEASURED (round-5, output/r5_bench_final.json.log
    # vs r5_queue8.log, same demo sample): the in-distribution res=36
    # model at its 40-epoch round-5 budget lands 395 iters where the
    # 500-epoch heat_r20 model applied OOD lands 217 — training budget
    # beats distribution match at this gap, so the OOD model is the
    # default until a res=36 model with a comparable budget exists
    # (opt in to outputs/heat_r36 via TPU_SPAI_BENCH_R36=1).
    big_ckpt = "outputs/heat_r36/checkpoints"
    if not (os.environ.get("TPU_SPAI_BENCH_R36") == "1"
            and os.path.isdir(big_ckpt)):
        big_ckpt = "outputs/heat_r20_v2/checkpoints"
        log("n~50k case: 500-epoch heat_r20 model OOD (measured better "
            "than the 40-epoch res=36 model: 217 vs 395 iters)")
    big_prefix = "output/bench_heat_r36"
    try:
        if not os.path.isdir(os.path.join(big_prefix, "mat")):
            from tpu_spai.datagen.heat import HeatDatagen

            log("generating heat box:36 sample (one-time)...")
            HeatDatagen(
                prefix=big_prefix, mesh="box:36", max_count=2, seed=77,
            ).generate()
        with tempfile.TemporaryDirectory() as td:
            big = _infer_neural_row(
                big_prefix, big_ckpt, td,
                extra=heat_cfg,
            )
        if big:
            btot = big["prec_ms"] + big["solve_ms"]
            detail["e2e_heat_50k"] = {**big, "total_ms": round(btot, 2)}
            log(f"heat n~50k e2e: {btot:.1f} ms "
                f"(construct {big['prec_ms']:.2f} + solve "
                f"{big['solve_ms']:.1f}, {big['iters']:.0f} iters)")
    except Exception as exc:  # noqa: BLE001
        log(f"50k e2e failed: {exc}")

    # ---- 4) continuity metric: preconditioned iteration rate ----------
    if e2e and e2e["iters"] > 0 and e2e["solve_ms"] > 0:
        rate = e2e["iters"] / (e2e["solve_ms"] / 1e3)
        detail["pcg_iters_per_s"] = round(rate, 1)
        detail["vs_ref_iter_rate"] = round(rate / REF_PCG_ITERS_PER_S, 3)
        # the solve wall carries the one-program relay dispatch floor
        # (test-tunnel artifact, not TPU time); the device rate is the
        # deployment-representative number
        net_ms = max(e2e["solve_ms"] - relay_ms, 1e-6)
        rate_dev = e2e["iters"] / (net_ms / 1e3)
        detail["pcg_iters_per_s_device"] = round(rate_dev, 1)
        detail["vs_ref_iter_rate_device"] = round(
            rate_dev / REF_PCG_ITERS_PER_S, 3
        )
        total = e2e["prec_ms"] + e2e["solve_ms"]
        detail["e2e_device_ms"] = round(max(total - relay_ms, 0.0), 2)
        detail["vs_baseline_device"] = round(
            REF_HEAT_TOTAL_MS / max(total - relay_ms, 1e-6), 4
        )

    cancel()
    if e2e:
        total = detail["e2e_heat_r20"]["total_ms"]
        print(json.dumps({
            "metric": "neural_e2e_ms",
            "value": total,
            "unit": "ms (GNN construction + device solve to TRUE rtol=1e-6,"
                    " trained heat_r20, rr tier)",
            "vs_baseline": round(REF_HEAT_TOTAL_MS / total, 4),
            "detail": detail,
        }))
    else:
        print(json.dumps({**FAIL, "detail": detail}))


if __name__ == "__main__":
    main()

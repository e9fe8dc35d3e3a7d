#!/usr/bin/env python
"""Benchmark harness: prints ONE JSON line with the headline metric.

Headline: Viterbi decode throughput (events/s) on one TPU chip — forward
scan + traceback + host base-sequence assembly over a realistic batched
workload (B reads x T events, 4096-state R7.3 model), versus a 4-core CPU
baseline derived from the REAL compiled reference run-viterbi's measured
single-core rate (tools/baseline_spotcheck.py; see BASELINE.md).

Usage: python bench.py [--reads N] [--events T] [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))

# 4 cores x 4,136 events/s: the REAL compiled reference run-viterbi's
# measured single-core rate (tools/baseline_spotcheck.py; near-linear to 2
# cores), the stronger of the two baselines — the 8-thread stand-in
# (baseline/cpu_nanocall.cpp, re-measure with --cpu) does 14.0k aggregate.
# See BASELINE.md "Round-2 baseline spot-check".
CPU_BASELINE_EVENTS_PER_S = 16500.0


def sample_walk_events(pm, B: int, T: int, rng, p_stay=0.1, p_skip=0.3,
                       noise=1.0):
    """Generative (B, T) walk through the stay/step/skip chain, emitting
    from the pore model — the bench workload shares the generative process
    of the accuracy runs (nanocall_tpu.simulate is the single source of
    truth) instead of uniform noise."""
    from nanocall_tpu import simulate
    from nanocall_tpu.pore_model import PoreModelParams

    n = pm.level_mean.shape[0]
    K = int(round(np.log(n) / np.log(4)))
    states = simulate.sample_state_walk_batch(B, T, K, p_stay, p_skip, rng)
    mean, stdv = simulate._emit(
        pm, states, PoreModelParams(), np.zeros((B, 1)), rng, noise
    )
    return mean.astype(np.float32), stdv.astype(np.float32)


def measure_cpu(reads: int, events: int, events_file: str = "") -> float:
    exe = os.path.join(REPO, "baseline", "cpu_nanocall")
    if not os.path.exists(exe):
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-pthread",
             "-o", exe, exe + ".cpp"],
            check=True,
        )
    args = [exe, str(reads), str(events), "8"]
    if events_file:
        args.append(events_file)
    out = subprocess.run(args, capture_output=True, text=True, check=True)
    return float(json.loads(out.stdout)["events_per_s"])


def measure_tpu(B: int, T: int, n_iter: int = 4, reps: int = 3) -> dict:
    import jax

    from nanocall_tpu.observe import enable_compilation_cache

    enable_compilation_cache()

    from nanocall_tpu import transitions
    from nanocall_tpu.models import load_builtin_models
    from nanocall_tpu.ops import hmm

    models = load_builtin_models("r73")
    pm = models["r73.t.006"]
    tp = transitions.TransitionParams()
    # per-read device-built tables + device-scaled models from a one-copy
    # bank: the same program shape as production's _decode_chunk_pooled
    # (basecall.py) — scalar host-built tables compile to a ~1.8x slower
    # program on this toolchain (278 vs 158 ms/chunk at B=128, T=8192)
    gt = hmm.make_grouped_trans_device(
        np.full(B, tp.p_stay, np.float32), np.full(B, tp.p_skip, np.float32),
        K=6)
    rng = np.random.default_rng(0)
    bank = {
        "level_mean": pm.level_mean[None].astype(np.float32),
        "level_stdv": pm.level_stdv[None].astype(np.float32),
        "sd_mean": pm.sd_mean[None].astype(np.float32),
        "sd_lambda": pm.sd_lambda[None].astype(np.float32),
    }
    params = np.zeros((B, 6), np.float32)
    params[:, [0, 3, 4, 5]] = 1.0  # identity {scale, var, scale_sd, var_sd}
    model = hmm.make_scaled_model_arrays(bank, np.zeros(B, np.int32), params)
    # model-generated signal (the accuracy runs' generative process), not
    # uniform noise: device timing and accuracy share a workload shape
    mean, stdv = sample_walk_events(pm, B, T, rng)
    ev = {
        "mean": mean,
        "stdv": stdv,
        "log_stdv": np.log(stdv),
        "length": np.full(B, T, np.int32),
    }
    ev = {k: jax.device_put(v) for k, v in ev.items()}
    # warm up (compile); compact_path matches the production decode
    # (basecall.py: uint8 codes fetch + native path reconstruction)
    out = hmm.viterbi_decode_grouped(gt, model, ev, compact_path=True)
    codes0 = np.asarray(out["codes"])
    path00 = np.asarray(out["path0"])
    from concurrent.futures import ThreadPoolExecutor

    from nanocall_tpu import native

    def assemble(path0, codes):
        seqs = []
        for b in range(B):
            path = native.path_from_packed_codes(int(path0[b]), codes[b], T, 6)
            seqs.append(native.moves_and_base_seq(path, 6))
        return seqs

    # measured isolated once, for the breakdown line (not the headline)
    t1 = time.time()
    assemble(path00, codes0)
    host_dt = time.time() - t1

    def fetch_and_assemble(out):
        return assemble(np.asarray(out["path0"]), np.asarray(out["codes"]))

    # pipelined steady state, exactly as the production decode path runs:
    # all batches dispatched up front (async), fetched + assembled on
    # worker threads (relay fetch round-trips overlap each other and the
    # later batches' device work; ctypes assembly releases the GIL).
    # Measured as `reps` INDEPENDENT windows; the headline is the BEST
    # window (the standard estimator of the code's own cost under
    # external noise — the relay's per-dispatch latency and bandwidth
    # swing 2x between windows, and a single cold window depressed a
    # recorded headline ~21% in round 3).  Every window is reported in
    # detail.rep_ms_per_batch so the spread stays visible.
    rep_ms = []
    for _ in range(reps):
        t0 = time.time()
        outs = [hmm.viterbi_decode_grouped(gt, model, ev, compact_path=True)
                for _ in range(n_iter)]
        with ThreadPoolExecutor(4) as pool:
            futs = [pool.submit(fetch_and_assemble, out) for out in outs]
            seqs = [f.result() for f in futs]
        assert len(seqs) == n_iter and all(s for s in seqs)
        rep_ms.append((time.time() - t0) / n_iter * 1e3)
    total = min(rep_ms) / 1e3
    return {
        "events_per_s": B * T / total,
        "batch_ms": total * 1e3,
        "rep_ms_per_batch": [round(r, 1) for r in rep_ms],
        "host_assembly_ms": host_dt * 1e3,
        "reads_per_s": B / total,
        "n_states": int(pm.level_mean.shape[0]),
    }


def measure_e2e(n_reads: int, n_events: int, train: bool,
                n_passes: int = 3) -> dict:
    """Full pipeline (simulated fast5 -> FASTA) wall-clock reads/s."""
    import tempfile

    import numpy as np

    from nanocall_tpu import basecall, read_pipeline, simulate
    from nanocall_tpu.config import Config
    from nanocall_tpu.models import load_builtin_models
    from nanocall_tpu.observe import enable_compilation_cache

    enable_compilation_cache()
    models = load_builtin_models("r73")
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        for i in range(n_reads):
            simulate.write_sim_fast5(
                os.path.join(d, f"r{i}.fast5"), models, "r73.t.006",
                "r73.c.p1.006" if i % 2 else None, n_events, rng,
                read_id=f"r{i}", noise_scale=0.7,
            )
        cfg = Config(pore="r73", train=train).apply_pore_preset()
        files = read_pipeline.init_files([d])

        from nanocall_tpu.observe import StageTimer

        def run_once():
            t0 = time.time()
            # fully overlapped pipeline (basecall.run_pipeline): ingest
            # overlaps EM, decode dispatch overlaps phase-2 straggler EM,
            # winner path decodes dispatch as scores land
            timer = StageTimer()
            summaries, results = basecall.run_pipeline(
                files, models, cfg, timer=timer
            )
            stages = timer.summary()
            t_train = stages.get("training",
                                 stages.get("init_reads", {})).get("wall_s", 0.0)
            return summaries, results, t_train, time.time() - t0

        # pass 1 warms the per-process deferred device compiles (the axon
        # remote-compile backend compiles at first execution; minutes per
        # program shape); the next n_passes are steady-state measurements
        # and the MEDIAN is the headline (the relay's per-dispatch latency
        # swings 50-400 ms between windows; the min — the standard
        # estimator for the code's own cost under external noise — and the
        # full spread are reported in "detail" so readers can judge window
        # noise; the CPU baseline was a single plain pass, so comparing
        # its value against a median, not a min, keeps vs_baseline
        # symmetric)
        t0 = time.time()
        run_once()
        warm_s = time.time() - t0
        n_passes = max(1, n_passes)
        passes = sorted([run_once() for _ in range(n_passes)],
                        key=lambda p: p[3])
        all_dt = sorted(round(p[3], 1) for p in passes)
        # len//2 is the true median for odd N; for even N it takes the
        # SLOWER middle pass (conservative, never best-case-as-median)
        summaries, results, t_train, dt = passes[len(passes) // 2]
        total_events = sum(s.num_ed_events for s in summaries)
    return {
        "reads_per_s": round(n_reads / dt, 2),
        "events_per_s": round(total_events / dt),
        "seconds": round(dt, 1),
        "all_pass_seconds": all_dt,
        "min_pass_seconds": all_dt[0],
        "min_pass_events_per_s": round(total_events / passes[0][3]),
        "pass_spread_seconds": round(all_dt[-1] - all_dt[0], 1),
        "warmup_compile_s": round(warm_s, 1),
        "ingest_train_s": round(t_train, 1),
        "basecall_s": round(dt - t_train, 1),
        "n_seqs": len(results),
    }


def main():
    ap = argparse.ArgumentParser()
    # B=128 x T=8192 (1M events/chunk): measured fastest decode shape on
    # hardware (tools/exp_decode_shapes.py: 6.7M vs 5.4M events/s at
    # 256x4096; 8k events is also the realistic R7.3 template length)
    ap.add_argument("--reads", type=int, default=128)
    ap.add_argument("--events", type=int, default=8192)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="re-measure CPU baseline")
    ap.add_argument("--e2e", action="store_true",
                    help="benchmark the full fast5->FASTA pipeline instead")
    ap.add_argument("--no-train", action="store_true")
    ap.add_argument("--passes", type=int, default=3,
                    help="steady-state e2e passes (median reported)")
    ap.add_argument("--no-mfu", action="store_true",
                    help="skip the MFU/roofline accounting (one extra "
                         "compiled shape: the same-shape FMA-peak scan)")
    ap.add_argument("--debug", action="store_true",
                    help="debug logging (sub-stage pack/fetch timers)")
    args = ap.parse_args()
    if args.debug:
        import logging

        logging.basicConfig(
            level=logging.DEBUG,
            format="%(relativeCreated)8.0fms %(name)s: %(levelname)s: %(message)s",
        )
        logging.getLogger("jax").setLevel(logging.WARNING)

    if args.e2e:
        res = measure_e2e(args.reads, args.events, train=not args.no_train,
                          n_passes=args.passes)
        cpu = CPU_BASELINE_EVENTS_PER_S
        print(json.dumps({
            "metric": "e2e_pipeline_events_per_s",
            "value": round(res["events_per_s"]),
            "unit": "events/s",
            "vs_baseline": round(res["events_per_s"] / cpu, 2),
            "detail": res,
        }))
        return

    B, T = args.reads, args.events
    if args.quick:
        B, T = 32, 1024

    cpu = CPU_BASELINE_EVENTS_PER_S
    if args.cpu:
        # same generative workload on both sides (apples-to-apples; the
        # C++ inner loop is data-independent, but measure it anyway)
        import tempfile

        from nanocall_tpu.models import load_builtin_models

        pm = load_builtin_models("r73")["r73.t.006"]
        Bc, Tc = min(B, 16), min(T, 2048)
        mean, stdv = sample_walk_events(pm, Bc, Tc, np.random.default_rng(0))
        with tempfile.NamedTemporaryFile(suffix=".bin", delete=False) as f:
            np.stack([mean, stdv], axis=-1).astype("<f4").tofile(f)
            ev_path = f.name
        try:
            cpu = measure_cpu(Bc, Tc, ev_path)
        finally:
            os.unlink(ev_path)
        print(f"cpu baseline: {cpu:,.0f} events/s", file=sys.stderr)

    res = measure_tpu(B, T, n_iter=3 if args.quick else 4,
                      reps=2 if args.quick else 3)
    detail = {
        "B": B,
        "T": T,
        "pipelined_ms_per_batch": round(res["batch_ms"], 1),
        "rep_ms_per_batch": res["rep_ms_per_batch"],
        "host_assembly_ms": round(res["host_assembly_ms"], 1),
        "reads_per_s": round(res["reads_per_s"], 1),
        "cpu_baseline_events_per_s": cpu,
    }
    if not args.no_mfu:
        # MFU / roofline accounting (nanocall_tpu/roofline.py): itemized
        # ops-per-event model of the grouped forward + traceback, vs (a) a
        # MEASURED FMA peak at the recursion's own scan shape and (b) the
        # v5e VPU spec peak.  Reproducible: every count cites the kernel
        # expression it tallies.
        from nanocall_tpu import roofline

        n = res["n_states"]
        # op-count-matched chain: same per-step work as the grouped forward
        k = max(8, round(
            roofline.grouped_forward_ops_per_event(n)["total"] / (2 * n)))
        fma_peak, _ = roofline.measure_fma_peak(
            B, n, T=T, k=k, n_iter=2 if args.quick else 4)
        rep = roofline.mfu_report(B, T, n, res["batch_ms"] / 1e3,
                                  fma_peak_ops_per_s=fma_peak)
        detail["mfu"] = {
            "ops_per_event_per_row": rep["ops_per_event_per_row"]["total"],
            "ops_breakdown": {
                k: v for k, v in rep["ops_per_event_per_row"].items()
                if k != "total"
            },
            "achieved_vpu_teraops": round(
                rep["achieved_vpu_ops_per_s"] / 1e12, 2),
            "measured_fma_peak_teraops": round(fma_peak / 1e12, 2),
            "mfu_vs_measured_fma_peak": round(
                rep["mfu_vs_measured_fma_peak"], 3),
            "mfu_vs_v5e_vpu_spec": round(rep["mfu_vs_v5e_vpu_spec"], 3),
        }
    print(
        json.dumps(
            {
                "metric": "viterbi_decode_events_per_s",
                "value": round(res["events_per_s"]),
                "unit": "events/s",
                "vs_baseline": round(res["events_per_s"] / cpu, 2),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()

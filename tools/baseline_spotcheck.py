"""Spot-check the CPU baseline against the REAL reference binary.

baseline/cpu_nanocall.cpp is a stand-in re-implementation of the reference
Viterbi inner loop (the shipped reference binary is unbuildable: vendored
submodules absent).  This script times the *actual compiled reference* dev
tool run-viterbi (built verbatim from /root/reference/src/nanocall by
tests/ref_tools.py with shimmed submodule headers) on bench-shaped
generative-walk events, so BASELINE.md's per-thread events/s can be
corroborated against ground truth rather than the stand-in alone.

run-viterbi is single-process single-thread and its runtime includes TSV
parse + transition-table load; the DP events/s is isolated by timing two
event counts (T and 2T) and taking the marginal slope, which cancels the
fixed startup/IO cost.

Usage: python tools/baseline_spotcheck.py [--events 8192] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))


def sample_walk_tsv(pm_scaled, T, rng, path):
    from bench import sample_walk_events
    from nanocall_tpu import events as events_mod

    mean, stdv = sample_walk_events(pm_scaled, 1, T, rng)
    dt = 0.02
    ev = events_mod.EventSequence(
        mean=mean[0], stdv=stdv[0],
        start=np.arange(T) * dt, length=np.full(T, dt),
    )
    events_mod.save_tsv(ev, path)


def time_run_viterbi(exe, pm_path, st_path, ev_path, runs, jobs=1):
    """Best wall-clock over `runs`, each launching `jobs` concurrent
    processes (the reference parallelizes across reads via pfor; N
    concurrent single-read decodes model its N-thread throughput)."""
    best = float("inf")
    args = [exe, "-p", str(pm_path), "-s", str(st_path), "-e", str(ev_path)]
    for _ in range(runs):
        t0 = time.time()
        procs = [
            subprocess.Popen(args, stdout=subprocess.DEVNULL,
                             stderr=subprocess.DEVNULL)
            for _ in range(jobs)
        ]
        for p in procs:
            assert p.wait() == 0
        best = min(best, time.time() - t0)
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=8192)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--jobs", type=int, default=1,
                    help="concurrent decode processes (pfor-style scaling)")
    args = ap.parse_args(argv)

    from ref_tools import build_ref_tools

    from nanocall_tpu import pore_model, transitions
    from nanocall_tpu.models import load_builtin_models

    tools_map = build_ref_tools()
    if tools_map is None:
        print("reference tree or g++ unavailable", file=sys.stderr)
        return 1

    pm = load_builtin_models("r73")["r73.t.006"]
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        d = Path(d)
        pore_model.save_tsv(pm, d / "model.tsv")
        st = transitions.build_structured(
            transitions.TransitionParams(0.1, 0.3), 6
        )
        transitions.save_tsv(st, d / "trans.tsv")
        T = args.events
        sample_walk_tsv(pm, T, rng, d / "ev1.tsv")
        sample_walk_tsv(pm, 2 * T, rng, d / "ev2.tsv")
        exe = tools_map["run-viterbi"]
        t1 = time_run_viterbi(exe, d / "model.tsv", d / "trans.tsv",
                              d / "ev1.tsv", args.runs, args.jobs)
        t2 = time_run_viterbi(exe, d / "model.tsv", d / "trans.tsv",
                              d / "ev2.tsv", args.runs, args.jobs)
    dp_events_per_s = args.jobs * T / max(t2 - t1, 1e-9)
    print(json.dumps({
        f"reference_run_viterbi_events_per_s_{args.jobs}way": round(
            dp_events_per_s),
        "wall_T": round(t1, 2), "wall_2T": round(t2, 2), "T": T,
        "jobs": args.jobs,
        "note": "marginal slope between T and 2T events (startup/IO cancelled)",
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

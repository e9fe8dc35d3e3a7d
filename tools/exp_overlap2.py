#!/usr/bin/env python
"""A/B the overlapped run_pipeline against the staged
summarize_and_train + basecall_reads flow in ONE process / relay window
(alternating passes), on the bench's 512-read workload.

Usage: python tools/exp_overlap2.py [--reads 512] [--events 8192] [--passes 2]
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nanocall_tpu import basecall, read_pipeline, simulate
from nanocall_tpu.config import Config
from nanocall_tpu.models import load_builtin_models
from nanocall_tpu.observe import enable_compilation_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reads", type=int, default=512)
    ap.add_argument("--events", type=int, default=8192)
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    enable_compilation_cache()
    models = load_builtin_models("r73")
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        for i in range(args.reads):
            simulate.write_sim_fast5(
                os.path.join(d, f"r{i}.fast5"), models, "r73.t.006",
                "r73.c.p1.006" if i % 2 else None, args.events, rng,
                read_id=f"r{i}", noise_scale=0.7,
            )
        cfg = Config(pore="r73", train=True).apply_pore_preset()
        files = read_pipeline.init_files([d])

        def staged():
            ev_pool = basecall.EventPool()
            summaries = basecall.summarize_and_train(
                files, models, cfg, ev_pool=ev_pool, train_enabled=True
            )
            results = basecall.basecall_reads(summaries, models, cfg,
                                              ev_pool=ev_pool)
            return summaries, results

        def pipeline():
            return basecall.run_pipeline(files, models, cfg)

        cfg_ov = Config(pore="r73", train=True,
                        overlap_decode=True).apply_pore_preset()

        def overlapped():
            return basecall.run_pipeline(files, models, cfg_ov)

        # warm the flows' shapes
        t0 = time.time()
        staged()
        overlapped()
        print(f"warmup {time.time() - t0:.1f}s", flush=True)
        out = {"staged": [], "pipeline": [], "overlapped": []}
        fasta = {}
        for p in range(args.passes):
            for name, fn in (("staged", staged), ("pipeline", pipeline),
                             ("overlapped", overlapped)):
                t0 = time.time()
                summaries, results = fn()
                dt = time.time() - t0
                out[name].append(round(dt, 2))
                fasta[name] = sorted((r.seq_name, r.base_seq) for r in results)
                ev = sum(s.num_ed_events for s in summaries)
                print(f"pass {p} {name}: {dt:.2f}s  {ev/dt/1e3:.0f}k ev/s",
                      flush=True)
        print("staged:", out["staged"], " pipeline:", out["pipeline"],
              " overlapped:", out["overlapped"])
        print("outputs equal:",
              fasta["staged"] == fasta["pipeline"] == fasta["overlapped"])


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B the EM group-batch cap on the real e2e pipeline.

The fused EM round cut the per-cell HBM cost 3x (16 B/cell), so the
device could fit train chunks well past the default
Config.train_group_batch=128.  Bigger chunks don't change total wire
bytes (the relay is FIFO) but halve the number of EM dispatch round
trips, each of which carries 50-400 ms of relay latency jitter.  This
measures the standard 512-read e2e at caps 128 (default) and 256.

Run detached (relay rules): nohup python tools/exp_em_gbatch.py &
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nanocall_tpu.observe import enable_compilation_cache


def main():
    enable_compilation_cache()
    from nanocall_tpu import basecall, read_pipeline, simulate
    from nanocall_tpu.config import Config
    from nanocall_tpu.models import load_builtin_models
    from nanocall_tpu.observe import StageTimer

    models = load_builtin_models("r73")
    rng = np.random.default_rng(0)
    n_reads, n_events = 512, 8192
    with tempfile.TemporaryDirectory() as d:
        for i in range(n_reads):
            simulate.write_sim_fast5(
                os.path.join(d, f"r{i}.fast5"), models, "r73.t.006",
                "r73.c.p1.006" if i % 2 else None, n_events, rng,
                read_id=f"r{i}", noise_scale=0.7,
            )
        files = read_pipeline.init_files([d])
        for gb in (128, 256, 128):  # repeat 128 to bracket relay drift
            cfg = Config(pore="r73").apply_pore_preset()
            cfg.train_group_batch = gb
            times = []
            for p in range(3):
                timer = StageTimer()
                t0 = time.time()
                summaries, results = basecall.run_pipeline(
                    files, models, cfg, timer=timer)
                dt = time.time() - t0
                times.append(dt)
                s2 = {k: round(v["wall_s"], 2) for k, v in timer.summary().items()}
                print(f"gb={gb} pass={p}: {dt:.1f}s stages={s2} "
                      f"seqs={len(results)}", flush=True)
            print(f"gb={gb}: best={min(times):.1f}s "
                  f"all={[f'{t:.1f}' for t in times]}", flush=True)


if __name__ == "__main__":
    main()

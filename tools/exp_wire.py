#!/usr/bin/env python
"""Probe the relay's host<->device bandwidth and the no-train e2e floor.

If e2e is wire-bound, its time should track total shipped bytes / measured
bandwidth regardless of train/decode compute.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nanocall_tpu.observe import enable_compilation_cache


def main():
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    # upload bandwidth: 32 MB array
    a = np.random.default_rng(0).random((1024, 8192), np.float32)
    for sz_mb, arr in ((32, a), (8, a[:256])):
        t0 = time.time()
        d = jax.device_put(arr)
        _ = np.asarray(d[0, :1])  # force completion through the relay
        dt = time.time() - t0
        print(f"upload {sz_mb} MB: {dt:.2f}s = {sz_mb/dt:.1f} MB/s", flush=True)
    # fetch bandwidth
    d = jax.device_put(a)
    np.asarray(d[0, :1])
    t0 = time.time()
    _ = np.asarray(d)
    dt = time.time() - t0
    print(f"fetch 32 MB: {dt:.2f}s = {32/dt:.1f} MB/s", flush=True)
    # second upload, warm
    t0 = time.time()
    d2 = jax.device_put(a + 1)
    _ = np.asarray(d2[0, :1])
    dt = time.time() - t0
    print(f"upload 32 MB (2nd): {dt:.2f}s = {32/dt:.1f} MB/s", flush=True)

    # no-train e2e floor
    import tempfile

    from nanocall_tpu import basecall, read_pipeline, simulate
    from nanocall_tpu.config import Config
    from nanocall_tpu.models import load_builtin_models

    models = load_builtin_models("r73")
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as dd:
        for i in range(512):
            simulate.write_sim_fast5(
                os.path.join(dd, f"r{i}.fast5"), models, "r73.t.006",
                "r73.c.p1.006" if i % 2 else None, 8192, rng,
                read_id=f"r{i}", noise_scale=0.7,
            )
        cfg = Config(pore="r73", train=False).apply_pore_preset()
        files = read_pipeline.init_files([dd])
        basecall.run_pipeline(files, models, cfg)  # warm
        for p in range(2):
            t0 = time.time()
            summaries, results = basecall.run_pipeline(files, models, cfg)
            dt = time.time() - t0
            ev = sum(s.num_ed_events for s in summaries)
            print(f"no-train pass {p}: {dt:.2f}s  {ev/dt/1e3:.0f}k ev/s "
                  f"({len(results)} seqs)", flush=True)


if __name__ == "__main__":
    main()

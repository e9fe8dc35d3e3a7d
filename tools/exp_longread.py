#!/usr/bin/env python
"""Hardware proof for the max-length read path (VERDICT r2 item 5).

The reference caps reads at 100k ed events (nanocall.cpp:65,
Fast5_Summary.hpp:510-524).  This decodes AND trains one max-length read
through the real pipeline on the TPU, recording the chosen decode bucket
(B, T), wall time, and the device memory stats the backend exposes — the
measured replacement for the extrapolated HBM budget model
(basecall.BP_MEM_BUDGET).

Run detached (relay rules): nohup python tools/exp_longread.py &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nanocall_tpu.observe import enable_compilation_cache


def main():
    enable_compilation_cache()
    import tempfile

    import jax

    from nanocall_tpu import basecall, batching, read_pipeline, simulate
    from nanocall_tpu.config import Config
    from nanocall_tpu.models import load_builtin_models

    n_events = 100_000
    models = load_builtin_models("r73")
    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        t0 = time.time()
        simulate.write_sim_fast5(
            os.path.join(d, "long.fast5"), models, "r73.t.006", None,
            n_events, rng, read_id="long", noise_scale=0.7,
        )
        print(f"simulated {n_events}-event read in {time.time()-t0:.1f}s",
              flush=True)
        cfg = Config(pore="r73", train=True).apply_pore_preset()
        files = read_pipeline.init_files([d])

        s = read_pipeline.summarize(files[0], models, cfg)
        L = s.strand_bounds[1] - s.strand_bounds[0]
        T = batching.bucket_length(L)
        B = batching.batch_size_for(T, cfg.bucket_max_batch,
                                    basecall.BP_MEM_BUDGET, 4096)
        print(f"num_ed_events={s.num_ed_events} strand_events~{L} "
              f"bucket T={T} cap B={B} "
              f"bp_bytes={8*T*4096/2**30:.2f} GiB at B=8", flush=True)

        for p in range(2):
            t0 = time.time()
            summaries, results = basecall.run_pipeline(files, models, cfg)
            dt = time.time() - t0
            print(f"pass {p}: train+decode {dt:.1f}s  "
                  f"seqs={len(results)} "
                  f"bases={sum(len(r.base_seq) for r in results)}",
                  flush=True)
        try:
            stats = jax.devices()[0].memory_stats()
            keys = {k: v for k, v in (stats or {}).items()
                    if "bytes" in k or "peak" in k}
            print("device memory_stats:", keys, flush=True)
        except Exception as e:
            print("memory_stats unavailable:", e, flush=True)
        print("done", flush=True)


if __name__ == "__main__":
    main()

"""Same-window A/B: pipelined decode wall ms/batch vs pipeline depth.

The self-diagnosing bench (round 5) measured device-only 134.6 ms/batch
vs pipelined wall 182 ms at n_iter=4 — ~47 ms/batch of relay fetch not
hidden by the 4-deep pipeline.  Steady-state production keeps a deeper
queue; sweep n_iter to find where wall/batch converges to device+eps.

Usage: python tools/exp_pipe_depth.py [depths...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import bench  # noqa: E402


def main():
    depths = [int(a) for a in sys.argv[1:]] or [4, 8, 12]
    import jax  # noqa: F401

    from nanocall_tpu.observe import enable_compilation_cache

    enable_compilation_cache()
    # one warm measurement builds all state via measure_tpu's own path;
    # then sweep depths with reps=2 windows each, interleaved
    from nanocall_tpu import native, transitions  # noqa: F401

    results = {d: [] for d in depths}
    for round_i in range(3):
        for d in depths:
            r = bench.measure_tpu(128, 8192, n_iter=d, reps=1,
                                  with_mfu=False)
            results[d].append(r["batch_ms"])
            print(f"round {round_i} depth {d}: wall {r['batch_ms']:.1f} "
                  f"dev {r['device_ms_per_batch']:.1f} ms/batch",
                  flush=True)
        time.sleep(2)
    for d in depths:
        print(f"depth {d}: best {min(results[d]):.1f} ms "
              f"median {sorted(results[d])[len(results[d]) // 2]:.1f} ms")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Decode throughput vs chunk shape: is the e2e's (B=128, T=8192) bucket
slower per event than the headline (B=256, T=4096)?

If yes, the decode scan is iteration-latency-bound at B=128 and raising B
(which needs backpointer-memory relief: packing or checkpoint-recompute)
is worth pursuing.  Run detached on the TPU.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp

from nanocall_tpu.ops import hmm
from nanocall_tpu.observe import enable_compilation_cache

enable_compilation_cache()


def bench_shape(B, T, n_iter=6):
    gt = hmm.make_grouped_trans_device(
        np.full(B, 0.1, np.float32), np.full(B, 0.3, np.float32), K=6)
    bank = {
        "level_mean": np.random.rand(4, 4096).astype(np.float32) * 30 + 50,
        "level_stdv": np.ones((4, 4096), np.float32),
        "sd_mean": np.ones((4, 4096), np.float32),
        "sd_lambda": np.ones((4, 4096), np.float32),
    }
    params = np.zeros((B, 6), np.float32)
    params[:, [0, 3, 4, 5]] = 1.0
    model = hmm.make_scaled_model_arrays(bank, np.zeros(B, np.int32), params)
    ev = {
        "mean": jnp.asarray(np.random.rand(B, T).astype(np.float32) * 30 + 50),
        "stdv": jnp.asarray(np.ones((B, T), np.float32) * 1.1),
        "log_stdv": jnp.asarray(np.full((B, T), np.log(1.1), np.float32)),
        "length": jnp.asarray(np.full(B, T, np.int32)),
    }
    out = hmm.viterbi_decode_grouped(gt, model, ev, with_path=True,
                                     compact_path=True)
    np.asarray(out["codes"][:1, :1])  # warm + sync
    t0 = time.time()
    outs = [hmm.viterbi_decode_grouped(gt, model, ev, with_path=True,
                                       compact_path=True)
            for _ in range(n_iter)]
    for o in outs:
        np.asarray(o["codes"])
        np.asarray(o["path0"])
    dt = (time.time() - t0) / n_iter
    print(f"B={B} T={T}: {dt*1e3:.0f} ms/chunk  "
          f"{B*T/dt/1e6:.2f} M events/s", flush=True)


if __name__ == "__main__":
    for B, T in [(256, 4096), (128, 8192), (64, 8192), (102, 10240)]:
        bench_shape(B, T)

#!/usr/bin/env python
"""Sweep the traceback scan's unroll at the headline decode shape
(B=128, T=8192): the traceback is iteration-latency-bound (~20us/step),
so a larger unroll may amortize more per-step overhead than the round-2
default of 8."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nanocall_tpu.observe import enable_compilation_cache


def main():
    enable_compilation_cache()
    from nanocall_tpu.models import load_builtin_models
    from nanocall_tpu.ops import hmm

    B, T = 128, 8192
    pm = load_builtin_models("r73")["r73.t.006"]
    rng = np.random.default_rng(0)
    gt = hmm.make_grouped_trans_device(
        np.full(B, 0.1, np.float32), np.full(B, 0.3, np.float32), K=6)
    bank = {k: getattr(pm, k)[None].astype(np.float32)
            for k in ("level_mean", "level_stdv", "sd_mean", "sd_lambda")}
    params = np.zeros((B, 6), np.float32)
    params[:, [0, 3, 4, 5]] = 1.0
    model = hmm.make_scaled_model_arrays(bank, np.zeros(B, np.int32), params)
    stdv = rng.uniform(0.5, 1.5, (B, T)).astype(np.float32)
    ev = {"mean": rng.uniform(40, 90, (B, T)).astype(np.float32),
          "stdv": stdv, "log_stdv": np.log(stdv),
          "length": np.full(B, T, np.int32)}

    for tb in (8, 16, 32):
        for fwd in (2,):
            out = hmm.viterbi_decode_grouped(gt, model, ev, fwd_unroll=fwd,
                                             tb_unroll=tb, compact_path=True)
            np.asarray(out["logp"])  # compile+warm
            t0 = time.time()
            outs = [hmm.viterbi_decode_grouped(gt, model, ev, fwd_unroll=fwd,
                                               tb_unroll=tb, compact_path=True)
                    for _ in range(6)]
            for o in outs:
                np.asarray(o["codes"])
            dt = (time.time() - t0) / 6
            print(f"fwd={fwd} tb={tb}: {dt*1e3:.0f} ms/batch "
                  f"{B*T/dt/1e6:.2f} M ev/s", flush=True)


if __name__ == "__main__":
    main()

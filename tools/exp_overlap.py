#!/usr/bin/env python
"""Measure relay H2D bandwidth and whether uploads overlap device compute.

Q1: what is the host->device wire rate for pool-sized arrays?
Q2: if a long compute is dispatched first, does an upload dispatched
    right after finish during the compute (overlap) or after it (serial)?
Q3: does jnp.asarray return before the transfer completes (async) or block?

Run detached on the TPU: python tools/exp_overlap.py
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


def fetch(x):
    return np.asarray(x)


def main():
    # Q1/Q3: upload timing, 25 MB
    a = np.random.rand(512, 4096, 3).astype(np.float32)
    for label in ("cold", "warm"):
        t0 = time.time()
        d = jnp.asarray(a)
        t_dispatch = time.time() - t0
        # force completion: tiny reduce fetched to host
        s = fetch(jnp.sum(d[:1, :1, :1]))
        t_done = time.time() - t0
        print(f"upload 25MB {label}: dispatch_return={t_dispatch:.3f}s "
              f"complete={t_done:.3f}s -> {25/max(t_done,1e-9):.1f} MB/s",
              flush=True)
        del d, s

    # a decode-like compute: grouped viterbi forward B=128 T=4096
    B, T = 128, 4096
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
        "stdv": jnp.asarray(np.ones((B, T), np.float32)),
        "log_stdv": jnp.asarray(np.zeros((B, T), np.float32)),
        "length": jnp.asarray(np.full(B, T, np.int32)),
    }
    # warm compile
    out = hmm.viterbi_decode_grouped(gt, model, ev, with_path=False)
    fetch(out["logp"])
    t0 = time.time()
    out = hmm.viterbi_decode_grouped(gt, model, ev, with_path=False)
    fetch(out["logp"])
    t_one = time.time() - t0
    print(f"one forward chunk: {t_one:.3f}s", flush=True)
    n_chunks = max(2, int(3.0 / max(t_one, 0.05)))

    # Q2: serial baseline — compute x n, then upload
    t0 = time.time()
    outs = [hmm.viterbi_decode_grouped(gt, model, ev, with_path=False)
            for _ in range(n_chunks)]
    for o in outs:
        fetch(o["logp"])
    t_compute = time.time() - t0
    t0 = time.time()
    d = jnp.asarray(a)
    fetch(jnp.sum(d[:1, :1, :1]))
    t_upload = time.time() - t0
    del d
    print(f"serial: compute({n_chunks})={t_compute:.3f}s upload={t_upload:.3f}s "
          f"sum={t_compute + t_upload:.3f}s", flush=True)

    # overlapped: dispatch computes, then upload, then fetch both
    t0 = time.time()
    outs = [hmm.viterbi_decode_grouped(gt, model, ev, with_path=False)
            for _ in range(n_chunks)]
    d = jnp.asarray(a)
    for o in outs:
        fetch(o["logp"])
    t_c = time.time() - t0
    fetch(jnp.sum(d[:1, :1, :1]))
    t_all = time.time() - t0
    print(f"overlapped: computes_done={t_c:.3f}s all_done={t_all:.3f}s "
          f"(overlap {'YES' if t_all < t_compute + 0.7 * t_upload else 'NO'})",
          flush=True)

    # Q2b: upload dispatched from a background thread during compute
    import threading
    res = {}

    def up():
        t0 = time.time()
        d = jnp.asarray(a)
        res["dispatch"] = time.time() - t0
        res["arr"] = d

    t0 = time.time()
    outs = [hmm.viterbi_decode_grouped(gt, model, ev, with_path=False)
            for _ in range(n_chunks)]
    th = threading.Thread(target=up)
    th.start()
    for o in outs:
        fetch(o["logp"])
    t_c = time.time() - t0
    th.join()
    fetch(jnp.sum(res["arr"][:1, :1, :1]))
    t_all = time.time() - t0
    print(f"thread-overlapped: computes_done={t_c:.3f}s all_done={t_all:.3f}s "
          f"upload_dispatch_return={res['dispatch']:.3f}s", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Hardware A/B: T-chunked long-read decode vs today's full-scan budget
shape (VERDICT r4 item 4's single-chip data point).

Today's long-read path decodes a ~100k-event read as ONE scan program
whose batch is capped by the backpointer HBM budget (B=8 at T~100k —
tools/exp_longread.py; the bp tensor is held ~2.5x, CLAUDE.md).  The
T-chunked formulation (ops.hmm.viterbi_forward_grouped_chunk +
viterbi_traceback_grouped_chunk, bit-exact vs the full kernel per
tests/test_seqpar.py) splits the scan into C dispatches carrying the
(B, n) alpha across chunks; only ONE chunk's ys buffer + layout copy is
live at a time on top of the accumulated bp slices, so peak HBM drops
from ~2.5x to ~(1 + 1.5/C)x of the bp bytes — admitting 2-4x the batch
at the same length, and with it the throughput the B=8 cap forfeits.

Arms (all T=100352 total, C=8 chunks of 12544):
  1. full-scan B=8  (today's budget shape)
  2. chunked  B=8  (iso-batch chunking overhead)
  3. chunked  B=16 (2x the capped batch)
  4. chunked  B=32 (4x; expected near the 16 GB ceiling — OOM is caught
     and reported, not fatal)

Run detached (relay rules): nohup python tools/exp_seqchunk.py &
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from nanocall_tpu.observe import enable_compilation_cache

T_TOTAL = 100_352
C = 8
REPS = 3


def main():
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from nanocall_tpu import simulate, transitions
    from nanocall_tpu.models import load_builtin_models
    from nanocall_tpu.ops import hmm

    models = load_builtin_models("r73")
    pm = models["r73.t.006"]
    model = hmm.make_model_arrays(*pm.state_arrays())
    gt = hmm.make_grouped_trans(transitions.TransitionParams(), 6)
    n = 4096

    rng = np.random.default_rng(0)
    t0 = time.time()
    mean1, stdv1, _, _, _ = simulate.simulate_read(
        models, "r73.t.006", None, T_TOTAL, rng, noise_scale=0.7)
    print(f"simulated {T_TOTAL} events in {time.time()-t0:.1f}s", flush=True)

    def make_ev(B):
        # replicate one simulated read with tiny per-row jitter (values
        # don't affect timing; jitter defeats any dedup)
        jit = rng.normal(0, 0.01, (B, 1)).astype(np.float32)
        mean = np.broadcast_to(mean1[:T_TOTAL], (B, T_TOTAL)).astype(np.float32) + jit
        stdv = np.broadcast_to(stdv1[:T_TOTAL], (B, T_TOTAL)).astype(np.float32)
        return {"mean": mean, "stdv": stdv,
                "log_stdv": np.log(stdv),
                "length": np.full(B, T_TOTAL, np.int32)}

    fwd_full = jax.jit(hmm.viterbi_forward_grouped, static_argnames="unroll")
    tb_full = jax.jit(hmm.viterbi_traceback_grouped,
                      static_argnames=("unroll", "compact"))
    fwd_chunk = jax.jit(hmm.viterbi_forward_grouped_chunk,
                        static_argnames="unroll")
    tb_chunk = jax.jit(hmm.viterbi_traceback_grouped_chunk,
                       static_argnames="unroll")

    def run_full(ev):
        fa, bps = fwd_full(gt, model, ev, unroll=2)
        path, logp = tb_full(gt, fa, bps, ev["length"])
        return np.asarray(logp)  # fetch syncs (block_until_ready lies here)

    def run_chunked(ev):
        B = ev["mean"].shape[0]
        Tc = T_TOTAL // C
        alpha = jnp.zeros((B, n), jnp.float32)
        chunks = []
        for c in range(C):
            evc = {k: (v[:, c * Tc:(c + 1) * Tc] if k != "length" else v)
                   for k, v in ev.items()}
            alpha, bps_c = fwd_chunk(gt, model, evc, alpha, c * Tc)
            chunks.append(bps_c)
        end_state = jnp.argmax(alpha, axis=-1).astype(jnp.int32)
        logp = jnp.max(alpha, axis=-1)
        carry = end_state
        for c in reversed(range(C)):
            carry, _states = tb_chunk(gt, end_state, carry, chunks[c],
                                      c * Tc, ev["length"])
            chunks[c] = None  # free this chunk's bp slice early
        return np.asarray(logp)

    def bench(label, fn, ev):
        B = ev["mean"].shape[0]
        try:
            fn(ev)  # warmup / compile
            times = []
            for _ in range(REPS):
                t0 = time.time()
                fn(ev)
                times.append(time.time() - t0)
            best = min(times)
            evs = B * T_TOTAL / best
            print(f"{label:22s} B={B:3d} best={best*1e3:8.1f} ms "
                  f"reps={[f'{t*1e3:.0f}' for t in times]} "
                  f"events/s={evs/1e6:.2f}M", flush=True)
            return evs
        except Exception as e:
            print(f"{label:22s} B={B:3d} FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            return None

    from nanocall_tpu import batching

    Tc = batching.tchunk_len(T_TOTAL)

    def run_tchunk(ev):
        out = hmm.viterbi_decode_grouped_tchunk(
            gt, model, ev, Tc=Tc, compact_path=True)
        return np.asarray(out["logp"])

    bench("full-scan (today)", run_full, make_ev(8))
    bench("chunked C=8", run_chunked, make_ev(8))
    bench("chunked C=8", run_chunked, make_ev(16))
    bench("chunked C=8", run_chunked, make_ev(32))
    print(f"tchunk single-program: Tc={Tc} C={T_TOTAL // Tc}", flush=True)
    bench("tchunk 1-program", run_tchunk, make_ev(8))
    bench("tchunk 1-program", run_tchunk, make_ev(16))
    bench("tchunk 1-program", run_tchunk, make_ev(32))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Find the traceback's floor: time stripped-down variants of the
reverse scan over the (T-1, B, n) uint8 backpointer tensor at the
headline shape to see whether its ~12 us/step is structural (scan +
per-step slicing of a ~1 GiB input) or trimmable kernel fat.

Variants:
  full   — the production traceback (two-stage lookup + code packing)
  lookup — only the two-stage _lookup_bp, no from-state/code logic
  sum    — per-step reduce of the bp slice (pure streaming floor)
  none   — scan over the bp tensor with a trivial carry (scan overhead)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import numpy as np

from nanocall_tpu.observe import enable_compilation_cache


def main():
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from nanocall_tpu.ops import hmm

    B, T, n = 128, 8192, 4096
    rng = np.random.default_rng(0)
    bps = jnp.asarray(rng.integers(0, 192, (T - 1, B, n), dtype=np.uint8))
    final_alpha = jnp.asarray(rng.uniform(-10, 0, (B, n)).astype(np.float32))
    lengths = jnp.full(B, T, jnp.int32)

    @functools.partial(jax.jit, static_argnames=("mode",))
    def run(bps, final_alpha, lengths, mode: str):
        end_state = jnp.argmax(final_alpha, axis=-1).astype(jnp.int32)
        if mode == "none":
            def step(s, bp_t):
                return s + bp_t[0, 0].astype(jnp.int32), None
            s, _ = jax.lax.scan(step, jnp.int32(0), bps, reverse=True,
                                unroll=8)
            return s
        if mode == "sum":
            def step(s, bp_t):
                return s + jnp.sum(bp_t.astype(jnp.int32)), None
            s, _ = jax.lax.scan(step, jnp.int32(0), bps, reverse=True,
                                unroll=8)
            return s
        if mode == "lookup":
            def step(s, bp_t):
                k = hmm._lookup_bp(bp_t, s)
                return (s + k.astype(jnp.int32)) & (n - 1), None
            s, _ = jax.lax.scan(step, end_state, bps, reverse=True, unroll=8)
            return s
        raise ValueError(mode)

    gt = hmm.make_grouped_trans(p_stay=0.1, p_skip=0.3, K=6)

    def full():
        return hmm.viterbi_traceback_grouped(gt, final_alpha, bps, lengths,
                                             compact=True)

    for mode in ("none", "sum", "lookup"):
        out = run(bps, final_alpha, lengths, mode)
        np.asarray(out)
        t0 = time.time()
        outs = [run(bps, final_alpha, lengths, mode) for _ in range(4)]
        np.asarray(outs[-1])
        dt = (time.time() - t0) / 4
        print(f"{mode:7s}: {dt*1e3:6.1f} ms  {dt/ (T-1) * 1e6:5.1f} us/step",
              flush=True)
    o = full()
    np.asarray(o[2])
    t0 = time.time()
    outs = [full() for _ in range(4)]
    np.asarray(outs[-1][2])
    dt = (time.time() - t0) / 4
    print(f"full   : {dt*1e3:6.1f} ms  {dt/(T-1)*1e6:5.1f} us/step", flush=True)


if __name__ == "__main__":
    main()

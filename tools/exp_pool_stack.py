#!/usr/bin/env python
"""Why does EventPool.upload_now's host stacking take ~4 s for the second
length bucket (T=8192, Pq=512) when the first (T=10240, Pq=256) takes
~10-70 ms?  Hypotheses:

  A. contention: the first bucket's async jnp.asarray transfers (~30 MB
     over the ~10 MB/s relay) steal host CPU / allocator locks while the
     second bucket stacks;
  B. the rows themselves (2D strand slices from the fork-pool ingest)
     are slow to copy;
  C. allocator first-touch (should have been fixed by _tune_allocator).

Run detached on the TPU host.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def stack(rows_T, Pq, T):
    t0 = time.time()
    mean = np.ones((Pq, T), np.float32)
    stdv = np.ones((Pq, T), np.float32)
    start = np.zeros((Pq, T), np.float32)
    for ri, (m, s, st) in enumerate(rows_T):
        L = len(m)
        mean[ri, :L] = m
        stdv[ri, :L] = s
        start[ri, :L] = st
    return (mean, stdv, start), time.time() - t0


def main():
    import nanocall_tpu  # noqa: F401 (_tune_allocator side effect)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)

    def make_rows(P, T, frac=0.9):
        out = []
        for _ in range(P):
            L = int(T * frac)
            out.append((
                rng.random(L).astype(np.float32),
                rng.random(L).astype(np.float32),
                rng.random(L).astype(np.float32),
            ))
        return out

    rows_a = make_rows(256, 10240)
    rows_b = make_rows(512, 8192)

    # pure host: stack both, no device
    for name, rows, Pq, T in [("A", rows_a, 256, 10240),
                              ("B", rows_b, 512, 8192)]:
        _, dt = stack(rows, Pq, T)
        print(f"host-only stack {name} Pq={Pq} T={T}: {dt*1e3:.0f} ms",
              flush=True)

    # now interleave with async device transfers, as upload_now does
    (m, s, st), dt = stack(rows_a, 256, 10240)
    print(f"stack A again: {dt*1e3:.0f} ms", flush=True)
    t0 = time.time()
    dev_a = (jnp.asarray(m), jnp.asarray(s), jnp.asarray(st))
    print(f"dispatch A: {(time.time()-t0)*1e3:.0f} ms", flush=True)
    (m2, s2, st2), dt = stack(rows_b, 512, 8192)
    print(f"stack B while A transfers: {dt*1e3:.0f} ms", flush=True)
    t0 = time.time()
    dev_b = (jnp.asarray(m2), jnp.asarray(s2), jnp.asarray(st2))
    print(f"dispatch B: {(time.time()-t0)*1e3:.0f} ms", flush=True)
    t0 = time.time()
    for d in (*dev_a, *dev_b):
        np.asarray(d[:1, :1])
    print(f"sync all: {(time.time()-t0)*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()

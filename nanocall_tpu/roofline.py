"""Ops-per-event roofline model for the decode kernels + measured VPU peak.

Makes the utilization claims in PERFORMANCE.md reproducible from repo code:
`bench.py` multiplies these per-event op counts by the measured events/s and
divides by (a) a MEASURED same-shape elementwise FMA peak and (b) a
spec-sheet VPU peak, emitting both as MFU fields in its JSON detail.

Why a VPU (not MXU) roofline: the Viterbi recursion is max-plus — there is
no matmul to put on the MXU; every op is an elementwise add/compare/select
over (B, n) float32 lanes, which executes on the VPU.  The EM E-step's
sufficient statistics DO hit the MXU (one (G*S*T, n) x (n, k) contraction,
train.py), but decode throughput — the headline — is VPU-bound.

The op tallies below mirror ops/hmm.py line by line (each item names the
kernel expression it counts); tests/test_roofline.py pins them against the
kernel source so they cannot silently drift.  Counting convention: one ADD /
MUL / DIV / COMPARE / SELECT / bitwise op over one f32/i32 lane = 1 op
(selects and integer ops occupy the same VPU issue slots as float ops on
TPU); broadcasts/reshapes/copies = 0.
"""

from __future__ import annotations

import functools
import time


def log_emission_ops(n: int) -> int:
    """Per (batch row, event): ops/hmm.py log_emission over (n,) states.

    lnorm: a=(x-lm)/ls (2n), a*a (n), +LOG_2PI (n), *0.5 (n),
           -log_ls - (...) (2n)                                    -> 7n
    linv:  b=(y-sm)/sm (2n), b*b (n), *sd_lambda (n), /y (n),
           log_sd_lambda - LOG_2PI - 3*log_stdv - (...) (3n), *0.5 (n) -> 9n
    sum:   lnorm + linv                                            -> 1n
    """
    return 17 * n


def grouped_forward_ops_per_event(n: int) -> dict:
    """Per (batch row, event step): viterbi_forward_grouped's `step`.

    Returns an itemized dict; key "total" is the sum of the items.
    """
    items = {
        # colmax(alpha.reshape(B, 4, n/4)): 3 rounds x (compare + 2 selects)
        # over n/4 lanes
        "colmax4": 3 * 3 * (n // 4),
        # colmax(alpha.reshape(B, 16, n/16)): 15 rounds x 3 ops over n/16
        "colmax16": 15 * 3 * (n // 16),
        # v0/v1/v2 = table + candidate (3 adds over n)
        "candidate_adds": 3 * n,
        # best = max(max(v0, v1), v2)
        "best_max": 2 * n,
        # f1/f2 = (arg << c) | j_shr: 2 int ops each
        "from_state_int": 4 * n,
        # k0/k1/k2 = where(v == best, f, big): compare + select each
        "tie_candidates": 6 * n,
        # fmin = min(min(k0, k1), k2)
        "tie_min": 2 * n,
        # bp = where(k0==fmin, 0, where(k1==fmin, 64+arg4, 128+arg16)):
        # 2 compares + 2 selects + 2 adds
        "bp_select": 6 * n,
        # emissions fused into the step
        "emission": log_emission_ops(n),
        # new_alpha = best + em; where(active, new_alpha, alpha)
        "alpha_update": 2 * n,
    }
    items["total"] = sum(items.values())
    return items


def grouped_traceback_ops_per_event(n: int) -> dict:
    """Per (batch row, step): viterbi_traceback_grouped's `step` (the
    two-stage _lookup_bp dominates)."""
    split = 1 << ((n.bit_length() - 1 + 1) // 2)
    lo_n = n // split
    items = {
        # _lookup_bp stage 1: where(i1 == hi, rows, 0) + sum over split:
        # compare + select + add over all n lanes
        "lookup_stage1": 3 * n,
        # stage 2 over lo_n lanes
        "lookup_stage2": 3 * lo_n,
        # grouped_from_state: shifts/ors/compares/selects on (B,) scalars
        "from_state": 12,
        # masks, code packing on (B,) scalars
        "code_pack": 8,
    }
    items["total"] = sum(items.values())
    return items


def decode_ops_per_event(n: int) -> dict:
    """Full decode (forward + traceback) ops per (batch row, event)."""
    fwd = grouped_forward_ops_per_event(n)["total"]
    tb = grouped_traceback_ops_per_event(n)["total"]
    return {"forward": fwd, "traceback": tb, "total": fwd + tb}


# v5e TensorCore VPU spec peak: (8, 128) vector lanes x 4 independent ALUs
# x 2 ops/FMA x 1.67 GHz clock ~= 13.7e12 ops/s.  The lane/ALU geometry is
# public (jax-ml.github.io/scaling-book); the clock is the commonly cited
# v5e figure — treat this as indicative, the MEASURED same-shape FMA peak
# below is the primary denominator.
V5E_VPU_SPEC_OPS_PER_S = 8 * 128 * 4 * 2 * 1.67e9


def measure_fma_peak(B: int, n: int, T: int, k: int = 24, n_iter: int = 4):
    """Measured elementwise speed-of-light at the recursion's own shape: a
    lax.scan of T steps, each a chain of k dependent FMAs over a (B, n)
    float32 carry — the same program structure (sequential scan over T,
    (B, n) elementwise body) as the Viterbi forward, with zero algorithmic
    content.  Returns achieved ops/s (= B*n*2k*T / time); the decode MFU
    against THIS number answers "how close is the kernel to the fastest
    possible scan-shaped elementwise program on this chip".

    k should be chosen so the chain's per-step op count (2k per lane)
    matches the kernel's per-step work (grouped_forward_ops_per_event /
    n / 2 ~= 24 at K=6) — a smaller body makes the scan
    iteration-latency-bound and measures step overhead, not the VPU
    (k=8 at T=1024 measured 0.11 Tops/s vs 2+ Tops/s with matched work).

    XLA does not reassociate float FMA chains (not IEEE-safe), so the k
    multiply-adds cannot be algebraically collapsed.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    @functools.partial(jax.jit, static_argnames=("T", "k"))
    def chain(x, c, d, T: int, k: int):
        def step(x, _):
            for _ in range(k):
                x = x * c + d
            return x, None
        x, _ = jax.lax.scan(step, x, None, length=T)
        return x

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.9, 1.1, (B, n)).astype(np.float32))
    c = jnp.asarray(np.float32(0.9999))
    d = jnp.asarray(np.float32(1e-4))
    np.asarray(chain(x, c, d, T, k))  # compile + warm
    t0 = time.time()
    outs = [chain(x, c, d, T, k) for _ in range(n_iter)]
    # one fetch of the LAST output syncs the whole in-order stream
    # (block_until_ready does not synchronize on this backend, and a
    # per-iteration fetch would add a 2 MB relay round trip to every
    # sample — measured 1.6x swings in the 'peak' from fetch latency)
    np.asarray(outs[-1])
    dt = (time.time() - t0) / n_iter
    return B * n * 2 * k * T / dt, dt


def mfu_report(B: int, T: int, n: int, decode_s: float,
               fma_peak_ops_per_s: float | None = None) -> dict:
    """MFU numbers for a measured full-decode time over a (B, T) batch."""
    ops = decode_ops_per_event(n)
    achieved = B * T * ops["total"] / decode_s
    out = {
        "ops_per_event_per_row": ops,
        "achieved_vpu_ops_per_s": achieved,
        "mfu_vs_v5e_vpu_spec": achieved / V5E_VPU_SPEC_OPS_PER_S,
    }
    if fma_peak_ops_per_s:
        out["measured_fma_peak_ops_per_s"] = fma_peak_ops_per_s
        out["mfu_vs_measured_fma_peak"] = achieved / fma_peak_ops_per_s
    return out

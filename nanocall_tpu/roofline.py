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


# ---------------------------------------------------------------------------
# EM (training) roofline — the dominant e2e device stage
# ---------------------------------------------------------------------------


def fwbw_grouped_fwd_ops_per_event(n: int) -> dict:
    """Per (sequence row, event step): ops/hmm.py fwbw_grouped's fwd_step."""
    items = {
        # m = max(alpha, axis=-1)
        "max_alpha": n,
        # E = exp(alpha - m): sub + exp
        "exp_shift": 2 * n,
        # S4 = sum(E.reshape(B, 4, n/4), axis=1): 3 adds per n/4 lane
        "colsum4": 3 * (n // 4),
        # S16: 15 adds per n/16 lane
        "colsum16": 15 * (n // 16),
        # total = e_stay*E + e_step*(S4 - mH*E) + e_skip*(S16 - mP2*E
        #         - mS5*S4): 6 muls + 3 subs + 2 adds over n
        "total_mix": 11 * n,
        # emissions fused into the step
        "emission": log_emission_ops(n),
        # new_alpha = em + m + log(total): log + 2 adds
        "alpha_new": 3 * n,
        # where(active, new_alpha, alpha)
        "active_select": n,
    }
    items["total"] = sum(items.values())
    return items


def fwbw_grouped_bwd_ops_per_event(n: int) -> dict:
    """Per (sequence row, event step): fwbw_grouped's bwd_step (emissions
    reused from the forward pass, so no emission term)."""
    items = {
        "g_add": n,            # g = em_next + beta
        "max_g": n,
        "exp_shift": 2 * n,    # G = exp(g - m)
        "rowsum4": 3 * (n // 4),
        "rowsum16": 15 * (n // 16),
        "total_mix": 11 * n,   # same 3-term mix as forward
        "cand": 2 * n,         # m + log(total)
        "boundary_select": n,  # where(t >= len-1, 0, cand)
    }
    items["total"] = sum(items.values())
    return items


def em_scaling_mstep_ops_per_event(n: int) -> dict:
    """Per (sequence row, event): train.train_one_round's scaling M-step.

    The (B, n, 6) weight matrix W and the 3x3 solve are O(B*n) / O(G) —
    amortized over T they contribute <1 op/event and are omitted (noted
    here, not counted).  The stats einsum is MXU work and reported in a
    separate field (matmul MACs, not VPU lane ops).
    """
    items = {
        # post = exp(alpha + beta - lpd) * w: 2 adds + exp + mul
        "posterior": 4 * n,
        # acc(s0), acc(s0*x), ... ~20 muls/adds on (B, T) scalars
        "mstep_accumulations": 24,
    }
    items["total"] = sum(items.values())
    return items


def em_stats_einsum_macs_per_event(n: int) -> int:
    """MXU MACs per (sequence row, event): einsum('btn,bnk->btk', post, W)
    with k=6 sufficient statistics (train.py)."""
    return 6 * n


def em_st_mstep_ops_per_event(n: int) -> dict:
    """Per (sequence row, event): train._train_st_params (transition
    M-step), the second-heaviest EM term after the E-step."""
    items = {
        "lp_j1": 2 * n,          # a_i + b_i - lpd
        "g_add": n,              # em[1:] + beta[1:]
        "lp_stay": 4 * n,        # 3 adds + min clamp
        "max_g": n,
        "exp_shift": 2 * n,
        "blocksum4": 3 * (n // 4),
        "log_blocks": n // 4,    # log on the (B,Tm,n/4) sums, then tile
        "lsum4_add": n,          # + safe_m
        "lp_steps": 3 * n,       # a_i + log_p_step_4 + lsum4 - lpd
        "logaddexp": 5 * n,      # max + 2 exp + log + add
        "d01_clamp": n,          # min(.., lp_j1)
        "skip_mass": 4 * n,      # exp + exp + sub + max(0)
        "log_d2": n,
        # _masked_lse(lp_j1 / lp_stay / lp_d2) x 2 strands: each is
        # where-mask + max-reduce + (sub, exp, sum-reduce) = 5n
        "masked_lse_reductions": 2 * 3 * 5 * n,
    }
    items["total"] = sum(items.values())
    return items


def em_ops_per_event(n: int, train_scaling: bool = True,
                     train_transitions: bool = True) -> dict:
    """Total VPU lane-ops per (sequence row, event) for ONE EM round
    (train.train_one_round): grouped E-step + M-steps.  MXU MACs are
    returned separately ('mxu_macs') — they run on a different unit."""
    out = {
        "fwd": fwbw_grouped_fwd_ops_per_event(n)["total"],
        "bwd": fwbw_grouped_bwd_ops_per_event(n)["total"],
    }
    out["scaling_mstep"] = (
        em_scaling_mstep_ops_per_event(n)["total"] if train_scaling else 0
    )
    out["st_mstep"] = (
        em_st_mstep_ops_per_event(n)["total"] if train_transitions else 0
    )
    out["total"] = sum(out.values())
    out["mxu_macs"] = em_stats_einsum_macs_per_event(n) if train_scaling else 0
    return out


def em_hbm_bytes_per_event(n: int) -> dict:
    """Minimum HBM traffic per (sequence row, event) for one EM round.

    Unlike decode (1-byte backpointers), the EM round materializes three
    full float32 (B, T, n) tensors — alpha, beta, em — because the
    M-steps re-read them outside the scans.  Counted: the three scan
    writes, plus one streamed read of each by the consumers XLA cannot
    fuse into the producing scan (bwd reads em; posterior/stats read
    alpha+beta; st_mstep re-reads all three — assume perfect fusion
    WITHIN each consumer pass, so each tensor is re-read once per
    consumer pass that needs it).  This is a lower bound on traffic and
    hence an upper bound on the bytes-roofline throughput.
    """
    f = 4 * n
    items = {
        "alpha_write": f, "beta_write": f, "em_write": f,
        "em_read_bwd": f,
        "alpha_read_post": f, "beta_read_post": f,
        "alpha_read_st": f, "beta_read_st": f, "em_read_st": f,
    }
    items["total"] = sum(items.values())
    return items


def em_fused_bwd_ops_per_event(n: int) -> dict:
    """Per (sequence row, event): the FUSED reverse scan
    (train._fused_bwd_mstats bwd_step) — beta recursion + recomputed
    emission + posterior + both M-steps' statistics.  The transition
    M-step block runs in LOG space, term-for-term like the reference
    (Parameter_Trainer.hpp:456-517) — the cheaper probability-space
    factorization was falsified by the trained fuzz (byte-FASTA flip at
    seed 11/r73; PERFORMANCE.md round-5 dead-end entry)."""
    items = {
        "g_add": n,
        "max_g": n,
        "exp_shift": 2 * n,
        "rowsum4": 3 * (n // 4),
        "rowsum16": 15 * (n // 16),
        "total_mix": 11 * n,
        "cand": 2 * n,
        "boundary_select": n,
        # emission recomputed at t+1 (cheaper than reading a stored em)
        "emission": log_emission_ops(n),
        # exp_lp = exp(alpha + beta - lpd): 2 adds + exp
        "posterior": 3 * n,
        # scaling stats: post*w mul + six mul+sum reductions + scalars
        "scal_stats": 13 * n + 30,
        # st stats, log space: lp_j1 2n; lp_stay 4n; eg4 exp pass
        # 2n + 0.75n sum; lsum4 log(n/4) + add ~1.25n; lp_steps 3n;
        # logaddexp + min 5n; p_d2 (two exp, sub, max, log) 5n; three
        # step_lse (mask, max, sub, exp, sum) ~5n each = 15n
        "st_stats": 38 * n,
    }
    items["total"] = sum(items.values())
    return items


def em_fused_ops_per_event(n: int) -> dict:
    """Total VPU lane-ops per (sequence row, event) for one FUSED EM
    round (the production default path since round 5)."""
    out = {
        "fwd": fwbw_grouped_fwd_ops_per_event(n)["total"],
        "bwd_fused": em_fused_bwd_ops_per_event(n)["total"],
    }
    out["total"] = sum(out.values())
    out["mxu_macs"] = 0  # the batched mat-vec was replaced by VPU sums
    return out


def em_fused_hbm_bytes_per_event(n: int) -> dict:
    """HBM traffic per (sequence row, event) for one FUSED round: only
    the alphas are materialized (scan-natural layout, written by the
    forward scan, streamed by the reverse scan)."""
    f = 4 * n
    items = {"alpha_write": f, "alpha_read_bwd": f}
    items["total"] = sum(items.values())
    return items


# v5e HBM bandwidth spec: 819 GB/s (public v5e spec sheet)
V5E_HBM_BYTES_PER_S = 819e9


def em_mfu_report(events_per_round_s: float, n: int,
                  fma_peak_ops_per_s: float | None = None,
                  fused: bool = True) -> dict:
    """Roofline verdict for a measured EM rate (event-rounds/s through
    train_one_round): achieved VPU ops/s and HBM bytes/s vs their
    ceilings, and which one binds.  fused=True (the production default
    path) uses the streaming-round models; fused=False the legacy
    materialize-then-reduce models (still used by --trans runs)."""
    ops = em_fused_ops_per_event(n) if fused else em_ops_per_event(n)
    bts = (em_fused_hbm_bytes_per_event(n) if fused
           else em_hbm_bytes_per_event(n))
    achieved_ops = events_per_round_s * ops["total"]
    achieved_bytes = events_per_round_s * bts["total"]
    peak_ops = fma_peak_ops_per_s or V5E_VPU_SPEC_OPS_PER_S
    out = {
        "ops_per_event_round": ops,
        "hbm_bytes_per_event_round": bts["total"],
        "achieved_vpu_ops_per_s": achieved_ops,
        "achieved_hbm_bytes_per_s": achieved_bytes,
        "mfu_vs_fma_peak": achieved_ops / peak_ops,
        "hbm_utilization_vs_spec": achieved_bytes / V5E_HBM_BYTES_PER_S,
        # ceiling event-rate implied by each resource: the binding one is
        # the smaller
        "ceiling_events_per_s_compute": peak_ops / ops["total"],
        "ceiling_events_per_s_hbm": V5E_HBM_BYTES_PER_S / bts["total"],
    }
    out["binding_resource"] = (
        "hbm" if out["ceiling_events_per_s_hbm"]
        < out["ceiling_events_per_s_compute"] else "compute"
    )
    return out


# v5e TensorCore VPU spec peak: (8, 128) vector lanes x 4 independent ALUs
# x 2 ops/FMA x 1.67 GHz clock ~= 13.7e12 ops/s.  The lane/ALU geometry is
# public (jax-ml.github.io/scaling-book); the clock is the commonly cited
# v5e figure — treat this as indicative, the MEASURED same-shape FMA peak
# below is the primary denominator.
V5E_VPU_SPEC_OPS_PER_S = 8 * 128 * 4 * 2 * 1.67e9


def measure_fma_peak(B: int, n: int, T: int, k: int = 24, n_iter: int = 4,
                     reduce_out: bool = False):
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

    reduce_out=True returns jnp.sum(x) from the jitted chain (the sum
    depends on every element, so the chain cannot be elided) and fetches
    a scalar instead of the (B, n) carry — REQUIRED for short-T chains
    through the relay, where a multi-MB result fetch would swamp the
    compute being measured (a T=128 chain at (512, 4096) measured a
    nonsense 0.06 Tops/s through an 8 MB fetch).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    @functools.partial(jax.jit, static_argnames=("T", "k", "reduce_out"))
    def chain(x, c, d, T: int, k: int, reduce_out: bool):
        def step(x, _):
            for _ in range(k):
                x = x * c + d
            return x, None
        x, _ = jax.lax.scan(step, x, None, length=T)
        return jnp.sum(x) if reduce_out else x

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0.9, 1.1, (B, n)).astype(np.float32))
    c = jnp.asarray(np.float32(0.9999))
    d = jnp.asarray(np.float32(1e-4))
    np.asarray(chain(x, c, d, T, k, reduce_out))  # compile + warm
    t0 = time.time()
    outs = [chain(x, c, d, T, k, reduce_out) for _ in range(n_iter)]
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

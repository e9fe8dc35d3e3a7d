"""Fused Pallas TPU kernels for the grouped Viterbi recursion.

The XLA scan version (ops/hmm.viterbi_forward_grouped) round-trips alpha
through HBM each step and schedules each step as a fused-loop iteration.
These kernels instead:

  forward: grid over T/CH chunks of CH=8 events; alpha lives in a VMEM
    scratch across grid steps; event scalars stream in as (CH, B) blocks and
    backpointer rows stream out as (CH, B, n) blocks via the Pallas block
    pipeline (double-buffered automatically); emission + grouped 3-way max +
    tie-break + bp encode fuse into one VMEM pass per micro-step.

  traceback: grid over chunks reversed; the per-read state vector lives in
    a (B, 1) VMEM scratch; the bp row lookup is a one-hot masked reduction
    (no scalar gathers).

Semantics are identical to the XLA kernels (same grouped decomposition,
same reference tie-breaking; see transitions.grouped_condition_masks).
Block shapes obey the Mosaic constraint that the last two dims of every
block divide (8, 128) or equal the full array dims.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..pore_model import LOG_2PI
from .hmm import GroupedTrans, ModelArrays

CH = 8  # events per grid step (also the sublane-divisibility quantum)


def _emission(lm, ls, log_ls, sm, slam, log_slam, mean, stdv, log_stdv):
    a = (mean - lm) / ls
    lnorm = -log_ls - (LOG_2PI + a * a) * 0.5
    b = (stdv - sm) / sm
    linv = (log_slam - LOG_2PI - 3.0 * log_stdv - slam * b * b / stdv) * 0.5
    return lnorm + linv


def _fwd_kernel(
    mean_ref, stdv_ref, log_stdv_ref, len_ref,
    stay_ref, step_ref, skip_ref,
    lm_ref, ls_ref, logls_ref, sm_ref, slam_ref, logslam_ref,
    bp_ref, final_alpha_ref,
    alpha_ref,
    *, B, n, K, T,
):
    c = pl.program_id(0)
    n4, n16 = n // 4, n // 16
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
    big = jnp.int32(np.iinfo(np.int32).max)
    lengths = len_ref[:]  # (B, 1)

    for r in range(CH):
        t = c * CH + r
        mean = mean_ref[r, :][:, None]
        stdv = stdv_ref[r, :][:, None]
        log_stdv = log_stdv_ref[r, :][:, None]
        em = _emission(
            lm_ref[:], ls_ref[:], logls_ref[:], sm_ref[:], slam_ref[:],
            logslam_ref[:], mean, stdv, log_stdv,
        )

        @pl.when(t == 0)
        def _init():
            alpha_ref[:] = em - math.log(n)
            bp_ref[r] = jnp.zeros((B, n), jnp.uint8)

        @pl.when(t > 0)
        def _step():
            alpha = alpha_ref[:]

            def colmax(a_r):
                R = a_r.shape[1]
                m = a_r[:, 0]
                g = jnp.zeros_like(m, dtype=jnp.int32)
                for q in range(1, R):
                    take = a_r[:, q] > m
                    m = jnp.where(take, a_r[:, q], m)
                    g = jnp.where(take, q, g)
                return m, g

            m4, g4 = colmax(alpha.reshape(B, 4, n4))
            m16, g16 = colmax(alpha.reshape(B, 16, n16))

            def rep(x, rr):
                return jnp.broadcast_to(
                    x[:, :, None], (B, x.shape[1], rr)
                ).reshape(B, n)

            v0 = stay_ref[:] + alpha
            v1 = step_ref[:] + rep(m4, 4)
            v2 = skip_ref[:] + rep(m16, 16)
            best = jnp.maximum(jnp.maximum(v0, v1), v2)

            arg4 = rep(g4, 4)
            arg16 = rep(g16, 16)
            f1 = (arg4 << (2 * (K - 1))) | (iota_n >> 2)
            f2 = (arg16 << (2 * (K - 2))) | (iota_n >> 4)
            k0 = jnp.where(v0 == best, iota_n, big)
            k1 = jnp.where(v1 == best, f1, big)
            k2 = jnp.where(v2 == best, f2, big)
            fmin = jnp.minimum(jnp.minimum(k0, k1), k2)
            bp_ref[r] = jnp.where(
                k0 == fmin, 0, jnp.where(k1 == fmin, 64 + arg4, 128 + arg16)
            ).astype(jnp.uint8)

            new_alpha = best + em
            active = t < lengths
            alpha_ref[:] = jnp.where(active, new_alpha, alpha)

    @pl.when(c == pl.num_programs(0) - 1)
    def _finish():
        final_alpha_ref[:] = alpha_ref[:]


def _pad_T(ev: dict):
    """Pad event arrays along T to a multiple of CH."""
    B, T = ev["mean"].shape
    Tp = ((T + CH - 1) // CH) * CH
    if Tp == T:
        return ev, T
    pad = Tp - T

    def padded(x, val):
        return jnp.concatenate(
            [jnp.asarray(x), jnp.full((B, pad), val, jnp.asarray(x).dtype)], axis=1
        )

    out = {
        "mean": padded(ev["mean"], 1.0),
        "stdv": padded(ev["stdv"], 1.0),
        "log_stdv": padded(ev["log_stdv"], 0.0),
        "length": ev["length"],
    }
    return out, T


def viterbi_forward_pallas(gt: GroupedTrans, model: ModelArrays, ev: dict,
                           interpret: bool = False):
    """Pallas forward pass.  Returns (bp (Tp, B, n) uint8, final_alpha
    (B, n)); Tp is T rounded up to a multiple of CH."""
    ev, T_orig = _pad_T(ev)
    B, T = ev["mean"].shape
    n = model.level_mean.shape[-1]
    K = gt.K

    def bcast(x):
        x = jnp.asarray(x)
        return jnp.broadcast_to(x, (B, n)) if x.ndim == 1 else x

    tables = [bcast(gt.stay_lp), bcast(gt.step_lp), bcast(gt.skip_lp)]
    marrays = [
        bcast(model.level_mean), bcast(model.level_stdv),
        bcast(model.log_level_stdv), bcast(model.sd_mean),
        bcast(model.sd_lambda), bcast(model.log_sd_lambda),
    ]
    lengths = jnp.asarray(ev["length"], jnp.int32)[:, None]

    ev_spec = pl.BlockSpec((CH, B), lambda c: (c, 0), memory_space=pltpu.VMEM)
    fixed_spec = pl.BlockSpec((B, n), lambda c: (0, 0), memory_space=pltpu.VMEM)
    len_spec = pl.BlockSpec((B, 1), lambda c: (0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(_fwd_kernel, B=B, n=n, K=K, T=T)
    bp, final_alpha = pl.pallas_call(
        kernel,
        grid=(T // CH,),
        in_specs=[ev_spec, ev_spec, ev_spec, len_spec] + [fixed_spec] * 9,
        out_specs=[
            pl.BlockSpec((CH, B, n), lambda c: (c, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, n), lambda c: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((T, B, n), jnp.uint8),
            jax.ShapeDtypeStruct((B, n), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((B, n), jnp.float32)],
        interpret=interpret,
    )(
        jnp.asarray(ev["mean"]).T, jnp.asarray(ev["stdv"]).T,
        jnp.asarray(ev["log_stdv"]).T, lengths, *tables, *marrays,
    )
    return bp, final_alpha


def _tb_kernel(len_ref, end_ref, bp_ref, path_ref, s_ref, *, B, n, K, T):
    ci = pl.program_id(0)  # reversed chunk counter
    n_chunks = pl.num_programs(0)
    c = n_chunks - 1 - ci
    iota_n = jax.lax.broadcasted_iota(jnp.int32, (B, n), 1)
    lengths = len_ref[:]  # (B, 1)

    @pl.when(ci == 0)
    def _init():
        s_ref[:] = end_ref[:]

    for r in range(CH - 1, -1, -1):
        t = c * CH + r
        s = jnp.where(t == lengths - 1, end_ref[:], s_ref[:])
        path_ref[r] = s
        bp_t = bp_ref[r]
        onehot = iota_n == s
        k = jnp.sum(
            jnp.where(onehot, bp_t.astype(jnp.int32), 0), axis=1, keepdims=True
        )
        f_step = ((k - 64) << (2 * (K - 1))) | (s >> 2)
        f_skip = ((k - 128) << (2 * (K - 2))) | (s >> 4)
        s_prev = jnp.where(k < 64, s, jnp.where(k < 128, f_step, f_skip))
        s_ref[:] = jnp.where((t <= lengths - 1) & (t > 0), s_prev, s)


def viterbi_traceback_pallas(gt: GroupedTrans, final_alpha, bp, lengths,
                             interpret: bool = False):
    """Pallas traceback over the grouped bp tensor (Tp multiple of CH).
    Returns (path (B, Tp) int32, logp (B,))."""
    T, B, n = bp.shape
    K = gt.K
    end_state = jnp.argmax(final_alpha, axis=-1).astype(jnp.int32)[:, None]
    path_logp = jnp.max(final_alpha, axis=-1)
    lengths = jnp.asarray(lengths, jnp.int32)[:, None]
    n_chunks = T // CH

    path_t = pl.pallas_call(
        functools.partial(_tb_kernel, B=B, n=n, K=K, T=T),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda ci: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda ci: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (CH, B, n),
                lambda ci, n_chunks=n_chunks: (n_chunks - 1 - ci, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        # (T, B, 1) layout: the (B, 1) trailing block dims equal the array
        # dims, avoiding in-kernel shape casts (unsupported by Mosaic here)
        out_specs=pl.BlockSpec(
            (CH, B, 1),
            lambda ci, n_chunks=n_chunks: (n_chunks - 1 - ci, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((T, B, 1), jnp.int32),
        scratch_shapes=[pltpu.VMEM((B, 1), jnp.int32)],
        interpret=interpret,
    )(lengths, end_state, bp)
    return path_t[:, :, 0].T, path_logp


@functools.partial(jax.jit, static_argnames=("interpret",))
def viterbi_decode_pallas(gt: GroupedTrans, model: ModelArrays, ev: dict,
                          interpret: bool = False):
    """Fused Pallas decode: returns {path (B, T) int32, logp (B,)}."""
    T = ev["mean"].shape[1]
    bp, final_alpha = viterbi_forward_pallas(gt, model, ev, interpret=interpret)
    path, logp = viterbi_traceback_pallas(
        gt, final_alpha, bp, ev["length"], interpret=interpret
    )
    return {"path": path[:, :T], "logp": logp}


@functools.partial(jax.jit, static_argnames=("interpret",))
def viterbi_decode_hybrid(gt: GroupedTrans, model: ModelArrays, ev: dict,
                          interpret: bool = False):
    """XLA grouped forward + Pallas traceback.

    The forward scan is already near VPU-bound under XLA, but the XLA
    traceback is latency-bound (tiny sequential steps); the Pallas
    traceback streams bp chunks through VMEM with the state vector
    resident.  (The fully-fused Pallas forward is blocked on Mosaic's
    'unsupported shape cast' for in-kernel reshapes in this toolchain.)
    """
    from . import hmm as hmm_mod

    T = ev["mean"].shape[1]
    ev_p, _ = _pad_T(ev)
    final_alpha, bps = hmm_mod.viterbi_forward_grouped(gt, model, ev_p)
    # the XLA forward emits T-1 bp rows (event 0 has no predecessor); the
    # Pallas traceback wants a full (Tp, B, n) tensor with a sentinel row 0
    B, n = final_alpha.shape
    bp = jnp.concatenate(
        [jnp.zeros((1, B, n), jnp.uint8), bps], axis=0
    )
    path, logp = viterbi_traceback_pallas(
        gt, final_alpha, bp, ev["length"], interpret=interpret
    )
    return {"path": path[:, :T], "logp": logp}

"""Scalar/numpy oracle implementations of the HMM dynamic programs.

These mirror the reference C++ loops literally (Viterbi.hpp:44-150,
Forward_Backward.hpp:46-135, Parameter_Trainer.hpp:230-532) in float64
numpy, operating on a dense (n, n) transition log-prob matrix.  They exist
purely as golden references for the JAX kernels; they are deliberately
slow and simple.
"""

from __future__ import annotations

import numpy as np

from nanocall_tpu import kmer, transitions
from nanocall_tpu.pore_model import LOG_2PI

NEG_INF = -np.inf


def dense_logp(st, K: int) -> np.ndarray:
    """(n, n) dense log-prob matrix M[i, j] = log p(i -> j), -inf outside
    the table's support."""
    n = kmer.n_states(K)
    M = np.full((n, n), NEG_INF, dtype=np.float64)
    if isinstance(st, transitions.StructuredTransitions):
        for i, j, lp in transitions.structured_to_pairs(st):
            M[i, j] = lp
    else:
        deg = st.to_logp.shape[0]
        for k in range(deg):
            for i in range(n):
                if np.isfinite(st.to_logp[k, i]):
                    M[i, int(st.to_idx[k, i])] = st.to_logp[k, i]
    return M


def emissions(pm_arrays, ev, drift: float = 0.0) -> np.ndarray:
    """(T, n) float64 log emission table for one event sequence.

    pm_arrays: (level_mean, level_stdv, sd_mean, sd_lambda) numpy arrays.
    """
    lm, ls, sm, slam = (np.asarray(a, dtype=np.float64) for a in pm_arrays)
    x = ev.corrected_mean(drift).astype(np.float64)[:, None]
    y = ev.stdv.astype(np.float64)[:, None]
    log_y = np.log(ev.stdv.astype(np.float64))[:, None]
    a = (x - lm[None, :]) / ls[None, :]
    lnorm = -np.log(ls)[None, :] - (LOG_2PI + a * a) / 2.0
    b = (y - sm[None, :]) / sm[None, :]
    linv = (np.log(slam)[None, :] - LOG_2PI - 3.0 * log_y - slam[None, :] * b * b / y) / 2.0
    return lnorm + linv


def viterbi(M: np.ndarray, em: np.ndarray):
    """Dense Viterbi with the reference's tie-breaking (first/lowest
    from-state wins, Viterbi.hpp:79-89).

    Returns (path (T,) int64, path_logp float).
    """
    T, n = em.shape
    alpha = em[0] - np.log(n)
    bps = np.zeros((T, n), dtype=np.int64)
    for t in range(1, T):
        scores = alpha[:, None] + M  # (from, to)
        best = scores.max(axis=0)
        bps[t] = scores.argmax(axis=0)  # first occurrence = lowest from index
        alpha = best + em[t]
    end = int(alpha.argmax())
    logp = float(alpha.max())
    path = np.zeros(T, dtype=np.int64)
    path[T - 1] = end
    for t in range(T - 1, 0, -1):
        path[t - 1] = bps[t, path[t]]
    return path, logp


def fwbw(M: np.ndarray, em: np.ndarray):
    """Dense log-space forward-backward.  Returns (alpha (T,n), beta (T,n),
    log_pr_data)."""
    T, n = em.shape
    alpha = np.zeros((T, n))
    beta = np.zeros((T, n))
    alpha[0] = em[0] - np.log(n)
    for t in range(1, T):
        # logsumexp over from states
        scores = alpha[t - 1][:, None] + M
        alpha[t] = em[t] + _lse0(scores)
    beta[T - 1] = 0.0
    for t in range(T - 2, -1, -1):
        scores = M + (em[t + 1] + beta[t + 1])[None, :]
        beta[t] = _lse1(scores)
    log_pr_data = _lse(alpha[T - 1])
    return alpha, beta, log_pr_data


def _lse(x):
    m = np.max(x)
    if not np.isfinite(m):
        return m
    return m + np.log(np.sum(np.exp(x - m)))


def _lse0(x):
    m = np.max(x, axis=0)
    safe = np.where(np.isfinite(m), m, 0.0)
    out = safe + np.log(np.sum(np.exp(x - safe[None, :]), axis=0))
    return np.where(np.isfinite(m), out, m)


def _lse1(x):
    return _lse0(x.T)


def fwbw_custom(M: np.ndarray, em: np.ndarray):
    """Normalized-variant oracle (Forward_Backward_Custom.hpp:46-142).
    Returns (alpha, beta, gamma) each (T, n)."""
    T, n = em.shape
    alpha = np.zeros((T, n))
    beta = np.zeros((T, n))
    gamma = np.zeros((T, n))
    alpha[0] = -np.log(n)
    b = em[0] + alpha[0]
    beta[0] = b - _lse(b)
    for t in range(1, T):
        scores = beta[t - 1][:, None] + M
        alpha[t] = _lse0(scores)
        b = em[t] + alpha[t]
        beta[t] = b - _lse(b)
    gamma[T - 1] = beta[T - 1]
    for t in range(T - 2, -1, -1):
        scores = M + (gamma[t + 1] - alpha[t + 1])[None, :]
        gamma[t] = beta[t] + _lse1(scores)
    return alpha, beta, gamma


def brute_force_structured(p_stay: float, p_skip: float, K: int) -> np.ndarray:
    """Dense log-prob matrix built the reference way
    (compute_transitions_fast, State_Transitions.hpp:181-220): for each i,
    the to-set {i} u nl1 u nl2, each entry log(get_trans_prob(i, j))."""
    n = kmer.n_states(K)
    p_step = 1.0 - p_stay - p_skip
    p_skip_1 = p_skip / (p_skip + 1.0)
    M = np.full((n, n), NEG_INF, dtype=np.float64)
    nl1 = kmer.neighbour_list(K, 1)
    nl2 = kmer.neighbour_list(K, 2)
    for i in range(n):
        to_set = {i} | set(nl1[i].tolist()) | set(nl2[i].tolist())
        for j in to_set:
            p = transitions.trans_prob(i, j, p_stay, p_step, p_skip_1, K)
            M[i, j] = np.log(np.float32(p))
    return M

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


# ---------------------------------------------------------------------------
# EM M-step oracles (Parameter_Trainer.hpp:230-532)
# ---------------------------------------------------------------------------


def train_pm_params(seqs, models_unscaled, fwbw_results, train_drift: bool):
    """Scalar transcription of train_pm_params (hpp:230-427).

    seqs: list of (EventSequence, strand); models_unscaled: dict strand ->
    (lm, ls, sm, slam) arrays; fwbw_results: list of (alpha, beta, lpd)
    matching seqs.  Returns (params (6,) [scale, shift, drift, var,
    scale_sd, var_sd], done).
    """
    A = np.zeros((3, 3))
    B = np.zeros(3)
    D = 0.0
    V_numer = V_denom = U_pos = 0.0
    total_n_events = 0
    for (ev, st), (alpha, beta, lpd) in zip(seqs, fwbw_results):
        lm, ls, sm, slam = (np.asarray(a, np.float64) for a in models_unscaled[st])
        T = len(ev)
        total_n_events += T
        post = np.exp(alpha + beta - lpd)
        for i in range(T):
            x_i = float(ev.mean[i])
            y_i = float(ev.stdv[i])
            t_i = float(ev.start[i])
            p = post[i]
            s0 = np.sum(p / (ls * ls))
            s1 = np.sum(p * lm / (ls * ls))
            s2 = np.sum(p * lm * lm / (ls * ls))
            l0 = np.sum(p * slam)
            l1 = np.sum(p * slam / sm)
            l2 = np.sum(p * slam / (sm * sm))
            A[0][0] += s0
            A[0][1] += s1
            A[1][1] += s2
            B[0] += s0 * x_i
            B[1] += s1 * x_i
            if train_drift:
                A[0][2] += s0 * t_i
                A[1][2] += s1 * t_i
                A[2][2] += s0 * t_i * t_i
                B[2] += s0 * x_i * t_i
            D += s0 * x_i * x_i
            V_numer += l2 * y_i
            V_denom += l1
            U_pos += l0 / y_i
    A[1][0] = A[0][1]
    A[2][0] = A[0][2]
    A[2][1] = A[1][2]
    if not train_drift:
        A[2][2] = 1.0
    A_copy = A.copy()
    B_copy = B.copy()
    C = A.max(axis=1)
    # gaussian elimination with scaled partial pivoting (hpp:339-386)
    for i in range(3):
        p = i
        p_val = abs(A[i][i]) / C[p]
        for i2 in range(i + 1, 3):
            v = abs(A[i2][i]) / C[i2]
            if v > p_val:
                p, p_val = i2, v
        if p_val < 1e-7:
            return None, True
        if p > i:
            A[[i, p]] = A[[p, i]]
            B[[i, p]] = B[[p, i]]
            C[[i, p]] = C[[p, i]]
        for r in range(i + 1, 3):
            m = A[r][i] / A[i][i]
            A[r][i] = 0.0
            for j in range(i + 1, 3):
                A[r][j] -= m * A[i][j]
            B[r] -= m * B[i]
    c_hat = B[2] / A[2][2]
    b_hat = (B[1] - A[1][2] * c_hat) / A[1][1]
    a_hat = (B[0] - A[0][1] * b_hat - A[0][2] * c_hat) / A[0][0]
    d_numer = (
        D
        + a_hat**2 * A_copy[0][0]
        + b_hat**2 * A_copy[1][1]
        + c_hat**2 * A_copy[2][2]
        + 2 * a_hat * b_hat * A_copy[0][1]
        + 2 * a_hat * c_hat * A_copy[0][2]
        + 2 * b_hat * c_hat * A_copy[1][2]
        - 2 * (a_hat * B_copy[0] + b_hat * B_copy[1] + c_hat * B_copy[2])
    )
    d_hat = np.sqrt(d_numer / total_n_events)
    v_hat = V_numer / V_denom
    u_hat = total_n_events / (U_pos - V_denom / v_hat)
    if not train_drift:
        c_hat = 0.0
    return np.array([b_hat, a_hat, c_hat, d_hat, v_hat, u_hat]), False


def train_st_params(
    seqs, scaled_models, fwbw_results, emissions_list, st_params_cur, K: int
):
    """Scalar transcription of train_st_params (hpp:434-532).

    st_params_cur: dict strand -> (p_stay, p_skip).
    Returns dict strand -> (p_stay, p_skip) for strands with sequences.
    """
    from nanocall_tpu.train import st_train_kmers

    sk = st_train_kmers(K)
    nl1 = kmer.neighbour_list(K, 1)
    out = {}
    for st in (0, 1):
        if not any(s == st for _, s in seqs):
            continue
        log_p_stay = np.log(st_params_cur[st][0])
        log_p_step_4 = np.log(1.0 - st_params_cur[st][0] - st_params_cur[st][1]) - np.log(4.0)
        num_stay, num_skip, denom = [], [], []
        for (ev, s), (alpha, beta, lpd), em in zip(seqs, fwbw_results, emissions_list):
            if s != st:
                continue
            T = len(ev)
            for i in range(T - 1):
                for j1 in sk:
                    lp_j1 = alpha[i, j1] + beta[i, j1] - lpd
                    denom.append(lp_j1)
                    lp_stay = min(
                        alpha[i, j1] + log_p_stay + em[i + 1, j1] + beta[i + 1, j1] - lpd,
                        lp_j1,
                    )
                    num_stay.append(lp_stay)
                    terms = [lp_stay]
                    for j2 in nl1[j1]:
                        terms.append(
                            alpha[i, j1]
                            + log_p_step_4
                            + em[i + 1, j2]
                            + beta[i + 1, j2]
                            - lpd
                        )
                    lp_d01 = min(_lse(np.array(terms)), lp_j1)
                    p_d2 = max(np.exp(lp_j1) - np.exp(lp_d01), 0.0)
                    num_skip.append(np.log(p_d2) if p_d2 > 0 else NEG_INF)
        p_stay_new = np.exp(_lse(np.array(num_stay)) - _lse(np.array(denom)))
        p_skip_new = np.exp(_lse(np.array(num_skip)) - _lse(np.array(denom)))
        p_stay_new = min(max(p_stay_new, 0.05), 0.4)
        p_skip_new = min(max(p_skip_new, 0.05), 0.4)
        out[st] = (p_stay_new, p_skip_new)
    return out

"""Transition-table construction vs brute-force reference semantics."""

import numpy as np
import pytest

import oracle
from nanocall_tpu import kmer, transitions


@pytest.mark.parametrize("K", [3, 4])
@pytest.mark.parametrize("p_stay,p_skip", [(0.1, 0.3), (0.09, 0.28), (0.2, 0.15)])
def test_structured_matches_brute_force(K, p_stay, p_skip):
    st = transitions.build_structured(transitions.TransitionParams(p_stay, p_skip), K)
    M_brute = oracle.brute_force_structured(p_stay, p_skip, K)
    M_struct = oracle.dense_logp(st, K)
    assert np.allclose(M_struct, M_brute, atol=1e-6, equal_nan=True)
    # from-table and to-table must describe the same matrix
    n = kmer.n_states(K)
    from_idx = transitions.slot_from_state(K)
    M_from = np.full((n, n), -np.inf)
    for k in range(transitions.N_SLOTS):
        for j in range(n):
            if np.isfinite(st.from_logp[k, j]):
                M_from[from_idx[k, j], j] = st.from_logp[k, j]
    assert np.allclose(M_from, M_brute, atol=1e-6, equal_nan=True)


@pytest.mark.parametrize("K", [3, 4])
def test_row_mass_below_one(K):
    """Each row's kept probability mass must be < 1 (the tail is the dropped
    background mass, State_Transitions.hpp:93)."""
    st = transitions.build_structured(K=K)
    M = oracle.dense_logp(st, K)
    row_mass = np.exp(M).sum(axis=1)
    assert (row_mass < 1.0).all()
    assert (row_mass > 0.9).all()  # structure captures almost all mass


def test_dedup_slots():
    """Homopolymer state 0 reaches itself via stay, step and skip roles: only
    one slot may carry the (0 -> 0) probability."""
    K = 4
    st = transitions.build_structured(K=K)
    from_idx = transitions.slot_from_state(K)
    j = 0
    slots_to_zero = [
        k
        for k in range(transitions.N_SLOTS)
        if from_idx[k, j] == 0 and np.isfinite(st.from_logp[k, j])
    ]
    assert len(slots_to_zero) == 1


@pytest.mark.parametrize("K", [3])
def test_dense_computation_matches(K):
    """compute_transitions (O(N^2) + cutoff) agrees with get_trans_prob."""
    p_stay, p_skip = 0.1, 0.3
    sp = transitions.compute_transitions_dense(p_skip, p_stay, 1e-3, K)
    p_step = 1.0 - p_stay - p_skip
    p_skip_1 = p_skip / (p_skip + 1.0)
    n = kmer.n_states(K)
    states = np.arange(n)
    P = transitions.trans_prob(
        states[:, None], states[None, :], p_stay, p_step, p_skip_1, K
    )
    M = oracle.dense_logp(sp, K)
    kept = np.isfinite(M)
    assert (P[kept] > 1e-3).all()
    assert (P[~kept] <= 1e-3).all()
    assert np.allclose(M[kept], np.log(P[kept].astype(np.float32)), atol=1e-6)


def test_tsv_roundtrip(tmp_path):
    K = 3
    st = transitions.build_structured(K=K)
    path = tmp_path / "trans.tsv"
    transitions.save_tsv(st, path)
    loaded = transitions.load_tsv(path, K)
    M1 = oracle.dense_logp(st, K)
    M2 = oracle.dense_logp(loaded, K)
    assert np.allclose(M1, M2, atol=1e-5, equal_nan=True)


def test_batched_tables_match_single():
    K = 4
    params = np.array([[0.1, 0.3], [0.15, 0.2]], dtype=np.float64)
    fb, tb = transitions.build_structured_batch(params, K)
    for b in range(2):
        st = transitions.build_structured(
            transitions.TransitionParams(params[b, 0], params[b, 1]), K
        )
        assert np.allclose(fb[b], st.from_logp, atol=1e-6, equal_nan=True)
        assert np.allclose(tb[b], st.to_logp, atol=1e-6, equal_nan=True)

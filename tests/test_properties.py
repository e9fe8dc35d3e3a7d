"""Property-based tests (hypothesis) over the algebraic core."""

import numpy as np
from hypothesis import given, settings, strategies as st

import oracle
from nanocall_tpu import kmer, transitions

Ks = st.integers(min_value=3, max_value=6)


@settings(max_examples=50, deadline=None)
@given(K=Ks, data=st.data())
def test_min_skip_string_semantics(K, data):
    n = kmer.n_states(K)
    k1 = data.draw(st.integers(0, n - 1))
    k2 = data.draw(st.integers(0, n - 1))
    d = int(kmer.min_skip(k1, k2, K))
    s1, s2 = kmer.int_to_kmer(k1, K), kmer.int_to_kmer(k2, K)
    if d == 0:
        assert k1 == k2
    elif d < K:
        assert s1[d:] == s2[: K - d]
        for dd in range(1, d):
            assert s1[dd:] != s2[: K - dd]
    else:
        for dd in range(1, K):
            assert s1[dd:] != s2[: K - dd]


@settings(max_examples=20, deadline=None)
@given(
    K=st.integers(3, 4),
    p_stay=st.floats(0.05, 0.4),
    p_skip=st.floats(0.05, 0.4),
)
def test_transition_rows_are_subprobabilities(K, p_stay, p_skip):
    stp = transitions.TransitionParams(p_stay, p_skip)
    tbl = transitions.build_structured(stp, K)
    M = oracle.dense_logp(tbl, K)
    mass = np.exp(M).sum(axis=1)
    assert (mass < 1.0 + 1e-6).all()
    assert (mass > 0.5).all()


@settings(max_examples=20, deadline=None)
@given(
    K=st.integers(3, 4),
    p_stay=st.floats(0.05, 0.4),
    p_skip=st.floats(0.05, 0.4),
)
def test_grouped_tables_match_slot_tables(K, p_stay, p_skip):
    """The grouped generic lp equals every non-duplicate slot entry, for
    arbitrary parameters (the decomposition's structural claim)."""
    tbl = transitions.build_structured(
        transitions.TransitionParams(p_stay, p_skip), K
    )
    stay, step, skip = transitions.grouped_tables(p_stay, p_skip, K)
    fl = tbl.from_logp
    assert np.allclose(fl[0], stay, atol=1e-5)
    masks = transitions.grouped_correction_masks(K)
    s5 = masks["S5"] > 0
    for k in range(1, 5):
        fin = np.isfinite(fl[k])
        assert np.allclose(fl[k][fin], step[fin], atol=1e-5)
    for k in range(5, 21):
        fin = np.isfinite(fl[k]) & ~s5
        assert np.allclose(fl[k][fin], skip[fin], atol=1e-5)


@settings(max_examples=10, deadline=None)
@given(seed=st.integers(0, 2**31 - 1), K=st.integers(3, 4))
def test_base_seq_roundtrip(seed, K):
    """Base sequence assembled from a valid move path must contain each
    state's k-mer at the right offset."""
    rng = np.random.default_rng(seed)
    n = kmer.n_states(K)
    T = 30
    # build a VALID path: each next state is reachable with the stated move
    states = [int(rng.integers(n))]
    moves = [0]
    for _ in range(T - 1):
        d = int(rng.integers(0, K + 1))
        s_prev = states[-1]
        if d == 0:
            states.append(s_prev)
        else:
            nxt = (kmer.suffix(s_prev, K - d, K) << (2 * d)) | int(
                rng.integers(1 << (2 * d))
            )
            d = int(kmer.min_skip(s_prev, nxt, K))  # actual minimal move
            states.append(int(nxt))
        moves.append(int(kmer.min_skip(states[-2], states[-1], K)))
    seq = kmer.moves_to_base_seq(np.array(states), np.array(moves), K)
    pos = 0
    for i, (s, m) in enumerate(zip(states, moves)):
        pos += m if i else 0
        assert seq[pos : pos + K] == kmer.int_to_kmer(s, K)
    assert len(seq) == K + sum(moves[1:])

"""Unit tests for k-mer algebra (vs brute-force string implementations)."""

import numpy as np
import pytest

from nanocall_tpu import kmer


@pytest.mark.parametrize("K", [3, 4, 6])
def test_codec_roundtrip(K):
    for i in range(0, kmer.n_states(K), 7):
        s = kmer.int_to_kmer(i, K)
        assert len(s) == K
        assert kmer.kmer_to_int(s) == i
    strs = kmer.all_kmer_strings(K)
    assert len(strs) == kmer.n_states(K)
    assert strs[0] == "A" * K
    assert strs[-1] == "T" * K
    assert [kmer.kmer_to_int(s) for s in strs[:20]] == list(range(20))


@pytest.mark.parametrize("K", [3, 4, 6])
def test_min_skip_brute(K):
    rng = np.random.default_rng(0)
    for _ in range(200):
        k1 = int(rng.integers(kmer.n_states(K)))
        k2 = int(rng.integers(kmer.n_states(K)))
        s1, s2 = kmer.int_to_kmer(k1, K), kmer.int_to_kmer(k2, K)
        # brute force: smallest d with s1[d:] == s2[:K-d]
        expected = K
        if k1 == k2:
            expected = 0
        else:
            for d in range(1, K):
                if s1[d:] == s2[: K - d]:
                    expected = d
                    break
        assert kmer.min_skip(k1, k2, K) == expected


@pytest.mark.parametrize("K", [4, 6])
def test_max_self_overlap(K):
    mso = kmer.max_self_overlap(K)
    # homopolymer AAAA..: suffix(K-1) == prefix(K-1)
    assert mso[0] == K - 1
    # brute force a sample
    for i in range(0, kmer.n_states(K), 13):
        s = kmer.int_to_kmer(i, K)
        expected = 0
        for k in range(K - 1, 0, -1):
            if s[K - k :] == s[:k]:
                expected = k
                break
        assert mso[i] == expected


@pytest.mark.parametrize("K", [3, 6])
def test_neighbour_list(K):
    nl1 = kmer.neighbour_list(K, 1)
    nl2 = kmer.neighbour_list(K, 2)
    for i in range(0, kmer.n_states(K), 11):
        s = kmer.int_to_kmer(i, K)
        exp1 = [kmer.kmer_to_int(s[1:] + b) for b in "ACGT"]
        assert nl1[i].tolist() == exp1
        exp2 = []
        for j1 in exp1:
            s1 = kmer.int_to_kmer(j1, K)
            exp2 += [kmer.kmer_to_int(s1[1:] + b) for b in "ACGT"]
        assert nl2[i].tolist() == exp2


def test_moves_to_base_seq():
    K = 4
    # path: ACGT -> CGTA (move 1) -> CGTA (move 0) -> TAAC (move 2)
    states = [kmer.kmer_to_int(s, ) if False else kmer.kmer_to_int(s) for s in ["ACGT", "CGTA", "CGTA", "TAAC"]]
    moves = kmer.min_skip(np.array(states[:-1]), np.array(states[1:]), K)
    moves = np.concatenate([[0], moves])
    assert moves.tolist() == [0, 1, 0, 2]
    seq = kmer.moves_to_base_seq(np.array(states), moves, K)
    assert seq == "ACGTAAC"


def test_moves_to_base_seq_big_move():
    K = 3
    # no overlap: move == K appends the whole kmer
    states = [kmer.kmer_to_int("ACG"), kmer.kmer_to_int("TTT")]
    moves = [0, 3]
    seq = kmer.moves_to_base_seq(np.array(states), np.array(moves), K)
    assert seq == "ACGTTT"


def test_moves_to_base_seq_empty_path():
    """An eventless strand decodes to an empty path; the numpy fallback must
    return "" like the native path, not crash (basecall sets path=zeros(0)
    for zero-length decode tasks)."""
    assert kmer.moves_to_base_seq(np.zeros(0, np.int64), np.zeros(0, np.int64), 6) == ""

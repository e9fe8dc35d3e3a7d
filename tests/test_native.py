"""Native C++ runtime vs numpy fallback equivalence."""

import numpy as np
import pytest

from nanocall_tpu import kmer, native, read_pipeline


requires_native = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@requires_native
def test_abasic_level_matches():
    rng = np.random.default_rng(0)
    means = rng.uniform(40, 110, 5000)
    for tp, off in [(1.0, 5.0), (1.0, 0.0), (2.5, 1.0)]:
        a = native.abasic_level(means, tp, off)
        b = read_pipeline.detect_abasic_level(means, tp, off)
        assert a == pytest.approx(b)


@requires_native
def test_islands_match():
    rng = np.random.default_rng(1)
    means = rng.uniform(40, 90, 3000)
    # plant islands
    means[100:110] = 120.0
    means[500:504] = 120.0  # too short (<5)
    means[2000:2030] = 120.0
    a = native.find_islands_5(means, 100.0)
    b = read_pipeline.find_islands_5_consec(means, 100.0)
    assert a == b
    assert (100, 110) in a and (2000, 2030) in a
    assert not any(s == 500 for s, _ in a)


@requires_native
def test_filter_matches():
    rng = np.random.default_rng(2)
    mean = rng.uniform(40, 120, 1000)
    stdv = rng.uniform(0, 6, 1000)
    a = native.filter_events(mean, stdv, 100.0)
    b = (mean < 100.0) & (stdv <= 4.0)
    assert np.array_equal(a, b)


@requires_native
def test_moves_and_base_seq_match():
    rng = np.random.default_rng(3)
    for K in (3, 6):
        path = rng.integers(kmer.n_states(K), size=200).astype(np.int32)
        moves_n, seq_n = native.moves_and_base_seq(path, K)
        moves_p = np.zeros(len(path), np.int32)
        moves_p[1:] = kmer.min_skip(path[:-1], path[1:], K)
        seq_p = kmer.moves_to_base_seq(path, moves_p, K)
        assert np.array_equal(moves_n, moves_p)
        assert seq_n == seq_p


@requires_native
def test_mean_stdv_f32_matches_bitexact():
    """The numpy cumsum fallback must reproduce the C++ f32 sequential
    accumulation BIT-exactly: initial scale/shift (and therefore the
    untrained FASTA byte-equality vs the reference binary) derive from
    these moments, so a last-ulp divergence between the two paths would
    make golden results depend on whether the .so built."""
    rng = np.random.default_rng(7)
    for n in (1, 9, 100, 5000, 99_999):
        vals = rng.uniform(40, 110, n)
        assert native.mean_stdv_f32(vals) == native._mean_stdv_f32_numpy(vals)
    assert native.mean_stdv_f32(np.zeros(0)) == (0.0, 0.0)


@requires_native
def test_mean_stdv_f32_matches_scalar_loop():
    """The numpy fallback's cumsum relies on numpy doing a STRICT
    sequential pass in f32 (pairwise reduction would round differently);
    prove it against a literal scalar accumulation loop."""
    rng = np.random.default_rng(11)
    for n in (3, 17, 257, 1000):
        vals = rng.uniform(40, 110, n)
        s = np.float32(0.0)
        s2 = np.float32(0.0)
        for v64 in vals:
            v = np.float32(v64)
            s = np.float32(s + v)
            s2 = np.float32(s2 + v * v)
        mean = np.float32(s / np.float32(n))
        var = np.float32(s2 / np.float32(n)) - mean * mean
        stdv = float(np.float32(np.sqrt(var))) if var > 0 else 0.0
        assert native._mean_stdv_f32_numpy(vals) == (float(mean), stdv)

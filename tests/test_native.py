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


def _pack_codes(codes: np.ndarray) -> np.ndarray:
    """Host mirror of the device 6-bit packing in
    ops/hmm.viterbi_traceback_grouped (4 codes -> 3 little-endian bytes)."""
    G = -(-len(codes) // 4)
    c = np.zeros(4 * G, np.uint32)
    c[: len(codes)] = codes
    c = c.reshape(G, 4)
    w = c[:, 0] | (c[:, 1] << 6) | (c[:, 2] << 12) | (c[:, 3] << 18)
    out = np.empty((G, 3), np.uint8)
    out[:, 0] = w & 0xFF
    out[:, 1] = (w >> 8) & 0xFF
    out[:, 2] = (w >> 16) & 0xFF
    return out.reshape(-1)


def test_path_from_packed_codes_matches_unpacked():
    """Packed (6-bit) and unpacked compact-code reconstruction must agree
    for every path length mod 4 and for empty/one-event paths."""
    rng = np.random.default_rng(13)
    K = 6
    for n in (0, 1, 2, 4, 5, 8, 97, 1023):
        moves = rng.integers(0, 3, size=max(n - 1, 0))
        lows = rng.integers(0, 16, size=max(n - 1, 0))
        codes = ((moves << 4) | lows).astype(np.uint8)
        packed = _pack_codes(codes)
        s0 = int(rng.integers(0, 4**K))
        if n == 0:
            assert native.path_from_packed_codes(s0, packed, n, K).size == 0
            continue
        ref = native.path_from_codes(s0, codes, K)
        got = native.path_from_packed_codes(s0, packed, n, K)
        assert np.array_equal(ref, got)


@requires_native
def test_path_from_codes_out_of_range_moves_are_stay(monkeypatch):
    """Arbitrary uint8 codes must be total: any move nibble other than
    1 (step) / 2 (skip) decodes as stay, identically in the C loop (16-entry
    lookup tables — a 4-entry table would read out of bounds on corrupted
    codes) and the numpy fallback."""
    rng = np.random.default_rng(23)
    K = 6
    codes = rng.integers(0, 256, 500).astype(np.uint8)  # moves 0..15
    s0 = int(rng.integers(0, 4**K))
    via_c = native.path_from_codes(s0, codes, K)
    monkeypatch.setattr(native, "_LIB", False)
    via_py = native.path_from_codes(s0, codes, K)
    assert np.array_equal(via_c, via_py)
    # a pure garbage-move path (no 1/2 nibbles) must stay at s0 throughout
    stay_codes = ((rng.integers(3, 16, 100) << 4)
                  | rng.integers(0, 16, 100)).astype(np.uint8)
    monkeypatch.undo()
    assert (native.path_from_codes(s0, stay_codes, K) == s0).all()


@requires_native
def test_path_from_packed_codes_fallback_matches_native(monkeypatch):
    """The REAL numpy fallback branch (native._LIB forced off) must agree
    with the C loop bit-exactly — the fallback is what .so-less installs
    actually run, so it must be the code under test, not a local copy."""
    rng = np.random.default_rng(17)
    K = 6
    cases = []
    for n in (1, 3, 6, 250, 4097):
        codes = ((rng.integers(0, 3, n - 1) << 4)
                 | rng.integers(0, 16, n - 1)).astype(np.uint8)
        cases.append((n, codes, _pack_codes(codes),
                      int(rng.integers(0, 4**K))))
    via_c = [
        (native.path_from_packed_codes(s0, packed, n, K),
         native.path_from_codes(s0, codes, K))
        for n, codes, packed, s0 in cases
    ]
    monkeypatch.setattr(native, "_LIB", False)  # numpy fallbacks in charge
    for (n, codes, packed, s0), (c_packed, c_unpacked) in zip(cases, via_c):
        assert np.array_equal(
            native.path_from_packed_codes(s0, packed, n, K), c_packed)
        assert np.array_equal(native.path_from_codes(s0, codes, K),
                              c_unpacked)

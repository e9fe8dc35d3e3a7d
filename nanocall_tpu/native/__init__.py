"""ctypes bindings for the native host-runtime library.

Loads libnanocall_native.so if built (make -C nanocall_tpu/native); every
entry point has a numpy fallback so the framework works without the native
build.  `available()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_HERE = os.path.dirname(__file__)


def _try_build(path: str) -> None:
    """Build the .so from source on first use (it is gitignored, so fresh
    checkouts don't ship it).  Compile to a unique temp name and atomically
    rename, so concurrent importers can't observe a half-written library.
    Any failure (no compiler, read-only tree) silently leaves the numpy
    fallbacks in charge."""
    import subprocess
    import tempfile

    src = os.path.join(_HERE, "preprocess.cpp")
    if not os.path.exists(src):
        return
    try:
        # inside the try: a read-only install dir (e.g. root-owned
        # site-packages holding a stale-ABI wheel .so) must fall back
        # silently, not raise from mkstemp
        fd, tmp = tempfile.mkstemp(suffix=".so", dir=_HERE)
    except OSError:
        return
    os.close(fd)
    try:
        subprocess.run(
            # -ffp-contract=off: match the reference binary's non-FMA f32
            # rounding in nc_mean_stdv_f32 (see Makefile)
            ["g++", "-O3", "-march=native", "-ffp-contract=off", "-std=c++17",
             "-fPIC", "-Wall", "-shared", "-o", tmp, src],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, path)
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass


# semantics version this Python layer expects; must match preprocess.cpp's
# nc_abi_version().  A stale auto-built .so (e.g. pre-dating the f32
# abasic-quantile fix, or the 6-bit packed traceback codes) would
# otherwise silently serve old semantics.
ABI_VERSION = 3


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(_HERE, "libnanocall_native.so")
    if not os.path.exists(path):
        _try_build(path)
    if not os.path.exists(path):
        _LIB = False
        return _LIB
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        _LIB = False
        return _LIB
    if (not hasattr(lib, "nc_abi_version")
            or lib.nc_abi_version() != ABI_VERSION):
        # stale build: rebuild from source and reload once
        del lib
        _try_build(path)
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _LIB = False
            return _LIB
        if (not hasattr(lib, "nc_abi_version")
                or lib.nc_abi_version() != ABI_VERSION):
            _LIB = False  # unbuildable or still stale: numpy fallbacks
            return _LIB
    c_dp = ctypes.POINTER(ctypes.c_double)
    c_i64p = ctypes.POINTER(ctypes.c_int64)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    c_u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.nc_abasic_level.restype = ctypes.c_double
    lib.nc_abasic_level.argtypes = [c_dp, ctypes.c_int64, ctypes.c_double, ctypes.c_double]
    lib.nc_find_islands_5.restype = ctypes.c_int64
    lib.nc_find_islands_5.argtypes = [c_dp, ctypes.c_int64, ctypes.c_double, c_i64p, ctypes.c_int64]
    lib.nc_find_islands_windowed.restype = ctypes.c_int64
    lib.nc_find_islands_windowed.argtypes = [
        c_dp, ctypes.c_int64, ctypes.c_double, ctypes.c_int64, ctypes.c_int64,
        c_i64p, ctypes.c_int64]
    lib.nc_filter_events.restype = None
    lib.nc_filter_events.argtypes = [c_dp, c_dp, ctypes.c_int64, ctypes.c_double, c_u8p]
    if hasattr(lib, "nc_mean_stdv_f32"):
        lib.nc_mean_stdv_f32.restype = None
        lib.nc_mean_stdv_f32.argtypes = [c_dp, ctypes.c_int64, c_dp]
    lib.nc_moves.restype = None
    lib.nc_moves.argtypes = [c_i32p, ctypes.c_int64, ctypes.c_int32, c_i32p]
    lib.nc_base_seq.restype = ctypes.c_int64
    lib.nc_base_seq.argtypes = [c_i32p, c_i32p, ctypes.c_int64, ctypes.c_int32,
                                ctypes.c_char_p]
    if hasattr(lib, "nc_path_from_codes"):
        lib.nc_path_from_codes.restype = None
        lib.nc_path_from_codes.argtypes = [
            ctypes.c_int32, c_u8p, ctypes.c_int64, ctypes.c_int32, c_i32p]
    if hasattr(lib, "nc_path_from_packed"):
        lib.nc_path_from_packed.restype = None
        lib.nc_path_from_packed.argtypes = [
            ctypes.c_int32, c_u8p, ctypes.c_int64, ctypes.c_int32, c_i32p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return bool(_load())


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def abasic_level(means: np.ndarray, top_percent: float, top_offset: float) -> float:
    lib = _load()
    means = np.ascontiguousarray(means, dtype=np.float64)
    if lib:
        return lib.nc_abasic_level(_dp(means), len(means), top_percent, top_offset)
    from ..read_pipeline import detect_abasic_level

    return detect_abasic_level(means, top_percent, top_offset)


def find_islands_5(means: np.ndarray, level: float) -> list:
    lib = _load()
    means = np.ascontiguousarray(means, dtype=np.float64)
    if lib:
        out = np.zeros(2 * (len(means) // 5 + 1), dtype=np.int64)
        cnt = lib.nc_find_islands_5(
            _dp(means), len(means), level,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(out) // 2,
        )
        return [(int(out[2 * i]), int(out[2 * i + 1])) for i in range(cnt)]
    from ..read_pipeline import find_islands_5_consec

    return find_islands_5_consec(means, level)


def mean_stdv_f32(vals: np.ndarray) -> tuple[float, float]:
    """(mean, population stdv) with the reference's exact float32 sequential
    accumulation (alg::mean_stdv_of<Float_Type>: s += v; s2 += v*v in order,
    mean = s/n, stdv = sqrtf(s2/n - mean^2)).  Initial scale/shift derive
    from these moments (Fast5_Summary.hpp:223-278, Pore_Model.hpp:307-313),
    and bit-equality here is what makes untrained FASTA byte-identical to
    the compiled reference binary."""
    vals = np.ascontiguousarray(vals, dtype=np.float64)
    lib = _load()
    if lib and hasattr(lib, "nc_mean_stdv_f32"):
        out = np.zeros(2, np.float64)
        lib.nc_mean_stdv_f32(_dp(vals), len(vals), _dp(out))
        return float(out[0]), float(out[1])
    return _mean_stdv_f32_numpy(vals)


def _mean_stdv_f32_numpy(vals: np.ndarray) -> tuple[float, float]:
    """Numpy fallback for mean_stdv_f32, bit-identical to the C++ loop
    (pinned by tests/test_native.py)."""
    n = len(vals)
    if n == 0:
        return 0.0, 0.0
    # np.cumsum is a strict sequential pass, so the f32 partial sums round
    # identically to the C++ loop (np.sum's pairwise reduction would not)
    v = vals.astype(np.float32)
    s = np.cumsum(v, dtype=np.float32)[-1]
    s2 = np.cumsum(v * v, dtype=np.float32)[-1]
    mean = np.float32(s / np.float32(n))
    var = np.float32(s2 / np.float32(n)) - mean * mean
    stdv = np.sqrt(var) if var > 0 else np.float32(0.0)
    return float(mean), float(np.float32(stdv))


def filter_events(mean: np.ndarray, stdv: np.ndarray, level: float) -> np.ndarray:
    lib = _load()
    mean = np.ascontiguousarray(mean, dtype=np.float64)
    stdv = np.ascontiguousarray(stdv, dtype=np.float64)
    if lib:
        keep = np.zeros(len(mean), dtype=np.uint8)
        lib.nc_filter_events(
            _dp(mean), _dp(stdv), len(mean), level,
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return keep.astype(bool)
    return (mean < level) & (stdv <= 4.0)


def path_from_codes(s0: int, codes: np.ndarray, K: int) -> np.ndarray:
    """Reconstruct the full (n,) int32 state path from the device's compact
    traceback encoding (ops/hmm.py viterbi_traceback_grouped compact=True):
    codes[t-1] = (move << 4) | (state_t & 15)."""
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    n = len(codes) + 1
    path = np.empty(n, dtype=np.int32)
    lib = _load()
    if lib and hasattr(lib, "nc_path_from_codes"):
        lib.nc_path_from_codes(
            int(s0), codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n,
            K, path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return path
    mask = (1 << (2 * K)) - 1
    s = int(s0)
    path[0] = s
    for t in range(1, n):
        c = int(codes[t - 1])
        move = c >> 4
        if move == 1:
            s = ((s << 2) | (c & 0x3)) & mask
        elif move == 2:
            s = ((s << 4) | (c & 0xF)) & mask
        path[t] = s
    return path


def path_from_packed_codes(s0: int, packed: np.ndarray, n: int,
                           K: int) -> np.ndarray:
    """Reconstruct the full (n,) int32 state path from the device's
    BIT-PACKED compact traceback encoding (ops/hmm.py
    viterbi_traceback_grouped compact=True): four 6-bit codes per
    little-endian 24-bit group, each code = (move << 4) | (state_t & 15).
    `packed` must hold at least 3*ceil((n-1)/4) bytes."""
    packed = np.ascontiguousarray(packed, dtype=np.uint8)
    path = np.empty(n, dtype=np.int32)
    if n == 0:
        return path
    lib = _load()
    if lib and hasattr(lib, "nc_path_from_packed"):
        lib.nc_path_from_packed(
            int(s0), packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n, K, path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return path
    # numpy fallback: unpack the 24-bit groups vectorized, then reuse the
    # scalar reconstruction
    G = -(-(n - 1) // 4)
    if G:
        w = (packed[0:3 * G:3].astype(np.uint32)
             | (packed[1:3 * G:3].astype(np.uint32) << 8)
             | (packed[2:3 * G:3].astype(np.uint32) << 16))
        codes = ((w[:, None] >> (6 * np.arange(4, dtype=np.uint32))) & 0x3F)
        codes = codes.reshape(-1).astype(np.uint8)[: n - 1]
    else:
        codes = np.zeros(0, np.uint8)
    return path_from_codes(s0, codes, K)


def moves_and_base_seq(path: np.ndarray, K: int):
    """(moves (n,), base_seq str) for a decoded state path."""
    lib = _load()
    path = np.ascontiguousarray(path, dtype=np.int32)
    n = len(path)
    if lib:
        moves = np.zeros(n, dtype=np.int32)
        lib.nc_moves(
            path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n, K,
            moves.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        buf = ctypes.create_string_buffer(n * K + 1)
        ln = lib.nc_base_seq(
            path.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            moves.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n, K, buf,
        )
        return moves, buf.raw[:ln].decode()
    from .. import kmer

    moves = np.zeros(n, np.int32)
    if n > 1:
        moves[1:] = kmer.min_skip(path[:-1], path[1:], K)
    return moves, kmer.moves_to_base_seq(path, moves, K)

"""Sequence-parallel / T-chunked Viterbi: bit-exactness vs the
single-program kernels.

The reference materializes each read's full DP matrix on one node and
caps reads at 100k events (Fast5_Summary.hpp:510-524, nanocall.cpp:65).
The chunked kernels (ops.hmm.viterbi_{forward,traceback}_grouped_chunk)
and the mesh-pipelined decoder (parallel.seqpar) remove that ceiling;
these tests pin that both reproduce viterbi_decode_grouped BIT-exactly
(alphas, backpointers, paths, logp), including ragged lengths and the
clamped padding suffix.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from nanocall_tpu import simulate, transitions
from nanocall_tpu.models import load_builtin_models
from nanocall_tpu.ops import hmm
from nanocall_tpu.parallel import seqpar


@pytest.fixture(scope="module")
def decode_case():
    rng = np.random.default_rng(5)
    models = load_builtin_models("r73")
    pm = models["r73.t.006"]
    model = hmm.make_model_arrays(*pm.state_arrays())
    gt = hmm.make_grouped_trans(transitions.TransitionParams(), 6)
    B, T = 8, 128
    mean = np.zeros((B, T), np.float32)
    stdv = np.zeros((B, T), np.float32)
    for b in range(B):
        m, s, _, _, _ = simulate.simulate_read(
            models, "r73.t.006", None, T, rng, noise_scale=0.5)
        mean[b], stdv[b] = m[:T], s[:T]
    # ragged lengths, incl. full-length and chunk-boundary-straddling ends
    lengths = np.array([128, 100, 65, 128, 33, 17, 128, 90], np.int32)
    ev = {"mean": mean, "stdv": stdv, "log_stdv": np.log(stdv),
          "length": lengths}
    ref = hmm.viterbi_decode_grouped(gt, model, ev)
    assert np.isfinite(np.asarray(ref["logp"])).all()
    return gt, model, ev, ref


def test_chunked_forward_traceback_exact(decode_case):
    """Host-looped T-chunks with carried alpha/state reproduce the full
    kernel bit-for-bit (the single-chip long-read formulation)."""
    gt, model, ev, ref = decode_case
    B, T = ev["mean"].shape
    n = model.level_mean.shape[-1]
    fa_ref, bps_ref = jax.jit(
        hmm.viterbi_forward_grouped, static_argnames="unroll"
    )(gt, model, ev, unroll=2)

    for C in (2, 4):
        Tc = T // C
        alpha = jnp.zeros((B, n), jnp.float32)
        chunks = []
        for c in range(C):
            evc = {k: (v[:, c * Tc:(c + 1) * Tc] if k != "length" else v)
                   for k, v in ev.items()}
            alpha, bps_c = jax.jit(
                hmm.viterbi_forward_grouped_chunk, static_argnames="unroll"
            )(gt, model, evc, alpha, c * Tc)
            chunks.append(np.asarray(bps_c))
        assert np.array_equal(np.asarray(alpha), np.asarray(fa_ref),
                              equal_nan=True), C
        bps_cat = np.concatenate(chunks, axis=0)
        assert np.array_equal(bps_cat[1:], np.asarray(bps_ref)), C

        end_state = jnp.argmax(alpha, axis=-1).astype(jnp.int32)
        carry = end_state
        st_chunks = []
        for c in reversed(range(C)):
            carry, states = jax.jit(
                hmm.viterbi_traceback_grouped_chunk,
                static_argnames="unroll",
            )(gt, end_state, carry, jnp.asarray(chunks[c]), c * Tc,
              ev["length"])
            st_chunks.insert(0, np.asarray(states))
        path = np.moveaxis(np.concatenate(st_chunks, axis=0), 0, 1)
        assert np.array_equal(path, np.asarray(ref["path"])), C
        assert np.array_equal(
            np.asarray(jnp.max(alpha, -1)), np.asarray(ref["logp"]),
            equal_nan=True), C


@pytest.mark.parametrize("Tc", [16, 32, 48, 112, 128])
def test_tchunk_single_program_exact(decode_case, Tc):
    """The one-program chunked-time decoder (outer scan over chunks)
    reproduces the full-scan program bit-for-bit — paths, logp, AND the
    compact 6-bit packed codes byte stream, so the pipeline can swap it
    in per bucket with no downstream change."""
    gt, model, ev, ref = decode_case
    refc = hmm.viterbi_decode_grouped(gt, model, ev, compact_path=True)
    ch = hmm.viterbi_decode_grouped_tchunk(gt, model, ev, Tc=Tc)
    chc = hmm.viterbi_decode_grouped_tchunk(gt, model, ev, Tc=Tc,
                                            compact_path=True)
    chs = hmm.viterbi_decode_grouped_tchunk(gt, model, ev, Tc=Tc,
                                            with_path=False)
    assert np.array_equal(np.asarray(ch["path"]), np.asarray(ref["path"]))
    assert np.array_equal(np.asarray(ch["logp"]), np.asarray(ref["logp"]))
    assert np.array_equal(np.asarray(chc["path0"]), np.asarray(refc["path0"]))
    assert np.array_equal(np.asarray(chc["codes"]), np.asarray(refc["codes"]))
    assert np.array_equal(np.asarray(chs["logp"]), np.asarray(ref["logp"]))


def test_tchunk_len_policy():
    from nanocall_tpu import batching, shapes

    # short buckets: no chunking
    assert batching.tchunk_len(4096) == 4096
    assert batching.tchunk_len(8192) == 8192
    # long buckets: fixed chunk length, last chunk simply shorter
    assert batching.tchunk_len(100352) == batching.TCHUNK_LEN
    assert batching.tchunk_len(2048 * 47) == batching.TCHUNK_LEN
    # the chunked budget only engages at the dispatch threshold, and
    # always admits at least the full-scan batch
    assert shapes.path_bp_budget(8192) == shapes.BP_MEM_BUDGET
    assert shapes.path_bp_budget(16384) == shapes.BP_MEM_BUDGET
    for k in range(16, 51):
        T = 2048 * k
        # C >= 4 past the threshold: peak factor <= 1.375 -> >= 1.8x bp
        assert shapes.path_bp_budget(T) >= int(shapes.BP_MEM_BUDGET * 1.8)


@pytest.mark.parametrize("n_blocks", [1, 2, 4, 8])
def test_seqpar_decode_exact_8way(decode_case, n_blocks):
    """Pipelined sequence-parallel decode over the 8-device CPU mesh is
    bit-identical to the single-device kernel at every pipelining depth
    (1 = pure carry handoff, 8 = one read row per block)."""
    gt, model, ev, ref = decode_case
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    out = seqpar.viterbi_decode_seqpar(gt, model, ev, mesh,
                                       n_blocks=n_blocks)
    assert np.array_equal(np.asarray(out["path"]), np.asarray(ref["path"]))
    assert np.array_equal(np.asarray(out["logp"]), np.asarray(ref["logp"]))


def test_seqpar_decode_exact_2x4_mesh(decode_case):
    """The time axis shards over a named axis of a 2D mesh (the
    production (data, model) layout's data axis)."""
    gt, model, ev, ref = decode_case
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2),
                ("data", "model"))
    out = seqpar.viterbi_decode_seqpar(gt, model, ev, mesh, axis="data",
                                       n_blocks=4)
    assert np.array_equal(np.asarray(out["path"]), np.asarray(ref["path"]))
    assert np.array_equal(np.asarray(out["logp"]), np.asarray(ref["logp"]))


def test_seqpar_shape_validation(decode_case):
    gt, model, ev, _ = decode_case
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    bad = {k: (v[:, :100] if k != "length" else v) for k, v in ev.items()}
    with pytest.raises(ValueError, match="not divisible"):
        seqpar.viterbi_decode_seqpar(gt, model, bad, mesh)
    with pytest.raises(ValueError, match="n_blocks"):
        seqpar.viterbi_decode_seqpar(gt, model, ev, mesh, n_blocks=3)

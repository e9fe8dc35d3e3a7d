"""Golden tests: JAX HMM kernels vs the scalar numpy oracle."""

import numpy as np
import pytest

import oracle
from nanocall_tpu import events, kmer, transitions
from nanocall_tpu.ops import hmm


def random_model_arrays(K, rng):
    n = kmer.n_states(K)
    lm = rng.uniform(40.0, 90.0, n).astype(np.float32)
    ls = rng.uniform(0.5, 2.0, n).astype(np.float32)
    sm = rng.uniform(0.5, 1.5, n).astype(np.float32)
    slam = (sm**3 / rng.uniform(0.1, 0.4, n).astype(np.float32) ** 2).astype(np.float32)
    return lm, ls, sm, slam


def random_events(T, rng, lm):
    mean = rng.choice(lm, T) + rng.normal(0, 1.0, T)
    stdv = rng.uniform(0.5, 1.5, T)
    start = np.cumsum(rng.uniform(0.01, 0.05, T))
    length = rng.uniform(0.01, 0.05, T)
    return events.EventSequence(mean=mean, stdv=stdv, start=start, length=length)


@pytest.fixture(scope="module")
def setup_k3():
    K = 3
    rng = np.random.default_rng(42)
    st = transitions.build_structured(K=K)
    pm = random_model_arrays(K, rng)
    seqs = [random_events(T, rng, pm[0]) for T in (17, 31, 9, 31)]
    return K, st, pm, seqs


def test_viterbi_matches_oracle(setup_k3):
    K, st, pm, seqs = setup_k3
    M = oracle.dense_logp(st, K)
    batch = events.pad_batch(seqs)
    ops = hmm.make_trans_ops(st)
    model = hmm.make_model_arrays(*pm)
    out = hmm.viterbi_decode(ops, model, batch)
    for b, ev in enumerate(seqs):
        em = oracle.emissions(pm, ev)
        path_ref, logp_ref = oracle.viterbi(M, em)
        T = len(ev)
        path = np.asarray(out["path"])[b, :T]
        assert np.array_equal(path, path_ref), f"path mismatch seq {b}"
        assert np.isclose(float(out["logp"][b]), logp_ref, rtol=1e-4)


def test_viterbi_sparse_matches_structured(setup_k3):
    K, st, pm, seqs = setup_k3
    # same table via the generic sparse/gather path
    sp = transitions.sparse_from_pairs(list(transitions.structured_to_pairs(st)), K)
    batch = events.pad_batch(seqs)
    model = hmm.make_model_arrays(*pm)
    out_s = hmm.viterbi_decode(hmm.make_trans_ops(st), model, batch)
    out_g = hmm.viterbi_decode(hmm.make_trans_ops(sp), model, batch)
    assert np.array_equal(np.asarray(out_s["path"]), np.asarray(out_g["path"]))
    assert np.allclose(np.asarray(out_s["logp"]), np.asarray(out_g["logp"]), rtol=1e-5)


def test_fwbw_matches_oracle(setup_k3):
    K, st, pm, seqs = setup_k3
    M = oracle.dense_logp(st, K)
    batch = events.pad_batch(seqs)
    ops = hmm.make_trans_ops(st)
    model = hmm.make_model_arrays(*pm)
    out = hmm.fwbw_jit(ops, model, batch)
    for b, ev in enumerate(seqs):
        em = oracle.emissions(pm, ev)
        a_ref, b_ref, lpd_ref = oracle.fwbw(M, em)
        T = len(ev)
        assert np.allclose(np.asarray(out["alpha"])[b, :T], a_ref, atol=1e-3)
        assert np.allclose(np.asarray(out["beta"])[b, :T], b_ref, atol=1e-3)
        assert np.isclose(float(out["log_pr_data"][b]), lpd_ref, rtol=1e-5, atol=1e-3)


def test_fwbw_posteriors_sum_to_one(setup_k3):
    K, st, pm, seqs = setup_k3
    batch = events.pad_batch(seqs)
    ops = hmm.make_trans_ops(st)
    model = hmm.make_model_arrays(*pm)
    out = hmm.fwbw_jit(ops, model, batch)
    for b, ev in enumerate(seqs):
        T = len(ev)
        lp = (
            np.asarray(out["alpha"])[b, :T]
            + np.asarray(out["beta"])[b, :T]
            - float(out["log_pr_data"][b])
        )
        sums = np.exp(lp).sum(axis=1)
        assert np.allclose(sums, 1.0, atol=1e-3)


def test_viterbi_logp_below_data_logp(setup_k3):
    K, st, pm, seqs = setup_k3
    batch = events.pad_batch(seqs)
    ops = hmm.make_trans_ops(st)
    model = hmm.make_model_arrays(*pm)
    v = hmm.viterbi_decode(ops, model, batch, with_path=False)
    f = hmm.fwbw_jit(ops, model, batch)
    assert (np.asarray(v["logp"]) <= np.asarray(f["log_pr_data"]) + 1e-3).all()


def test_batch_padding_invariance(setup_k3):
    """Results for a sequence must not depend on batch padding context."""
    K, st, pm, seqs = setup_k3
    ops = hmm.make_trans_ops(st)
    model = hmm.make_model_arrays(*pm)
    full = hmm.viterbi_decode(ops, model, events.pad_batch(seqs))
    for b, ev in enumerate(seqs):
        solo = hmm.viterbi_decode(ops, model, events.pad_batch([ev], pad_to=64))
        T = len(ev)
        assert np.array_equal(
            np.asarray(full["path"])[b, :T], np.asarray(solo["path"])[0, :T]
        )
        assert np.isclose(float(full["logp"][b]), float(solo["logp"][0]), rtol=1e-5)


def test_fwbw_custom_matches_oracle(setup_k3):
    K, st, pm, seqs = setup_k3
    M = oracle.dense_logp(st, K)
    batch = events.pad_batch(seqs[:2])
    ops = hmm.make_trans_ops(st)
    model = hmm.make_model_arrays(*pm)
    out = hmm.fwbw_custom_jit(ops, model, batch)
    for b, ev in enumerate(seqs[:2]):
        em = oracle.emissions(pm, ev)
        a_ref, b_ref, g_ref = oracle.fwbw_custom(M, em)
        T = len(ev)
        assert np.allclose(np.asarray(out["alpha"])[b, :T], a_ref, atol=1e-3)
        assert np.allclose(np.asarray(out["beta"])[b, :T], b_ref, atol=1e-3)
        assert np.allclose(np.asarray(out["gamma"])[b, :T], g_ref, atol=1e-3)
        # gamma rows are normalized posteriors
        assert np.allclose(np.exp(g_ref).sum(axis=1), 1.0, atol=1e-6)


def test_per_batch_transition_tables(setup_k3):
    """Batched per-read transition tables give the same result as building
    each table separately."""
    K, st, pm, seqs = setup_k3
    params = np.array([[0.1, 0.3], [0.15, 0.2], [0.07, 0.35], [0.1, 0.3]])
    fb, tb = transitions.build_structured_batch(params, K)
    ops_b = hmm.make_trans_ops_batch(fb, tb, K)
    model = hmm.make_model_arrays(*pm)
    batch = events.pad_batch(seqs)
    out_b = hmm.viterbi_decode(ops_b, model, batch)
    for b, ev in enumerate(seqs):
        st_i = transitions.build_structured(
            transitions.TransitionParams(params[b, 0], params[b, 1]), K
        )
        solo = hmm.viterbi_decode(
            hmm.make_trans_ops(st_i), model, events.pad_batch([ev])
        )
        T = len(ev)
        assert np.array_equal(
            np.asarray(out_b["path"])[b, :T], np.asarray(solo["path"])[0, :T]
        )


def test_grouped_viterbi_matches_slots(setup_k3):
    """The grouped 3-way decomposition must reproduce the 21-slot kernel
    exactly (values and tie-broken paths)."""
    K, st, pm, seqs = setup_k3
    ops = hmm.make_trans_ops(st)
    gt = hmm.make_grouped_trans(transitions.TransitionParams(), K)
    model = hmm.make_model_arrays(*pm)
    batch = events.pad_batch(seqs)
    o1 = hmm.viterbi_decode(ops, model, batch)
    o2 = hmm.viterbi_decode_grouped(gt, model, batch)
    for b, ev in enumerate(seqs):
        T = len(ev)
        assert np.array_equal(
            np.asarray(o1["path"])[b, :T], np.asarray(o2["path"])[b, :T]
        )
    assert np.allclose(np.asarray(o1["logp"]), np.asarray(o2["logp"]), rtol=1e-6)


def test_grouped_viterbi_ties_and_homopolymers():
    """Adversarial ties: few distinct emission rows force exact alpha ties,
    exercising the duplicate-domination and tie-break proofs."""
    K = 4
    n = kmer.n_states(K)
    rng = np.random.default_rng(9)
    st = transitions.build_structured(K=K)
    ops = hmm.make_trans_ops(st)
    gt = hmm.make_grouped_trans(transitions.TransitionParams(), K)
    base = rng.uniform(40, 90, 4).astype(np.float32)
    model = hmm.make_model_arrays(
        base[rng.integers(4, size=n)].astype(np.float32),
        np.full(n, 1.0, np.float32),
        np.full(n, 1.0, np.float32),
        np.full(n, 5.0, np.float32),
    )
    T = 48
    seq = events.EventSequence(
        mean=base[rng.integers(4, size=T)],
        stdv=np.full(T, 1.0),
        start=np.cumsum(np.full(T, 0.02)),
        length=np.full(T, 0.02),
    )
    batch = events.pad_batch([seq])
    o1 = hmm.viterbi_decode(ops, model, batch)
    o2 = hmm.viterbi_decode_grouped(gt, model, batch)
    assert np.array_equal(np.asarray(o1["path"]), np.asarray(o2["path"]))


def test_grouped_batched_params(setup_k3):
    """Per-batch grouped tables match per-element single tables."""
    K, st, pm, seqs = setup_k3
    params = np.array([[0.1, 0.3], [0.15, 0.2], [0.07, 0.35], [0.1, 0.3]])
    stay, step, skip = transitions.grouped_tables(params[:, 0], params[:, 1], K)
    gt_b = hmm.GroupedTrans(stay_lp=stay, step_lp=step, skip_lp=skip, K=K)
    model = hmm.make_model_arrays(*pm)
    batch = events.pad_batch(seqs)
    out_b = hmm.viterbi_decode_grouped(gt_b, model, batch)
    for b, ev in enumerate(seqs):
        gt_i = hmm.make_grouped_trans(
            transitions.TransitionParams(params[b, 0], params[b, 1]), K
        )
        solo = hmm.viterbi_decode_grouped(gt_i, model, events.pad_batch([ev]))
        T = len(ev)
        assert np.array_equal(
            np.asarray(out_b["path"])[b, :T], np.asarray(solo["path"])[0, :T]
        )


def test_fwbw_grouped_matches_slots(setup_k3):
    """Grouped log-sum-exp fwbw (closed-form corrections) == 21-slot fwbw."""
    K, st, pm, seqs = setup_k3
    ops = hmm.make_trans_ops(st)
    gtf = hmm.make_grouped_full_device(np.float32(0.1), np.float32(0.3), K=K)
    model = hmm.make_model_arrays(*pm)
    batch = events.pad_batch(seqs)
    ref = hmm.fwbw_jit(ops, model, batch)
    out = hmm.fwbw_grouped(gtf, model, batch)
    for b, ev in enumerate(seqs):
        T = len(ev)
        assert np.allclose(
            np.asarray(ref["alpha"])[b, :T], np.asarray(out["alpha"])[b, :T],
            atol=2e-3,
        )
        assert np.allclose(
            np.asarray(ref["beta"])[b, :T], np.asarray(out["beta"])[b, :T],
            atol=2e-3,
        )
    assert np.allclose(
        np.asarray(ref["log_pr_data"]), np.asarray(out["log_pr_data"]), atol=2e-3
    )


def test_compact_path_equals_full(setup_k3):
    """The compact (move, low-bases) traceback encoding must reconstruct
    the full state path exactly, padded suffix included, for ragged
    lengths."""
    from nanocall_tpu import native

    K, st, pm, seqs = setup_k3
    gt = hmm.make_grouped_trans(transitions.TransitionParams(), K)
    model = hmm.make_model_arrays(*pm)
    batch = events.pad_batch(seqs)
    full = hmm.viterbi_decode_grouped(gt, model, batch)
    comp = hmm.viterbi_decode_grouped(gt, model, batch, compact_path=True)
    assert np.allclose(np.asarray(full["logp"]), np.asarray(comp["logp"]))
    p0 = np.asarray(comp["path0"])
    codes = np.asarray(comp["codes"])
    T = np.asarray(full["path"]).shape[1]
    assert codes.shape[1] == 3 * (-(-(T - 1) // 4))  # 6-bit packed
    for b in range(len(seqs)):
        rec = native.path_from_packed_codes(int(p0[b]), codes[b], T, K)
        assert np.array_equal(rec, np.asarray(full["path"])[b].astype(np.int32))


def test_compact_path_equals_full_ties():
    """Compact encoding under adversarial emission ties (K=4)."""
    from nanocall_tpu import native

    K = 4
    n = kmer.n_states(K)
    rng = np.random.default_rng(9)
    gt = hmm.make_grouped_trans(transitions.TransitionParams(), K)
    base = rng.uniform(40, 90, 4).astype(np.float32)
    model = hmm.make_model_arrays(
        base[rng.integers(4, size=n)].astype(np.float32),
        np.full(n, 1.0, np.float32),
        np.full(n, 1.0, np.float32),
        np.full(n, 5.0, np.float32),
    )
    T = 48
    seq = events.EventSequence(
        mean=base[rng.integers(4, size=T)],
        stdv=np.full(T, 1.0),
        start=np.cumsum(np.full(T, 0.02)),
        length=np.full(T, 0.02),
    )
    batch = events.pad_batch([seq])
    full = hmm.viterbi_decode_grouped(gt, model, batch)
    comp = hmm.viterbi_decode_grouped(gt, model, batch, compact_path=True)
    rec = native.path_from_packed_codes(
        int(np.asarray(comp["path0"])[0]), np.asarray(comp["codes"])[0],
        np.asarray(full["path"]).shape[1], K
    )
    assert np.array_equal(rec, np.asarray(full["path"])[0].astype(np.int32))

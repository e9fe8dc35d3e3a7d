"""Structural validation of the grouped 3-way decomposition at K=6.

Checks, against the exact 21-slot table, the claims the fast Viterbi path
relies on (see transitions.grouped_condition_masks docstring):
  - slot 0 == stay_lp everywhere;
  - all non-duplicate step slots share step_lp[j];
  - all non-duplicate skip slots share skip_lp[j] except the special states
    (five-equal-leading-bases) where some slots carry an extra step term —
    and those from-states are exactly the step-group members (so their full
    probability is represented exactly there).
"""

import numpy as np

from nanocall_tpu import kmer, transitions

K = 6
N = kmer.n_states(K)


def test_grouped_tables_vs_slots_k6():
    st = transitions.build_structured(K=K)
    stay, step, skip = transitions.grouped_tables(
        transitions.DEFAULT_P_STAY, transitions.DEFAULT_P_SKIP, K
    )
    from_idx = transitions.slot_from_state(K)
    fl = st.from_logp

    # stay slot is exact
    assert np.allclose(fl[0], stay, atol=1e-6)

    j = np.arange(N)
    # step slots: non-dup entries all equal step_lp
    for b in range(4):
        row = fl[1 + b]
        finite = np.isfinite(row)
        assert np.allclose(row[finite], step[finite], atol=1e-6)
        # duplicates are exactly the i == j cases (homopolymers)
        dup = ~finite
        assert (from_idx[1 + b][dup] == j[dup]).all()

    # special destinations: five equal leading bases
    b1 = j >> 10
    special = ((j >> 2) & 0xFF) == (j >> 4)
    assert special.sum() == 16

    for c in range(16):
        row = fl[5 + c]
        finite = np.isfinite(row)
        generic = finite & ~special
        assert np.allclose(row[generic], skip[generic], atol=1e-6)
        # on special js, slots with c&3 == top base carry the step term and
        # their from-state is a member of the step group
        extra = finite & special & ((c & 3) == b1)
        if extra.any():
            assert (row[extra] > skip[extra] + 1e-7).all()
            i_states = from_idx[5 + c][extra]
            js = j[extra]
            assert (
                kmer.suffix(i_states, K - 1, K) == kmer.prefix(js, K - 1, K)
            ).all()
        plain = finite & special & ((c & 3) != b1)
        assert np.allclose(row[plain], skip[plain], atol=1e-6)

    # duplicate-domination: every masked (dup) slot's from-state appears with
    # a strictly larger probability in its primary representation
    for k in range(1, 21):
        dup = ~np.isfinite(fl[k])
        if not dup.any():
            continue
        for jj in np.nonzero(dup)[0][:50]:
            i = from_idx[k, jj]
            # find the primary slot carrying (i -> jj)
            prim = [
                kk for kk in range(21)
                if from_idx[kk, jj] == i and np.isfinite(fl[kk, jj])
            ]
            assert len(prim) == 1
            kk = prim[0]
            generic_val = (
                stay[jj] if kk == 0 else (step[jj] if kk <= 4 else skip[jj])
            )
            assert fl[kk, jj] >= generic_val - 1e-6


def test_grouped_viterbi_k6_end_to_end():
    """Full-size (K=6) grouped-vs-slot decode equality on model-like data."""
    from nanocall_tpu import events
    from nanocall_tpu.models import load_builtin_models
    from nanocall_tpu.ops import hmm

    models = load_builtin_models("r73")
    pm = models["r73.t.006"]
    rng = np.random.default_rng(0)
    st = transitions.build_structured(K=K)
    gt = hmm.make_grouped_trans(transitions.TransitionParams(), K)
    model = hmm.make_model_arrays(*pm.state_arrays())
    T = 64
    seq = events.EventSequence(
        mean=rng.choice(pm.level_mean, T) + rng.normal(0, 0.5, T),
        stdv=rng.uniform(0.5, 1.5, T),
        start=np.cumsum(np.full(T, 0.02)),
        length=np.full(T, 0.02),
    )
    batch = events.pad_batch([seq])
    o1 = hmm.viterbi_decode(hmm.make_trans_ops(st), model, batch)
    o2 = hmm.viterbi_decode_grouped(gt, model, batch)
    assert np.array_equal(np.asarray(o1["path"]), np.asarray(o2["path"]))
    assert np.allclose(np.asarray(o1["logp"]), np.asarray(o2["logp"]), rtol=1e-6)


def test_device_tables_match_host_to_float32_ulps():
    """The production pipeline builds grouped tables ON DEVICE in float32
    (make_grouped_trans_device / train.py xp=jnp); the host builders
    accumulate float64 then cast (the TSV-conformance pipeline).  The two
    may differ only at the last float32 ulp (measured max 4.8e-7 in log
    space across the trained-parameter range) — large enough to flip a
    Viterbi tie only when two path scores agree to ~1e-6, which the
    byte-identical FASTA goldens (test_reference_pipeline_golden) bound in
    practice.  This test pins that ulp-level agreement so neither builder
    drifts."""
    import jax.numpy as jnp

    for ps, pk in [(0.1, 0.3), (0.05, 0.4), (0.4, 0.05), (0.09, 0.28)]:
        host = transitions.grouped_tables(ps, pk, K)
        dev = transitions.grouped_tables(
            jnp.float32(ps), jnp.float32(pk), K, xp=jnp
        )
        for name, a, b in zip(("stay", "step", "skip"), host, dev):
            d = np.abs(np.asarray(a) - np.asarray(b)).max()
            assert d <= 1e-6, (name, ps, pk, float(d))

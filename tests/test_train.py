"""EM trainer tests: one-round golden vs oracle, and parameter recovery."""

import dataclasses

import numpy as np
import pytest

import oracle
from nanocall_tpu import events, kmer, pore_model, train, transitions
from nanocall_tpu.ops import hmm

K = 3
N = kmer.n_states(K)


def make_models(rng):
    out = {}
    for st in (0, 1):
        lm = rng.uniform(40.0, 90.0, N).astype(np.float32)
        ls = rng.uniform(0.8, 2.0, N).astype(np.float32)
        sm = rng.uniform(0.5, 1.5, N).astype(np.float32)
        ss = rng.uniform(0.1, 0.4, N).astype(np.float32)
        out[st] = pore_model.PoreModel(
            level_mean=lm, level_stdv=ls, sd_mean=sm, sd_stdv=ss, K=K, strand=st
        )
    return out


def sample_events(pm, T, rng, scale=1.0, shift=0.0, drift=0.0):
    """Generate events by a random walk through states, emitting from the
    scaled model."""
    st_tbl = transitions.build_structured(K=K)
    M = np.exp(oracle.dense_logp(st_tbl, K))
    M = M / M.sum(axis=1, keepdims=True)
    s = rng.integers(N)
    means, stdvs, starts, lengths = [], [], [], []
    t = 0.0
    for _ in range(T):
        lm = pm.level_mean[s] * scale + shift + drift * t
        means.append(rng.normal(lm, pm.level_stdv[s]))
        stdvs.append(max(rng.normal(pm.sd_mean[s], pm.sd_stdv[s]), 0.05))
        starts.append(t)
        dt = rng.uniform(0.01, 0.03)
        lengths.append(dt)
        t += dt
        s = rng.choice(N, p=M[s])
    return events.EventSequence(mean=means, stdv=stdvs, start=starts, length=lengths)


def build_train_batch(group_seqs, models, pm_params_list, st_params_list):
    """Pack a list of groups (each: list of (EventSequence, strand)) into the
    trainer's batch arrays."""
    G = len(group_seqs)
    S = max(len(g) for g in group_seqs)
    T = max(len(ev) for g in group_seqs for ev, _ in g)
    ev = {
        "mean": np.ones((G, S, T), np.float32),
        "stdv": np.ones((G, S, T), np.float32),
        "log_stdv": np.zeros((G, S, T), np.float32),
        "start": np.zeros((G, S, T), np.float32),
        "length": np.zeros((G, S), np.int32),
        "strand": np.zeros((G, S), np.int32),
        "valid": np.zeros((G, S), bool),
    }
    mdl = {
        k: np.zeros((G, 2, N), np.float32)
        for k in ("level_mean", "level_stdv", "sd_mean", "sd_lambda")
    }
    for g, seqs in enumerate(group_seqs):
        for s, (e, st) in enumerate(seqs):
            L = len(e)
            ev["mean"][g, s, :L] = e.mean
            ev["stdv"][g, s, :L] = e.stdv
            ev["log_stdv"][g, s, :L] = e.log_stdv
            ev["start"][g, s, :L] = e.start
            ev["length"][g, s] = L
            ev["strand"][g, s] = st
            ev["valid"][g, s] = True
        for st in (0, 1):
            mdl["level_mean"][g, st] = models[st].level_mean
            mdl["level_stdv"][g, st] = models[st].level_stdv
            mdl["sd_mean"][g, st] = models[st].sd_mean
            mdl["sd_lambda"][g, st] = models[st].sd_lambda
    pm_params = np.stack([p.as_array() for p in pm_params_list])
    st_params = np.asarray(st_params_list, np.float32)
    return ev, mdl, pm_params, st_params


@pytest.mark.parametrize("train_drift", [True, False])
def test_one_round_matches_oracle(train_drift):
    rng = np.random.default_rng(7)
    models = make_models(rng)
    seqs = [
        (sample_events(models[0], 25, rng), 0),
        (sample_events(models[0], 20, rng), 0),
        (sample_events(models[1], 22, rng), 1),
    ]
    pm_params = pore_model.PoreModelParams(scale=1.05, shift=-1.0, drift=0.002)
    st_params = [[[0.11, 0.29], [0.1, 0.3]]]

    ev, mdl, pm_arr, st_arr = build_train_batch([seqs], models, [pm_params], st_params)
    out = train.train_one_round(
        ev, mdl, pm_arr, st_arr, K=K, train_drift=train_drift
    )

    # oracle: fwbw per sequence with scaled models + custom transitions
    scaled = {st: models[st].scaled(pm_params) for st in (0, 1)}
    fwbw_res, ems = [], []
    fit_ref = 0.0
    for e, st in seqs:
        tp = transitions.TransitionParams(*st_params[0][st])
        M = oracle.dense_logp(transitions.build_structured(tp, K), K)
        em = oracle.emissions(
            (scaled[st].level_mean, scaled[st].level_stdv, scaled[st].sd_mean,
             scaled[st].sd_lambda),
            e, drift=pm_params.drift,
        )
        a, b, lpd = oracle.fwbw(M, em)
        fwbw_res.append((a, b, lpd))
        ems.append(em)
        fit_ref += lpd

    assert np.isclose(float(out["fit"][0]), fit_ref, rtol=1e-4, atol=1e-2)

    mdl_arrays = {
        st: (models[st].level_mean, models[st].level_stdv, models[st].sd_mean,
             models[st].sd_lambda)
        for st in (0, 1)
    }
    params_ref, done_ref = oracle.train_pm_params(seqs, mdl_arrays, fwbw_res, train_drift)
    assert not done_ref
    assert not bool(out["done"][0])
    got = np.asarray(out["new_pm_params"][0], np.float64)
    assert np.allclose(got, params_ref, rtol=2e-3, atol=2e-3), (got, params_ref)

    st_ref = oracle.train_st_params(
        seqs, scaled, fwbw_res, ems, {0: st_params[0][0], 1: st_params[0][1]}, K
    )
    got_st = np.asarray(out["new_st_params"][0])
    for st in (0, 1):
        assert np.allclose(got_st[st], st_ref[st], rtol=5e-3, atol=5e-4), (
            st, got_st[st], st_ref[st])


def test_em_recovers_scaling():
    """EM on events generated with known scale/shift should recover them."""
    rng = np.random.default_rng(3)
    models = make_models(rng)
    true = pore_model.PoreModelParams(scale=1.2, shift=5.0)
    seqs = [
        (sample_events(models[0], 60, rng, scale=1.2, shift=5.0), 0),
        (sample_events(models[0], 60, rng, scale=1.2, shift=5.0), 0),
    ]
    # moment-matching init (Fast5_Summary.hpp:253-268)
    ev_all = np.concatenate([e.mean for e, _ in seqs])
    r_mean, r_std = float(ev_all.mean()), float(ev_all.std())
    scale0 = r_std / models[0].stdv()
    shift0 = r_mean - scale0 * models[0].mean()
    pm0 = pore_model.PoreModelParams(scale=scale0, shift=shift0)
    st0 = [[[0.1, 0.3], [0.1, 0.3]]]

    ev, mdl, pm_arr, st_arr = build_train_batch([seqs], models, [pm0], st0)
    cfg = train.EMConfig(K=K, train_drift=False, double_strand=False)
    pm_f, st_f, fit, rounds, _ = train.run_em(ev, mdl, pm_arr, st_arr, cfg)
    assert rounds[0] >= 1
    assert abs(pm_f[0, 0] - true.scale) < 0.08, pm_f[0]
    assert abs(pm_f[0, 1] - true.shift) < 4.0, pm_f[0]
    assert 0.5 < pm_f[0, 3] < 2.0  # var near 1


def test_em_fit_improves():
    rng = np.random.default_rng(11)
    models = make_models(rng)
    seqs = [(sample_events(models[0], 40, rng, scale=1.1, shift=2.0), 0)]
    ev_all = seqs[0][0].mean
    scale0 = float(ev_all.std()) / models[0].stdv()
    shift0 = float(ev_all.mean()) - scale0 * models[0].mean()
    pm0 = pore_model.PoreModelParams(scale=scale0, shift=shift0)
    ev, mdl, pm_arr, st_arr = build_train_batch(
        [seqs], models, [pm0], [[[0.1, 0.3], [0.1, 0.3]]]
    )
    cfg = train.EMConfig(K=K, train_drift=False, double_strand=False,
                         min_progress=0.0)
    # two manual rounds: fit at round 2 params must be >= fit at round 1
    out1 = train.train_one_round(ev, mdl, pm_arr, st_arr, K=K, train_drift=False)
    out2 = train.train_one_round(
        ev, mdl, np.asarray(out1["new_pm_params"]), np.asarray(out1["new_st_params"]),
        K=K, train_drift=False,
    )
    assert float(out2["fit"][0]) >= float(out1["fit"][0]) - 1e-3


def test_em_recovers_transition_params():
    """EM transition training should move p_stay/p_skip toward the
    kinetics the events were generated with."""
    rng = np.random.default_rng(21)
    models = make_models(rng)
    # generate with high stay, low skip
    true_stay, true_skip = 0.3, 0.08

    def sample(T):
        st_tbl = transitions.build_structured(
            transitions.TransitionParams(true_stay, true_skip), K
        )
        import oracle

        M = np.exp(oracle.dense_logp(st_tbl, K))
        M = M / M.sum(axis=1, keepdims=True)
        s = rng.integers(N)
        means, stdvs, starts, lengths = [], [], [], []
        t = 0.0
        pm = models[0]
        for _ in range(T):
            means.append(rng.normal(pm.level_mean[s], pm.level_stdv[s] * 0.3))
            stdvs.append(max(rng.normal(pm.sd_mean[s], pm.sd_stdv[s]), 0.05))
            starts.append(t)
            t += 0.02
            lengths.append(0.02)
            s = rng.choice(N, p=M[s])
        return events.EventSequence(mean=means, stdv=stdvs, start=starts,
                                    length=lengths)

    seqs = [(sample(80), 0), (sample(80), 0)]
    pm0 = pore_model.PoreModelParams()
    st0 = [[[0.1, 0.3], [0.1, 0.3]]]
    ev, mdl, pm_arr, st_arr = build_train_batch([seqs], models, [pm0], st0)
    cfg = train.EMConfig(K=K, train_drift=False, double_strand=False,
                         train_scaling=False, max_rounds=8, min_progress=0.0)
    pm_f, st_f, fit, rounds, _ = train.run_em(ev, mdl, pm_arr, st_arr, cfg)
    p_stay, p_skip = float(st_f[0, 0, 0]), float(st_f[0, 0, 1])
    # moved decisively toward the generating kinetics
    assert p_stay > 0.2, p_stay
    assert p_skip < 0.2, p_skip


def test_mixed_joint_single_round_caps():
    """Per-candidate round caps in a mixed joint/single bucket
    (nanocall.cpp:420 vs :536): a single-strand candidate sharing a chunk
    with double-strand candidates must still be capped at max_rounds, not
    2x max_rounds, and every group must behave exactly as if trained in
    its own bucket."""
    rng = np.random.default_rng(29)
    models = make_models(rng)
    T = 30
    groups = [
        [(sample_events(models[0], T, rng, scale=1.1, shift=2.0), 0),
         (sample_events(models[1], T, rng, scale=1.1, shift=2.0), 1)],  # joint
        [(sample_events(models[0], T, rng, scale=1.1, shift=2.0), 0)],  # single
        [(sample_events(models[0], T, rng, scale=1.1, shift=2.0), 0),
         (sample_events(models[1], T, rng, scale=1.1, shift=2.0), 1)],  # joint
    ]
    joint = [True, False, True]
    pm0 = [pore_model.PoreModelParams(scale=1.0, shift=1.0)] * 3
    st0 = [[[0.1, 0.3], [0.1, 0.3]]] * 3
    # min_progress very negative => groups only stop on cap or regression,
    # so the cap is actually exercised
    cfg = train.EMConfig(K=K, train_drift=False, max_rounds=2,
                         min_progress=-1e9)
    caps = cfg.caps(joint)
    assert caps.tolist() == [4, 2, 4]

    ev, mdl, pm_arr, st_arr = build_train_batch(groups, models, pm0, st0)
    for device_loop in (True, False):
        pm_f, st_f, fit, rounds, _ = train.run_em(
            ev, mdl, pm_arr, st_arr, cfg, device_loop=device_loop, caps=caps
        )
        # the single-strand candidate must not exceed its own cap
        assert rounds[1] <= 2, rounds
        # each group must match an isolated single-group run
        for g in range(3):
            ev1, mdl1, pm1, st1 = build_train_batch(
                [groups[g]], models, [pm0[g]], [st0[g]]
            )
            c1 = dataclasses.replace(cfg, double_strand=joint[g])
            pm_i, st_i, fit_i, rounds_i, _ = train.run_em(
                ev1, mdl1, pm1, st1, c1, device_loop=device_loop
            )
            assert rounds[g] == rounds_i[0], (g, rounds, rounds_i)
            # cross-G tolerance: a G=3 bucket and a G=1 program lower the
            # fused round's reductions with different tilings, so moments
            # differ at reassociation level (~1e-7) and the 3x3 solve
            # amplifies that through its conditioning over 4 rounds.
            # Same-composition runs remain bit-identical (the
            # staged-vs-overlapped pipeline test pins atol=0 on that).
            assert np.allclose(pm_f[g], pm_i[0], rtol=5e-3, atol=1e-3)
            assert np.allclose(fit[g], fit_i[0], rtol=1e-5, atol=1e-1)


def test_device_em_loop_matches_host_loop():
    """The on-device while_loop EM must reproduce the host-stepped loop."""
    rng = np.random.default_rng(17)
    models = make_models(rng)
    groups = []
    for i in range(3):
        groups.append([
            (sample_events(models[0], 30, rng, scale=1.1, shift=2.0), 0),
            (sample_events(models[1], 25, rng, scale=1.1, shift=2.0), 1),
        ])
    pm0 = [pore_model.PoreModelParams(scale=1.0, shift=1.0)] * 3
    st0 = [[[0.1, 0.3], [0.1, 0.3]]] * 3
    ev, mdl, pm_arr, st_arr = build_train_batch(groups, models, pm0, st0)
    cfg = train.EMConfig(K=K, train_drift=False, double_strand=True,
                         max_rounds=4)
    dev = train.run_em(ev, mdl, pm_arr, st_arr, cfg, device_loop=True)
    host = train.run_em(ev, mdl, pm_arr, st_arr, cfg, device_loop=False)
    # loop-body fusion changes float rounding slightly vs the host-stepped
    # path; semantics (rounds, convergence target) must agree
    for a, b, name in zip(dev, host, ("pm", "st", "fit", "rounds", "frozen")):
        assert np.allclose(np.asarray(a, np.float64), np.asarray(b, np.float64),
                           rtol=5e-3, atol=2e-2), (name, a, b)
    assert np.array_equal(dev[3], host[3])  # same per-group round counts


def test_two_phase_em_resume_identical():
    """Splitting the EM loop (run round_limit rounds, then resume the
    still-unfrozen groups from the fetched (fit, frozen, rounds) carry)
    must be trajectory-identical to one uninterrupted run — this is the
    exactness contract of the two-phase straggler repacking in
    basecall.train_reads."""
    rng = np.random.default_rng(43)
    models = make_models(rng)
    groups = []
    for i in range(4):
        groups.append([
            (sample_events(models[0], 40, rng, scale=1.1, shift=2.0), 0),
            (sample_events(models[1], 35, rng, scale=1.1, shift=2.0), 1),
        ])
    pm0 = [pore_model.PoreModelParams(scale=1.0, shift=1.0)] * 4
    st0 = [[[0.1, 0.3], [0.1, 0.3]]] * 4
    ev, mdl, pm_arr, st_arr = build_train_batch(groups, models, pm0, st0)
    cfg = train.EMConfig(K=K, train_drift=False, double_strand=True,
                         max_rounds=4, min_progress=-1e9)

    full = train.run_em(ev, mdl, pm_arr, st_arr, cfg)
    for split in (1, 2, 3):
        p1 = train.run_em(ev, mdl, pm_arr, st_arr, cfg, round_limit=split)
        pm1, st1, fit1, rounds1, frozen1 = p1
        p2 = train.run_em(
            ev, mdl, pm1, st1, cfg,
            state0=(fit1, frozen1, rounds1),
        )
        for a, b, name in zip(full, p2, ("pm", "st", "fit", "rounds", "frozen")):
            assert np.allclose(np.asarray(a, np.float64),
                               np.asarray(b, np.float64),
                               rtol=1e-6, atol=1e-6), (split, name, a, b)


def test_two_phase_em_repack_subset():
    """Resuming only a SUBSET of groups (the repacked stragglers) matches
    those groups' rows of the uninterrupted run."""
    rng = np.random.default_rng(47)
    models = make_models(rng)
    groups = []
    for i in range(4):
        groups.append([
            (sample_events(models[0], 40, rng, scale=1.1, shift=2.0), 0),
            (sample_events(models[1], 35, rng, scale=1.1, shift=2.0), 1),
        ])
    pm0 = [pore_model.PoreModelParams(scale=1.0, shift=1.0)] * 4
    st0 = [[[0.1, 0.3], [0.1, 0.3]]] * 4
    ev, mdl, pm_arr, st_arr = build_train_batch(groups, models, pm0, st0)
    cfg = train.EMConfig(K=K, train_drift=False, double_strand=True,
                         max_rounds=5, min_progress=-1e9)

    full = train.run_em(ev, mdl, pm_arr, st_arr, cfg)
    pm1, st1, fit1, rounds1, frozen1 = train.run_em(
        ev, mdl, pm_arr, st_arr, cfg, round_limit=2)
    keep = np.where(~frozen1)[0]
    if len(keep) == 0:
        return  # everything converged in 2 rounds; nothing to repack
    sub_ev = {k: np.asarray(v)[keep] for k, v in ev.items()}
    sub_mdl = {k: (np.asarray(v)[keep] if k == "model_idx" else v)
               for k, v in mdl.items()}
    out = train.run_em(
        sub_ev, sub_mdl, pm1[keep], st1[keep], cfg,
        state0=(fit1[keep], frozen1[keep], rounds1[keep]),
    )
    for a, b, name in zip(
        (full[0][keep], full[1][keep], full[2][keep], full[3][keep]),
        out[:4], ("pm", "st", "fit", "rounds"),
    ):
        assert np.allclose(np.asarray(a, np.float64),
                           np.asarray(b, np.float64),
                           rtol=1e-6, atol=1e-6), (name, a, b)


@pytest.mark.parametrize("train_drift", [True, False])
def test_fused_round_matches_legacy(train_drift):
    """The fused streaming EM round (one reverse scan carrying beta +
    both M-steps' sufficient statistics, train._fused_bwd_mstats) must
    agree with the legacy materialize-then-reduce formulation — same
    summands, different association — to float-reassociation tolerance,
    including padding rows, mixed strands, and a group with a
    below-min-length sequence."""
    import jax.numpy as jnp

    rng = np.random.default_rng(42)
    models = make_models(rng)
    g0 = [
        (sample_events(models[0], 25, rng), 0),
        (sample_events(models[0], 18, rng), 0),
        (sample_events(models[1], 22, rng), 1),
        (sample_events(models[1], 27, rng), 1),
    ]
    g1 = [
        (sample_events(models[0], 30, rng), 0),
        (sample_events(models[0], 1, rng), 0),  # length-1: no transitions
    ]
    pm = [
        pore_model.PoreModelParams(scale=1.05, shift=-1.0, drift=0.002),
        pore_model.PoreModelParams(scale=0.97, shift=0.5, drift=-0.001),
    ]
    st = [[[0.11, 0.29], [0.1, 0.3]], [[0.09, 0.31], [0.12, 0.28]]]
    ev, mdl, pm_arr, st_arr = build_train_batch([g0, g1], models, pm, st)

    kw = dict(K=K, train_drift=train_drift)
    args = (ev, mdl, jnp.asarray(pm_arr), jnp.asarray(st_arr))
    fused = train.train_one_round.__wrapped__(*args, **kw)
    assert not train._FORCE_LEGACY
    train._FORCE_LEGACY = True
    try:
        legacy = train.train_one_round.__wrapped__(*args, **kw)
    finally:
        train._FORCE_LEGACY = False

    np.testing.assert_allclose(fused["fit"], legacy["fit"],
                               rtol=1e-6, atol=1e-4)
    # raw moments agree to ~1.5e-7 relative (pure reassociation; verified
    # directly when this test was built); the 3x3 WLS solve amplifies
    # that through its conditioning, same as the existing oracle
    # tolerances (test_one_round_matches_oracle: 2e-3)
    np.testing.assert_allclose(fused["new_pm_params"],
                               legacy["new_pm_params"], rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(fused["new_st_params"],
                               legacy["new_st_params"], rtol=5e-3, atol=1e-4)
    assert np.array_equal(np.asarray(fused["done"]),
                          np.asarray(legacy["done"]))

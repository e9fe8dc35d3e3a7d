"""Dev-tool CLI tests (TSV golden pipeline, HACKING.org:9-24 style)."""

import numpy as np
import pytest

from nanocall_tpu import events, kmer, pore_model, tools, transitions

K = 3
N = kmer.n_states(K)


@pytest.fixture()
def tsv_fixtures(tmp_path):
    rng = np.random.default_rng(5)
    lm = rng.uniform(40, 90, N).astype(np.float32)
    pm = pore_model.PoreModel(
        level_mean=lm,
        level_stdv=rng.uniform(0.8, 2.0, N).astype(np.float32),
        sd_mean=rng.uniform(0.5, 1.5, N).astype(np.float32),
        sd_stdv=rng.uniform(0.1, 0.4, N).astype(np.float32),
        K=K,
    )
    pm_path = tmp_path / "model.tsv"
    pore_model.save_tsv(pm, pm_path)
    st = transitions.build_structured(K=K)
    st_path = tmp_path / "trans.tsv"
    transitions.save_tsv(st, st_path)
    T = 21
    ev = events.EventSequence(
        mean=rng.choice(lm, T) + rng.normal(0, 0.5, T),
        stdv=rng.uniform(0.5, 1.5, T),
        start=np.cumsum(rng.uniform(0.01, 0.05, T)),
        length=rng.uniform(0.01, 0.05, T),
    )
    ev_path = tmp_path / "events.tsv"
    events.save_tsv(ev, ev_path)
    return pm_path, st_path, ev_path


def test_run_viterbi(tsv_fixtures, capsys):
    pm_path, st_path, ev_path = tsv_fixtures
    rc = tools.main([
        "run-viterbi", "-p", str(pm_path), "-s", str(st_path), "-e", str(ev_path),
        "-K", str(K),
    ])
    assert rc == 0
    seq = capsys.readouterr().out.strip()
    assert len(seq) >= K
    assert set(seq) <= set("ACGT")


@pytest.mark.parametrize("custom", [False, True])
def test_run_fwbw(tsv_fixtures, capsys, custom):
    pm_path, st_path, ev_path = tsv_fixtures
    args = ["run-fwbw", "-p", str(pm_path), "-s", str(st_path), "-e", str(ev_path),
            "-K", str(K)]
    if custom:
        args.append("--custom-fwbw")
    rc = tools.main(args)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out  # at least one kmer with posterior >= 0.1
    probs = [float(l.split("\t")[1]) for l in out]
    assert all(0.1 <= p <= 1.0 + 1e-6 for p in probs)
    assert probs == sorted(probs, reverse=True)


def test_compute_state_transitions_roundtrip(tmp_path, capsys):
    out_path = tmp_path / "st.tsv"
    rc = tools.main([
        "compute-state-transitions", "--fast", "-t", "0.1", "-k", "0.3",
        "-o", str(out_path), "-K", str(K),
    ])
    assert rc == 0
    loaded = transitions.load_tsv(out_path, K)
    ref = transitions.build_structured(transitions.TransitionParams(0.1, 0.3), K)
    import oracle

    assert np.allclose(
        oracle.dense_logp(loaded, K), oracle.dense_logp(ref, K),
        atol=1e-5, equal_nan=True,
    )


def test_dense_vs_fast_tools(tmp_path):
    """The dense O(N^2) table restricted to the fast table's support matches."""
    fast_p = tmp_path / "fast.tsv"
    dense_p = tmp_path / "dense.tsv"
    tools.main(["compute-state-transitions", "--fast", "-o", str(fast_p), "-K", str(K)])
    tools.main(["compute-state-transitions", "-p", "0.0001", "-o", str(dense_p), "-K", str(K)])
    import oracle

    Mf = oracle.dense_logp(transitions.load_tsv(fast_p, K), K)
    Md = oracle.dense_logp(transitions.load_tsv(dense_p, K), K)
    both = np.isfinite(Mf) & np.isfinite(Md)
    assert np.allclose(Mf[both], Md[both], atol=1e-5)


def test_gzip_transparent_inputs(tsv_fixtures, tmp_path, capsys):
    """Model/transition/event TSVs may be gzip-compressed (zstr parity)."""
    import gzip
    import shutil

    pm_path, st_path, ev_path = tsv_fixtures
    gz = {}
    for name, p in [("pm", pm_path), ("st", st_path), ("ev", ev_path)]:
        gz_path = tmp_path / (p.name + ".gz")
        with open(p, "rb") as fi, gzip.open(gz_path, "wb") as fo:
            shutil.copyfileobj(fi, fo)
        gz[name] = gz_path
    rc = tools.main([
        "run-viterbi", "-p", str(gz["pm"]), "-s", str(gz["st"]),
        "-e", str(gz["ev"]), "-K", str(K),
    ])
    assert rc == 0
    seq_gz = capsys.readouterr().out.strip()
    rc = tools.main([
        "run-viterbi", "-p", str(pm_path), "-s", str(st_path),
        "-e", str(ev_path), "-K", str(K),
    ])
    assert rc == 0
    assert capsys.readouterr().out.strip() == seq_gz

"""fast5 I/O: read/write round-trips and basecall write-back."""

import numpy as np
import pytest

from nanocall_tpu import fast5_io, pore_model
from nanocall_tpu.cli import main as cli_main
from nanocall_tpu.models import load_builtin_models
from nanocall_tpu import simulate


def test_write_read_roundtrip(tmp_path):
    path = str(tmp_path / "x.fast5")
    rng = np.random.default_rng(0)
    mean = rng.uniform(40, 90, 100)
    stdv = rng.uniform(0.5, 1.5, 100)
    start = np.cumsum(rng.integers(10, 40, 100)).astype(float)
    length = rng.integers(10, 40, 100).astype(float)
    fast5_io.write_fast5(path, mean, stdv, start, length, sampling_rate=4321.0,
                         read_id="abc")
    assert fast5_io.is_valid_file(path)
    assert not fast5_io.is_valid_file(__file__)
    with fast5_io.Fast5File(path) as f:
        assert f.have_sampling_rate()
        assert f.get_sampling_rate() == 4321.0
        assert f.have_eventdetection_events("000")
        ed = f.get_eventdetection_events("000")
        assert ed.read_id == "abc"
        assert np.allclose(ed.mean, mean)
        assert np.allclose(ed.stdv, stdv)


def test_next_basecall_group():
    assert fast5_io.next_basecall_group([]) == "Nanocall_000"
    assert fast5_io.next_basecall_group(["Nanocall_000", "Other"]) == "Nanocall_001"
    assert (
        fast5_io.next_basecall_group(["Nanocall_000", "Nanocall_002"])
        == "Nanocall_001"
    )


def test_write_fast5_end_to_end(tmp_path):
    """--write-fast5 persists seq/events/model/params; a rerun reserves the
    next Nanocall group; compute-scaled-pore-model reads it back."""
    models = load_builtin_models("r73")
    rng = np.random.default_rng(7)
    d = tmp_path / "reads"
    d.mkdir()
    simulate.write_sim_fast5(
        d / "r.fast5", models, "r73.t.006", None, 300, rng, read_id="r",
        noise_scale=0.5,
    )
    rc = cli_main([str(d), "--write-fast5", "--no-train", "--1d", "--pore", "r73"])
    assert rc == 0
    import h5py

    with h5py.File(d / "r.fast5", "r") as f:
        g = f["/Analyses/Nanocall_000/BaseCalled_template"]
        fastq = g["Fastq"][()].decode()
        assert fastq.startswith("@r:r:0\n")
        seq = fastq.splitlines()[1]
        assert len(seq) > 100 and set(seq) <= set("ACGT")
        ev = g["Events"][()]
        assert len(ev) > 100
        assert ev["model_state"][0].decode() == seq[:6]
        mdl = g["Model"][()]
        assert len(mdl) == 4096
        assert g.attrs["scale"] > 0

    # rerun must not clobber: goes to Nanocall_001
    rc = cli_main([str(d), "--write-fast5", "--no-train", "--1d", "--pore", "r73"])
    assert rc == 0
    with h5py.File(d / "r.fast5", "r") as f:
        assert "Nanocall_001" in f["/Analyses"]

    # compute-scaled-pore-model reads the written model + params back
    from nanocall_tpu import tools

    out = tmp_path / "scaled.tsv"
    rc = tools.main([
        "compute-scaled-pore-model", "-f", str(d / "r.fast5"), "-s", "0",
        "-o", str(out),
    ])
    assert rc == 0
    spm = pore_model.load_tsv(out)
    assert spm.n_states == 4096


def test_write_fast5_one_bad_file_does_not_abort(tmp_path, monkeypatch, caplog):
    """Per-read graceful degradation on write-back: one failing fast5 write
    logs a warning and the remaining reads are still persisted
    (Fast5_Summary.hpp:379-437 semantics; previously one OSError aborted
    the run after basecalling, losing every other read's write-back)."""
    import logging

    import h5py

    from nanocall_tpu import output, read_pipeline, basecall
    from nanocall_tpu.config import Config

    models = load_builtin_models("r73")
    rng = np.random.default_rng(9)
    d = tmp_path / "reads"
    d.mkdir()
    for rid in ("a", "b"):
        simulate.write_sim_fast5(
            d / f"{rid}.fast5", models, "r73.t.006", None, 250, rng,
            read_id=rid, noise_scale=0.5,
        )
    cfg = Config(pore="r73", train=False, write_fast5=True,
                 scaling_select_threshold=np.inf).apply_pore_preset()
    cfg.template_only = True
    cfg.double_strand_scaling = False
    files = read_pipeline.init_files([str(d)])
    summaries = [read_pipeline.summarize(f, models, cfg) for f in files]
    results = basecall.basecall_reads(summaries, models, cfg)
    assert len(results) == 2

    real_open = fast5_io.Fast5File

    def failing_open(path, rw=False):
        if path.endswith("a.fast5") and rw:
            raise OSError("simulated locked file")
        return real_open(path, rw=rw)

    monkeypatch.setattr(fast5_io, "Fast5File", failing_open)
    with caplog.at_level(logging.WARNING):
        output.write_results_fast5(results, summaries, models, cfg)
    assert any("error writing basecalls" in r.getMessage()
               for r in caplog.records)
    with h5py.File(d / "b.fast5", "r") as f:
        assert "Nanocall_000" in f["/Analyses"]
    with h5py.File(d / "a.fast5", "r") as f:
        assert "Nanocall_000" not in f.get("/Analyses", {})


def test_ed_group_selection(tmp_path):
    """Multiple EventDetection groups: the default picks the smallest
    available NNN (reference --ed-group default, nanocall.cpp:56 /
    Fast5_Summary.hpp:174-184); an explicit group overrides.  Pins the
    --ed-group flag's read path."""
    import h5py

    path = str(tmp_path / "two_groups.fast5")
    rng = np.random.default_rng(3)
    m1 = rng.uniform(40, 90, 60)
    fast5_io.write_fast5(path, m1, np.ones(60), np.arange(60) * 20.0,
                         np.full(60, 20.0), read_id="r-a", ed_group="001")
    m2 = rng.uniform(40, 90, 40)
    with h5py.File(path, "a") as f:
        rg = f.create_group("/Analyses/EventDetection_002/Reads/Read_0")
        rg.attrs["read_id"] = np.bytes_(b"r-b")
        dt = np.dtype([("mean", "<f8"), ("stdv", "<f8"), ("start", "<i8"),
                       ("length", "<i8")])
        tbl = np.zeros(40, dtype=dt)
        tbl["mean"] = m2
        tbl["length"] = 20
        rg.create_dataset("Events", data=tbl)
    with fast5_io.Fast5File(path) as f:
        assert f.eventdetection_groups() == ["001", "002"]
        assert f.have_eventdetection_events()          # default resolves
        d_def = f.get_eventdetection_events()
        d_explicit = f.get_eventdetection_events("002")
        assert d_def.read_id == "r-a" and np.allclose(d_def.mean, m1)
        assert d_explicit.read_id == "r-b" and np.allclose(d_explicit.mean, m2)
        assert not f.have_eventdetection_events("007")


# ---------------------------------------------------------------------------
# adversarial real-world-layout fixtures (Fast5_Summary.hpp:138-319 error
# paths): each case pins the reference-parity skip/degrade behavior
# ---------------------------------------------------------------------------


def _events_dtype(*fields):
    return np.dtype([(f, "<f8") for f in fields])


def test_variance_dataset_reader_and_pipeline(tmp_path):
    """Real-world files store `variance` instead of `stdv`
    (fast5_io.get_eventdetection_events:133-137): the reader must take
    sqrt (negative variance clamped to 0), and a summarize over the
    variance twin must equal the stdv file exactly — including the
    stdv==0 -> 0.01 event clamp triggered by the clamped negative."""
    import h5py

    from nanocall_tpu import read_pipeline
    from nanocall_tpu.config import Config

    models = load_builtin_models("r73")
    rng = np.random.default_rng(17)
    p_std = tmp_path / "stdv.fast5"
    simulate.write_sim_fast5(p_std, models, "r73.t.006", None, 220, rng,
                             read_id="rv", noise_scale=0.5)
    p_var = tmp_path / "variance.fast5"
    with h5py.File(p_std, "r") as f:
        tbl = f["/Analyses/EventDetection_000/Reads/Read_0/Events"][()]
        sr = f["/UniqueGlobalKey/channel_id"].attrs["sampling_rate"]
    # the stdv twin must ALSO carry the zero (variance clamp -> stdv 0)
    tbl["stdv"][7] = 0.0
    with h5py.File(p_std, "r+") as f:
        rg = f["/Analyses/EventDetection_000/Reads/Read_0"]
        del rg["Events"]
        rg.create_dataset("Events", data=tbl)
    vt = np.zeros(len(tbl), dtype=_events_dtype(
        "mean", "variance", "start", "length"))
    vt["mean"] = tbl["mean"]
    vt["variance"] = tbl["stdv"] ** 2
    vt["variance"][7] = -1e-6  # negative variance -> clamped to stdv 0
    vt["start"] = tbl["start"]
    vt["length"] = tbl["length"]
    with h5py.File(p_var, "w") as f:
        f.create_group("/UniqueGlobalKey/channel_id").attrs[
            "sampling_rate"] = sr
        rg = f.create_group("/Analyses/EventDetection_000/Reads/Read_0")
        rg.attrs["read_id"] = np.bytes_(b"rv")
        rg.create_dataset("Events", data=vt)

    with fast5_io.Fast5File(str(p_var)) as f:
        ed = f.get_eventdetection_events()
    assert ed.stdv[7] == 0.0
    assert np.allclose(ed.stdv, tbl["stdv"], atol=1e-9)

    cfg = Config(pore="r73").apply_pore_preset()
    s_a, ev_a = read_pipeline.summarize(str(p_std), models, cfg,
                                        return_events=True)
    s_b, ev_b = read_pipeline.summarize(str(p_var), models, cfg,
                                        return_events=True)
    assert s_a.num_ed_events == s_b.num_ed_events > 0
    assert s_a.strand_bounds == s_b.strand_bounds
    for st in (0, 1):
        assert np.array_equal(ev_a[st].mean, ev_b[st].mean)
        assert np.array_equal(ev_a[st].stdv, ev_b[st].stdv)
        # the clamp must have fired somewhere if event 7 survived filtering
    assert s_a.pm_params.keys() == s_b.pm_params.keys()
    for k in s_a.pm_params:
        assert np.array_equal(s_a.pm_params[k].as_array(),
                              s_b.pm_params[k].as_array())


def test_missing_read_id_attr(tmp_path):
    """No read_id attribute at all -> empty string (callers fall back to
    file-name naming, Fast5_Summary.hpp:156-162)."""
    p = str(tmp_path / "noid.fast5")
    fast5_io.write_fast5(p, np.full(30, 60.0), np.ones(30),
                         np.arange(30) * 20.0, np.full(30, 20.0),
                         read_id="")
    with fast5_io.Fast5File(p) as f:
        assert f.get_eventdetection_events().read_id == ""


def test_empty_events_dataset_skipped(tmp_path, caplog):
    """A zero-row Events dataset must skip the read (num_ed_events == 0),
    not crash (too-few-events gate, Fast5_Summary.hpp:190-193)."""
    from nanocall_tpu import read_pipeline
    from nanocall_tpu.config import Config

    models = load_builtin_models("r73")
    p = str(tmp_path / "empty.fast5")
    fast5_io.write_fast5(p, np.zeros(0), np.zeros(0), np.zeros(0),
                         np.zeros(0), read_id="e")
    cfg = Config(pore="r73").apply_pore_preset()
    s = read_pipeline.summarize(p, models, cfg)
    assert s.num_ed_events == 0


def test_events_missing_stdv_and_variance_skipped(tmp_path, caplog):
    """A compound Events table with neither stdv nor variance is a corrupt
    layout: per-read catch-all skip (hpp:311-315), never an abort."""
    import logging

    import h5py

    from nanocall_tpu import read_pipeline
    from nanocall_tpu.config import Config

    models = load_builtin_models("r73")
    p = str(tmp_path / "nostdv.fast5")
    tbl = np.zeros(50, dtype=_events_dtype("mean", "start", "length"))
    tbl["mean"] = np.random.default_rng(0).uniform(40, 90, 50)
    tbl["length"] = 20.0
    with h5py.File(p, "w") as f:
        f.create_group("/UniqueGlobalKey/channel_id").attrs[
            "sampling_rate"] = 4000.0
        rg = f.create_group("/Analyses/EventDetection_000/Reads/Read_0")
        rg.create_dataset("Events", data=tbl)
    cfg = Config(pore="r73").apply_pore_preset()
    with caplog.at_level(logging.WARNING):
        s = read_pipeline.summarize(p, models, cfg)
    assert s.num_ed_events == 0
    assert any("fast5 error" in r.getMessage() for r in caplog.records)


def test_missing_events_dataset_skipped(tmp_path):
    """Read group exists but has no Events dataset -> skip, not abort."""
    import h5py

    from nanocall_tpu import read_pipeline
    from nanocall_tpu.config import Config

    models = load_builtin_models("r73")
    p = str(tmp_path / "noev.fast5")
    with h5py.File(p, "w") as f:
        f.create_group("/UniqueGlobalKey/channel_id").attrs[
            "sampling_rate"] = 4000.0
        f.create_group("/Analyses/EventDetection_000/Reads/Read_0")
    cfg = Config(pore="r73").apply_pore_preset()
    s = read_pipeline.summarize(p, models, cfg)
    assert s.num_ed_events == 0


def test_writeback_vanished_and_corrupt_files(tmp_path, caplog):
    """--write-fast5 with files that went bad AFTER basecalling (deleted
    by another process; truncated to garbage): each failing file logs a
    warning, every healthy file still gets its Nanocall group — real
    OS-level failures, no monkeypatching (Fast5_Summary.hpp:379-437)."""
    import logging
    import os

    import h5py

    from nanocall_tpu import basecall, output, read_pipeline
    from nanocall_tpu.config import Config

    models = load_builtin_models("r73")
    rng = np.random.default_rng(23)
    d = tmp_path / "reads"
    d.mkdir()
    for rid in ("wa", "wb", "wc"):
        simulate.write_sim_fast5(d / f"{rid}.fast5", models, "r73.t.006",
                                 None, 200, rng, read_id=rid,
                                 noise_scale=0.5)
    cfg = Config(pore="r73", train=False, write_fast5=True,
                 scaling_select_threshold=np.inf).apply_pore_preset()
    cfg.template_only = True
    cfg.double_strand_scaling = False
    files = read_pipeline.init_files([str(d)])
    summaries = [read_pipeline.summarize(f, models, cfg) for f in files]
    results = basecall.basecall_reads(summaries, models, cfg)
    assert len(results) == 3
    os.remove(d / "wa.fast5")
    with open(d / "wb.fast5", "wb") as fh:
        fh.write(b"\x89HDF\r\n\x1a\n garbage, not a real superblock")
    with caplog.at_level(logging.WARNING):
        output.write_results_fast5(results, summaries, models, cfg)
    warns = [r.getMessage() for r in caplog.records
             if "error writing basecalls" in r.getMessage()]
    assert len(warns) == 2
    with h5py.File(d / "wc.fast5", "r") as f:
        assert "Nanocall_000" in f["/Analyses"]


def test_ed_group_selection_pipeline(tmp_path):
    """--ed-group end to end: a file whose DEFAULT group (000) is a
    too-short junk read but whose EventDetection_005 holds the real data
    must skip under the default and decode under --ed-group 005."""
    import h5py

    from nanocall_tpu import read_pipeline
    from nanocall_tpu.config import Config

    models = load_builtin_models("r73")
    rng = np.random.default_rng(29)
    mean, stdv, start, length, _ = simulate.simulate_read(
        models, "r73.t.006", None, 250, rng, noise_scale=0.5)
    p = str(tmp_path / "multi.fast5")
    fast5_io.write_fast5(p, mean, stdv, start, length, read_id="m5",
                         ed_group="005")
    with h5py.File(p, "r+") as f:
        rg = f.create_group("/Analyses/EventDetection_000/Reads/Read_0")
        junk = np.zeros(5, dtype=_events_dtype(
            "mean", "stdv", "start", "length"))
        junk["mean"] = 60.0
        junk["length"] = 20.0
        rg.create_dataset("Events", data=junk)
    cfg = Config(pore="r73").apply_pore_preset()
    s_def = read_pipeline.summarize(p, models, cfg)
    assert s_def.num_ed_events == 0  # picked 000: 5 events < min
    cfg5 = Config(pore="r73", ed_group="005").apply_pore_preset()
    s_5 = read_pipeline.summarize(p, models, cfg5)
    assert s_5.num_ed_events > 0
    assert s_5.read_id == "m5"

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

"""Failure-mode robustness: bad inputs degrade gracefully per read
(Fast5_Summary failure handling, SURVEY.md section 5)."""

import numpy as np
import pytest

from nanocall_tpu import fast5_io, read_pipeline, simulate
from nanocall_tpu.config import Config
from nanocall_tpu.models import load_builtin_models


@pytest.fixture(scope="module")
def models():
    return load_builtin_models("r73")


def cfg():
    return Config(pore="r73").apply_pore_preset()


def test_corrupt_file_is_skipped(tmp_path, models):
    p = tmp_path / "bad.fast5"
    p.write_bytes(b"\x89HDF\r\n\x1a\n" + b"garbage" * 100)
    s = read_pipeline.summarize(str(p), models, cfg())
    assert s.num_ed_events == 0  # skipped, no exception


def test_corrupt_binary_input_does_not_abort_init_files(tmp_path):
    """A file with a DAMAGED HDF5 signature falls through to the fofn
    branch, which reads it as text: arbitrary binary garbage must yield an
    empty file list (its 'lines' name no valid files, like the reference's
    getline loop, nanocall.cpp:228-253), not a UnicodeDecodeError."""
    import numpy as np

    p = tmp_path / "truncated.fast5"
    rng = np.random.default_rng(5)
    p.write_bytes(b"\x00HDX" + rng.integers(0, 256, 4096,
                                            dtype=np.uint8).tobytes())
    assert read_pipeline.init_files([str(p)]) == []


def test_fofn_and_stdin_input_resolution(tmp_path, monkeypatch):
    """fofn files list fast5 paths one per line, and '-' reads the fofn
    from stdin (nanocall.cpp:198-261): blank lines and names of invalid
    files are skipped, order is preserved."""
    import io

    import numpy as np

    from nanocall_tpu import fast5_io

    f5s = []
    for i in range(2):
        p = str(tmp_path / f"r{i}.fast5")
        fast5_io.write_fast5(p, np.full(20, 60.0), np.ones(20),
                             np.arange(20) * 20.0, np.full(20, 20.0),
                             read_id=f"r{i}")
        f5s.append(p)
    bogus = tmp_path / "not_a_fast5.txt"
    bogus.write_text("hello\n")
    fofn = tmp_path / "reads.fofn"
    fofn.write_text(f"{f5s[1]}\n\n{bogus}\n{f5s[0]}\n")
    assert read_pipeline.init_files([str(fofn)]) == [f5s[1], f5s[0]]
    monkeypatch.setattr("sys.stdin", io.StringIO(f"{f5s[0]}\n{f5s[1]}\n"))
    assert read_pipeline.init_files(["-"]) == f5s


def test_missing_sampling_rate(tmp_path, models):
    import h5py

    p = str(tmp_path / "nosr.fast5")
    with h5py.File(p, "w") as f:
        f.create_group("/Analyses")
    s = read_pipeline.summarize(p, models, cfg())
    assert s.num_ed_events == 0


def test_bad_sampling_rate(tmp_path, models):
    rng = np.random.default_rng(0)
    p = str(tmp_path / "badsr.fast5")
    fast5_io.write_fast5(
        p, rng.uniform(40, 90, 200), rng.uniform(0.5, 1.5, 200),
        np.arange(200.0) * 20, np.full(200, 20.0), sampling_rate=99.0,
    )
    s = read_pipeline.summarize(p, models, cfg())
    assert s.num_ed_events == 0  # out of [1000, 10000] (hpp:168)


def test_too_few_events(tmp_path, models):
    rng = np.random.default_rng(0)
    p = str(tmp_path / "short.fast5")
    fast5_io.write_fast5(
        p, rng.uniform(40, 90, 30), rng.uniform(0.5, 1.5, 30),
        np.arange(30.0) * 20, np.full(30, 20.0),
    )
    s = read_pipeline.summarize(p, models, cfg())
    assert s.num_ed_events == 0  # < trims + min_ed_events


def test_max_ed_events_truncation(tmp_path, models):
    rng = np.random.default_rng(1)
    p = str(tmp_path / "long.fast5")
    fast5_io.write_fast5(
        p, rng.uniform(40, 90, 800), rng.uniform(0.5, 1.5, 800),
        np.arange(800.0) * 20, np.full(800, 20.0),
    )
    c = cfg()
    c.max_ed_events = 500
    s = read_pipeline.summarize(p, models, c)
    assert s.num_ed_events == 500  # truncated (hpp:510-524)


def test_abasic_level_too_low(tmp_path, models):
    # all event means ~0 -> abasic level <= 1 -> skip (hpp:193-200)
    p = str(tmp_path / "low.fast5")
    fast5_io.write_fast5(
        p, np.full(300, 0.5), np.full(300, 0.5),
        np.arange(300.0) * 20, np.full(300, 20.0),
    )
    c = cfg()
    c.abasic_level_top_offset = 0.0  # r9-style preset; r73's +5 keeps it > 1
    s = read_pipeline.summarize(p, models, c)
    assert s.num_ed_events == 0


def test_pipeline_mixed_good_and_bad(tmp_path, models):
    """Bad reads are skipped; good reads still basecall (nanocall.cpp:294)."""
    from nanocall_tpu import basecall

    rng = np.random.default_rng(5)
    d = tmp_path / "mix"
    d.mkdir()
    simulate.write_sim_fast5(
        d / "good.fast5", models, "r73.t.006", None, 300, rng,
        read_id="good", noise_scale=0.5,
    )
    (d / "bad.fast5").write_bytes(b"\x89HDF\r\n\x1a\n" + b"junk" * 64)
    c = cfg()
    c.train = False
    files = read_pipeline.init_files([str(d)])
    assert len(files) == 2
    summaries = [read_pipeline.summarize(f, models, c) for f in files]
    results = basecall.basecall_reads(summaries, models, c)
    assert len(results) == 1
    assert "good" in results[0].seq_name


def test_log_facility_levels():
    """--log spec semantics (nanocall.cpp:911-912): bare level sets the
    default; `facility:level` gates only that facility's logger."""
    import logging

    import pytest

    from nanocall_tpu import observe

    lvl = observe.set_levels_from_options(["Fast5_Summary:debug2"])
    assert lvl == logging.INFO  # default untouched
    fac = logging.getLogger("Fast5_Summary")
    assert fac.level == observe.DEBUG2
    assert fac.isEnabledFor(observe.DEBUG2)
    assert not logging.getLogger("nanocall").isEnabledFor(logging.DEBUG)

    lvl = observe.set_levels_from_options(["debug", "Viterbi:error"])
    assert lvl == logging.DEBUG
    assert logging.getLogger("Viterbi").level == logging.ERROR

    with pytest.raises(SystemExit):
        observe.set_levels_from_options(["nonsense"])
    with pytest.raises(SystemExit):
        observe.set_levels_from_options(["Viterbi:loud"])
    # reset facility levels so other tests are unaffected
    logging.getLogger("Fast5_Summary").setLevel(logging.NOTSET)
    logging.getLogger("Viterbi").setLevel(logging.NOTSET)


def test_read_context_annotates_exceptions():
    """Per-read failure context (global_assert.hpp:21-25): exceptions
    escaping a read's work carry the read id as an exception note."""
    import pytest

    from nanocall_tpu.observe import current_read, read_context

    assert current_read() == ""
    with pytest.raises(ValueError) as ei:
        with read_context("read-42"):
            assert current_read() == "read-42"
            raise ValueError("boom")
    assert any("read-42" in n for n in ei.value.__notes__)
    assert current_read() == ""


def test_zero_length_strand_decodes_to_empty_seq(models):
    """A strand task with zero events (every event filtered out) must yield
    an empty path and an empty base sequence — the compact traceback
    encoding must not materialize a spurious [path0] state for it."""
    from nanocall_tpu import basecall, simulate
    from nanocall_tpu.events import EventSequence
    from nanocall_tpu.pore_model import PoreModelParams
    from nanocall_tpu.transitions import TransitionParams

    c = cfg()
    pm = models["r73.t.006"]
    rng = np.random.default_rng(0)
    L = 50
    states = simulate.sample_state_walk_batch(1, L, 6, 0.1, 0.3, rng)[0]
    mean, stdv = simulate._emit(pm, states, PoreModelParams(), np.zeros(L), rng)
    ev0 = EventSequence(
        mean=mean.astype(np.float32), stdv=stdv.astype(np.float32),
        start=np.arange(L, dtype=np.float32) * 0.02,
        length=np.full(L, 0.02, np.float32),
    )
    ev1 = EventSequence(
        mean=np.zeros(0, np.float32), stdv=np.zeros(0, np.float32),
        start=np.zeros(0, np.float32), length=np.zeros(0, np.float32),
    )
    key = ("r73.t.006", "r73.c.p1.006")
    s = read_pipeline.ReadSummary(
        file_name="x.fast5", base_file_name="x.fast5", read_id="r0",
        valid=True, num_ed_events=L, scale_strands_together=True,
    )
    s.pm_params[key] = PoreModelParams()
    s.st_params[key] = [TransitionParams(0.1, 0.3), TransitionParams(0.1, 0.3)]
    tasks = [
        basecall.DecodeTask(0, 0, key, key[0], ev0),
        basecall.DecodeTask(0, 1, key, key[1], ev1),
    ]
    winners = basecall.run_decode_tasks(tasks, [s], models, c)
    t1 = next(t for t in winners if t.strand == 1)
    assert t1.path.shape == (0,)
    results = basecall.select_and_assemble(winners, [s], c)
    r1 = next(r for r in results if r.strand == 1)
    assert r1.base_seq == ""
    r0 = next(r for r in results if r.strand == 0)
    assert len(r0.base_seq) > 0

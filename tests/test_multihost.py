"""Multi-host partitioning and shard-merge logic (single-process tests)."""

import numpy as np
import pytest

from nanocall_tpu.parallel import multihost


def test_partition_contiguous_and_complete():
    files = [f"f{i}" for i in range(10)]
    parts = [multihost.partition_files(files, p, 3) for p in range(3)]
    assert sum(parts, []) == files  # contiguous + order-preserving
    assert all(len(p) <= 4 for p in parts)


def test_partition_more_hosts_than_files():
    files = ["a", "b"]
    parts = [multihost.partition_files(files, p, 4) for p in range(4)]
    assert sum(parts, []) == files


def test_shard_paths_and_merge(tmp_path):
    out = str(tmp_path / "out.fa")
    for pid in range(3):
        p = multihost.shard_output_path(out, pid, 3)
        assert p.endswith(f".shard{pid:04d}")
        with open(p, "w") as fh:
            fh.write(f">r{pid}\nACGT\n")
    multihost.merge_shards(out, 3)
    text = open(out).read()
    assert text == ">r0\nACGT\n>r1\nACGT\n>r2\nACGT\n"
    # shards cleaned up
    import os

    assert not os.path.exists(multihost.shard_output_path(out, 0, 3))


def test_single_host_passthrough():
    assert multihost.shard_output_path("x.fa", 0, 1) == "x.fa"


def test_multihost_cli_emulation(tmp_path):
    """Emulate a 2-host run by invoking the CLI twice with --num-hosts 2
    (no coordinator -> no distributed init), then verify host 0's merge
    equals a single-host run."""
    from nanocall_tpu import simulate
    from nanocall_tpu.cli import main as cli_main
    from nanocall_tpu.models import load_builtin_models

    models = load_builtin_models("r73")
    rng = np.random.default_rng(1)
    d = tmp_path / "reads"
    d.mkdir()
    for i in range(4):
        simulate.write_sim_fast5(
            d / f"r{i}.fast5", models, "r73.t.006", None, 200, rng,
            read_id=f"r{i}", noise_scale=0.5,
        )
    single = tmp_path / "single.fa"
    assert cli_main([str(d), "-o", str(single), "--no-train", "--1d"]) == 0

    multi_out = tmp_path / "multi.fa"
    # host 1 first (writes its shard), then host 0 (writes shard + merges)
    assert cli_main([str(d), "-o", str(multi_out), "--no-train", "--1d",
                     "--num-hosts", "2", "--host-id", "1"]) == 0
    assert cli_main([str(d), "-o", str(multi_out), "--no-train", "--1d",
                     "--num-hosts", "2", "--host-id", "0"]) == 0
    assert multi_out.read_text() == single.read_text()


def test_multihost_stats_shards_and_resume(tmp_path):
    """Operational flow: a 2-host trained run writes per-shard stats TSVs;
    each host can later resume decode-only from ITS shard and reproduce its
    half of the merged FASTA exactly (SURVEY.md section 5: per-shard
    FASTA + params manifest enables resume)."""
    from nanocall_tpu import simulate
    from nanocall_tpu.cli import main as cli_main
    from nanocall_tpu.models import load_builtin_models
    from nanocall_tpu.parallel import multihost

    models = load_builtin_models("r73")
    rng = np.random.default_rng(3)
    d = tmp_path / "reads"
    d.mkdir()
    for i in range(4):
        simulate.write_sim_fast5(
            d / f"r{i}.fast5", models, "r73.t.006", None, 250, rng,
            read_id=f"r{i}", noise_scale=0.5,
        )
    out = tmp_path / "multi.fa"
    stats = tmp_path / "stats.tsv"
    common = [str(d), "--pore", "r73", "--1d", "-o", str(out),
              "--stats", str(stats), "--num-hosts", "2"]
    assert cli_main([*common, "--host-id", "1"]) == 0
    assert cli_main([*common, "--host-id", "0"]) == 0
    merged = out.read_text()

    # per-shard stats exist and cover disjoint halves of the input
    shard_rows = []
    for hid in (0, 1):
        sp = multihost.shard_output_path(str(stats), hid, 2)
        rows = open(sp).read().strip().splitlines()
        assert rows[0].startswith("file_name")  # header
        shard_rows.append({r.split("\t")[1] for r in rows[1:]})
    assert shard_rows[0].isdisjoint(shard_rows[1])
    assert shard_rows[0] | shard_rows[1] == {f"r{i}" for i in range(4)}

    # decode-only resume per host from ITS stats shard (host 1 first, then
    # host 0 which merges) must reproduce the trained run's merged FASTA
    re_out = tmp_path / "re.fa"
    for hid in (1, 0):
        sp = multihost.shard_output_path(str(stats), hid, 2)
        rc = cli_main([str(d), "--pore", "r73", "--1d", "-o", str(re_out),
                       "--resume-stats", sp,
                       "--num-hosts", "2", "--host-id", str(hid)])
        assert rc == 0
    assert re_out.read_text() == merged


def test_merge_missing_shard_raises(tmp_path):
    """A missing shard means an unfinished host: merging must fail loudly
    rather than silently emit a truncated FASTA."""
    from nanocall_tpu.parallel import multihost

    out = tmp_path / "out.fa"
    p0 = multihost.shard_output_path(str(out), 0, 2)
    open(p0, "w").write(">a\nACGT\n")
    with pytest.raises(FileNotFoundError, match="shard"):
        multihost.merge_shards(str(out), 2)
    assert not out.exists() or open(p0).read()  # shard 0 not consumed


def test_merge_is_atomic_and_preserves_shards_on_failure(tmp_path,
                                                         monkeypatch):
    """An IO failure mid-merge must neither destroy already-copied shards
    nor leave a partial file under the final name (write-then-rename;
    shards removed only after the rename)."""
    import shutil

    out = str(tmp_path / "out.fa")
    for pid in range(2):
        open(multihost.shard_output_path(out, pid, 2), "w").write(
            f">r{pid}\nACGT\n")

    calls = {"n": 0}
    real = shutil.copyfileobj

    def failing_copy(src, dst):
        calls["n"] += 1
        if calls["n"] == 2:
            raise OSError("disk full")
        return real(src, dst)

    monkeypatch.setattr(shutil, "copyfileobj", failing_copy)
    with pytest.raises(OSError):
        multihost.merge_shards(out, 2)
    import os

    # no plausible-looking partial output NOR a stale partial .tmp; every
    # shard intact -> re-merge OK
    assert not os.path.exists(out)
    assert not os.path.exists(out + ".tmp")
    monkeypatch.undo()
    multihost.merge_shards(out, 2)
    assert open(out).read() == ">r0\nACGT\n>r1\nACGT\n"
    assert not os.path.exists(out + ".tmp")


def test_remove_stale_shard(tmp_path):
    """Each host clears its own shard at run start, so a leftover from a
    previous failed run cannot satisfy the merge's existence-means-
    complete check if this run crashes before writing."""
    out = str(tmp_path / "out.fa")
    p1 = multihost.shard_output_path(out, 1, 2)
    open(p1, "w").write(">stale\nAAAA\n")
    multihost.remove_stale_shard(out, 1, 2)
    import os

    assert not os.path.exists(p1)
    multihost.remove_stale_shard(out, 1, 2)  # idempotent on absence


def test_multihost_no_basecall_does_not_merge(tmp_path):
    """A training-only multi-host run writes no FASTA shards; host 0 must
    not attempt (and fail) the shard merge after a successful run."""
    from nanocall_tpu import simulate
    from nanocall_tpu.cli import main as cli_main
    from nanocall_tpu.models import load_builtin_models

    models = load_builtin_models("r73")
    rng = np.random.default_rng(4)
    d = tmp_path / "reads"
    d.mkdir()
    for i in range(2):
        simulate.write_sim_fast5(
            d / f"r{i}.fast5", models, "r73.t.006", None, 250, rng,
            read_id=f"r{i}", noise_scale=0.5,
        )
    stats = tmp_path / "stats.tsv"
    common = [str(d), "--pore", "r73", "--1d", "--no-basecall",
              "--stats", str(stats), "--num-hosts", "2"]
    assert cli_main([*common, "--host-id", "1"]) == 0
    assert cli_main([*common, "--host-id", "0"]) == 0  # no merge crash
    for hid in (0, 1):
        assert (tmp_path / f"stats.tsv.shard{hid:04d}").exists()

"""Multi-host partitioning and shard-merge logic (single-process tests)."""

import numpy as np

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

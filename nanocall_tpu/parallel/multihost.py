"""Multi-host (pod-slice) execution: file sharding + output merging.

Pod-scale streaming (SURVEY.md §7, BASELINE.json config 5): each host
process runs the full pipeline over its shard of the input fast5 files
(reads are independent — pure data parallelism over DCN-free work), writes
a shard FASTA, and host 0 merges shards in global input order so the final
FASTA matches a single-host run ordering (the reference's ordered-chunk
contract, nanocall.cpp:859-861).

Per-host device parallelism (DataSharder over local devices) composes
underneath; no cross-host collectives are required for basecalling, and EM
statistics reduce per-read (SURVEY.md §2.10).
"""

from __future__ import annotations

import os

import jax


def init_distributed(coordinator: str, num_processes: int, process_id: int) -> None:
    """Initialize JAX multi-process runtime (call before any jax op)."""
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def partition_files(files: list, process_id: int, num_processes: int) -> list:
    """Contiguous partition of the input file list for one host.

    Contiguous (not round-robin) so each shard's FASTA is a contiguous run
    of the global input order and the merge is a simple concatenation.
    """
    n = len(files)
    per = (n + num_processes - 1) // num_processes
    return files[process_id * per : (process_id + 1) * per]


def shard_output_path(output: str, process_id: int, num_processes: int) -> str:
    if num_processes <= 1:
        return output
    base = output or "out.fa"
    return f"{base}.shard{process_id:04d}"


def merge_shards(output: str, num_processes: int, cleanup: bool = True) -> None:
    """Concatenate shard FASTAs into the final output (host 0 only).

    A missing shard raises rather than silently truncating the merged
    output — a host that produced no shard means the run is incomplete
    (empty inputs still write an empty shard file)."""
    shards = [
        shard_output_path(output, pid, num_processes)
        for pid in range(num_processes)
    ]
    missing = [s for s in shards if not os.path.exists(s)]
    if missing:
        raise FileNotFoundError(
            f"cannot merge {output}: missing shard(s) {missing} — did every "
            f"host finish its run?"
        )
    import shutil

    with open(output, "wb") as out:
        for shard in shards:
            with open(shard, "rb") as fh:
                shutil.copyfileobj(fh, out)  # constant memory per shard
            if cleanup:
                os.remove(shard)


def barrier(name: str = "nanocall") -> None:
    """Cross-host synchronization point."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)

"""Bucketed batching of variable-length decode/training work.

Reads (and their per-model decode candidates) vary from tens to 100k
events.  To keep XLA compilation cached and the TPU fed, tasks are grouped
into power-of-two length buckets; each bucket runs with a fixed batch size
(padded with dummy zero-length elements), so the total number of compiled
(T, B) shapes stays small.
"""

from __future__ import annotations

import math


MIN_BUCKET = 128


def bucket_length(n_events: int, min_bucket: int = MIN_BUCKET) -> int:
    """Smallest power-of-two bucket >= n_events."""
    return max(min_bucket, 1 << math.ceil(math.log2(max(n_events, 1))))


def batch_size_for(T: int, max_batch: int, mem_budget_bytes: int, n_states: int) -> int:
    """Cap the bucket batch size so the Viterbi backpointer tensor
    (B x T x n_states uint8) stays within budget."""
    by_mem = max(1, mem_budget_bytes // (T * n_states))
    return max(1, min(max_batch, by_mem))


def make_buckets(lengths, max_batch: int, mem_budget_bytes: int, n_states: int,
                 align: int = 1):
    """Group task indices into (T, [chunks of indices]) buckets.

    Returns list of (padded_T, batch_size, [index_chunks]); every chunk has
    exactly batch_size slots (the caller pads short chunks with dummies).
    `align` rounds the batch size up to a multiple (e.g. the data-parallel
    device count, so each shard gets equal work).
    """
    groups: dict[int, list[int]] = {}
    for i, L in enumerate(lengths):
        groups.setdefault(bucket_length(L), []).append(i)
    out = []
    for T in sorted(groups):
        idxs = groups[T]
        B = batch_size_for(T, max_batch, mem_budget_bytes, n_states)
        # don't pad small buckets up to the full batch: use the next power of
        # two >= occupancy (keeps the compiled-shape set small without
        # wasting compute on dummy lanes)
        B = min(B, 1 << (len(idxs) - 1).bit_length() if idxs else 1)
        B = ((B + align - 1) // align) * align
        chunks = [idxs[i : i + B] for i in range(0, len(idxs), B)]
        out.append((T, B, chunks))
    return out

"""Small host-side utilities."""

from __future__ import annotations

import gzip
import io


def zopen(path, mode: str = "rt"):
    """zlib-transparent open (the reference reads every text input through
    zstr streams, accepting plain or gzip files; SURVEY.md section 2.9)."""
    path = str(path)
    with open(path, "rb") as probe:
        magic = probe.read(2)
    if magic == b"\x1f\x8b":
        return gzip.open(path, mode)
    return open(path, mode)

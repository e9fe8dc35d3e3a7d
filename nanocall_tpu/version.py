"""Version stamping with git-describe parity.

The reference bakes `package_version` at build time via
src/get-dir-version:6-21 with the fallback chain
git describe -> VERSION file -> directory-name -> "unknown".  Python
packages resolve versions at import, so the same chain runs here (cached);
a generated _version.py (written by builds/CI) short-circuits everything.
"""

from __future__ import annotations

import functools
import pathlib
import subprocess

FALLBACK = "0.1.0"


@functools.lru_cache(maxsize=1)
def get_version() -> str:
    pkg_dir = pathlib.Path(__file__).resolve().parent
    root = pkg_dir.parent
    # 1. build-time stamp (CI / docker write this file)
    try:
        from . import _version  # type: ignore

        return _version.version
    except ImportError:
        pass
    # 2. git describe (get-dir-version:8-12) — only if the working copy the
    # package sits in is actually THIS project's checkout (a wheel installed
    # into a venv that happens to live inside some other git repo must not
    # describe that repo)
    try:
        top = subprocess.run(
            ["git", "rev-parse", "--show-toplevel"],
            cwd=root, capture_output=True, text=True, timeout=5,
        )
        if (
            top.returncode == 0
            and pathlib.Path(top.stdout.strip()).resolve() == root
        ):
            r = subprocess.run(
                ["git", "describe", "--tags", "--always", "--dirty"],
                cwd=root, capture_output=True, text=True, timeout=5,
            )
            if r.returncode == 0 and r.stdout.strip():
                return f"{FALLBACK}+{r.stdout.strip()}"
    except (OSError, subprocess.TimeoutExpired):
        pass
    # 3. VERSION file (get-dir-version:14-16)
    vf = root / "VERSION"
    if vf.is_file():
        return vf.read_text().strip()
    # 4. static fallback (directory-name step degenerates to this here)
    return FALLBACK


def write_version_file(path: str | pathlib.Path | None = None) -> str:
    """Bake the resolved version into nanocall_tpu/_version.py (the
    build-time equivalent of the reference's generated version.cpp)."""
    v = get_version()
    path = path or pathlib.Path(__file__).resolve().parent / "_version.py"
    pathlib.Path(path).write_text(f'version = "{v}"\n')
    return v

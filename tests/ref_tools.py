"""Build the REAL reference dev tools from /root/reference sources.

The reference's compute core is header-only; its vendored submodules
(fast5, hpptools, tclap) are empty directories in the snapshot, so the
tools cannot be built as shipped.  tests/ref_shims/ provides ~300 lines of
reconstructed submodule headers (logger/logsumset/zstr/alg/fast5/tclap),
which is enough to compile the three TSV-only dev tools:

    run-viterbi               (run-viterbi.cpp:38-57)
    run-fwbw                  (run-fwbw.cpp:60-93)
    compute-state-transitions (compute-state-transitions.cpp:30-49)

These binaries ARE the reference implementation (Viterbi.hpp,
Forward_Backward*.hpp, State_Transitions.hpp compiled verbatim), giving
the golden-file contract of HACKING.org:9-24 against the actual C++ code
rather than a transcription.
"""

from __future__ import annotations

import hashlib
import pathlib
import shutil
import subprocess

REPO = pathlib.Path(__file__).resolve().parents[1]
REF_SRC = pathlib.Path("/root/reference/src/nanocall")
SHIMS = REPO / "tests" / "ref_shims"
BUILD = REPO / "build" / "ref_tools"
TOOLS = ("run-viterbi", "run-fwbw", "compute-state-transitions")


def _dep_hash(extra_paths=(), extra_tokens=()) -> str:
    """Content hash over everything a reference-tool build depends on
    (shim headers + reference headers + the named sources + the compile
    flags), so the build/ cache survives across sessions and checkouts
    (git resets mtimes; content does not lie)."""
    h = hashlib.sha256()
    deps = sorted(
        [p for p in SHIMS.rglob("*") if p.is_file() and p.suffix != ".pyc"]
        + list(REF_SRC.glob("*.hpp"))
    ) + [pathlib.Path(p) for p in extra_paths]
    for p in deps:
        h.update(str(p).encode())
        h.update(p.read_bytes())
    for t in extra_tokens:
        h.update(t.encode())
    return h.hexdigest()


def _stale(exe: pathlib.Path, want_hash: str) -> bool:
    stamp = exe.with_suffix(".stamp")
    return not (
        exe.exists() and stamp.exists() and stamp.read_text() == want_hash
    )


def _stamp(exe: pathlib.Path, h: str) -> None:
    exe.with_suffix(".stamp").write_text(h)


GOLDEN_SKIP_TAG = "[golden-skip]"


def golden_unavailable(reason: str):
    """Skip (or FAIL) a reference-binary golden test whose fixture is
    unavailable.

    The golden tests are the single most important conformance evidence;
    a silent skip green-lights a run in which they never executed.  Two
    loudness levels:
    - NANOCALL_REQUIRE_GOLDENS=1 (or an available /root/reference tree,
      auto-detected in conftest.py) -> pytest.fail: the suite goes RED.
    - otherwise -> pytest.skip with GOLDEN_SKIP_TAG, which conftest.py
      counts and surfaces as a prominent terminal-summary warning (and a
      GitHub Actions ::warning:: annotation in CI).
    """
    import os

    import pytest

    if os.environ.get("NANOCALL_REQUIRE_GOLDENS"):
        pytest.fail(
            f"reference-binary goldens REQUIRED but unavailable: {reason} "
            f"(unset NANOCALL_REQUIRE_GOLDENS to run without them)",
            pytrace=False,
        )
    pytest.skip(f"{GOLDEN_SKIP_TAG} {reason}")


def build_ref_tools() -> dict[str, str] | None:
    """Compile the reference dev tools; returns {name: exe path}, or None
    when the reference tree / compiler is unavailable (tests skip)."""
    if not REF_SRC.is_dir() or shutil.which("g++") is None:
        return None
    BUILD.mkdir(parents=True, exist_ok=True)
    out = {}
    for t in TOOLS:
        exe = BUILD / t
        src = REF_SRC / f"{t}.cpp"
        want = _dep_hash(extra_paths=[src], extra_tokens=["-O2 c++11"])
        if _stale(exe, want):
            cmd = [
                "g++", "-O2", "-std=c++11",
                f"-I{SHIMS}", f"-I{REF_SRC}",
                "-o", str(exe), str(src),
            ]
            r = subprocess.run(cmd, capture_output=True, text=True)
            if r.returncode != 0:
                raise RuntimeError(
                    f"failed to build reference tool {t}:\n{r.stderr[:4000]}"
                )
            _stamp(exe, want)
        out[t] = str(exe)
    return out


def run_tool(exe: str, *args: str) -> str:
    """Run a compiled reference tool, returning stdout (raises on failure)."""
    r = subprocess.run(
        [exe, *args], capture_output=True, text=True, timeout=600
    )
    if r.returncode != 0:
        raise RuntimeError(f"{exe} failed ({r.returncode}): {r.stderr[:2000]}")
    return r.stdout


def parse_fasta(text: str) -> dict:
    """FASTA text -> {record name: sequence}; ignores pre-header lines."""
    recs, name = {}, None
    for line in text.splitlines():
        if line.startswith(">"):
            name = line[1:]
            recs[name] = ""
        elif name is not None:
            recs[name] += line.strip()
    return recs

def parse_writeback(path: str) -> dict:
    """Parse a `<bundle>.wb.tsv` sidecar written by the shimmed fast5::File's
    add_basecall_* methods (tests/ref_shims/fast5.hpp) into
    {strand: {"grp", "seq_name", "qual", "seq", "events", "model",
    "params"}}; events rows are (mean, stdv, start, length, model_state,
    move), model rows are (kmer, level_mean, level_stdv, sd_mean, sd_stdv),
    params is the 6-float scaling vector."""
    out: dict = {}
    with open(path) as fh:
        lines = fh.read().splitlines()
    i = 0
    while i < len(lines):
        f = lines[i].split("\t")
        st = int(f[1])
        rec = out.setdefault(st, {})
        if f[0] == "seq":
            rec["grp"], rec["seq_name"] = f[2], f[3]
            rec["qual"], rec["seq"] = int(f[4]), f[5]
            i += 1
        elif f[0] == "events":
            n = int(f[3])
            rows = [lines[i + 1 + j].split("\t") for j in range(n)]
            assert all(r[0] == "ev" for r in rows)
            rec["events"] = [
                (float(r[1]), float(r[2]), float(r[3]), float(r[4]),
                 r[5], int(r[6]))
                for r in rows
            ]
            i += 1 + n
        elif f[0] == "model":
            n = int(f[3])
            rows = [lines[i + 1 + j].split("\t") for j in range(n)]
            assert all(r[0] == "pm" for r in rows)
            rec["model"] = [
                (r[1], float(r[2]), float(r[3]), float(r[4]), float(r[5]))
                for r in rows
            ]
            i += 1 + n
        elif f[0] == "params":
            rec["params"] = [float(x) for x in f[3:9]]
            i += 1
        else:
            raise ValueError(f"bad wb record: {lines[i][:80]}")
    return out


REF_BUILTIN = pathlib.Path("/root/reference/src/builtin_models")


def build_ref_nanocall_dump() -> str | None:
    """Like build_ref_nanocall, but compiled with -DDUMP_TRAINING_DATA: the
    binary dumps emissions/transitions/fw/bw TSVs into its CWD on the first
    fill_train_data call and abort()s (Parameter_Trainer.hpp:157-221) —
    the golden source for our --dump-training-data output."""
    return build_ref_nanocall(dump_training_data=True)


def build_ref_nanocall(dump_training_data: bool = False) -> str | None:
    """Compile the FULL reference `nanocall` binary from /root/reference
    sources against the shim headers (fast5 -> f5txt text bundles, serial
    pfor, extended tclap/alg/logger; see tests/ref_shims/).  This is the
    reference's entire driver — nanocall.cpp + Builtin_Model.cpp compiled
    verbatim — enabling whole-pipeline FASTA/stats golden tests.

    Returns the exe path, or None when unavailable (tests skip)."""
    if not REF_SRC.is_dir() or shutil.which("g++") is None:
        return None
    BUILD.mkdir(parents=True, exist_ok=True)
    exe = BUILD / ("nanocall_dump" if dump_training_data else "nanocall")
    srcs = [REF_SRC / "nanocall.cpp", REF_SRC / "Builtin_Model.cpp"]
    want = _dep_hash(
        extra_paths=srcs + sorted(REF_BUILTIN.glob("*.inl")),
        extra_tokens=["-O2 c++11 pthread", f"dump={dump_training_data}"],
    )
    if _stale(exe, want):
        cmd = [
            "g++", "-O2", "-std=c++11", "-pthread",
            f"-I{SHIMS}", f"-I{REF_SRC}", f"-I{REF_BUILTIN}",
            *(["-DDUMP_TRAINING_DATA"] if dump_training_data else []),
            "-o", str(exe), *[str(s) for s in srcs],
        ]
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=600)
        if r.returncode != 0:
            raise RuntimeError(
                f"failed to build reference nanocall:\n{r.stderr[:6000]}"
            )
        _stamp(exe, want)
    return str(exe)


def export_f5txt(fast5_path: str, out_path: str) -> None:
    """Export a fast5's EventDetection data as the f5txt text bundle the
    shimmed fast5::File reads (tests/ref_shims/fast5.hpp), so the reference
    binary consumes the IDENTICAL event arrays our h5py reader returns."""
    from nanocall_tpu import fast5_io

    with fast5_io.Fast5File(fast5_path) as f:
        ed = f.get_eventdetection_events()
    with open(out_path, "w") as fh:
        fh.write("#nanocall-f5txt v1\n")
        fh.write(f"sampling_rate {float(ed.sampling_rate)!r}\n")
        fh.write(f"read_id {ed.read_id}\n")
        fh.write(f"n_events {len(ed.mean)}\n")
        for m, s, st, ln in zip(ed.mean, ed.stdv, ed.start, ed.length):
            # repr of python floats round-trips the doubles exactly
            fh.write(f"{float(m)!r} {float(s)!r} {float(st)!r} {float(ln)!r}\n")

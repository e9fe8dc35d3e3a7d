#!/usr/bin/env python
"""Basecall accuracy characterization on simulated reads.

Simulates template reads from the builtin R7.3 model at several emission
noise levels, runs the full pipeline (train + basecall), and reports mean
sequence identity vs the generative truth.  Identity is bounded below 1
even at zero noise because skip moves (p_skip=0.3) hide bases the 6-mer
overlap cannot fully recover.

With --ref, the same simulated reads are ALSO run through the compiled
reference `nanocall` binary (tests/ref_tools.build_ref_nanocall, consuming
f5txt bundles exported from the identical event arrays) and its identity
to the generative truth is reported alongside — a direct check that the
rebuild's accuracy equals the reference's on shared inputs.

Usage: python tools/accuracy_report.py [--cpu] [--reads N] [--ref]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true", help="force CPU execution")
    ap.add_argument("--reads", type=int, default=6)
    ap.add_argument("--events", type=int, default=400)
    ap.add_argument("--noises", default="0.3,0.5,0.7,1.0")
    ap.add_argument("--ref", action="store_true",
                    help="also score the compiled reference binary")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from nanocall_tpu import basecall, read_pipeline, simulate
    from nanocall_tpu.config import Config
    from nanocall_tpu.models import load_builtin_models

    ref_exe = None
    if args.ref:
        sys.path.insert(0, "tests")
        import ref_tools

        ref_exe = ref_tools.build_ref_nanocall()
        if ref_exe is None:
            print("reference tree/compiler unavailable", file=sys.stderr)
            return

    models = load_builtin_models("r73")
    report = {}
    for noise in [float(x) for x in args.noises.split(",")]:
        rng = np.random.default_rng(0)
        with tempfile.TemporaryDirectory() as d:
            truths = {}
            for i in range(args.reads):
                truths[f"r{i}"] = simulate.write_sim_fast5(
                    os.path.join(d, f"r{i}.fast5"), models, "r73.t.006", None,
                    args.events, rng, read_id=f"r{i}", noise_scale=noise,
                )
            cfg = Config(pore="r73").apply_pore_preset()
            files = read_pipeline.init_files([d])
            summaries = [read_pipeline.summarize(f, models, cfg) for f in files]
            basecall.train_reads(summaries, models, cfg)
            results = basecall.basecall_reads(summaries, models, cfg)
            idents = []
            for r in results:
                rid = summaries[r.read_idx].read_id
                if rid in truths and r.strand == 0:
                    idents.append(
                        simulate.identity(r.base_seq, truths[rid].base_seqs[0])
                    )
            ref_idents = []
            if ref_exe is not None:
                import ref_tools

                bundles = []
                for f in files:
                    b = f + ".f5txt"
                    ref_tools.export_f5txt(f, b)
                    bundles.append(b)
                fa = ref_tools.run_tool(ref_exe, "--pore", "r73", *bundles)
                for name, seq in ref_tools.parse_fasta(fa).items():
                    rid = name.split(":")[0]
                    if rid in truths and name.endswith(":0"):
                        ref_idents.append(
                            simulate.identity(seq, truths[rid].base_seqs[0])
                        )
        report[noise] = {
            "mean_identity": round(float(np.mean(idents)), 4),
            "min_identity": round(float(np.min(idents)), 4),
            "n": len(idents),
        }
        if ref_idents:
            report[noise]["ref_mean_identity"] = round(float(np.mean(ref_idents)), 4)
            report[noise]["ref_min_identity"] = round(float(np.min(ref_idents)), 4)
        print(f"noise={noise}: {report[noise]}", file=sys.stderr)
    print(json.dumps(report))


if __name__ == "__main__":
    main()

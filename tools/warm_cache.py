#!/usr/bin/env python
"""Pre-compile the standard kernel shapes into the persistent XLA cache.

The remote-TPU compile path costs minutes per shape; this warms the cache
for the shapes the pipeline/bench use so production runs start fast.
Run once per machine: python tools/warm_cache.py [--quick]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax  # noqa: E402

    from nanocall_tpu import train, transitions  # noqa: E402
    from nanocall_tpu.models import load_builtin_models  # noqa: E402
    from nanocall_tpu.observe import enable_compilation_cache  # noqa: E402
    from nanocall_tpu.ops import hmm  # noqa: E402

    enable_compilation_cache()
    models = load_builtin_models("r73")
    m = models["r73.t.006"]
    gt = hmm.make_grouped_trans(transitions.TransitionParams(), 6)
    rng = np.random.default_rng(0)

    def decode_args(B, T):
        model = hmm.make_model_arrays(
            np.tile(m.level_mean, (B, 1)), np.tile(m.level_stdv, (B, 1)),
            np.tile(m.sd_mean, (B, 1)), np.tile(m.sd_lambda, (B, 1)))
        stdv = rng.uniform(0.5, 1.5, (B, T)).astype(np.float32)
        ev = {"mean": rng.uniform(40, 90, (B, T)).astype(np.float32),
              "stdv": stdv, "log_stdv": np.log(stdv),
              "length": np.full(B, T, np.int32)}
        return model, ev

    # batched grouped tables variant (pipeline path: per-task tables)
    def decode_args_batched_tables(B, T):
        model, ev = decode_args(B, T)
        stay, step, skip = transitions.grouped_tables(
            np.full(B, 0.1), np.full(B, 0.3), 6
        )
        gtb = hmm.GroupedTrans(stay_lp=stay, step_lp=step, skip_lp=skip, K=6)
        return gtb, model, ev

    shapes = [(256, 4096, True), (256, 4096, False)]
    if not args.quick:
        for T in (2048, 4096, 6144, 8192):
            for B in (8, 64):
                shapes += [(B, T, True), (B, T, False)]

    for B, T, with_path in shapes:
        t0 = time.time()
        gtb, model, ev = decode_args_batched_tables(B, T)
        jax.jit(
            hmm.viterbi_decode_grouped.__wrapped__, static_argnames=("with_path",)
        ).lower(gtb, model, ev, with_path=with_path).compile()
        print(f"decode B={B} T={T} path={with_path}: {time.time()-t0:.0f}s",
              flush=True)

    # training shape (G=64, S=4, T=128), both drift modes
    G, S, T = 64, 4, 128
    stdv = rng.uniform(0.5, 1.5, (G, S, T)).astype(np.float32)
    ev = {"mean": rng.uniform(40, 90, (G, S, T)).astype(np.float32),
          "stdv": stdv, "log_stdv": np.log(stdv),
          "start": np.cumsum(np.full((G, S, T), .02, np.float32), -1),
          "length": np.full((G, S), T, np.int32),
          "strand": np.tile(np.array([0, 0, 1, 1], np.int32), (G, 1)),
          "valid": np.ones((G, S), bool)}
    mdl = {"level_mean": np.tile(m.level_mean, (G, 2, 1)),
           "level_stdv": np.tile(m.level_stdv, (G, 2, 1)),
           "sd_mean": np.tile(m.sd_mean, (G, 2, 1)),
           "sd_lambda": np.tile(m.sd_lambda, (G, 2, 1))}
    pm0 = np.tile(np.array([1, 0, 0, 1, 1, 1], np.float32), (G, 1))
    st0 = np.tile(np.array([.1, .3], np.float32), (G, 2, 1))
    for drift in (True, False):
        t0 = time.time()
        jax.jit(
            train.train_one_round.__wrapped__,
            static_argnames=("K", "train_drift", "train_scaling",
                             "train_transitions"),
        ).lower(ev, mdl, pm0, st0, K=6, train_drift=drift).compile()
        print(f"train G={G} S={S} T={T} drift={drift}: {time.time()-t0:.0f}s",
              flush=True)
    print("cache warm done")


if __name__ == "__main__":
    main()

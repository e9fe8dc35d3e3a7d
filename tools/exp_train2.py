"""TPU experiment: full EM round cost vs group-batch size.

tools/exp_train.py measured the E-step fwbw alone (1.9x better per-event
at 512 rows); this times jitted train_one_round — E-step + M-step +
stopping outputs — at G=64/128/256 (S=4, T=128), which is what the
while_loop body actually costs per round.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from nanocall_tpu.observe import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from nanocall_tpu import train  # noqa: E402
from nanocall_tpu.models import load_builtin_models  # noqa: E402

S, T = 4, 128
N_ITER = 8
models_all = load_builtin_models("r73")
pm = models_all["r73.t.006"]
pmc = models_all["r73.c.p1.006"]
n = pm.level_mean.shape[0]
rng = np.random.default_rng(0)

results = {}
for G in (64, 128, 256):
    ev = {
        "mean": rng.uniform(40, 90, (G, S, T)).astype(np.float32),
        "stdv": rng.uniform(0.5, 1.5, (G, S, T)).astype(np.float32),
        "start": np.cumsum(
            rng.uniform(0.01, 0.05, (G, S, T)).astype(np.float32), axis=-1),
        "length": np.full((G, S), T, np.int32),
        "strand": np.tile(np.array([0, 0, 1, 1], np.int32), (G, 1)),
        "valid": np.ones((G, S), bool),
    }
    ev["log_stdv"] = np.log(ev["stdv"])
    mdl = {
        "level_mean": np.stack([pm.level_mean, pmc.level_mean])[None].repeat(4, 0),
        "level_stdv": np.stack([pm.level_stdv, pmc.level_stdv])[None].repeat(4, 0),
        "sd_mean": np.stack([pm.sd_mean, pmc.sd_mean])[None].repeat(4, 0),
        "sd_lambda": np.stack([pm.sd_lambda, pmc.sd_lambda])[None].repeat(4, 0),
        "model_idx": np.zeros(G, np.int32),
    }
    mdl = {k: np.ascontiguousarray(v, np.float32) if k != "model_idx" else v
           for k, v in mdl.items()}
    pm0 = np.tile(np.array([1, 0, 0, 1, 1, 1], np.float32), (G, 1))
    st0 = np.full((G, 2, 2), [0.1, 0.3], np.float32)

    fn = jax.jit(train.train_one_round, static_argnames=(
        "K", "train_drift", "train_scaling", "train_transitions"))

    def call():
        return fn(ev, mdl, pm0, st0, K=6)

    t0 = time.time()
    jax.device_get(call())
    print(f"G={G} compile+first: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    outs = [call() for _ in range(N_ITER)]
    for o in outs:
        jax.device_get(o)
    dt = (time.time() - t0) / N_ITER
    results[f"round_G{G}"] = {
        "ms": round(dt * 1e3, 1),
        "events_per_s": round(G * S * T / dt),
    }
    print(json.dumps({f"round_G{G}": results[f"round_G{G}"]}), flush=True)

print(json.dumps(results))

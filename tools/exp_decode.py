"""TPU experiment: decode throughput vs scan unroll factors.

Run on the real chip:  python tools/exp_decode.py
Times by np.asarray fetch (block_until_ready is a no-op on this backend);
first call per variant excluded (deferred remote compile).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from nanocall_tpu.observe import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from nanocall_tpu import transitions  # noqa: E402
from nanocall_tpu.models import load_builtin_models  # noqa: E402
from nanocall_tpu.ops import hmm  # noqa: E402

B, T = 256, 4096
N_ITER = 4

models = load_builtin_models("r73")
pm = models["r73.t.006"]
gt = hmm.make_grouped_trans(transitions.TransitionParams(), 6)
rng = np.random.default_rng(0)
model = hmm.make_model_arrays(
    np.tile(pm.level_mean, (B, 1)), np.tile(pm.level_stdv, (B, 1)),
    np.tile(pm.sd_mean, (B, 1)), np.tile(pm.sd_lambda, (B, 1)),
)
stdv = rng.uniform(0.5, 1.5, (B, T)).astype(np.float32)
ev = {
    "mean": rng.uniform(40.0, 90.0, (B, T)).astype(np.float32),
    "stdv": stdv,
    "log_stdv": np.log(stdv),
    "length": np.full(B, T, np.int32),
}
ev = {k: jax.device_put(v) for k, v in ev.items()}


def timeit(fn, fetch):
    out = fetch(fn())  # warm (compile)
    t0 = time.time()
    for _ in range(N_ITER):
        out = fetch(fn())
    dt = (time.time() - t0) / N_ITER
    return dt, out


variants = [
    ("fwd_only", dict(with_path=False), lambda o: np.asarray(o["logp"])),
    ("decode_tb1", dict(with_path=True, tb_unroll=1), lambda o: np.asarray(o["path"])),
    ("decode_tb8", dict(with_path=True, tb_unroll=8), lambda o: np.asarray(o["path"])),
    ("decode_tb32", dict(with_path=True, tb_unroll=32), lambda o: np.asarray(o["path"])),
    ("decode_f2_tb8", dict(with_path=True, fwd_unroll=2, tb_unroll=8),
     lambda o: np.asarray(o["path"])),
]

results = {}
ref_path = None
for name, kw, fetch in variants:
    t0 = time.time()
    dt, out = timeit(lambda: hmm.viterbi_decode_grouped(gt, model, ev, **kw), fetch)
    compile_s = time.time() - t0 - dt * N_ITER
    ev_s = B * T / dt
    results[name] = {
        "ms": round(dt * 1e3, 1),
        "events_per_s": round(ev_s),
        "compile_s": round(compile_s, 1),
    }
    print(json.dumps({name: results[name]}), flush=True)
    if name.startswith("decode"):
        if ref_path is None:
            ref_path = out
        else:
            assert np.array_equal(ref_path, out), f"{name} paths differ!"

print(json.dumps(results))

"""TPU experiment: fwbw_grouped scan unroll at EM-training shapes (B=G*S=256, T=128).

The EM E-step's cost is the two fwbw scans (exp/log-heavy bodies).  The
Viterbi forward gained 1.9x from unroll=2; this measures the same knob on
fwbw at the production train shape (B = G*S = 256, T = 1024).
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from nanocall_tpu.observe import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nanocall_tpu import transitions  # noqa: E402
from nanocall_tpu.models import load_builtin_models  # noqa: E402
from nanocall_tpu.ops import hmm  # noqa: E402

import os
B = int(os.environ.get("EXPB", 256))
T = 128
N_ITER = 8

models = load_builtin_models("r73")
pm = models["r73.t.006"]
gtf = hmm.make_grouped_full_device(
    jnp.full(B, 0.1, jnp.float32), jnp.full(B, 0.3, jnp.float32), 6)
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


@functools.partial(jax.jit, static_argnames=("unroll",))
def run(gtf, model, ev, unroll=1):
    fb = hmm.fwbw_grouped(gtf, model, ev, keep_emissions=True, unroll=unroll)
    # reduce to small outputs (keep the big tensors internal, like EM does)
    return {
        "lpd": fb["log_pr_data"],
        "post_sum": jnp.sum(fb["alpha"] + fb["beta"], axis=(1, 2)),
    }


results = {}
ref = None
for u in (1, 2, 4):
    fn = lambda: run(gtf, model, ev, unroll=u)
    t0 = time.time()
    out = jax.device_get(fn())
    print(f"u={u} compile+first: {time.time()-t0:.1f}s", flush=True)
    if ref is None:
        ref = out
    else:
        assert np.allclose(out["lpd"], ref["lpd"], rtol=0, atol=0), "lpd drift"
        assert np.array_equal(out["post_sum"], ref["post_sum"]), "post drift"
    t0 = time.time()
    outs = [fn() for _ in range(N_ITER)]
    for o in outs:
        jax.device_get(o)
    dt = (time.time() - t0) / N_ITER
    results[f"fwbw_u{u}"] = {
        "ms": round(dt * 1e3, 1), "events_per_s": round(B * T / dt)}
    print(json.dumps({f"fwbw_u{u}": results[f"fwbw_u{u}"]}), flush=True)

print(json.dumps(results))

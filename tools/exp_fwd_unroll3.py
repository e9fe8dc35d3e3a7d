"""TPU experiment: forward-scan unroll=3 (the untried point).

Round-2 measured fwd unroll=2 1.9x faster than 1 and unroll=4 regressing
(register/VMEM spills) at B=256 x T=4096; unroll=3 was never measured.
A/B at the production decode shape (B=128 x T=8192, compact codes),
interleaved within the same relay windows, timed by fetching the codes
(np.asarray) per CLAUDE.md (block_until_ready does not sync here).
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

B, T = 128, 8192
N_REP = 3

pm = load_builtin_models("r73")["r73.t.006"]
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


def run(u):
    out = hmm.viterbi_decode_grouped(gt, model, ev, with_path=True,
                                     fwd_unroll=u, compact_path=True)
    codes = np.asarray(out["codes"])  # fetch = the only reliable sync
    return codes, float(np.asarray(out["logp"]).sum())


print("warmup (compiles unroll=3 if cold)...", flush=True)
ref_codes, ref_lp = run(2)
t0 = time.time()
codes3, lp3 = run(3)
print(f"unroll=3 first exec {time.time()-t0:.0f}s", flush=True)
assert np.array_equal(ref_codes, codes3) and ref_lp == lp3, "output drift!"

res = {2: [], 3: []}
for rep in range(N_REP):
    for u in (2, 3):  # interleaved: same-window pairs
        t0 = time.time()
        run(u)
        dt = time.time() - t0
        res[u].append(round(dt * 1000, 1))
        print(f"rep{rep} unroll={u}: {dt*1000:.1f} ms", flush=True)
print(json.dumps({"shape": [B, T], "ms": res,
                  "best": {u: min(v) for u, v in res.items()}}))

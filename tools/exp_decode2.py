"""TPU experiment 2: decode component split + sustained (pipelined) rates."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from nanocall_tpu.observe import enable_compilation_cache

enable_compilation_cache()

import functools  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nanocall_tpu import transitions  # noqa: E402
from nanocall_tpu.models import load_builtin_models  # noqa: E402
from nanocall_tpu.ops import hmm  # noqa: E402

B, T = 256, 4096
N_ITER = 8

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


@functools.partial(jax.jit, static_argnames=("unroll",))
def fwd_with_bp(gt, model, ev, unroll=1):
    fa, bps = hmm.viterbi_forward_grouped(gt, model, ev, unroll=unroll)
    # force bps to be a real output without shipping 4.3 GB: checksum row
    return jnp.max(fa, axis=-1), bps[-1, :, 0]


@functools.partial(jax.jit, static_argnames=())
def decode_gather_tb(gt, model, ev):
    """Traceback via take_along_axis gather instead of one-hot reduction."""
    fa, bps = hmm.viterbi_forward_grouped(gt, model, ev, unroll=2)
    Tm = bps.shape[0]
    lengths = ev["length"]
    end_state = jnp.argmax(fa, axis=-1).astype(jnp.int32)
    logp = jnp.max(fa, axis=-1)

    def step(s, x):
        bp_t, t = x
        s_eff = jnp.where(t == lengths - 1, end_state, s)
        k = jnp.take_along_axis(bp_t, s_eff[:, None].astype(jnp.int32), axis=1)[:, 0]
        s_prev = hmm.grouped_from_state(k, s_eff, gt.K)
        s_new = jnp.where(t <= lengths - 1, s_prev, s_eff)
        return s_new, s_eff.astype(jnp.uint16)

    xs = (bps, jnp.arange(1, Tm + 1))
    s0, path_rest = jax.lax.scan(step, end_state, xs, reverse=True)
    path = jnp.concatenate([s0[None].astype(jnp.uint16), path_rest], axis=0)
    return {"path": jnp.moveaxis(path, 0, 1), "logp": logp}


def timeit_seq(fn, fetch):
    out = fetch(fn())
    t0 = time.time()
    for _ in range(N_ITER):
        out = fetch(fn())
    return (time.time() - t0) / N_ITER, out


def timeit_pipe(fn, fetch):
    fetch(fn())
    t0 = time.time()
    outs = [fn() for _ in range(N_ITER)]
    for o in outs:
        fetch(o)
    return (time.time() - t0) / N_ITER


results = {}


def report(name, dt, extra=""):
    results[name] = {"ms": round(dt * 1e3, 1), "events_per_s": round(B * T / dt)}
    print(json.dumps({name: results[name], "note": extra}), flush=True)


# component split
dt, _ = timeit_seq(lambda: fwd_with_bp(gt, model, ev),
                   lambda o: np.asarray(o[1]))
report("fwd_with_bp_u1", dt)
dt, _ = timeit_seq(lambda: fwd_with_bp(gt, model, ev, unroll=2),
                   lambda o: np.asarray(o[1]))
report("fwd_with_bp_u2", dt)
# gather traceback variant
ref = np.asarray(hmm.viterbi_decode_grouped(gt, model, ev, fwd_unroll=2)["path"])
dt, out = timeit_seq(lambda: decode_gather_tb(gt, model, ev),
                     lambda o: np.asarray(o["path"]))
assert np.array_equal(np.asarray(out), ref), "gather tb mismatch"
report("decode_gather_tb_f2", dt)
# unroll 4 forward
dt, out = timeit_seq(
    lambda: hmm.viterbi_decode_grouped(gt, model, ev, fwd_unroll=4, tb_unroll=8),
    lambda o: np.asarray(o["path"]))
assert np.array_equal(np.asarray(out), ref)
report("decode_f4_tb8", dt)
# sustained/pipelined rates
dt = timeit_pipe(
    lambda: hmm.viterbi_decode_grouped(gt, model, ev, fwd_unroll=2, tb_unroll=8),
    lambda o: np.asarray(o["path"]))
report("decode_f2_tb8_pipelined", dt)
dt = timeit_pipe(
    lambda: hmm.viterbi_decode_grouped(gt, model, ev, with_path=False),
    lambda o: np.asarray(o["logp"]))
report("fwd_only_pipelined", dt)

print(json.dumps(results))

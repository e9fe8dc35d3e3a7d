"""Where does the EM round's 79 ms go?  (round-5 measurement)

bench.py --em measured train_one_round at 79 ms/round over (G=128, S=4,
T=128, n=4096) = 0.83 M event-rounds/s — ~15% of the modeled HBM ceiling
and far under the decode forward's per-step efficiency.  Time the round's
pieces as separate device programs (device-only timing: back-to-back
dispatches, tiny fetch):

  A. fwbw_grouped E-step alone (keep_emissions=True, the production form)
  B. train_one_round with train_transitions=False (E-step + scaling M-step)
  C. train_one_round full (adds _train_st_params)
  D. run_em_device per-round (the while_loop program, = bench --em)

C-B isolates the transition M-step; B-A the scaling M-step; D-C the
while_loop/stopping overhead.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def dev_time(fn, fetch_tiny, n_iter=4):
    """Median-of-2 device-only ms per call."""
    fetch_tiny(fn())  # warm
    reps = []
    for _ in range(2):
        t0 = time.time()
        outs = [fn() for _ in range(n_iter)]
        fetch_tiny(outs[-1])
        reps.append((time.time() - t0) / n_iter * 1e3)
    return min(reps)


def main():
    from nanocall_tpu import train
    from nanocall_tpu.observe import enable_compilation_cache
    from nanocall_tpu.ops import hmm

    enable_compilation_cache()
    import bench

    # reuse the bench's batch builder by importing its internals
    import functools

    em_inputs = {}

    real_run_em = train.run_em

    def capture_run_em(*a, **kw):
        em_inputs["args"] = (a, kw)
        return real_run_em(*a, **kw)

    train.run_em = capture_run_em
    try:
        res = bench.measure_em(rounds=8, n_iter=3, reps=1, with_mfu=False)
    finally:
        train.run_em = real_run_em
    print(f"D. run_em_device: {res['ms_per_round']:.1f} ms/round "
          f"(windows {res['rep_ms_per_round']})", flush=True)
    (ev, mdl, pm0, st0, em_cfg), kw = em_inputs["args"]
    G, S, T = ev["mean"].shape
    n = 4096

    import jax.numpy as jnp

    # device-resident inputs: numpy args would re-upload ~1 MB per
    # dispatch through the relay (~50 ms), swamping the variant deltas
    # (the first version of this experiment made exactly that mistake)
    ev = {k: jnp.asarray(v) for k, v in ev.items()}
    mdl = {k: jnp.asarray(v) for k, v in mdl.items()}
    pm_j = jnp.asarray(pm0)
    st_j = jnp.asarray(st0)

    one_round = functools.partial(
        train.train_one_round, ev, mdl, K=6,
        train_drift=bool(em_cfg.train_drift),
    )

    t_full = dev_time(
        lambda: one_round(pm_params=pm_j, st_params=st_j),
        lambda o: np.asarray(o["fit"]))
    print(f"C. train_one_round full: {t_full:.1f} ms", flush=True)

    t_nost = dev_time(
        lambda: one_round(pm_params=pm_j, st_params=st_j,
                          train_transitions=False),
        lambda o: np.asarray(o["fit"]))
    print(f"B. no st M-step: {t_nost:.1f} ms (st_mstep ~ "
          f"{t_full - t_nost:.1f} ms)", flush=True)

    t_fit = dev_time(
        lambda: one_round(pm_params=pm_j, st_params=st_j,
                          train_scaling=False, train_transitions=False),
        lambda o: np.asarray(o["fit"]))
    print(f"A~. fit only (E-step, no posteriors kept): {t_fit:.1f} ms "
          f"(scaling M-step ~ {t_nost - t_fit:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()

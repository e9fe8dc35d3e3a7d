"""EM round cost: prologue (tables+gathers) vs the fwbw scans themselves.

exp_em_breakdown measured: fit-only (fwd scan + prologue) 77.5 ms, full
round 98.5 ms, while the bwd scan + posteriors + stats einsum added only
3.3 ms — so ~75 ms is COMMON to every variant: the per-round prologue
(scale_arrays, grouped transition tables, and 9 take_along_axis gathers
(G,2,n) -> (G,S,n)) and/or the forward scan.  Time them separately:

  P. prologue only: build scaled models + grouped tables + gathers,
     return a checksum of the flat arrays
  F. fwbw_grouped alone on PRE-BUILT flat inputs at (B=512, T=128)
  F2. same but keep_emissions + alpha/beta materialized (the E-step form)
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def dev_time(fn, fetch, n_iter=4):
    fetch(fn())
    reps = []
    for _ in range(2):
        t0 = time.time()
        outs = [fn() for _ in range(n_iter)]
        fetch(outs[-1])
        reps.append((time.time() - t0) / n_iter * 1e3)
    return min(reps)


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from nanocall_tpu import train, transitions
    from nanocall_tpu.observe import enable_compilation_cache
    from nanocall_tpu.ops import hmm
    from nanocall_tpu.pore_model import scale_arrays

    enable_compilation_cache()
    import bench

    em_inputs = {}
    real_run_em = train.run_em

    def capture(*a, **kw):
        em_inputs["args"] = (a, kw)
        return real_run_em(*a, **kw)

    train.run_em = capture
    try:
        bench.measure_em(rounds=2, n_iter=1, reps=1, with_mfu=False)
    finally:
        train.run_em = real_run_em
    (ev, mdl, pm0, st0, _), _ = em_inputs["args"]
    G, S, T = ev["mean"].shape
    n = 4096
    K = 6
    ev = {k: jnp.asarray(v) for k, v in ev.items()}
    mdl = {k: jnp.asarray(v) for k, v in mdl.items()}
    pm_j = jnp.asarray(pm0)
    st_j = jnp.asarray(st0)

    @jax.jit
    def prologue(ev, mdl, pm_params, st_params):
        models = {
            k: mdl[k][mdl["model_idx"]]
            for k in ("level_mean", "level_stdv", "sd_mean", "sd_lambda")
        }
        lm_s, ls_s, sm_s, slam_s = scale_arrays(
            models["level_mean"], models["level_stdv"],
            models["sd_mean"], models["sd_lambda"], pm_params[:, None, :],
        )
        stay_t, step_t, skip_t = transitions.grouped_tables(
            st_params[..., 0], st_params[..., 1], K, xp=jnp)
        step_to_t, skip_to_t = transitions.grouped_tables_to(
            st_params[..., 0], st_params[..., 1], K, xp=jnp)
        st_idx = ev["strand"][:, :, None]

        def sel(a):
            return jnp.take_along_axis(a, st_idx, axis=1)

        parts = [sel(x) for x in (lm_s, ls_s, sm_s, slam_s, stay_t, step_t,
                                  skip_t, step_to_t, skip_to_t)]
        drift = pm_params[:, 2][:, None, None]
        corrected = ev["mean"] - drift * ev["start"]
        return sum(jnp.sum(p) for p in parts) + jnp.sum(corrected)

    t_p = dev_time(lambda: prologue(ev, mdl, pm_j, st_j),
                   lambda o: np.asarray(o))
    print(f"P. prologue (tables+9 gathers+drift): {t_p:.1f} ms", flush=True)

    # pre-built flat inputs for the bare E-step
    B = G * S
    rng = np.random.default_rng(0)
    model_flat = hmm.make_model_arrays(
        *[jnp.asarray(rng.uniform(0.5, 2.0, (B, n)).astype(np.float32))
          for _ in range(4)])
    gtf = hmm.GroupedTransFull(
        *[jnp.asarray(np.log(rng.uniform(0.1, 0.9, (B, n))).astype(np.float32))
          for _ in range(5)], K=K)
    ev_flat = {
        "mean": ev["mean"].reshape(B, T),
        "stdv": ev["stdv"].reshape(B, T),
        "log_stdv": ev["log_stdv"].reshape(B, T),
        "length": ev["length"].reshape(B),
    }

    fw_fit = jax.jit(functools.partial(hmm.fwbw_grouped))

    @jax.jit
    def fit_only(gtf, model, evf):
        return hmm.fwbw_grouped(gtf, model, evf)["log_pr_data"]

    t_f = dev_time(lambda: fit_only(gtf, model_flat, ev_flat),
                   lambda o: np.asarray(o))
    print(f"F. fwbw fit-only (fwd scan, bwd+mats DCE'd): {t_f:.1f} ms",
          flush=True)

    @jax.jit
    def estep_full(gtf, model, evf):
        fb = hmm.fwbw_grouped(gtf, model, evf, keep_emissions=True)
        # force all three (B, T, n) tensors to materialize
        return (jnp.sum(fb["alpha"]) + jnp.sum(fb["beta"]) + jnp.sum(fb["em"])
                + jnp.sum(fb["log_pr_data"]))

    t_f2 = dev_time(lambda: estep_full(gtf, model_flat, ev_flat),
                    lambda o: np.asarray(o))
    print(f"F2. full fwbw, alpha/beta/em materialized: {t_f2:.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()

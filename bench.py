"""Headline benchmark: log-prob evaluations/sec/chip on a 10^4-star catalog.

Runs the ConstantFit ensemble (the reference's per-bin workload, bin/run.py:186-189)
with W walkers on N stars: one sampler step performs W walker-lnprob evaluations
(two half-ensemble updates), all fused into a single XLA computation via lax.scan.

The reference publishes no numbers (BASELINE.md); the recorded baseline is the
north-star target of 1e7 evals/sec/chip, so vs_baseline = evals_per_sec / 1e7.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from mcmc_dynamics_tpu import units as u
    from mcmc_dynamics_tpu.models import ConstantFit
    from mcmc_dynamics_tpu.sampler import init_state, run_ensemble
    from mcmc_dynamics_tpu.utils import DataReader

    n_stars = 10_000
    n_walkers = 16384
    n_steps = 300

    ra_c, dec_c = 56.345, -26.675
    rng = np.random.default_rng(0)
    data = DataReader({
        "ra": u.Quantity(ra_c + 0.03 * rng.normal(size=n_stars), "deg"),
        "dec": u.Quantity(dec_c + 0.03 * rng.normal(size=n_stars), "deg"),
        "v": u.Quantity(5.0 * rng.normal(size=n_stars), "km/s"),
        "verr": u.Quantity(0.5 + 0.5 * rng.random(n_stars), "km/s"),
    })
    params = ConstantFit.default_parameters()
    params["ra_center"].set(value=ra_c, fixed=True)
    params["dec_center"].set(value=dec_c, fixed=True)
    fit = ConstantFit(data, parameters=params)

    pos = np.column_stack([
        rng.normal(0, 1, n_walkers),
        np.exp(rng.normal(1.8, 0.2, n_walkers)),
        rng.normal(0, 3, n_walkers),
        rng.normal(0, 3, n_walkers),
    ])

    def measure(lnprob, walkers=n_walkers):
        reps = max(1, walkers // n_walkers)
        pos_w = np.concatenate([pos] * reps, axis=0)[:walkers]
        state = init_state(lnprob, jnp.asarray(pos_w, dtype=fit.dtype),
                           jax.random.PRNGKey(0), batched=True)
        # warm-up compiles the scan (store only final state: pure throughput)
        res = run_ensemble(lnprob, state, n_steps=n_steps, store_chain=False,
                           batched=True)
        _ = np.asarray(res.final.coords)
        t0 = time.perf_counter()
        res = run_ensemble(lnprob, res.final, n_steps=n_steps, store_chain=False,
                           batched=True)
        _ = np.asarray(res.final.coords)
        return walkers * n_steps / (time.perf_counter() - t0)

    # A/B/C the production paths; report the best (selection is a config knob):
    # - sufficient: exact weighted-moment tables, O(1)/walker (the default)
    # - pallas:     fused walker x star VMEM kernel
    # - xla:        broadcast + XLA fusion
    import os
    import sys
    rates = {}
    # the O(1)-per-walker path is sampler-machinery bound: give it a bigger ensemble
    rates["sufficient"] = measure(fit.build_lnprob_sufficient(), walkers=131072)
    os.environ["MCMC_TPU_LNPROB"] = "direct"
    rates["pallas"] = measure(fit.build_lnprob_batched())
    os.environ["MCMC_TPU_DISABLE_PALLAS"] = "1"
    rates["xla"] = measure(fit.build_lnprob_batched())
    del os.environ["MCMC_TPU_DISABLE_PALLAS"], os.environ["MCMC_TPU_LNPROB"]
    print({k: round(v, 1) for k, v in rates.items()}, file=sys.stderr)
    evals_per_sec = max(rates.values())
    print(json.dumps({
        "metric": "lnprob evals/sec/chip (ConstantFit on 1e4 stars; best of sufficient/pallas/xla paths)",
        "value": round(evals_per_sec, 1),
        "unit": "evals/s",
        "vs_baseline": round(evals_per_sec / 1.0e7, 4),
    }))


if __name__ == "__main__":
    main()

"""On-device rate + accuracy probe for the JAM polar-grid tier.

Measures, on the real TPU in float32, sampler-inclusive lnprob rates of the
direct JAM path vs the polar-grid tier at several catalog sizes, plus their
on-device lnL agreement.  Two-point (dispatch-free) measurement — see
bench.py._measure.

    python tools/probe_jam_grid_tpu.py [n_stars ...]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [1000, 4096, 16384, 65536]

    import jax
    import jax.numpy as jnp

    from bench import _measure, _mock_catalog
    from mcmc_dynamics_tpu import units as u
    from mcmc_dynamics_tpu.models import Axisymmetric
    from mcmc_dynamics_tpu.utils import MgeReader, Table

    rng = np.random.default_rng(2)
    lum = MgeReader(Table({"i": u.Quantity([5000.0, 1000.0], "solLum/pc2"),
                           "s": u.Quantity([10.0, 40.0], "arcsec"),
                           "q": [0.9, 0.85]}), lum=True)
    mass = MgeReader(Table({"i": u.Quantity([5000.0, 1000.0], "solMass/pc2"),
                            "s": u.Quantity([10.0, 40.0], "arcsec"),
                            "q": [0.9, 0.85]}), lum=False)

    n_walkers = 512
    for n_stars in sizes:
        data, ra_c, dec_c = _mock_catalog(n_stars, rng)
        params = Axisymmetric.default_parameters()
        for name, val in dict(d=5.0, beta=0.0, mbh=0.0, ra_center=ra_c,
                              dec_center=dec_c, rbh=1.0, delta_v=0.0).items():
            params[name].set(value=val, fixed=True)
        params["mlr"].set(value=2.0, min=0.1, max=10.0, fixed=False)
        params["barq"].set(value=0.4, fixed=False)
        params["kappa_x"].set(value=0.5, min=-2.0, max=2.0, fixed=False)
        params["kappa_y"].set(value=0.0, min=-2.0, max=2.0, fixed=False)
        fit = Axisymmetric(data, mge_mass=mass, mge_lum=lum, parameters=params)
        free = fit.compiled.free_names
        d = {"mlr": rng.uniform(1.5, 2.5, n_walkers),
             "barq": rng.uniform(0.41, 0.45, n_walkers),
             "kappa_x": rng.uniform(0.3, 0.7, n_walkers),
             "kappa_y": rng.uniform(-0.1, 0.1, n_walkers)}
        pos = np.column_stack([d[n] for n in free])
        steps = max(8, min(100, 4_000_000 // (n_stars * n_walkers // 64)))

        out = {}
        for mode in ("direct", "grid"):
            os.environ["MCMC_TPU_JAM"] = mode
            fn = fit.build_lnprob_batched()
            lp = np.asarray(fn(jnp.asarray(pos, fit.dtype)))
            out[mode] = lp
            rate = _measure(fn, pos, fit.dtype, n_steps=steps, repeats=2)
            print(f"N={n_stars:6d} {mode:6s} steps={steps:3d} "
                  f"rate={rate:10.1f} evals/s")
        diff = np.abs(out["grid"] - out["direct"])
        finite = np.isfinite(out["direct"]) & np.isfinite(out["grid"])
        both_inf = (~np.isfinite(out["direct"])) & (~np.isfinite(out["grid"]))
        print(f"          lnL agreement: max|d| "
              f"{diff[finite].max() if finite.any() else float('nan'):.3f}, "
              f"finite {int(finite.sum())}/{n_walkers}, "
              f"inf-matched {int(both_inf.sum())}")


if __name__ == "__main__":
    main()

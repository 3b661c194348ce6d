"""On-device rate + accuracy probe: ChemoProfiles through the polar-grid tier.

Each population is a separate grid solve (theta0 = 0), so the expected win is
the same per-population star/grid ratio as the Axisymmetric probe
(tools/probe_jam_grid_tpu.py).  Two-point dispatch-free measurement.

    python tools/probe_chemo_grid_tpu.py [n_stars ...]
"""

import math
import os
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    sizes = [int(s) for s in sys.argv[1:]] or [4096, 16384]

    import jax.numpy as jnp

    from bench import _measure
    from mcmc_dynamics_tpu import units as u
    from mcmc_dynamics_tpu.models import ChemoProfiles
    from mcmc_dynamics_tpu.utils import DataReader, MgeReader, Table

    ra_c, dec_c = 56.345, -26.675
    lum = MgeReader(Table({"i": u.Quantity([5000.0, 800.0], "solLum/pc2"),
                           "s": u.Quantity([10.0, 40.0], "arcsec"),
                           "q": [0.9, 0.9], "pop": [0, 1]}), lum=True)
    mass = MgeReader(Table({"i": u.Quantity([5000.0, 800.0], "solMass/pc2"),
                            "s": u.Quantity([10.0, 40.0], "arcsec"),
                            "q": [0.9, 0.9]}), lum=False)

    n_walkers = 256
    rng = np.random.default_rng(3)
    for n_stars in sizes:
        r = np.abs(rng.normal(0, 40, n_stars)) + 1.0
        phi = rng.uniform(-np.pi, np.pi, n_stars)
        x, y = r * np.cos(phi), r * np.sin(phi)
        ra = ra_c - (x / 3600.0) / math.cos(math.radians(dec_c))
        dec = dec_c + y / 3600.0
        pop = rng.random(n_stars) < 0.6
        feh = np.where(pop, -0.5, 0.2) + 0.1 * rng.normal(size=n_stars)
        data = DataReader({
            "ra": u.Quantity(ra, "deg"), "dec": u.Quantity(dec, "deg"),
            "v": u.Quantity(3.0 * rng.normal(size=n_stars), "km/s"),
            "verr": u.Quantity(np.full(n_stars, 0.3), "km/s"),
            "feh": feh, "feherr": np.full(n_stars, 0.05)})

        params = ChemoProfiles.default_parameters(2)
        fixed = dict(d=5.0, mlr_0=2.0, mlr_t=2.0, mlr_inf=2.0, r_mlr=20.0,
                     barq=0.5, beta=0.0, ra_center=ra_c, dec_center=dec_c,
                     mu_feh_b=0.2, sigma_feh_b=0.1, kappa_max_b=-0.2,
                     logr_kappa_b=math.log10(30.0 / 60.0), h_ab=0.2,
                     sigma_feh_a=0.12, logr_kappa_a=math.log10(20.0 / 60.0))
        for name, val in fixed.items():
            params[name].set(value=val, fixed=True)
        params["kappa_max_a"].set(fixed=False, min=-2.0, max=2.0)
        params["mu_feh_a"].set(fixed=False, min=-1.0, max=1.0)
        params["h_aa"].set(fixed=False, min=0.0, max=1.0)

        steps = max(6, min(60, 2_000_000 // (n_stars * n_walkers // 64)))
        # draw the walker positions ONCE per catalog size, before the mode
        # loop: the host rng advances per draw, so drawing inside the loop
        # would evaluate the two tiers at DIFFERENT positions and void the
        # max|dlnL| comparison (the CLAUDE.md "reuse pos" pitfall).
        # free_names are mode-independent (same parameters/fixed mask).
        d = {"kappa_max_a": rng.uniform(0.2, 0.6, n_walkers),
             "mu_feh_a": rng.uniform(-0.6, -0.4, n_walkers),
             "h_aa": rng.uniform(0.7, 0.95, n_walkers)}
        out = {}
        lnp = {}
        for mode in ("direct", "grid"):
            os.environ["MCMC_TPU_JAM"] = mode
            fit = ChemoProfiles(data, mge_mass=mass, mge_lum=lum,
                                parameters=params.copy(), n_pops=2)
            free = fit.compiled.free_names
            pos = np.column_stack([d[n] for n in free])
            lnprob = fit.build_lnprob_batched()
            lnp[mode] = np.asarray(lnprob(jnp.asarray(pos, fit.dtype)))
            grid_steps = steps if mode == "direct" else max(steps, 40)
            out[mode] = _measure(lnprob, pos, fit.dtype, n_steps=grid_steps,
                                 repeats=2)
        del os.environ["MCMC_TPU_JAM"]
        ok = np.isfinite(lnp["direct"])
        maxd = float(np.max(np.abs(lnp["grid"][ok] - lnp["direct"][ok])))
        print(f"N={n_stars:6d}  direct {out['direct']:9.1f}  "
              f"grid {out['grid']:9.1f}  speedup {out['grid']/out['direct']:5.1f}x  "
              f"finite {int(ok.sum())}/{n_walkers}  max|dlnL| {maxd:.3g}",
              flush=True)


if __name__ == "__main__":
    main()

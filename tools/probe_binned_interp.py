"""A/B probe: ConstantSufficientStats.interpolate as lax.scan vs unrolled loop,
measured through the FULL binned pipeline (the workload of the
pipeline/binned-constant bench row) with alternating runs so backend drift
cannot masquerade as a difference.

    python tools/probe_binned_interp.py [reps]
"""

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def scan_interpolate(self, s):
    import jax
    import jax.numpy as jnp

    t = jnp.log(jnp.maximum(s, 0.0) + self.offset)
    xi = jnp.clip((2.0 * t - (self.t_hi + self.t_lo))
                  / (self.t_hi - self.t_lo), -1.0, 1.0)

    def step(carry, c):
        tm1, tm0, acc = carry
        tp = 2.0 * xi * tm0 - tm1
        return (tm0, tp, acc + c * tp[..., None]), None

    acc0 = (jnp.broadcast_to(self.coeffs[0], xi.shape + (11,))
            + self.coeffs[1] * xi[..., None])
    (_, _, mom), _ = jax.lax.scan(
        step, (jnp.ones_like(xi), xi, acc0), self.coeffs[2:])
    return mom


def unrolled_interpolate(self, s):
    import jax.numpy as jnp

    t = jnp.log(jnp.maximum(s, 0.0) + self.offset)
    xi = jnp.clip((2.0 * t - (self.t_hi + self.t_lo))
                  / (self.t_hi - self.t_lo), -1.0, 1.0)
    acc = (jnp.broadcast_to(self.coeffs[0], xi.shape + (11,))
           + self.coeffs[1] * xi[..., None])
    tm1, tm0 = jnp.ones_like(xi), xi
    for k in range(2, self.coeffs.shape[0]):
        tp = 2.0 * xi * tm0 - tm1
        acc = acc + self.coeffs[k] * tp[..., None]
        tm1, tm0 = tm0, tp
    return acc


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3

    from mcmc_dynamics_tpu import pipelines
    from mcmc_dynamics_tpu import units as u
    from mcmc_dynamics_tpu.cli.run import load_catalog
    from mcmc_dynamics_tpu.ops.sufficient import ConstantSufficientStats
    from mcmc_dynamics_tpu.pipelines import fit_radial_bins

    catalog = (pathlib.Path(__file__).parent.parent / "example" / "data"
               / "omega_cen_like.csv")
    data = load_catalog({"file": str(catalog), "format": "csv", "v_sys": 0.0})
    n_walkers, n_steps = 64, 300

    def run():
        return fit_radial_bins(data, 201.697 * u.deg, -47.48 * u.deg,
                               nstars=400, dlogr=0.05,
                               n_walkers=n_walkers, n_steps=n_steps, seed=0)

    variants = {"scan": scan_interpolate, "unroll": unrolled_interpolate}
    best = {k: np.inf for k in variants}
    n_bins = None
    for rep in range(reps):
        for name, impl in variants.items():
            ConstantSufficientStats.interpolate = impl
            pipelines._PROGRAM_CACHE.clear()
            res = run()                       # compile + binning warm-up
            n_bins = res.n_per_bin.shape[0]
            for _ in range(2):
                t0 = time.perf_counter()
                res = run()
                np.asarray(res.chains)
                best[name] = min(best[name], time.perf_counter() - t0)
            print(f"rep {rep}  {name:6s}  best {best[name]:.3f}s  "
                  f"rate {n_bins * n_walkers * n_steps / best[name]:9.1f}",
                  flush=True)


if __name__ == "__main__":
    main()

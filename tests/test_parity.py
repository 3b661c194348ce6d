"""Posterior parity: the JAX sampler vs an independent NumPy implementation of the
Goodman & Weare (2010) stretch move (the algorithm emcee implements; emcee itself is
not available in this environment).  Parity must be *distributional* — posterior
moments/quantiles within Monte-Carlo error — not samplewise (SURVEY.md hard parts).
"""

import math

import numpy as np

import jax
import jax.numpy as jnp

from mcmc_dynamics_tpu import units as u
from mcmc_dynamics_tpu.models import ConstantFit
from mcmc_dynamics_tpu.sampler import autocorr_time, init_state, run_ensemble
from mcmc_dynamics_tpu.utils import DataReader

RA_C, DEC_C = 56.345, -26.675


def numpy_stretch_sampler(lnprob, p0, n_steps, a=2.0, seed=0):
    """Independent reference implementation of the affine-invariant stretch move
    (Goodman & Weare 2010, eqs. 7-10; the emcee 'StretchMove')."""
    rng = np.random.default_rng(seed)
    pos = np.array(p0, dtype=float)
    n_walkers, ndim = pos.shape
    lnp = np.array([lnprob(p) for p in pos])
    half = n_walkers // 2
    chain = np.empty((n_walkers, n_steps, ndim))
    for step in range(n_steps):
        for first in (True, False):
            sel = slice(0, half) if first else slice(half, n_walkers)
            other = slice(half, n_walkers) if first else slice(0, half)
            z = ((a - 1.0) * rng.random(half) + 1.0) ** 2 / a
            partners = pos[other][rng.integers(0, half, half)]
            prop = partners + z[:, None] * (pos[sel] - partners)
            new_lnp = np.array([lnprob(p) for p in prop])
            ln_acc = (ndim - 1.0) * np.log(z) + new_lnp - lnp[sel]
            accept = np.log(rng.random(half)) < ln_acc
            pos[sel][accept] = prop[accept]
            block = pos[sel]
            block[accept] = prop[accept]
            pos[sel] = block
            lnp_block = lnp[sel]
            lnp_block[accept] = new_lnp[accept]
            lnp[sel] = lnp_block
        chain[:, step, :] = pos
    return chain


def _fit(n=250, seed=0):
    rng = np.random.default_rng(seed)
    r = np.abs(rng.normal(0, 60, n)) + 1.0
    phi = rng.uniform(-np.pi, np.pi, n)
    theta_0, v_max, sigma = 0.8, 4.0, 7.0
    v = v_max * np.sin(phi - theta_0) + sigma * rng.normal(size=n)
    verr = 0.3 + 0.2 * rng.random(n)
    v = v + verr * rng.normal(size=n)
    ra = RA_C - (r / 3600) * np.cos(phi) / math.cos(math.radians(DEC_C))
    dec = DEC_C + (r / 3600) * np.sin(phi)
    data = DataReader({"ra": u.Quantity(ra, "deg"), "dec": u.Quantity(dec, "deg"),
                       "v": u.Quantity(v, "km/s"), "verr": u.Quantity(verr, "km/s")})
    params = ConstantFit.default_parameters()
    params["ra_center"].set(value=RA_C, fixed=True)
    params["dec_center"].set(value=DEC_C, fixed=True)
    params["sigma_max"].set(initials="rng.lognormal(mean=2.0, sigma=0.3, size=n)")
    params["v_maxx"].set(initials="rng.normal(loc=0, scale=3, size=n)")
    params["v_maxy"].set(initials="rng.normal(loc=0, scale=3, size=n)")
    return ConstantFit(data, parameters=params, seed=seed)


class TestPosteriorParity:
    def test_same_posterior_as_independent_numpy_sampler(self):
        fit = _fit()
        lnprob_jax = fit.build_lnprob()
        lnprob_np = lambda p: float(fit.lnprob(p))

        pos = fit.get_initials(64)
        n_steps, n_burn = 600, 300

        state = init_state(lnprob_jax, jnp.asarray(pos), jax.random.PRNGKey(0))
        ours = np.asarray(run_ensemble(lnprob_jax, state, n_steps=n_steps).chain)
        ref = numpy_stretch_sampler(lnprob_np, pos, n_steps, seed=1)

        ours_flat = ours[:, n_burn:, :].reshape(-1, 4)
        ref_flat = ref[:, n_burn:, :].reshape(-1, 4)

        # Monte-Carlo error of the means given the autocorrelation time
        tau = np.maximum(autocorr_time(ours[:, n_burn:, :]), 1.0)
        n_eff = ours_flat.shape[0] / tau
        mc_err = ours_flat.std(axis=0) / np.sqrt(n_eff)

        delta = np.abs(ours_flat.mean(axis=0) - ref_flat.mean(axis=0))
        assert np.all(delta < 5 * mc_err + 1e-3), (delta, mc_err)

        # matching posterior widths (5% tolerance + MC error margin)
        s_ours = ours_flat.std(axis=0)
        s_ref = ref_flat.std(axis=0)
        assert np.all(np.abs(s_ours - s_ref) / s_ref < 0.15)

        # matching quantiles
        for q in (0.16, 0.5, 0.84):
            dq = np.abs(np.quantile(ours_flat, q, axis=0)
                        - np.quantile(ref_flat, q, axis=0))
            assert np.all(dq < 6 * mc_err + 1e-3)

    def test_acceptance_rates_match(self):
        fit = _fit(seed=2)
        lnprob_jax = fit.build_lnprob()
        pos = fit.get_initials(32)
        state = init_state(lnprob_jax, jnp.asarray(pos), jax.random.PRNGKey(3))
        res = run_ensemble(lnprob_jax, state, n_steps=400)
        acc_ours = float(np.mean(np.asarray(res.acceptance_fraction)))

        # acceptance of the independent implementation
        lnprob_np = lambda p: float(fit.lnprob(p))
        ref = numpy_stretch_sampler(lnprob_np, pos, 400, seed=4)
        moved = np.mean(np.any(np.diff(ref, axis=1) != 0, axis=2))
        assert abs(acc_ours - moved) < 0.1

"""Parallel-tempered ensemble sampler: multimodal mixing + evidence estimation."""

import math

import numpy as np

import jax
import jax.numpy as jnp

from mcmc_dynamics_tpu.sampler import init_state, run_ensemble
from mcmc_dynamics_tpu.sampler.tempered import (init_tempered, log_evidence,
                                                make_beta_ladder, run_tempered)


def _bimodal_lnprob(separation=12.0):
    """Two well-separated 1D Gaussians with 30/70 weights."""
    mu = jnp.asarray([0.0, separation])
    w = jnp.asarray([0.3, 0.7])

    def lnprob(theta):
        x = theta[0]
        comp = jnp.log(w) - 0.5 * (x - mu) ** 2 - 0.5 * math.log(2 * math.pi)
        return jax.scipy.special.logsumexp(comp)

    return lnprob


class TestTempered:
    def test_ladder(self):
        betas = make_beta_ladder(5, 1e-2)
        assert betas[0] == 1.0 and abs(betas[-1] - 1e-2) < 1e-12
        assert np.all(np.diff(betas) < 0)

    def test_bimodal_mixing_beats_plain_ensemble(self):
        lnprob = _bimodal_lnprob()
        rng = np.random.default_rng(0)
        # all walkers start in the SMALLER mode at 0
        pos = 0.1 * rng.normal(size=(32, 1))

        # plain ensemble: stuck in the starting mode
        state = init_state(lnprob, jnp.asarray(pos), jax.random.PRNGKey(0))
        plain = run_ensemble(lnprob, state, n_steps=1500)
        plain_frac = float(np.mean(np.asarray(plain.chain[:, 750:, 0]) > 6.0))

        # tempered: hot chains cross, swaps propagate to the cold chain
        tstate, betas = init_tempered(lnprob, jnp.asarray(pos),
                                      jax.random.PRNGKey(0), n_temps=6,
                                      beta_min=1e-2)
        res = run_tempered(lnprob, tstate, betas, n_steps=1500, swap_every=5)
        cold = np.asarray(res.chain[:, 750:, 0])
        frac_right = float(np.mean(cold > 6.0))

        assert plain_frac < 0.05            # plain sampler cannot cross
        assert abs(frac_right - 0.7) < 0.12  # tempered recovers the 70% weight

        sw = np.asarray(res.swap_acceptance)
        assert np.all(sw > 0.05)            # ladder actually exchanges

    def test_evidence_gaussian(self):
        """TI evidence for lnP = -x^2/2 (unnormalised): ln Z = 0.5 ln(2 pi)."""
        lnprob = lambda theta: -0.5 * theta[0] ** 2
        rng = np.random.default_rng(1)
        pos = rng.normal(size=(64, 1))
        tstate, betas = init_tempered(lnprob, jnp.asarray(pos),
                                      jax.random.PRNGKey(2), n_temps=24,
                                      beta_min=1e-4)
        res = run_tempered(lnprob, tstate, betas, n_steps=2500, swap_every=5)
        lnz = log_evidence(betas, res.mean_lnp_by_beta)
        # TI with a finite geometric ladder truncated at beta_min:
        # exact ln Z(beta_min -> 1) = 0.5 ln(2 pi) - 0.5 ln(beta_min) ... the
        # integral from 0 to beta_min is missed; compare against the analytic
        # value of the SAME truncated integral: int_bmin^1 E_beta[lnP] dbeta
        # with E_beta[lnP] = -1/(2 beta):
        expected = -0.5 * (math.log(1.0) - math.log(1e-4))
        assert abs(lnz - expected) < 0.35, (lnz, expected)

    def test_resume_and_acceptance(self):
        lnprob = _bimodal_lnprob(6.0)
        rng = np.random.default_rng(3)
        pos = rng.normal(size=(16, 1))
        tstate, betas = init_tempered(lnprob, jnp.asarray(pos),
                                      jax.random.PRNGKey(4), n_temps=4)
        r1 = run_tempered(lnprob, tstate, betas, n_steps=100)
        r2 = run_tempered(lnprob, r1.final, betas, n_steps=100)
        acc = np.asarray(r2.acceptance_fraction)
        assert acc.shape == (4, 16)
        assert np.all(acc > 0.05) and np.all(acc <= 1.0)
        assert int(r2.final.step) == 200

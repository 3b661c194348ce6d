"""Centre-offset fitting (the capability behind the reference's 5139_center
workflow): ra_center/dec_center sampled as free parameters and recovered."""

import math

import numpy as np

from mcmc_dynamics_tpu import units as u
from mcmc_dynamics_tpu.mock import make_mock_cluster
from mcmc_dynamics_tpu.models import ModelFit

RA_C, DEC_C = 56.345, -26.675


class TestFreeCenterFit:
    def test_center_recovered_from_offset_start(self):
        # strong central concentration + dispersion gradient localise the centre
        data, truth = make_mock_cluster(n_stars=600, ra_center=RA_C,
                                        dec_center=DEC_C, sigma_max=10.0,
                                        v_max=4.0, theta_0=0.7, r_peak=60.0,
                                        a=30.0, seed=11)
        params = ModelFit.default_parameters()
        params["sigma_max"].set(initials="rng.lognormal(mean=2.3, sigma=0.3, size=n)")
        params["v_maxx"].set(initials="rng.normal(loc=0, scale=2, size=n)")
        params["v_maxy"].set(initials="rng.normal(loc=0, scale=2, size=n)")
        params["r_peak"].set(min=5.0, max=300.0,
                             initials="rng.uniform(30, 120, size=n)")
        params["a"].set(min=5.0, max=300.0, initials="rng.uniform(15, 60, size=n)")
        # centre free, initialised OFF-centre by ~0.5 arcmin
        span = 0.02
        params["ra_center"].set(value=RA_C, min=RA_C - span, max=RA_C + span,
                                initials=f"rng.normal(loc={RA_C + 0.008}, "
                                         "scale=0.003, size=n)")
        params["dec_center"].set(value=DEC_C, min=DEC_C - span, max=DEC_C + span,
                                 initials=f"rng.normal(loc={DEC_C - 0.008}, "
                                          "scale=0.003, size=n)")

        fit = ModelFit(data, parameters=params, seed=4)
        sampler = fit(n_walkers=64, n_steps=600, prefix=None)
        best = fit.compute_bestfit_values(sampler.chain, n_burn=300)

        # recovered centre within ~10 arcsec of truth
        d_ra = abs(best.value("ra_center")[0] - RA_C) \
            * math.cos(math.radians(DEC_C)) * 3600
        d_dec = abs(best.value("dec_center")[0] - DEC_C) * 3600
        assert d_ra < 12.0, d_ra
        assert d_dec < 12.0, d_dec

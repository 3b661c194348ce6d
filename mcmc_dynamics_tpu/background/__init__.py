"""Field-star background population models.

Capability parity with the reference's ``background`` package: each model is a callable
returning per-star log-likelihoods that the star belongs to the background population.
These are *data* for the sampler — evaluated once at fit construction (reference
runner.py:102), never inside the hot loop — so they run host-side in float64.

For very large catalogs the ``SingleStars`` kernel is the one quadratic (N x M) cost;
``mcmc_dynamics_tpu.ops.background_logsumexp`` provides a blocked on-device
implementation used automatically above a size threshold.
"""

from __future__ import annotations

import logging

import numpy as np

from .. import units as u

logger = logging.getLogger(__name__)

__all__ = ["Gaussian", "SingleStars"]


class Gaussian:
    """Background = single Gaussian in velocity space (reference gaussian.py:9-28)."""

    def __init__(self, mean, sigma):
        self.mean = float(u.as_value(mean, u.km_per_s))
        self.sigma = float(u.as_value(sigma, u.km_per_s))

    def __call__(self, v, verr):
        v = np.asarray(u.as_value(v, u.km_per_s), dtype=np.float64)
        verr = np.asarray(u.as_value(verr, u.km_per_s), dtype=np.float64)
        norm = verr * verr + self.sigma * self.sigma
        return -0.5 * (np.log(2.0 * np.pi * norm) + (v - self.mean) ** 2 / norm)


class SingleStars:
    """Background = KDE over M catalog stars (reference single_stars.py:9-77):

    p(v_i) = (1/M) sum_j N(v_i; v_j, verr_i^2 + sigma_int^2)

    evaluated with a numerically-stable log-sum-exp over the (N x M) kernel matrix.
    """

    # above this many pairwise terms, evaluate on-device with the blocked kernel
    _DEVICE_THRESHOLD = 4_000_000

    def __init__(self, v):
        self.v = np.asarray(u.as_value(v, u.km_per_s), dtype=np.float64)
        self.n_stars = self.v.size

    def __call__(self, v, verr, sigma_int=0.0):
        v = np.asarray(u.as_value(v, u.km_per_s), dtype=np.float64)
        verr = np.asarray(u.as_value(verr, u.km_per_s), dtype=np.float64)
        sigma_int = float(u.as_value(sigma_int, u.km_per_s))

        if v.size * self.n_stars > self._DEVICE_THRESHOLD:
            try:
                from ..ops import background_logsumexp
                return np.asarray(background_logsumexp(self.v, v, verr, sigma_int))
            except Exception as err:  # pragma: no cover - fallback safety
                logger.warning("Device background kernel failed (%s); "
                               "falling back to NumPy.", err)

        norm = sigma_int ** 2 + verr ** 2                      # (N,)
        # (M, N) matrix of kernel exponents
        exponents = -np.subtract.outer(self.v, v) ** 2 / (2.0 * norm)
        m = exponents.max(axis=0)
        lnlike = m + np.log(np.sum(np.exp(exponents - m) / np.sqrt(2.0 * np.pi * norm),
                                   axis=0)) - np.log(self.n_stars)
        return lnlike

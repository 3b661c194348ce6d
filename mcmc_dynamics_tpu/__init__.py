"""mcmc_dynamics_tpu — a TPU-native Bayesian stellar-kinematics framework.

Brand-new JAX/XLA/Pallas implementation of the capabilities of the reference package
``skamann/mcmc-dynamics``: deriving the internal kinematics of star clusters (rotation
amplitude & axis, dispersion profile, field-star contamination, cluster centre/elongation,
axisymmetric Jeans/JAM models) from per-star radial-velocity catalogs.

Architecture (TPU-first, not a port):

* likelihoods are pure functions ``lnlike(theta, data)`` vmapped over walkers;
* the affine-invariant ensemble sampler runs natively inside ``lax.scan`` so thousands
  of walkers advance per XLA step (the reference drives ``emcee`` through a fork-based
  process pool, one Python callback per walker proposal);
* hot star-catalog reductions can run as fused Pallas kernels over HBM-resident data;
* multi-chip runs shard walkers/stars/bins over an ICI mesh with ``psum``'d
  log-probabilities (see ``mcmc_dynamics_tpu.parallel``).
"""

from . import units
from .parameters import Parameter, Parameters, CompiledParameters

__version__ = "0.4.0"

__all__ = [
    "units", "Parameter", "Parameters", "CompiledParameters",
]


def default_dtype():
    """Preferred floating dtype: float64 when x64 is enabled (CPU tests/parity),
    float32 otherwise (TPU throughput)."""
    import jax
    import jax.numpy as jnp
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

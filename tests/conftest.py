"""Test configuration: run JAX on a virtual 8-device CPU mesh with float64.

Multi-chip sharding paths are exercised without TPU hardware by forcing the host
platform to expose 8 devices; float64 gives the numerical headroom for posterior
parity checks (on TPU the library runs float32 — see mcmc_dynamics_tpu.default_dtype).
"""

import os

# Force CPU: the session environment pins JAX_PLATFORMS to the TPU tunnel, which is
# reserved for bench.py; unit tests must run hermetically on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_ENABLE_X64"] = "1"

import jax  # noqa: E402  (import after env setup)

# The sandbox's sitecustomize registers a remote-TPU PJRT plugin and pins
# jax_platforms to it; override after import so tests stay on the local CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

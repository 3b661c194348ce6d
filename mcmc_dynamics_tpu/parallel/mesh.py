"""Device-mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh

__all__ = ["make_mesh", "factorize_devices"]


def factorize_devices(n_devices: int, n_axes: int = 2) -> Tuple[int, ...]:
    """Split a device count into a near-square mesh shape (largest factors first)."""
    if n_axes == 1:
        return (n_devices,)
    best = (n_devices, 1)
    for a in range(1, int(np.sqrt(n_devices)) + 1):
        if n_devices % a == 0:
            best = (n_devices // a, a)
    return best


def make_mesh(axis_names: Sequence[str] = ("dp", "sp"),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a mesh over the available devices.

    Default axes for this workload: ``dp`` = walker (data-parallel analog) and
    ``sp`` = star axis (context/sequence-parallel analog: each chip holds a slice of
    the catalog and lnlike partial sums ride an ICI psum).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = factorize_devices(n, len(axis_names))
    assert int(np.prod(shape)) == n, f"mesh shape {shape} != {n} devices"
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))

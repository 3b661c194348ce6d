"""Blocked Pallas log-sum-exp kernel for the SingleStars background population.

The SingleStars field-star model evaluates, for each of N target stars, a KDE over M
background-catalog velocities (reference single_stars.py:72-77):

    lnlike_i = log[(1/M) sum_j exp(-(v_i - v_j)^2 / (2 n_i)) / sqrt(2 pi n_i)],
    n_i = verr_i^2 + sigma_int^2

— an (N x M) pairwise kernel, the one quadratic cost in the framework and the direct
analog of a blockwise-attention score matrix.  The kernel below streams background
blocks through VMEM with an online (running-max, rescaled-sum) reduction — the
flash-attention pattern — so the (N x M) matrix never materialises in HBM.
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["background_logsumexp"]


@functools.partial(jax.jit, static_argnames=("target_tile", "catalog_chunk"))
def background_logsumexp(v_catalog, v, verr, sigma_int=0.0,
                         target_tile: int = 1024, catalog_chunk: int = 1024):
    """Per-target-star background log-likelihoods, fused on-device.

    v_catalog: (M,) background velocities; v, verr: (N,) targets.
    Exact (up to float reduction order) match of the NumPy implementation.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if np.size(v_catalog) == 0:
        raise ValueError(
            "Empty background catalog: the KDE log-likelihood is undefined "
            "(did the field-star selection match no stars?).")
    dtype = jnp.result_type(jnp.asarray(v).dtype, jnp.float32)
    v = jnp.asarray(v, dtype)
    verr = jnp.asarray(verr, dtype)
    v_catalog = jnp.asarray(v_catalog, dtype)

    n = v.shape[0]
    m = v_catalog.shape[0]

    n_pad = (-n) % target_tile
    if n_pad:
        v = jnp.concatenate([v, jnp.zeros(n_pad, dtype)])
        verr = jnp.concatenate([verr, jnp.ones(n_pad, dtype)])
    m_pad = (-m) % catalog_chunk
    if m_pad:
        # pad with +inf velocities -> exp(-inf) = 0 contribution
        v_catalog = jnp.concatenate(
            [v_catalog, jnp.full(m_pad, jnp.inf, dtype)])
    n_padded, m_padded = v.shape[0], v_catalog.shape[0]
    n_chunks = m_padded // catalog_chunk

    norm_all = sigma_int * sigma_int + verr * verr  # (N,)
    targets = jnp.stack([v, norm_all], axis=0)      # (2, N)

    def kernel(t_ref, c_ref, out_ref):
        vt = t_ref[0, :][:, None]          # (T, 1)
        norm = t_ref[1, :][:, None]        # (T, 1)
        tile = vt.shape[0]

        def body(c, carry):
            run_max, run_sum = carry
            sl = pl.ds(c * catalog_chunk, catalog_chunk)
            vc = c_ref[0, sl][None, :]                     # (1, C)
            expo = -(vc - vt) ** 2 / (2.0 * norm)          # (T, C)
            blk_max = jnp.max(expo, axis=1, keepdims=True)
            new_max = jnp.maximum(run_max, blk_max)
            # rescale the running sum to the new max (online softmax)
            run_sum = run_sum * jnp.exp(run_max - new_max) \
                + jnp.sum(jnp.exp(expo - new_max), axis=1, keepdims=True)
            return new_max, run_sum

        init = (jnp.full((tile, 1), float("-inf"), t_ref.dtype),
                jnp.zeros((tile, 1), t_ref.dtype))
        run_max, run_sum = jax.lax.fori_loop(0, n_chunks, body, init)
        out_ref[:] = run_max + jnp.log(run_sum) \
            - 0.5 * jnp.log(2.0 * jnp.pi * norm)

    out = pl.pallas_call(
        kernel,
        grid=(n_padded // target_tile,),
        in_specs=[
            pl.BlockSpec((2, target_tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_padded), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((target_tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_padded, 1), dtype),
    )(targets, v_catalog[None, :])

    return out[:n, 0] - math.log(m)

"""O(1)-per-walker ConstantFit likelihood via exact sufficient statistics.

The single-bin likelihood (reference constant.py:113-154 + runner.py:260-271) is

    lnL(theta) = -0.5 sum_i [ log(2 pi n_i) + (v_i - v_sys - gx_i vx - gy_i vy)^2 / n_i ],
    n_i = verr_i^2 + s,   s = sigma_max^2,

which is *quadratic* in c = (v_sys, vx, vy) with weights w_i(s) = 1/n_i.  Expanding,

    lnL = -0.5 [ F(s) + M0(s) - 2 c . M1(s) + c^T M2(s) c ] - (N/2) log(2 pi)

with F(s) = sum_i log n_i and the weighted moments
M0 = sum w v^2, M1 = sum w v u, M2 = sum w u u^T, u_i = (1, gx_i, gy_i) —
eleven scalar functions of s ONLY.  They are analytic on s >= 0 (poles at
s = -verr_i^2 < 0) and so are their exact derivatives
(dF/ds = sum w, dM/ds = -sum w^2 ...), so a cubic **Hermite** interpolant on a
log-spaced grid with exact endpoint derivatives evaluates them to ~1e-9 relative —
below float32 noise.  The per-walker cost drops from O(N_stars) to ~60 flops.

This is the TPU production path for the reference's binned-fit workload
(bin/run.py:186-189: thousands of small ConstantFit posteriors): the star catalog
is touched ONCE to build the tables; sampling never re-reads it.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["ConstantSufficientStats"]

_LOG_2PI = math.log(2.0 * math.pi)


class ConstantSufficientStats(NamedTuple):
    """Hermite tables of the eleven moment functions over t = log1p(s)."""

    t0: jnp.ndarray          # scalar: grid start
    dt: jnp.ndarray          # scalar: grid spacing
    values: jnp.ndarray      # (n_nodes, 11)
    derivs: jnp.ndarray      # (n_nodes, 11) d/dt
    n_stars: jnp.ndarray     # effective (masked) star count

    @classmethod
    def build(cls, gx, gy, v, verr2, mask=None, n_nodes: int = 2048,
              s_max: float = 1.0e6,
              star_chunk: int = 16384) -> "ConstantSufficientStats":
        """Precompute the moment tables from the star catalog.

        The star axis is processed in chunks under ``lax.scan`` so the (n_nodes x
        N_stars) weight matrix never materialises — catalogs of 10^6+ stars build
        in bounded memory.
        """
        gx = jnp.asarray(gx)
        dtype = gx.dtype
        gy = jnp.asarray(gy, dtype)
        v = jnp.asarray(v, dtype)
        verr2 = jnp.asarray(verr2, dtype)
        # binarise: the derivative tables fold the mask into both the basis
        # and the w2 weight, so a fractional mask would be applied with
        # different powers in the value vs derivative channels — only
        # membership (0/1) semantics are supported
        m = jnp.ones_like(v) if mask is None \
            else (jnp.asarray(mask, dtype) > 0).astype(dtype)

        t0 = 0.0
        t1 = math.log1p(s_max)
        t = jnp.linspace(t0, t1, n_nodes, dtype=dtype)
        s = jnp.expm1(t)                                   # (G,)

        n_stars_total = v.shape[0]
        # adapt the chunk to the catalog: small catalogs use one unpadded-ish
        # chunk, large ones stream in fixed blocks
        star_chunk = min(star_chunk, max(128, -(-n_stars_total // 128) * 128))
        n_pad = (-n_stars_total) % star_chunk
        if n_pad:
            pad = lambda a: jnp.concatenate([a, jnp.zeros(n_pad, dtype)])
            gx, gy, v, m = pad(gx), pad(gy), pad(v), pad(m)
            verr2 = jnp.concatenate([verr2, jnp.ones(n_pad, dtype)])
        n_chunks = gx.shape[0] // star_chunk
        stars = jnp.stack([gx, gy, v, verr2, m]).reshape(5, n_chunks, star_chunk)
        stars = jnp.swapaxes(stars, 0, 1)                  # (chunks, 5, C)

        def chunk_moments(carry, chunk):
            vals, ders = carry
            cgx, cgy, cv, ce2, cm = chunk
            n = ce2[None, :] + s[:, None]                  # (G, C)
            w = cm[None, :] / n
            basis = jnp.stack([cm, cgx * cm, cgy * cm])    # mask folded into basis
            uu = jnp.stack([basis[0], cgx * basis[0], cgy * basis[0],
                            cgx * basis[1], cgy * basis[1], cgy * basis[2]])

            def moments(weight):
                m0 = weight @ (cv * cv * cm)               # (G,)
                m1 = weight @ (cv[:, None] * basis.T)      # (G, 3)
                m2 = weight @ uu.T                         # (G, 6)
                return m0, m1, m2

            f = jnp.sum(jnp.log(n) * cm[None, :], axis=1)
            m0, m1, m2 = moments(w / jnp.maximum(cm, 1e-30)[None, :])
            # note: basis already carries one mask factor; w brings the 1/n weight
            vals = vals + jnp.concatenate([f[:, None], m0[:, None], m1, m2], axis=1)

            w2 = (w / jnp.maximum(cm, 1e-30)[None, :]) * w
            df = jnp.sum(w, axis=1)
            dm0, dm1, dm2 = moments(-w2)
            ders = ders + jnp.concatenate([df[:, None], dm0[:, None], dm1, dm2],
                                          axis=1)
            return (vals, ders), None

        init = (jnp.zeros((n_nodes, 11), dtype), jnp.zeros((n_nodes, 11), dtype))
        (values, derivs_s), _ = jax.lax.scan(chunk_moments, init, stars)
        # chain rule to t-space: ds/dt = s + 1
        derivs = derivs_s * (s + 1.0)[:, None]

        return cls(t0=jnp.asarray(t0, dtype),
                   dt=jnp.asarray((t1 - t0) / (n_nodes - 1), dtype),
                   values=values, derivs=derivs, n_stars=jnp.sum(m))

    def interpolate(self, s):
        """Hermite-cubic evaluation of all 11 moments at s (batched)."""
        t = jnp.log1p(s)
        x = (t - self.t0) / self.dt
        j = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, self.values.shape[0] - 2)
        u = jnp.clip(x - j, 0.0, 1.0)[..., None]

        y0 = self.values[j]
        y1 = self.values[j + 1]
        d0 = self.derivs[j] * self.dt
        d1 = self.derivs[j + 1] * self.dt

        u2 = u * u
        u3 = u2 * u
        h00 = 2 * u3 - 3 * u2 + 1
        h10 = u3 - 2 * u2 + u
        h01 = -2 * u3 + 3 * u2
        h11 = u3 - u2
        return h00 * y0 + h10 * d0 + h01 * y1 + h11 * d1    # (..., 11)

    def lnlike(self, params):
        """Batched ConstantFit log-likelihood: params (W, 4) columns
        (v_sys, sigma_max, v_maxx, v_maxy) -> (W,).  Exact up to interpolation
        error ~1e-9 relative."""
        v_sys = params[:, 0]
        s = params[:, 1] * params[:, 1]
        vx = params[:, 2]
        vy = params[:, 3]

        mom = self.interpolate(s)                           # (W, 11)
        f = mom[:, 0]
        m0 = mom[:, 1]
        m1 = mom[:, 2:5]
        q11, q12, q13, q22, q23, q33 = (mom[:, 5], mom[:, 6], mom[:, 7],
                                        mom[:, 8], mom[:, 9], mom[:, 10])

        lin = v_sys * m1[:, 0] + vx * m1[:, 1] + vy * m1[:, 2]
        quad = (v_sys * v_sys * q11 + vx * vx * q22 + vy * vy * q33
                + 2.0 * (v_sys * vx * q12 + v_sys * vy * q13 + vx * vy * q23))
        return -0.5 * (f + m0 - 2.0 * lin + quad + self.n_stars * _LOG_2PI)

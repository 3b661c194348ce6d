"""Design probe for the ModelFit tensor-Chebyshev tier (ops/model_tensor.py).

The ModelFit likelihood is quadratic in (v_sys, v_maxx, v_maxy); the eleven
coefficient channels are smooth functions of (s = sigma_max^2, a^2, r_peak^2)
ONLY (reference model.py:93-180 math):

    w_i(s, a)  = m_i / (E_i + s g(u_i; a)),    g = (1 + u/a^2)^(-1/2)
    c_i(rp)    = 2 rp / (rp^2 + u_i)

    2-D: F = sum m log(E + s g), M0 = sum w v^2, m1v = sum w v, m11 = sum w
    3-D: S{x,y,vx,vy} = sum w c {x, y, v x, v y},  Q{xx,xy,yy} = sum w c^2 {..}

This probe measures the per-axis Chebyshev coefficient decay of those channels
on a realistic catalog over candidate grids in (t_s, t_a, t_r) =
(log(s + E_min), log(a^2), log(rp^2)), i.e. the degrees the tier actually
needs for a target truncation — the pole-geometry estimate (poles a distance
pi off the real axis in each log variable) says

    degree ~= log(1/eps) / log(rho),  rho = eta + sqrt(1 + eta^2),  eta = pi/L

with L the interval half-length; this script checks that empirically, because
the channels are sums over thousands of stars and the estimate is worst-case.

Run:  python tools/probe_model_tensor.py [--stars 10000] [--arange 1 300]
                                         [--rrange 1 300] (arcsec)
"""

from __future__ import annotations

import argparse
import math
import sys

import numpy as np


def cheb_nodes(n):
    k = np.arange(n)
    return np.cos(np.pi * (k + 0.5) / n)


def dct_along(vals, axis):
    """Chebyshev coefficients from Chebyshev-Gauss node values along ``axis``."""
    n = vals.shape[axis]
    xi = cheb_nodes(n)
    tmat = np.cos(np.outer(np.arange(n), np.arccos(xi))) * (2.0 / n)
    tmat[0] *= 0.5
    return np.tensordot(tmat, np.moveaxis(vals, axis, 0), axes=(1, 0))


def mock_catalog(n, rng):
    """Same shape as bench.py's _mock_catalog: lognormal radii (arcmin),
    Lynden-Bell rotation + Plummer dispersion signal."""
    r = np.exp(rng.normal(-1.0, 0.8, n))          # arcmin
    theta = rng.uniform(-np.pi, np.pi, n)
    dx, dy = r * np.cos(theta), r * np.sin(theta)
    verr = np.exp(rng.normal(0.0, 0.5, n)).clip(0.3, 30.0)
    sigma = 12.0 / (1.0 + (r / 0.5) ** 2) ** 0.25
    vrot = 2.0 * 5.0 * (r / 0.8) / (1.0 + (r / 0.8) ** 2) * np.sin(theta)
    v = vrot + rng.normal(0, 1, n) * np.hypot(sigma, verr)
    return dx, dy, v, verr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stars", type=int, default=10000)
    ap.add_argument("--arange", type=float, nargs=2, default=[1.0, 300.0],
                    help="a prior bounds [arcsec]")
    ap.add_argument("--rrange", type=float, nargs=2, default=[1.0, 300.0],
                    help="r_peak prior bounds [arcsec]")
    ap.add_argument("--smax", type=float, default=1.0e6,
                    help="sigma_max^2 grid edge [ (km/s)^2 ]")
    ap.add_argument("--deg", type=int, nargs=3, default=[48, 40, 40],
                    help="probe degrees (Ds, Da, Dr)")
    args = ap.parse_args()

    rng = np.random.default_rng(1)
    dx, dy, v, verr = mock_catalog(args.stars, rng)
    u = dx * dx + dy * dy
    x, y = dy, -dx
    E = verr * verr
    e_min = float(E.min())

    Ds, Da, Dr = args.deg
    a_lo, a_hi = (np.asarray(args.arange) / 60.0) ** 2     # arcmin^2
    r_lo, r_hi = (np.asarray(args.rrange) / 60.0) ** 2

    t_s = 0.5 * (math.log(args.smax + e_min) + math.log(e_min)) \
        + 0.5 * (math.log(args.smax + e_min) - math.log(e_min)) * cheb_nodes(Ds)
    s_nodes = np.exp(t_s) - e_min
    ta = 0.5 * (math.log(a_hi) + math.log(a_lo)) \
        + 0.5 * (math.log(a_hi) - math.log(a_lo)) * cheb_nodes(Da)
    a2 = np.exp(ta)
    tr = 0.5 * (math.log(r_hi) + math.log(r_lo)) \
        + 0.5 * (math.log(r_hi) - math.log(r_lo)) * cheb_nodes(Dr)
    rp = np.sqrt(np.exp(tr))

    # per-star factors
    g = 1.0 / np.sqrt(1.0 + u[:, None] / a2[None, :])       # (N, Da)
    c = 2.0 * rp[None, :] / (rp[None, :] ** 2 + u[:, None])  # (N, Dr)

    # w (N, Ds, Da) in chunks; accumulate channel node values
    ch2 = np.zeros((4, Ds, Da))
    ch3 = np.zeros((7, Ds, Da, Dr))
    pay2 = np.stack([np.ones_like(v), v * v, v, np.ones_like(v)])  # F uses log
    for lo in range(0, len(v), 4096):
        sl = slice(lo, lo + 4096)
        den = E[sl, None, None] + s_nodes[None, :, None] * g[sl, None, :]
        w = 1.0 / den
        ch2[0] += np.log(den).sum(0)
        ch2[1] += np.einsum("isa,i->sa", w, v[sl] * v[sl])
        ch2[2] += np.einsum("isa,i->sa", w, v[sl])
        ch2[3] += w.sum(0)
        cb = c[sl]
        for k, f in enumerate((v[sl] * x[sl], v[sl] * y[sl], x[sl], y[sl])):
            ch3[k] += np.einsum("isa,ir->sar", w * f[:, None, None], cb)
        cb2 = cb * cb
        for k, f in enumerate((x[sl] * x[sl], x[sl] * y[sl], y[sl] * y[sl])):
            ch3[4 + k] += np.einsum("isa,ir->sar", w * f[:, None, None], cb2)

    names2 = ["F", "M0", "m1v", "m11"]
    names3 = ["Svx", "Svy", "Sx", "Sy", "Qxx", "Qxy", "Qyy"]

    def decay_report(coefs, names, axes):
        for nm, cf in zip(names, coefs):
            scale = np.abs(cf).max()
            row = [nm]
            for ax in range(cf.ndim):
                # degree at which the max |coef| in the tail drops below eps*scale
                prof = np.moveaxis(np.abs(cf), ax, 0)
                prof = prof.reshape(prof.shape[0], -1).max(1) / scale
                for eps, tag in ((1e-6, "f32"), (1e-10, "f64")):
                    below = np.nonzero(prof < eps)[0]
                    # first index after which everything stays below eps
                    deg = prof.shape[0]
                    for i in below:
                        if np.all(prof[i:] < eps):
                            deg = i
                            break
                    row.append(f"{axes[ax]}@{tag}:{deg}")
            print("  " + " ".join(f"{r:>12s}" for r in row))

    print(f"channels on N={args.stars}, a in {args.arange} as, "
          f"rp in {args.rrange} as, smax={args.smax:g}")
    print("-- 2-D channels (degree needed per axis for 1e-6 / 1e-10 rel) --")
    c2 = dct_along(dct_along(ch2, 1), 2)            # axes moved to front twice
    # dct_along moves the transformed axis to front: track axes
    # ch2 (4, Ds, Da) -> dct axis1 -> (Ds, 4, Da) -> dct axis2 -> (Da, Ds, 4)
    c2 = np.moveaxis(c2, (0, 1, 2), (2, 1, 0))      # back to (4, Ds, Da)
    decay_report(list(c2), names2, ["s", "a"])
    print("-- 3-D channels --")
    c3 = dct_along(dct_along(dct_along(ch3, 1), 2), 3)
    # (7, Ds, Da, Dr) -> (Ds, 7, Da, Dr) -> (Da, Ds, 7, Dr) -> (Dr, Da, Ds, 7)
    c3 = np.moveaxis(c3, (0, 1, 2, 3), (3, 2, 1, 0))
    decay_report(list(c3), names3, ["s", "a", "r"])

    # pole-geometry prediction
    for nm, lo, hi in (("s", math.log(e_min), math.log(args.smax + e_min)),
                       ("a", math.log(a_lo), math.log(a_hi)),
                       ("r", math.log(r_lo), math.log(r_hi))):
        L = 0.5 * (hi - lo)
        eta = math.pi / L
        rho = eta + math.sqrt(1 + eta * eta)
        print(f"pole-geometry {nm}: L={L:.2f} rho={rho:.3f} "
              f"deg(1e-6)={math.log(1e6)/math.log(rho):.0f} "
              f"deg(1e-10)={math.log(1e10)/math.log(rho):.0f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

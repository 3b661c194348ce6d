"""Accuracy probe for the JAM polar-grid tier (models/jam/grid.py).

Sweeps inclination x anisotropy x rotation x BH over a realistic flattened
multi-component MGE and measures — against a CONVERGED quadrature reference
(n_u=48, n_zeta=96, whose own error is ~8e-5 in these units) — the worst-case
deviation at scattered star positions of (a) the direct production engine at
its certified defaults (n_u=24, n_zeta=32) and (b) the grid tier on top of
that same engine:

    dsig = max |sigma - sigma_truth| / sigma_truth
    dvz  = max |vz - vz_truth| / sigma_truth     (rotation error in dispersion
                                                  units)

Findings that set the defaults (2026-08, float64 CPU):
* the angular series converges geometrically (the harmonic m=6 coefficient is
  already ~1e-6 of m=1): n_phi = 8 is converged;
* the RADIAL Chebyshev decay is only algebraic (~d^-3), because the JAM
  rotation model vbar_phi = kappa sqrt(max(0, <v_phi^2> - b sigma_z^2))
  (Cappellari 2008 section 3.3) has C^(1/2) kinks along the curves where the
  argument crosses zero — so the budget goes into radial nodes;
* at (n_r, n_phi) = (128, 8) the grid tier's worst-case error EQUALS the
  direct engine's own quadrature error (dvz 6e-4, dsig 5e-4 on the hardest
  case incl=55, beta=0, kappa=1): the tier costs nothing in accuracy.

Run on CPU in float64 so the numbers measure interpolation, not the dtype:

    python tools/probe_jam_grid.py [n_r,n_phi ...]
"""

import sys

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, ".")

from mcmc_dynamics_tpu.models.jam.grid import JamGridSpec, jam_grid_moments
from mcmc_dynamics_tpu.models.jam.moments import jam_los_moments

# flattened, multi-scale MGE (same family as the bench/test fixtures)
LUM_I = np.array([8000.0, 4000.0, 1000.0, 200.0])
LUM_S = np.array([3.0, 12.0, 40.0, 120.0])
LUM_Q = np.array([0.95, 0.85, 0.75, 0.9])
MASS_I = LUM_I * np.array([1.0, 1.2, 0.9, 1.1])
D = 5.0
THETA0 = 0.37   # fixed rotation-frame angle (exercises the harmonic shift)


def star_positions(n=1500, seed=1):
    rng = np.random.default_rng(seed)
    r = np.exp(rng.uniform(np.log(0.08), np.log(290.0), n))
    phi = rng.uniform(-np.pi, np.pi, n)
    # include axis-aligned and near-centre stars explicitly
    r = np.concatenate([r, [0.08, 0.08, 290.0, 290.0, 0.1]])
    phi = np.concatenate([phi, [0.0, np.pi / 2, np.pi, -np.pi / 2, 0.3]])
    return r * np.cos(phi), r * np.sin(phi)


def sweep_cases():
    for incl_deg in (35.0, 55.0, 75.0, 88.0):
        for beta in (-0.4, 0.0, 0.5):
            for kappa in (0.0, 0.6, 1.0):
                for mbh in (0.0, 3.0e5):
                    yield incl_deg, beta, kappa, mbh


def main():
    orders = [(int(a), int(b)) for a, b in
              (s.split(",") for s in sys.argv[1:])] or [(96, 8), (128, 8)]
    dx, dy = star_positions()
    r = np.hypot(dx, dy)
    phi = np.arctan2(dy, dx)
    xr = jnp.asarray(r * np.cos(phi - THETA0))
    yr = jnp.asarray(r * np.sin(phi - THETA0))
    specs = {o: JamGridSpec.build(dx, dy, n_r=o[0], n_phi=o[1],
                                  dtype=jnp.float64) for o in orders}

    worst = {"direct": [0.0, 0.0, None]}
    worst.update({o: [0.0, 0.0, None] for o in orders})
    for case in sweep_cases():
        incl_deg, beta, kappa, mbh = case
        kw = dict(d=D, beta=beta, kappa=kappa, mscale=2.0,
                  incl=np.deg2rad(incl_deg), mbh=mbh, rbh=1.0)

        def at(gx, gy, n_u=24, n_zeta=32):
            res = jam_los_moments(gx, gy, LUM_I, LUM_S, LUM_Q,
                                  MASS_I, LUM_S, LUM_Q,
                                  n_u=n_u, n_zeta=n_zeta, **kw)
            return res.vz, res.v2zz, res.valid

        truth = at(xr, yr, n_u=48, n_zeta=96)
        if not bool(truth[2]):
            continue
        sig = np.sqrt(np.asarray(truth[1]) - np.asarray(truth[0]) ** 2)

        def upd(key, vz, v2):
            dv = float(np.max(np.abs(np.asarray(vz) - np.asarray(truth[0]))
                              / sig))
            s = np.sqrt(np.maximum(np.asarray(v2) - np.asarray(vz) ** 2, 0.0))
            ds = float(np.max(np.abs(s - sig) / sig))
            if max(dv, ds) > max(worst[key][0], worst[key][1]):
                worst[key][2] = case
            worst[key][0] = max(worst[key][0], dv)
            worst[key][1] = max(worst[key][1], ds)

        d32 = at(xr, yr)
        upd("direct", d32[0], d32[1])
        for o, spec in specs.items():
            vzg, v2g, _ = jam_grid_moments(spec, at, jnp.asarray(THETA0))
            upd(o, vzg, v2g)

    dv, ds, case = worst["direct"]
    print(f"direct n24/32       dvz/sig={dv:.2e}  dsig={ds:.2e}  worst={case}")
    for o in orders:
        dv, ds, case = worst[o]
        print(f"grid ({o[0]:3d},{o[1]:3d}) G={o[0] * o[1]:5d} "
              f"dvz/sig={dv:.2e}  dsig={ds:.2e}  worst={case}")


if __name__ == "__main__":
    main()

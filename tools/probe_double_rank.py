"""Measure the epsilon-rank of the double-model rotation-shape star field.

The DoubleModelFit likelihood (reference double_model.py:99-160) is quadratic in
(v_sys, v_max, v_max_c) but NOT in (v_maxx, v_maxy, ...): the Lynden-Bell
denominator uses x_pa = r sin(theta - theta_0), so the per-star rotation shape

    S_i(theta0, rp) = 2 (x_pa_i / rp) / (1 + (x_pa_i / rp)^2)

depends on the component's position angle.  An O(1)-per-walker tensor tier
(a la ops/model_tensor.py) requires a low-rank factorization over stars,

    S_i(b) ~= sum_m phi_{im} psi_m(b),      b = (theta0, rp),

because the quadratic's cross channel  X(b, b') = sum_i w_i S_i(b) S_i(b')
otherwise lives on a 6-D box.  This probe measures, on a realistic mock
catalog, (a) the singular-value decay of the star-field matrix over a dense
prior-box sample (the achievable rank M), and (b) the Fourier bandwidth in
theta0 (the psi-interpolation cost K).  Both scale with rho_max =
r_max / rp_lo — reported for several rp_lo choices so the dispatch gate can
condition on the prior box.

Run:  python tools/probe_double_rank.py [n_stars] [r_max_arcmin]
"""

import sys

import numpy as np


def field_matrix(r, theta, theta0, rp):
    """S matrix (stars, n_theta0 * n_rp) in float64."""
    # x_pa = r sin(theta - theta0): (N, T)
    x = r[:, None] * np.sin(theta[:, None] - theta0[None, :])
    t = x[:, :, None] / rp[None, None, :]
    s = 2.0 * t / (1.0 + t * t)
    return s.reshape(r.shape[0], -1)


def eps_rank(sv, eps):
    return int(np.sum(sv > eps * sv[0]))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    r_max = float(sys.argv[2]) if len(sys.argv) > 2 else 20.0

    rng = np.random.default_rng(0)
    # realistic projected cluster: lognormal radii clipped at the FoV edge
    r = np.minimum(np.exp(rng.normal(np.log(2.0), 0.9, n)), r_max)
    theta = rng.uniform(0.0, 2.0 * np.pi, n)

    n_t0, n_rp = 192, 32
    theta0 = np.linspace(0.0, 2.0 * np.pi, n_t0, endpoint=False)

    for rp_lo in (0.2, 0.5, 1.0, 2.0):
        rp_hi = 10.0
        rho_max = r.max() / rp_lo
        rp = np.exp(np.linspace(np.log(rp_lo), np.log(rp_hi), n_rp))
        a = field_matrix(r, theta, theta0, rp)
        sv = np.linalg.svd(a, compute_uv=False)
        # normalise: rank at eps relative to the top singular value
        ranks = {e: eps_rank(sv, e) for e in (1e-3, 1e-4, 1e-5, 1e-6)}
        # Fourier bandwidth in theta0 at the worst case (largest rho): the
        # sharpest star's S(theta0) at rp = rp_lo, on a grid fine enough to
        # resolve it (the pole of 2t/(1+t^2) sits at sin(phi) = +-i/rho, so
        # coefficients decay like exp(-k asinh(1/rho)) ~ exp(-k/rho):
        # bandwidth K(eps) ~ rho ln(1/eps))
        i_max = int(np.argmax(r))
        n_fine = 8192
        t0f = np.linspace(0.0, 2.0 * np.pi, n_fine, endpoint=False)
        srow = field_matrix(r[i_max:i_max + 1], theta[i_max:i_max + 1],
                            t0f, rp[:1]).ravel()
        ck = np.abs(np.fft.rfft(srow)) / n_fine
        kc = {e: int(np.max(np.nonzero(ck > e * ck.max())[0], initial=0))
              for e in (1e-4, 1e-5)}
        k_pred = rho_max * np.log(1e5) / np.arcsinh(1.0 / rho_max) \
            / rho_max  # = ln(1/eps)/asinh(1/rho)
        print(f"rp_lo={rp_lo:4.1f}'  rho_max={rho_max:6.1f}  "
              f"rank@1e-3/4/5/6 = {ranks[1e-3]:4d} {ranks[1e-4]:4d} "
              f"{ranks[1e-5]:4d} {ranks[1e-6]:4d}   "
              f"K_theta@1e-4/5 = {kc[1e-4]:4d} {kc[1e-5]:4d}  "
              f"(pole prediction @1e-5: {k_pred:6.0f})")
        sys.stdout.flush()


if __name__ == "__main__":
    main()

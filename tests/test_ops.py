"""Pallas kernel correctness (interpreter mode on CPU) vs the pure-JAX likelihoods."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _inputs(n_walkers=24, n_stars=1000, seed=0):
    rng = np.random.default_rng(seed)
    params = np.column_stack([
        rng.normal(0, 1, n_walkers),
        np.exp(rng.normal(1.5, 0.2, n_walkers)),
        rng.normal(0, 3, n_walkers),
        rng.normal(0, 3, n_walkers),
    ])
    gx = rng.normal(size=n_stars)
    gy = rng.normal(size=n_stars)
    v = 5 * rng.normal(size=n_stars)
    verr2 = (0.5 + rng.random(n_stars)) ** 2
    mask = np.ones(n_stars)
    return params, gx, gy, v, verr2, mask


def _reference_lnlike(params, gx, gy, v, verr2, mask):
    out = np.zeros(params.shape[0])
    for w in range(params.shape[0]):
        v_sys, sigma, vx, vy = params[w]
        norm = verr2 + sigma ** 2
        vlos = v_sys + gx * vx + gy * vy
        t = np.log(2 * np.pi * norm) + (v - vlos) ** 2 / norm
        out[w] = -0.5 * np.sum(t * mask)
    return out


class TestConstantKernel:
    # NOTE: the plain ConstantFit kernel was deleted in round 2 (it tied XLA's
    # fusion and the sufficient-statistics tier supersedes both); only the
    # fixed-background mixture kernel remains.

    def test_mixture_kernel(self):
        from jax.experimental.pallas import tpu as pltpu
        from mcmc_dynamics_tpu.ops.lnlike_kernels import (
            constant_mixture_lnlike_batched)

        rng = np.random.default_rng(3)
        params, gx, gy, v, verr2, mask = _inputs(n_walkers=8, n_stars=200)
        pm = 0.2 + 0.6 * rng.random(200)
        lnb = -5.0 - rng.random(200)
        lgp, lg1mp = np.log(pm), np.log1p(-pm)
        args = [jnp.asarray(a) for a in (params, gx, gy, v, verr2,
                                         lgp, lg1mp, lnb, mask)]
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(constant_mixture_lnlike_batched(
                *args, walker_tile=8, star_chunk=128))

        member = _reference_lnlike(params, gx, gy, v, verr2, np.ones(200))
        expected = np.zeros(8)
        for w in range(8):
            v_sys, sigma, vx, vy = params[w]
            norm = verr2 + sigma ** 2
            vlos = v_sys + gx * vx + gy * vy
            lnm = -0.5 * (np.log(2 * np.pi * norm) + (v - vlos) ** 2 / norm)
            expected[w] = np.logaddexp(lgp + lnm, lg1mp + lnb).sum()
        np.testing.assert_allclose(got, expected, rtol=1e-10)


class TestBackgroundKernel:
    def test_matches_numpy_logsumexp(self):
        from jax.experimental.pallas import tpu as pltpu
        from mcmc_dynamics_tpu.ops import background_logsumexp

        rng = np.random.default_rng(7)
        vcat = rng.normal(25.0, 30.0, size=300)
        v = rng.normal(0.0, 15.0, size=150)
        verr = 0.4 + rng.random(150)
        sigma_int = 2.0
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(background_logsumexp(vcat, v, verr, sigma_int,
                                                  target_tile=64,
                                                  catalog_chunk=128))
        norm = sigma_int ** 2 + verr ** 2
        brute = np.log(np.mean(
            np.exp(-np.subtract.outer(vcat, v) ** 2 / (2 * norm))
            / np.sqrt(2 * np.pi * norm), axis=0))
        np.testing.assert_allclose(got, brute, rtol=1e-8)

    def test_single_stars_device_path(self):
        """SingleStars transparently switches to the device kernel for large
        pairwise problems."""
        from jax.experimental.pallas import tpu as pltpu
        from mcmc_dynamics_tpu import units as u
        from mcmc_dynamics_tpu.background import SingleStars

        rng = np.random.default_rng(8)
        vcat = rng.normal(20.0, 25.0, size=400)
        bg = SingleStars(u.Quantity(vcat, "km/s"))
        v = rng.normal(0.0, 10.0, size=100)
        verr = 0.5 + rng.random(100)

        reference = bg(v, verr)  # small -> numpy path
        bg._DEVICE_THRESHOLD = 1  # force the kernel path
        with pltpu.force_tpu_interpret_mode():
            got = bg(v, verr)
        np.testing.assert_allclose(got, reference, rtol=1e-6)


class TestSufficientStats:
    """O(1)-per-walker ConstantFit likelihood via exact weighted-moment tables."""

    def test_matches_direct_lnlike(self):
        from mcmc_dynamics_tpu.ops import ConstantSufficientStats

        params, gx, gy, v, verr2, mask = _inputs(n_walkers=64, n_stars=3000, seed=5)
        # spread sigma over several orders of magnitude
        params[:, 1] = np.exp(np.random.default_rng(0).uniform(-2, 4, 64))
        stats = ConstantSufficientStats.build(gx, gy, v, verr2, mask)
        got = np.asarray(stats.lnlike(jnp.asarray(params)))
        expected = _reference_lnlike(params, gx, gy, v, verr2, mask)
        np.testing.assert_allclose(got, expected, rtol=1e-7)

    def test_respects_mask(self):
        from mcmc_dynamics_tpu.ops import ConstantSufficientStats

        params, gx, gy, v, verr2, mask = _inputs(n_walkers=8, n_stars=500, seed=6)
        mask[250:] = 0.0
        stats = ConstantSufficientStats.build(gx, gy, v, verr2, mask)
        got = np.asarray(stats.lnlike(jnp.asarray(params)))
        expected = _reference_lnlike(params[:, :4], gx[:250], gy[:250], v[:250],
                                     verr2[:250], np.ones(250))
        np.testing.assert_allclose(got, expected, rtol=1e-7)

    def test_jit_and_scan_compatible(self):
        from mcmc_dynamics_tpu.ops import ConstantSufficientStats
        from mcmc_dynamics_tpu.sampler import init_state, run_ensemble

        params, gx, gy, v, verr2, mask = _inputs(n_walkers=32, n_stars=800, seed=7)
        stats = ConstantSufficientStats.build(gx, gy, v, verr2, mask)

        def batched(thetas):
            ok = thetas[:, 1] > 0
            return jnp.where(ok, stats.lnlike(thetas), -jnp.inf)

        state = init_state(batched, jnp.asarray(params), jax.random.PRNGKey(0),
                           batched=True)
        res = run_ensemble(batched, state, n_steps=200, batched=True)
        chain = np.asarray(res.chain)
        assert np.isfinite(np.asarray(res.log_prob)).all()
        # posterior must match the direct-likelihood posterior
        direct = lambda ths: jnp.asarray(
            _reference_lnlike(np.asarray(ths), gx, gy, v, verr2, mask))
        lp_direct = _reference_lnlike(chain[:, -1, :], gx, gy, v, verr2, mask)
        np.testing.assert_allclose(np.asarray(res.log_prob[:, -1]), lp_direct,
                                   rtol=1e-6)


class TestModelKernel:
    def test_matches_reference(self):
        from jax.experimental.pallas import tpu as pltpu
        from mcmc_dynamics_tpu.ops import model_lnlike_batched

        rng = np.random.default_rng(9)
        W, N = 12, 400
        params = np.column_stack([
            rng.normal(0, 1, W), np.exp(rng.normal(1.5, 0.2, W)),
            0.3 + rng.random(W), rng.normal(0, 3, W), rng.normal(0, 3, W),
            0.5 + rng.random(W)])
        dxm = rng.normal(size=N)
        dym = rng.normal(size=N)
        r2 = dxm ** 2 + dym ** 2
        v = 5 * rng.normal(size=N)
        verr2 = (0.4 + rng.random(N)) ** 2
        mask = np.ones(N)
        mask[350:] = 0.0

        args = [jnp.asarray(a) for a in (params, dxm, dym, r2, v, verr2, mask)]
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(model_lnlike_batched(*args, walker_tile=8,
                                                  star_chunk=128))

        expected = np.zeros(W)
        for w in range(W):
            v_sys, sig, a, vx, vy, rp = params[w]
            v_los = v_sys + 2 * (dym * vx - dxm * vy) / (rp * (1 + r2 / rp ** 2))
            s2 = sig ** 2 / np.sqrt(1 + r2 / a ** 2)
            norm = verr2 + s2
            t = np.log(2 * np.pi * norm) + (v - v_los) ** 2 / norm
            expected[w] = -0.5 * np.sum(t * mask)
        np.testing.assert_allclose(got, expected, rtol=1e-8)

    def test_freecenter_matches_full_trig_reference(self):
        """The free-centre kernel's trig-identity restructure is EXACT: it
        must match the per-pair spherical projection at any centre offset
        (including a 5-degree one), not just in an arcsecond box."""
        from jax.experimental.pallas import tpu as pltpu
        from mcmc_dynamics_tpu.ops import model_freecenter_lnlike_batched

        rng = np.random.default_rng(5)
        W, N = 12, 300
        M = 10800.0 / np.pi
        ra_c0, dec_c0 = np.radians(201.7), np.radians(-47.48)
        ra = ra_c0 + 4e-4 * rng.normal(size=N)
        dec = dec_c0 + 4e-4 * rng.normal(size=N)
        v = 5 * rng.normal(size=N)
        verr2 = (0.4 + rng.random(N)) ** 2
        mask = np.ones(N)
        mask[260:] = 0.0

        ra0, dec0 = np.median(ra), np.median(dec)
        s0, c0 = np.sin(dec0), np.cos(dec0)
        d = ra - ra0
        pm = M * np.cos(dec) * np.cos(d)
        qm = M * np.cos(dec) * np.sin(d)
        sm = M * np.sin(dec)
        dx0, dy0, b0 = -qm, sm * c0 - pm * s0, sm * s0 + pm * c0

        dra = np.concatenate([3e-4 * rng.normal(size=W - 1),
                              [np.radians(5.0)]])
        ddec = np.concatenate([3e-4 * rng.normal(size=W - 1),
                               [np.radians(-5.0)]])
        params = np.column_stack([
            rng.normal(0, 1, W), np.exp(rng.normal(1.5, 0.2, W)),
            0.3 + rng.random(W), rng.normal(0, 3, W), rng.normal(0, 3, W),
            0.5 + rng.random(W), dra, ddec])

        args = [jnp.asarray(a)
                for a in (params, dx0, dy0, pm, qm, b0, v, verr2, mask)]
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(model_freecenter_lnlike_batched(
                *args, s0=float(s0), c0=float(c0), walker_tile=8,
                star_chunk=128))

        expected = np.zeros(W)
        for w in range(W):
            v_sys, sig, a, vx, vy, rp, e, n_ = params[w]
            rc, dc = ra0 + e, dec0 + n_
            dx = -M * np.cos(dec) * np.sin(ra - rc)
            dy = M * (np.sin(dec) * np.cos(dc)
                      - np.cos(dec) * np.sin(dc) * np.cos(ra - rc))
            r2 = dx ** 2 + dy ** 2
            v_los = v_sys + 2 * (dy * vx - dx * vy) / (rp * (1 + r2 / rp ** 2))
            s2 = sig ** 2 / np.sqrt(1 + r2 / a ** 2)
            norm = verr2 + s2
            t = np.log(2 * np.pi * norm) + (v - v_los) ** 2 / norm
            expected[w] = -0.5 * np.sum(t * mask)
        np.testing.assert_allclose(got, expected, rtol=1e-11)

    def test_boundary_walker_survives_padded_lanes(self):
        """A prior-legal boundary walker (sigma_max = 0) with zero-padded
        star lanes must produce a finite lnlike — the padded lane used to
        hit rsqrt(0) = inf and inf * mask(0) = NaN, freezing the walker."""
        from jax.experimental.pallas import tpu as pltpu
        from mcmc_dynamics_tpu.ops import (model_lnlike_batched,
                                           constant_mixture_lnlike_batched)

        rng = np.random.default_rng(3)
        N = 100                      # NOT a multiple of star_chunk -> padding
        dxm, dym = rng.normal(size=N), rng.normal(size=N)
        r2 = dxm ** 2 + dym ** 2
        v = rng.normal(size=N)
        verr2 = (0.5 + rng.random(N)) ** 2
        mask = np.ones(N)
        # walker 0: sigma_max = 0 (bound); walker 1: ordinary
        params = np.array([[0.0, 0.0, 1.0, 0.0, 0.0, 1.0],
                           [0.0, 5.0, 1.0, 1.0, 1.0, 1.0]])
        args = [jnp.asarray(a) for a in (params, dxm, dym, r2, v, verr2, mask)]
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(model_lnlike_batched(*args, walker_tile=8,
                                                  star_chunk=128))
        assert np.isfinite(got).all(), got

        lgp = np.log(np.full(N, 0.7))
        lgb = np.log(np.full(N, 0.3)) - 5.0
        cparams = np.array([[0.0, 0.0, 0.0, 0.0],    # sigma_max = 0
                            [0.0, 5.0, 1.0, 1.0]])
        gx, gy = dym / np.sqrt(r2), -dxm / np.sqrt(r2)
        with pltpu.force_tpu_interpret_mode():
            got_c = np.asarray(constant_mixture_lnlike_batched(
                jnp.asarray(cparams), jnp.asarray(gx), jnp.asarray(gy),
                jnp.asarray(v), jnp.asarray(verr2), jnp.asarray(lgp),
                jnp.asarray(np.log(0.3) * np.ones(N)), jnp.asarray(lgb),
                jnp.asarray(mask), walker_tile=8, star_chunk=128))
        assert np.isfinite(got_c).all(), got_c


def _model_inputs(n_stars=1500, seed=11):
    rng = np.random.default_rng(seed)
    dxm = 0.5 * rng.normal(size=n_stars)
    dym = 0.5 * rng.normal(size=n_stars)
    v = 5.0 * rng.normal(size=n_stars)
    verr2 = (0.5 + 2.0 * rng.random(n_stars)) ** 2
    mask = np.ones(n_stars)
    return dxm, dym, v, verr2, mask


def _model_reference_lnlike(params, dxm, dym, v, verr2, mask):
    out = np.zeros(params.shape[0])
    u = dxm ** 2 + dym ** 2
    for w in range(params.shape[0]):
        v_sys, sig, a, vx, vy, rp = params[w]
        v_los = v_sys + 2.0 * rp * (dym * vx - dxm * vy) / (rp ** 2 + u)
        s2 = sig ** 2 / np.sqrt(1 + u / a ** 2)
        norm = verr2 + s2
        t = np.log(2 * np.pi * norm) + (v - v_los) ** 2 / norm
        out[w] = -0.5 * np.sum(t * mask)
    return out


def _model_box(n_walkers, seed=12):
    rng = np.random.default_rng(seed)
    return np.column_stack([
        rng.uniform(-10, 10, n_walkers),
        np.exp(rng.uniform(np.log(0.3), np.log(100.0), n_walkers)),
        np.exp(rng.uniform(np.log(0.05), np.log(10.0), n_walkers)),  # a (arcmin)
        rng.uniform(-10, 10, n_walkers),
        rng.uniform(-10, 10, n_walkers),
        np.exp(rng.uniform(np.log(0.05), np.log(10.0), n_walkers)),  # r_peak
    ])


class TestModelSufficientStats:
    """Radially-binned Chebyshev moment tables for the ModelFit likelihood."""

    def test_matches_direct_lnlike(self):
        from mcmc_dynamics_tpu.ops import ModelSufficientStats

        dxm, dym, v, verr2, mask = _model_inputs()
        stats = ModelSufficientStats.build(dxm, dym, v, verr2, mask, s_max=1e6)
        params = _model_box(256)
        got = np.asarray(stats.lnlike(jnp.asarray(params)))
        expected = _model_reference_lnlike(params, dxm, dym, v, verr2, mask)
        err = np.abs(got - expected)
        # 2nd-order radial binning: small absolute bias, tiny relative error
        assert err.max() < 0.05, err.max()
        assert np.median(err) < 1e-3
        np.testing.assert_allclose(got, expected, rtol=5e-5)

    def test_respects_mask(self):
        from mcmc_dynamics_tpu.ops import ModelSufficientStats

        dxm, dym, v, verr2, mask = _model_inputs(n_stars=600, seed=13)
        mask[300:] = 0.0
        stats = ModelSufficientStats.build(dxm, dym, v, verr2, mask)
        params = _model_box(16, seed=14)
        got = np.asarray(stats.lnlike(jnp.asarray(params)))
        expected = _model_reference_lnlike(params, dxm[:300], dym[:300], v[:300],
                                           verr2[:300], np.ones(300))
        np.testing.assert_allclose(got, expected, rtol=5e-5, atol=0.02)

    def test_modelfit_dispatch_and_equality(self):
        """ModelFit.build_lnprob_batched picks the sufficient tier by default and
        agrees with the direct (XLA) tier."""
        import os

        from mcmc_dynamics_tpu import units as u
        from mcmc_dynamics_tpu.models import ModelFit
        from mcmc_dynamics_tpu.utils import DataReader

        ra_c, dec_c = 56.345, -26.675
        rng = np.random.default_rng(15)
        n = 400
        data = DataReader({
            "ra": u.Quantity(ra_c + 0.03 * rng.normal(size=n), "deg"),
            "dec": u.Quantity(dec_c + 0.03 * rng.normal(size=n), "deg"),
            "v": u.Quantity(5.0 * rng.normal(size=n), "km/s"),
            "verr": u.Quantity(0.5 + 0.5 * rng.random(n), "km/s"),
        })
        params = ModelFit.default_parameters()
        params["ra_center"].set(value=ra_c, fixed=True)
        params["dec_center"].set(value=dec_c, fixed=True)
        params["r_peak"].set(min=1.0, max=600.0)
        params["a"].set(min=1.0, max=600.0)
        fit = ModelFit(data, parameters=params)
        # auto mode applies a catalog-size threshold (the table tier is
        # approximate): not eligible at 400 stars, forced via the env knob
        assert not fit._sufficient_eligible()

        thetas = np.column_stack([
            rng.normal(0, 2, 32),
            np.exp(rng.uniform(np.log(1.0), np.log(60.0), 32)),
            rng.uniform(30, 500, 32),   # a (arcsec, declared unit)
            rng.normal(0, 3, 32),
            rng.normal(0, 3, 32),
            rng.uniform(30, 500, 32),   # r_peak (arcsec)
        ])
        thetas = jnp.asarray(thetas, fit.dtype)

        try:
            os.environ["MCMC_TPU_LNPROB"] = "sufficient"
            assert fit._sufficient_eligible()
            fast = fit.build_lnprob_batched()       # forced tier = sufficient
            os.environ["MCMC_TPU_LNPROB"] = "direct"
            os.environ["MCMC_TPU_DISABLE_PALLAS"] = "1"
            assert not fit._sufficient_eligible()
            direct = fit.build_lnprob_batched()
        finally:
            del os.environ["MCMC_TPU_LNPROB"], os.environ["MCMC_TPU_DISABLE_PALLAS"]
        np.testing.assert_allclose(np.asarray(fast(thetas)),
                                   np.asarray(direct(thetas)),
                                   rtol=1e-5, atol=5e-3)

    def test_jit_and_scan_compatible(self):
        from mcmc_dynamics_tpu.ops import ModelSufficientStats
        from mcmc_dynamics_tpu.sampler import init_state, run_ensemble

        dxm, dym, v, verr2, mask = _model_inputs(n_stars=500, seed=16)
        stats = ModelSufficientStats.build(dxm, dym, v, verr2, mask)
        rng = np.random.default_rng(17)
        pos = np.column_stack([
            rng.normal(0, 1, 32), np.exp(rng.normal(1.5, 0.2, 32)),
            0.3 + rng.random(32), rng.normal(0, 3, 32), rng.normal(0, 3, 32),
            0.5 + rng.random(32)])

        def batched(thetas):
            ok = (thetas[:, 1] > 0) & (thetas[:, 2] > 0) & (thetas[:, 5] > 0)
            return jnp.where(ok, stats.lnlike(thetas), -jnp.inf)

        state = init_state(batched, jnp.asarray(pos), jax.random.PRNGKey(0),
                           batched=True)
        res = run_ensemble(batched, state, n_steps=100, batched=True)
        chain = np.asarray(res.chain)
        assert np.isfinite(np.asarray(res.log_prob)).all()
        lp_direct = _model_reference_lnlike(chain[:, -1, :], dxm, dym, v, verr2,
                                            mask)
        np.testing.assert_allclose(np.asarray(res.log_prob[:, -1]), lp_direct,
                                   rtol=1e-5, atol=5e-3)


class TestModelMixtureKernel:
    """Fused ModelFit + density-mixture kernel vs the pure-JAX tier."""

    def _fit(self, cls, seed=21, **kwargs):
        from mcmc_dynamics_tpu import units as u
        from mcmc_dynamics_tpu.utils import DataReader

        ra_c, dec_c = 56.345, -26.675
        rng = np.random.default_rng(seed)
        n = 300
        data = DataReader({
            "ra": u.Quantity(ra_c + 0.03 * rng.normal(size=n), "deg"),
            "dec": u.Quantity(dec_c + 0.03 * rng.normal(size=n), "deg"),
            "v": u.Quantity(5.0 * rng.normal(size=n), "km/s"),
            "verr": u.Quantity(0.5 + 0.5 * rng.random(n), "km/s"),
            "density": 10.0 ** rng.uniform(-1, 2, n),
        })
        params = cls.default_parameters()
        params["ra_center"].set(value=ra_c, fixed=True)
        params["dec_center"].set(value=dec_c, fixed=True)
        return cls(data, parameters=params, **kwargs)

    def _thetas(self, with_bg_cols, n=16, seed=22):
        rng = np.random.default_rng(seed)
        cols = [rng.normal(0, 2, n),
                np.exp(rng.uniform(np.log(3.0), np.log(30.0), n)),
                rng.uniform(30, 300, n),      # a (arcsec)
                rng.normal(0, 3, n),
                rng.normal(0, 3, n),
                rng.uniform(30, 300, n)]      # r_peak (arcsec)
        if with_bg_cols:
            cols += [rng.normal(0, 30, n), np.exp(rng.uniform(2, 4, n))]
        cols += [10.0 ** rng.uniform(-1, 1, n)]  # f_back
        return np.column_stack(cols)

    def test_parametric_gb_matches_pure_jax(self):
        from jax.experimental.pallas import tpu as pltpu
        from mcmc_dynamics_tpu.models import ModelFitGB
        from mcmc_dynamics_tpu.ops.lnlike_kernels import \
            model_mixture_lnlike_batched

        fit = self._fit(ModelFitGB)
        assert fit.compiled.free_names == fit._KERNEL_FREE_NAMES
        thetas = self._thetas(with_bg_cols=True)
        want = np.array([float(fit.lnlike(t)) for t in thetas])

        data = fit.prepare_data(dict(fit._data_arrays))
        dxm, dym = data["dxm"], data["dym"]
        r2 = dxm * dxm + dym * dym
        dens = np.asarray(data["density"], np.float64)
        col_scale = np.ones(9)
        col_scale[2] = col_scale[5] = 1.0 / 60.0  # arcsec -> arcmin
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(model_mixture_lnlike_batched(
                jnp.asarray(thetas * col_scale), dxm, dym, r2, data["v"],
                data["verr"] * data["verr"], jnp.asarray(dens),
                jnp.asarray(np.log(dens)), jnp.zeros_like(data["v"]),
                jnp.ones_like(data["v"]), parametric_bg=True,
                walker_tile=8, star_chunk=128))
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_zero_f_back_with_padding_is_finite(self):
        """Regression: f_back == 0 (the prior's lower bound) used to NaN-poison
        every walker whenever the catalog was padded — padded lanes have
        density 0, so log(d + f_back) was -inf and (finite - -inf) * mask(0)
        produced inf * 0 = NaN inside the kernel accumulator."""
        from jax.experimental.pallas import tpu as pltpu
        from mcmc_dynamics_tpu.models import ModelFitGB
        from mcmc_dynamics_tpu.ops.lnlike_kernels import \
            model_mixture_lnlike_batched

        fit = self._fit(ModelFitGB)
        thetas = self._thetas(with_bg_cols=True)
        thetas[::2, 8] = 0.0              # f_back = 0 for half the walkers
        want = np.array([float(fit.lnlike(t)) for t in thetas])
        assert np.isfinite(want).all()

        data = fit.prepare_data(dict(fit._data_arrays))
        dxm, dym = data["dxm"], data["dym"]
        r2 = dxm * dxm + dym * dym
        col_scale = np.ones(9)
        col_scale[2] = col_scale[5] = 1.0 / 60.0
        with pltpu.force_tpu_interpret_mode():
            # n=300 stars with star_chunk=128 -> 84 padded lanes
            got = np.asarray(model_mixture_lnlike_batched(
                jnp.asarray(thetas * col_scale), dxm, dym, r2, data["v"],
                data["verr"] * data["verr"], data["density"],
                data["ln_density"], jnp.zeros_like(data["v"]),
                jnp.ones_like(data["v"]), parametric_bg=True,
                walker_tile=8, star_chunk=128))
        np.testing.assert_allclose(got, want, rtol=1e-9)

    def test_subclass_never_gets_base_kernel(self):
        """A subclass overriding the physics must not silently inherit the
        hardcoded Plummer + Lynden-Bell mixture kernel."""
        from mcmc_dynamics_tpu.models import ModelFitGB

        class TweakedGB(ModelFitGB):
            def dispersion_field(self, p, data):
                return 2.0 * super().dispersion_field(p, data)

        fit = self._fit(TweakedGB)
        assert not fit._canonical_layout()
        assert not fit._pallas_eligible()
        base = self._fit(ModelFitGB)
        assert base._canonical_layout()

    def test_star_chunk_must_be_multiple_of_four(self):
        import pytest
        from mcmc_dynamics_tpu.ops.lnlike_kernels import model_lnlike_batched

        n = 8
        arrs = [jnp.ones(n) for _ in range(6)]
        with pytest.raises(ValueError, match="multiple of 4"):
            model_lnlike_batched(jnp.ones((4, 6)), *arrs,
                                 walker_tile=4, star_chunk=6)

    def test_fixed_background_matches_pure_jax(self):
        from jax.experimental.pallas import tpu as pltpu
        from mcmc_dynamics_tpu import units as u
        from mcmc_dynamics_tpu.background import Gaussian
        from mcmc_dynamics_tpu.models import ModelFitConstantBackground
        from mcmc_dynamics_tpu.ops.lnlike_kernels import \
            model_mixture_lnlike_batched

        bg = Gaussian(u.Quantity(20.0, "km/s"), u.Quantity(60.0, "km/s"))
        fit = self._fit(ModelFitConstantBackground, background=bg)
        # the kernel layout requires the unused parametric-background
        # parameters of the shared defaults file to be fixed
        fit.parameters["v_back"].set(value=0.0, fixed=True)
        fit.parameters["sigma_back"].set(value=50.0, fixed=True)
        fit._compiled = None  # force recompile after mutation
        assert fit.compiled.free_names == fit._KERNEL_FREE_NAMES

        thetas = self._thetas(with_bg_cols=False)
        want = np.array([float(fit.lnlike(t)) for t in thetas])

        data = fit.prepare_data(dict(fit._data_arrays))
        dxm, dym = data["dxm"], data["dym"]
        r2 = dxm * dxm + dym * dym
        dens = np.asarray(data["density"], np.float64)
        col_scale = np.ones(7)
        col_scale[2] = col_scale[5] = 1.0 / 60.0
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(model_mixture_lnlike_batched(
                jnp.asarray(thetas * col_scale), dxm, dym, r2, data["v"],
                data["verr"] * data["verr"], jnp.asarray(dens),
                jnp.asarray(np.log(dens)),
                data["lnlike_fixed_background"],
                jnp.ones_like(data["v"]), parametric_bg=False,
                walker_tile=8, star_chunk=128))
        np.testing.assert_allclose(got, want, rtol=1e-9)


class TestDoubleModelKernel:
    def test_matches_pure_jax(self):
        from jax.experimental.pallas import tpu as pltpu
        from mcmc_dynamics_tpu import units as u
        from mcmc_dynamics_tpu.models import DoubleModelFit
        from mcmc_dynamics_tpu.ops.lnlike_kernels import \
            double_model_lnlike_batched
        from mcmc_dynamics_tpu.utils import DataReader

        ra_c, dec_c = 56.345, -26.675
        rng = np.random.default_rng(31)
        n = 250
        data = DataReader({
            "ra": u.Quantity(ra_c + 0.03 * rng.normal(size=n), "deg"),
            "dec": u.Quantity(dec_c + 0.03 * rng.normal(size=n), "deg"),
            "v": u.Quantity(5.0 * rng.normal(size=n), "km/s"),
            "verr": u.Quantity(0.5 + 0.5 * rng.random(n), "km/s"),
        })
        params = DoubleModelFit.default_parameters()
        params["ra_center"].set(value=ra_c, fixed=True)
        params["dec_center"].set(value=dec_c, fixed=True)
        fit = DoubleModelFit(data, parameters=params)
        assert fit._canonical_layout()

        W = 12
        thetas = np.column_stack([
            rng.normal(0, 2, W),
            np.exp(rng.uniform(np.log(3.0), np.log(30.0), W)),
            rng.uniform(30, 300, W),      # a (arcsec)
            rng.normal(0, 5, W),
            rng.normal(0, 5, W),
            rng.uniform(60, 300, W),      # r_peak (arcsec)
            rng.normal(0, 2, W),
            rng.normal(0, 2, W),
            rng.uniform(10, 50, W),       # r_peak_c <= r_peak
        ])
        want = np.array([float(fit.lnlike(t)) for t in thetas])

        d = fit.prepare_data(dict(fit._data_arrays))
        dxm, dym = d["dxm"], d["dym"]
        r2 = dxm * dxm + dym * dym
        col_scale = np.ones(9)
        col_scale[2] = col_scale[5] = col_scale[8] = 1.0 / 60.0
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(double_model_lnlike_batched(
                jnp.asarray(thetas * col_scale), dxm, dym, r2, d["v"],
                d["verr"] * d["verr"], jnp.ones_like(d["v"]),
                walker_tile=8, star_chunk=128))
        np.testing.assert_allclose(got, want, rtol=1e-9)


class TestConstantGBKernel:
    def test_matches_pure_jax(self):
        from jax.experimental.pallas import tpu as pltpu
        from mcmc_dynamics_tpu import units as u
        from mcmc_dynamics_tpu.models import ConstantFitGB
        from mcmc_dynamics_tpu.ops.lnlike_kernels import \
            constant_gb_lnlike_batched
        from mcmc_dynamics_tpu.utils import DataReader

        ra_c, dec_c = 56.345, -26.675
        rng = np.random.default_rng(41)
        n = 220
        data = DataReader({
            "ra": u.Quantity(ra_c + 0.03 * rng.normal(size=n), "deg"),
            "dec": u.Quantity(dec_c + 0.03 * rng.normal(size=n), "deg"),
            "v": u.Quantity(5.0 * rng.normal(size=n), "km/s"),
            "verr": u.Quantity(0.5 + 0.5 * rng.random(n), "km/s"),
            "density": 10.0 ** rng.uniform(-1, 2, n),
        })
        params = ConstantFitGB.default_parameters()
        params["ra_center"].set(value=ra_c, fixed=True)
        params["dec_center"].set(value=dec_c, fixed=True)
        fit = ConstantFitGB(data, parameters=params)
        assert fit._canonical_layout()

        W = 10
        thetas = np.column_stack([
            rng.normal(0, 2, W),
            np.exp(rng.uniform(np.log(3.0), np.log(30.0), W)),
            rng.normal(0, 5, W),
            rng.normal(0, 5, W),
            rng.normal(0, 30, W),
            np.exp(rng.uniform(2, 4, W)),
            10.0 ** rng.uniform(-1, 1, W),
        ])
        want = np.array([float(fit.lnlike(t)) for t in thetas])

        d = fit.prepare_data(dict(fit._data_arrays))
        dens = np.asarray(d["density"], np.float64)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(constant_gb_lnlike_batched(
                jnp.asarray(thetas), d["gx"], d["gy"], d["v"],
                d["verr"] * d["verr"], jnp.asarray(dens),
                jnp.asarray(np.log(dens)), jnp.ones_like(d["v"]),
                walker_tile=8, star_chunk=128))
        np.testing.assert_allclose(got, want, rtol=1e-9)

        # regression: f_back = 0 with padded lanes (n=220 % 128 != 0) used to
        # produce NaN via log(0 + 0) = -inf on the padding (confirmed repro)
        thetas[:, 6] = 0.0
        want0 = np.array([float(fit.lnlike(t)) for t in thetas])
        with pltpu.force_tpu_interpret_mode():
            got0 = np.asarray(constant_gb_lnlike_batched(
                jnp.asarray(thetas), d["gx"], d["gy"], d["v"],
                d["verr"] * d["verr"], d["density"], d["ln_density"],
                jnp.ones_like(d["v"]), walker_tile=8, star_chunk=128))
        assert np.isfinite(got0).all()
        np.testing.assert_allclose(got0, want0, rtol=1e-9)


class TestDoubleModelGBKernel:
    def test_matches_pure_jax(self):
        from jax.experimental.pallas import tpu as pltpu
        from mcmc_dynamics_tpu import units as u
        from mcmc_dynamics_tpu.models import DoubleModelFitGB
        from mcmc_dynamics_tpu.ops.lnlike_kernels import \
            double_model_gb_lnlike_batched
        from mcmc_dynamics_tpu.utils import DataReader

        ra_c, dec_c = 56.345, -26.675
        rng = np.random.default_rng(51)
        n = 200
        data = DataReader({
            "ra": u.Quantity(ra_c + 0.03 * rng.normal(size=n), "deg"),
            "dec": u.Quantity(dec_c + 0.03 * rng.normal(size=n), "deg"),
            "v": u.Quantity(5.0 * rng.normal(size=n), "km/s"),
            "verr": u.Quantity(0.5 + 0.5 * rng.random(n), "km/s"),
            "density": 10.0 ** rng.uniform(-1, 2, n),
        })
        params = DoubleModelFitGB.default_parameters()
        params["ra_center"].set(value=ra_c, fixed=True)
        params["dec_center"].set(value=dec_c, fixed=True)
        fit = DoubleModelFitGB(data, parameters=params)
        assert fit._canonical_layout()

        W = 10
        thetas = np.column_stack([
            rng.normal(0, 2, W),
            np.exp(rng.uniform(np.log(3.0), np.log(30.0), W)),
            rng.uniform(30, 300, W),      # a (arcsec)
            rng.normal(0, 5, W),
            rng.normal(0, 5, W),
            rng.uniform(60, 300, W),      # r_peak
            rng.normal(0, 2, W),
            rng.normal(0, 2, W),
            rng.uniform(10, 50, W),       # r_peak_c
            rng.normal(0, 30, W),
            np.exp(rng.uniform(2, 4, W)),
            10.0 ** rng.uniform(-1, 0, W),
        ])
        want = np.array([float(fit.lnlike(t)) for t in thetas])

        d = fit.prepare_data(dict(fit._data_arrays))
        dxm, dym = d["dxm"], d["dym"]
        r2 = dxm * dxm + dym * dym
        dens = np.asarray(d["density"], np.float64)
        col_scale = np.ones(12)
        col_scale[2] = col_scale[5] = col_scale[8] = 1.0 / 60.0
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(double_model_gb_lnlike_batched(
                jnp.asarray(thetas * col_scale), dxm, dym, r2, d["v"],
                d["verr"] * d["verr"], jnp.asarray(dens),
                jnp.asarray(np.log(dens)), jnp.ones_like(d["v"]),
                walker_tile=8, star_chunk=128))
        np.testing.assert_allclose(got, want, rtol=1e-9)


class TestKernelGuards:
    def test_vmem_size_guard(self):
        """Direct kernels hold the star table in VMEM; the eligibility guard
        must route over-budget catalogs to the XLA path instead of letting
        Mosaic fail at compile."""
        from mcmc_dynamics_tpu.ops.lnlike_kernels import star_table_fits_vmem

        assert star_table_fits_vmem(10_000)
        assert star_table_fits_vmem(200_000)
        assert not star_table_fits_vmem(1_000_000)

    def test_sufficient_build_binarises_mask(self):
        """Fractional masks would enter the value and derivative tables with
        different powers; build() treats any positive mask as membership."""
        from mcmc_dynamics_tpu.ops import ConstantSufficientStats

        rng = np.random.default_rng(0)
        n = 500
        gx, gy = rng.normal(size=n), rng.normal(size=n)
        v = 3.0 * rng.normal(size=n)
        verr2 = (0.5 + rng.random(n)) ** 2
        frac = np.where(rng.random(n) < 0.7, 0.5, 0.0)   # fractional weights
        binary = (frac > 0).astype(float)
        s_frac = ConstantSufficientStats.build(gx, gy, v, verr2, mask=frac)
        s_bin = ConstantSufficientStats.build(gx, gy, v, verr2, mask=binary)
        theta = jnp.asarray(np.array([[0.1, 4.0, 0.5, -0.3]]))
        np.testing.assert_allclose(np.asarray(s_frac.lnlike(theta)),
                                   np.asarray(s_bin.lnlike(theta)), rtol=1e-12)

    def test_empty_background_catalog_rejected(self):
        from mcmc_dynamics_tpu.ops import background_logsumexp

        with pytest.raises(ValueError, match="Empty background"):
            background_logsumexp(np.zeros(0), np.array([1.0]), np.array([1.0]))

"""JAM polar-grid moment tier (models/jam/grid.py): interpolation accuracy,
likelihood parity with the direct engine, dispatch rules and cache salting.

Order certification lives in tools/probe_jam_grid.py (full incl/beta/kappa/BH
sweep against a converged-quadrature truth); these tests pin the measured
behaviour at the production defaults.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mcmc_dynamics_tpu.models import Axisymmetric
from mcmc_dynamics_tpu.models.jam.grid import JamGridSpec, jam_grid_moments
from mcmc_dynamics_tpu.models.jam.moments import jam_los_moments

from test_axisymmetric import (DEC_C, RA_C, _base_params, _mge_pair,
                               _mock_jam_data)

LUM_I = np.array([8000.0, 4000.0, 1000.0, 200.0])
LUM_S = np.array([3.0, 12.0, 40.0, 120.0])
LUM_Q = np.array([0.95, 0.85, 0.75, 0.9])
MASS_I = LUM_I * np.array([1.0, 1.2, 0.9, 1.1])


def _stars(n=400, seed=3):
    rng = np.random.default_rng(seed)
    r = np.exp(rng.uniform(np.log(0.1), np.log(250.0), n))
    phi = rng.uniform(-np.pi, np.pi, n)
    return r * np.cos(phi), r * np.sin(phi)


def _moments_closure(**over):
    kw = dict(d=5.0, beta=0.0, kappa=1.0, mscale=2.0,
              incl=np.deg2rad(55.0), mbh=0.0, rbh=1.0, n_u=24, n_zeta=32)
    kw.update(over)

    def at(gx, gy):
        res = jam_los_moments(gx, gy, LUM_I, LUM_S, LUM_Q,
                              MASS_I, LUM_S, LUM_Q, **kw)
        return res.vz, res.v2zz, res.valid

    return at


class TestGridMoments:
    @pytest.mark.parametrize("over", [
        {},                                    # the hardest measured case
        {"mbh": 3.0e5, "incl": np.deg2rad(75.0), "beta": 0.2, "kappa": 0.6},
        {"kappa": 0.0, "incl": np.deg2rad(88.0)},
    ])
    def test_matches_direct_engine(self, over):
        """Grid (128, 12) reproduces the direct engine at scattered stars to
        within the engine's own quadrature noise class (probe: grid-vs-truth
        error equals direct-vs-truth error, ~6e-4 dispersion-relative)."""
        dx, dy = _stars()
        r, phi = np.hypot(dx, dy), np.arctan2(dy, dx)
        theta0 = 0.37
        spec = JamGridSpec.build(dx, dy, n_r=128, n_phi=12, dtype=jnp.float64)
        at = _moments_closure(**over)
        vz_g, v2_g, valid = jam_grid_moments(spec, at, jnp.asarray(theta0))
        assert bool(valid)

        ref = at(jnp.asarray(r * np.cos(phi - theta0)),
                 jnp.asarray(r * np.sin(phi - theta0)))
        sig = np.sqrt(np.asarray(ref[1]) - np.asarray(ref[0]) ** 2)
        dvz = np.max(np.abs(np.asarray(vz_g) - np.asarray(ref[0])) / sig)
        sig_g = np.sqrt(np.maximum(
            np.asarray(v2_g) - np.asarray(vz_g) ** 2, 0.0))
        dsig = np.max(np.abs(sig_g - sig) / sig)
        # the reference here is the engine at its PRODUCTION orders, so this
        # difference stacks the grid truncation on top of the engine's own
        # quadrature noise (largest with a BH); the tight certification
        # against converged truth is tools/probe_jam_grid.py (8.6e-4 worst)
        assert dvz < 4.0e-3
        assert dsig < 1.5e-3

    def test_rotation_frame_shift_exact(self):
        """The theta0 shift is algebraic in harmonic space: rotating the
        stars and shifting the reconstruction angle must agree to machine
        precision with evaluating at theta0 = 0."""
        dx, dy = _stars(n=100)
        spec = JamGridSpec.build(dx, dy, n_r=64, n_phi=8, dtype=jnp.float64)
        at = _moments_closure(kappa=0.7)
        vz0, v20, _ = jam_grid_moments(spec, at, jnp.asarray(0.0))

        r, phi = np.hypot(dx, dy), np.arctan2(dy, dx)
        th = 1.1
        rot = JamGridSpec.build(r * np.cos(phi + th), r * np.sin(phi + th),
                                n_r=64, n_phi=8, dtype=jnp.float64)
        vz1, v21, _ = jam_grid_moments(rot, at, jnp.asarray(th))
        np.testing.assert_allclose(np.asarray(vz1), np.asarray(vz0),
                                   rtol=0, atol=1e-8)
        np.testing.assert_allclose(np.asarray(v21), np.asarray(v20),
                                   rtol=1e-10)

    def test_invalid_model_flag_passes_through(self):
        dx, dy = _stars(n=50)
        spec = JamGridSpec.build(dx, dy, n_r=32, n_phi=8, dtype=jnp.float64)
        at = _moments_closure(beta=1.5)  # beta >= 1 is invalid
        _, _, valid = jam_grid_moments(spec, at, jnp.asarray(0.0))
        assert not bool(valid)


class TestLnprobParity:
    def _fit(self, monkeypatch, mode, n=300, **extra):
        monkeypatch.setenv("MCMC_TPU_JAM", mode)
        data, lum, mass = _mock_jam_data(n=n, seed=5)
        params = _base_params()
        for name in ("mlr", "kappa_x", "kappa_y"):
            params[name].set(fixed=False)
        fit = Axisymmetric(data, parameters=params, mge_mass=mass,
                           mge_lum=lum, **extra)
        fit.jam_grid_min_stars = 100
        return fit

    def test_grid_lnprob_matches_direct(self, monkeypatch):
        fit = self._fit(monkeypatch, "grid")
        # walkers near the mock truth (mlr=2, kappa=(0.5, 0)): wide default
        # initials can draw kappa > 1, where the rotation model itself goes
        # unphysical (v2zz < vz^2) and BOTH paths correctly return -inf
        rng = np.random.default_rng(11)
        pos = (np.array([2.0, 0.5, 0.0])[None, :]
               + rng.normal(0, [0.1, 0.05, 0.05], (8, 3)))
        assert fit._jam_grid_spec() is not None
        lp_grid = np.asarray(fit.build_lnprob_batched()(
            jnp.asarray(pos, fit.dtype)))

        monkeypatch.setenv("MCMC_TPU_JAM", "direct")
        assert fit._jam_grid_spec() is None
        lp_dir = np.asarray(fit.build_lnprob_batched()(
            jnp.asarray(pos, fit.dtype)))

        assert np.isfinite(lp_grid).all()
        # per-star moment error ~6e-4 dispersion-relative -> lnL differences
        # well under O(1) at 300 stars
        np.testing.assert_allclose(lp_grid, lp_dir, rtol=0, atol=1.0)
        # and the agreement must be much tighter than the lnL spread
        assert np.std(lp_dir) > 10 * np.max(np.abs(lp_grid - lp_dir))

    def test_grid_chunked_matches_vmap(self, monkeypatch):
        """jam_grid_chunk (the tier's own walker chunk, tuned separately from
        lnprob_chunk on TPU) is a pure batching knob: lax.map(batch_size=c)
        over the walkers must reproduce the un-chunked vmap to accumulation-
        order noise, and the chunk must salt the program cache."""
        fit = self._fit(monkeypatch, "grid")
        rng = np.random.default_rng(12)
        pos = (np.array([2.0, 0.5, 0.0])[None, :]
               + rng.normal(0, [0.1, 0.05, 0.05], (12, 3)))
        fit.jam_grid_chunk = 64                       # > W: pure vmap
        salt_vmap = fit.program_cache_salt()
        lp_vmap = np.asarray(fit.build_lnprob_batched()(
            jnp.asarray(pos, fit.dtype)))
        fit.jam_grid_chunk = 5                        # ragged lax.map path
        assert fit.program_cache_salt() != salt_vmap
        lp_map = np.asarray(fit.build_lnprob_batched()(
            jnp.asarray(pos, fit.dtype)))
        assert np.isfinite(lp_vmap).all()
        np.testing.assert_allclose(lp_map, lp_vmap, rtol=1e-12)

    def test_grid_lnprob_matches_direct_free_mbh(self, monkeypatch):
        """The production IMBH workload: mbh SAMPLED through the grid tier.
        The per-walker grid solve carries the closed-form erfcx BH chain, so
        a live black-hole mass must ride the tier exactly like the fixed-mbh
        case (the moment-level BH box is certified in TestGridMoments /
        tools/probe_jam_grid.py; this pins lnprob-level parity — the BH cusp
        is the steepest radial feature the 128-node log grid must resolve).
        Reference workload: the cjam IMBH fits, axisymmetric.py:288-310."""
        monkeypatch.setenv("MCMC_TPU_JAM", "grid")
        data, lum, mass = _mock_jam_data(n=300, seed=5)
        params = _base_params()
        for name in ("mlr", "kappa_x", "kappa_y"):
            params[name].set(fixed=False)
        params["mbh"].set(value=1e5, min=0.0, max=1e6, fixed=False,
                          initials="rng.uniform(1e4, 3e5, size=n)")
        fit = Axisymmetric(data, parameters=params, mge_mass=mass,
                           mge_lum=lum)
        fit.jam_grid_min_stars = 100
        assert fit._jam_grid_spec() is not None

        rng = np.random.default_rng(13)
        draws = {"mlr": rng.uniform(1.9, 2.1, 8),
                 "kappa_x": rng.uniform(0.45, 0.55, 8),
                 "kappa_y": rng.uniform(-0.05, 0.05, 8),
                 "mbh": rng.uniform(1e4, 3e5, 8)}
        pos = np.column_stack([draws[n] for n in fit.compiled.free_names])
        lp_grid = np.asarray(fit.build_lnprob_batched()(
            jnp.asarray(pos, fit.dtype)))

        monkeypatch.setenv("MCMC_TPU_JAM", "direct")
        assert fit._jam_grid_spec() is None
        lp_dir = np.asarray(fit.build_lnprob_batched()(
            jnp.asarray(pos, fit.dtype)))

        assert np.isfinite(lp_grid).all()
        np.testing.assert_allclose(lp_grid, lp_dir, rtol=0, atol=1.0)
        assert np.std(lp_dir) > 10 * np.max(np.abs(lp_grid - lp_dir))

    def test_grid_spec_rebuilds_on_center_change(self, monkeypatch):
        """The spec cache is keyed on the centre, not just the orders: the
        per-star bases are built from fixed-centre offsets, so mutating
        ra/dec_center on a built fit must rebuild the spec (a stale spec
        would silently interpolate moments at the OLD star positions)."""
        fit = self._fit(monkeypatch, "grid")
        spec0 = fit._jam_grid_spec()
        assert fit._jam_grid_spec() is spec0       # same centre: cached
        ra0 = fit.parameters["ra_center"].quantity.to("deg").value
        fit.parameters["ra_center"].set(value=float(ra0) + 30.0 / 3600.0)
        spec1 = fit._jam_grid_spec()
        assert spec1 is not spec0
        # and the rebuilt bases actually reflect the shifted star offsets
        assert not np.allclose(np.asarray(spec1.t_star),
                               np.asarray(spec0.t_star))

    def test_auto_threshold(self, monkeypatch):
        fit = self._fit(monkeypatch, "auto")
        fit.jam_grid_min_stars = 4096
        assert fit._jam_grid_spec() is None          # 300 stars < threshold
        fit.jam_grid_min_stars = 100
        assert fit._jam_grid_spec() is not None      # now eligible
        salt_grid = fit.program_cache_salt()
        monkeypatch.setenv("MCMC_TPU_JAM", "direct")
        assert fit.program_cache_salt() != salt_grid  # env is in the salt

    def test_free_center_rejected(self, monkeypatch):
        monkeypatch.setenv("MCMC_TPU_JAM", "grid")
        data, lum, mass = _mock_jam_data(n=120, seed=6)
        params = _base_params()
        params["ra_center"].set(fixed=False)
        fit = Axisymmetric(data, parameters=params, mge_mass=mass, mge_lum=lum)
        with pytest.raises(ValueError, match="fixed cluster centre"):
            fit._jam_grid_spec()
        monkeypatch.setenv("MCMC_TPU_JAM", "auto")
        assert fit._jam_grid_spec() is None           # auto falls back

    def test_custom_terms_subclass_rejected(self, monkeypatch):
        class Custom(Axisymmetric):
            def lnlike_terms(self, p, data):
                return super().lnlike_terms(p, data)

        monkeypatch.setenv("MCMC_TPU_JAM", "grid")
        data, lum, mass = _mock_jam_data(n=120, seed=7)
        fit = Custom(data, parameters=_base_params(), mge_mass=mass,
                     mge_lum=lum)
        with pytest.raises(ValueError, match="overrides the"):
            fit._jam_grid_spec()
        monkeypatch.setenv("MCMC_TPU_JAM", "auto")
        assert fit._jam_grid_spec() is None


class TestGridPosteriorCertification:
    """Posterior-level certification of the grid tier AT PRODUCTION SCALE
    (VERDICT r4 next-round #3).  The tier's lnL error is extensive in the
    star count while posterior widths shrink ~1/sqrt(N) — the same bias-vs-
    width race the round-3 quadrature certification resolved.  Method here:
    importance reweighting, which isolates the tier-induced posterior shift
    EXACTLY instead of racing it against chain-divergence Monte-Carlo noise
    (the two-run protocol's noise floor was measured at 0.21-0.23 sigma in
    round 3 — itself the size of the bound being proven):

    * a constant lnL offset between tiers shifts NO posterior mass; only the
      VARIATION of delta = lnL_direct - lnL_grid across the posterior bulk
      does, so reweighting grid-chain draws by exp(delta) yields draws from
      the exact direct posterior;
    * the weighted-vs-unweighted median shift is then the exact tier-induced
      bias for every free parameter, and the effective sample size bounds
      the total perturbation.

    Run at the N where auto turns the tier on (4096) and at 10x that
    (40960), at the production grid orders (128, 12).  Engine quadrature is
    lowered for CPU test cost — it is IDENTICAL in both tiers, so the tier
    error is isolated regardless.  Reference contract: cjam/axisymmetric.py
    :288-310."""

    def _certify(self, n_stars, n_walkers, n_steps, n_draws, monkeypatch):
        monkeypatch.setenv("MCMC_TPU_JAM", "auto")
        data, lum, mass = _mock_jam_data(n=n_stars, seed=5, mlr=2.0,
                                         kappa=0.5)
        params = _base_params()
        params["mlr"].set(fixed=False, min=0.2, max=8.0,
                          initials="rng.uniform(1.8, 2.2, size=n)")
        params["kappa_x"].set(fixed=False, min=-3.0, max=3.0,
                              initials="rng.uniform(0.3, 0.7, size=n)")
        params["barq"].set(fixed=False,
                           initials="rng.uniform(0.41, 0.5, size=n)")
        fit = Axisymmetric(data, parameters=params, mge_mass=mass,
                           mge_lum=lum, seed=7)
        fit.n_u, fit.n_zeta = 12, 16
        assert fit._jam_grid_spec() is not None   # production auto dispatch

        pos = fit.get_initials(n_walkers)
        sampler = fit(n_walkers=n_walkers, n_steps=n_steps, pos=pos,
                      prefix=None)
        flat = sampler.chain[:, n_steps // 2:, :].reshape(
            -1, sampler.chain.shape[-1])
        rng = np.random.default_rng(3)
        draws = flat[rng.choice(flat.shape[0], size=n_draws, replace=False)]
        th = jnp.asarray(draws, fit.dtype)

        lnp_grid = np.asarray(fit.build_lnprob_batched()(th))
        monkeypatch.setenv("MCMC_TPU_JAM", "direct")
        assert fit._jam_grid_spec() is None
        lnp_dir = np.asarray(fit.build_lnprob_batched()(th))
        assert np.isfinite(lnp_grid).all() and np.isfinite(lnp_dir).all()

        delta = lnp_dir - lnp_grid
        w = np.exp(delta - delta.max())
        w /= w.sum()
        ess = 1.0 / np.sum(w ** 2)
        # the tier perturbation must not concentrate the posterior weight
        assert ess > 0.5 * n_draws, (n_stars, ess)

        def wmedian(x, weights):
            order = np.argsort(x)
            cw = np.cumsum(weights[order])
            return x[order][np.searchsorted(cw, 0.5)]

        for i, name in enumerate(fit.fitted_parameters):
            x = draws[:, i]
            shift = abs(wmedian(x, w) - np.median(x))
            width = float(np.std(x))
            assert shift < 0.2 * width, (
                f"N={n_stars} {name}: tier-induced median shift {shift:.4g}"
                f" vs posterior sigma {width:.4g} ({shift / width:.2f})")

    def test_posterior_unbiased_at_auto_threshold(self, monkeypatch):
        self._certify(4096, n_walkers=16, n_steps=200, n_draws=256,
                      monkeypatch=monkeypatch)

    def test_posterior_unbiased_at_ten_x(self, monkeypatch):
        self._certify(40960, n_walkers=12, n_steps=120, n_draws=144,
                      monkeypatch=monkeypatch)


class TestProfilesGrid:
    """AnalyticalProfiles rides the base grid tier (it overrides neither
    lnlike_terms nor model_moments, only jam_parameters): the radially
    varying kappa(r)/mlr(r) make its moment fields the one case whose
    angular/radial content differs from everything the base certification
    covers — and it is the reference's flagship production model
    (bin/run.py:444-450, cjam/radial_profiles.py:127-142), so it must not
    ride the tier uncertified."""

    def _fit(self, monkeypatch, mode, n=300):
        from mcmc_dynamics_tpu.models import AnalyticalProfiles

        monkeypatch.setenv("MCMC_TPU_JAM", mode)
        data, lum, mass = _mock_jam_data(n=n, seed=9)
        params = AnalyticalProfiles.default_parameters()
        fixed = dict(d=5.0, barq=0.4, beta=0.0, mbh=0.0, ra_center=RA_C,
                     dec_center=DEC_C, rbh=1.0, delta_v=0.0)
        for name, val in fixed.items():
            params[name].set(value=val, fixed=True)
        for name in ("mlr_0", "mlr_t", "mlr_inf"):
            params[name].set(value=2.0, min=0.1, max=10.0, fixed=False)
        for name in ("kappa_x", "kappa_y"):
            params[name].set(value=0.0, min=-2.0, max=2.0, fixed=False)
        # r_mlr / r_kappa bounds are clamped to the MGE sigma range [10, 40]
        # by the constructor; leave them free
        fit = AnalyticalProfiles(data, parameters=params, mge_mass=mass,
                                 mge_lum=lum)
        fit.jam_grid_min_stars = 100
        return fit

    def _pos(self, fit, n_walkers=8, seed=13):
        rng = np.random.default_rng(seed)
        draws = {"mlr_0": rng.uniform(1.8, 2.6, n_walkers),
                 "mlr_t": rng.uniform(1.6, 2.4, n_walkers),
                 "mlr_inf": rng.uniform(1.2, 2.0, n_walkers),
                 "r_mlr": rng.uniform(15.0, 30.0, n_walkers),
                 "kappa_x": rng.uniform(0.3, 0.7, n_walkers),
                 "kappa_y": rng.uniform(-0.1, 0.1, n_walkers),
                 "r_kappa": rng.uniform(15.0, 30.0, n_walkers)}
        return np.column_stack([draws[k] for k in fit.compiled.free_names])

    def test_profiles_grid_lnprob_matches_direct(self, monkeypatch):
        fit = self._fit(monkeypatch, "grid")
        assert fit._jam_grid_spec() is not None
        pos = self._pos(fit)
        lp_grid = np.asarray(fit.build_lnprob_batched()(
            jnp.asarray(pos, fit.dtype)))

        monkeypatch.setenv("MCMC_TPU_JAM", "direct")
        assert fit._jam_grid_spec() is None
        lp_dir = np.asarray(fit.build_lnprob_batched()(
            jnp.asarray(pos, fit.dtype)))

        assert np.isfinite(lp_grid).all()
        np.testing.assert_allclose(lp_grid, lp_dir, rtol=0, atol=1.0)
        # the walker lnL spread (what acceptance decisions see) must dwarf
        # the tier disagreement
        assert np.std(lp_dir) > 10 * np.max(np.abs(lp_grid - lp_dir))

    def test_profiles_auto_selects_grid(self, monkeypatch):
        fit = self._fit(monkeypatch, "auto")
        assert fit._jam_grid_spec() is not None       # 300 >= patched 100
        fit.jam_grid_min_stars = 4096
        assert fit._jam_grid_spec() is None


class TestChemoGrid:
    """ChemoProfiles rides the grid tier via its _grid_lnlike_terms override:
    one grid solve per population, theta0 = 0 (chemo fixes the morphological
    frame)."""

    def _fit(self, monkeypatch, mode, n=300):
        from mcmc_dynamics_tpu.models import ChemoProfiles

        from test_chemo import _data, _fixed_params, _tagged_mges

        monkeypatch.setenv("MCMC_TPU_JAM", mode)
        data = _data(n=n, seed=1)
        lum, mass = _tagged_mges()
        params = _fixed_params(kappa_max_a=dict(min=-2.0, max=2.0),
                               mu_feh_a=dict(min=-1.0, max=1.0),
                               h_aa=dict(min=0.0, max=1.0))
        fit = ChemoProfiles(data, mge_mass=mass, mge_lum=lum,
                            parameters=params, n_pops=2)
        fit.n_u, fit.n_zeta = 12, 16
        fit.jam_grid_min_stars = 100
        return fit

    def test_chemo_grid_lnprob_matches_direct(self, monkeypatch):
        fit = self._fit(monkeypatch, "grid")
        assert fit._jam_grid_spec() is not None
        free = fit.compiled.free_names
        rng = np.random.default_rng(7)
        draws = {"kappa_max_a": rng.uniform(0.2, 0.6, 8),
                 "mu_feh_a": rng.uniform(-0.6, -0.4, 8),
                 "h_aa": rng.uniform(0.7, 0.95, 8)}
        pos = np.column_stack([draws[n] for n in free])
        lp_grid = np.asarray(fit.build_lnprob_batched()(
            jnp.asarray(pos, fit.dtype)))

        monkeypatch.setenv("MCMC_TPU_JAM", "direct")
        assert fit._jam_grid_spec() is None
        lp_dir = np.asarray(fit.build_lnprob_batched()(
            jnp.asarray(pos, fit.dtype)))

        assert np.isfinite(lp_grid).all()
        np.testing.assert_allclose(lp_grid, lp_dir, rtol=0, atol=1.0)
        assert np.std(lp_dir) > 10 * np.max(np.abs(lp_grid - lp_dir))

    def test_chemo_auto_selects_grid_over_threshold(self, monkeypatch):
        fit = self._fit(monkeypatch, "auto")
        assert fit._jam_grid_spec() is not None       # 300 >= patched 100
        fit.jam_grid_min_stars = 4096
        assert fit._jam_grid_spec() is None

    def test_stale_inherited_grid_override_rejected(self, monkeypatch):
        """A subclass of ChemoProfiles that re-overrides lnlike_terms would
        inherit chemo's _grid_lnlike_terms OUT OF SYNC with its own direct
        path; the MRO-positional capability gate must reject it instead of
        silently serving diverging grid lnprobs (r4 advisor finding)."""
        from mcmc_dynamics_tpu.models import ChemoProfiles

        from test_chemo import _data, _fixed_params, _tagged_mges

        class Custom(ChemoProfiles):
            def lnlike_terms(self, p, data):
                return super().lnlike_terms(p, data)

        monkeypatch.setenv("MCMC_TPU_JAM", "grid")
        data = _data(n=150, seed=2)
        lum, mass = _tagged_mges()
        params = _fixed_params(kappa_max_a=dict(min=-2.0, max=2.0))
        fit = Custom(data, mge_mass=mass, mge_lum=lum, parameters=params,
                     n_pops=2)
        fit.jam_grid_min_stars = 100
        with pytest.raises(ValueError, match="overrides the"):
            fit._jam_grid_spec()
        monkeypatch.setenv("MCMC_TPU_JAM", "auto")
        assert fit._jam_grid_spec() is None           # auto falls back

"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mcmc_dynamics_tpu import units as u
from mcmc_dynamics_tpu.models import ConstantFit, ModelFit
from mcmc_dynamics_tpu.parallel import (make_mesh, pad_star_axis,
                                        run_ensemble_sharded, star_sharded_lnprob)
from mcmc_dynamics_tpu.utils import DataReader

RA_C, DEC_C = 56.345, -26.675


def _catalog(n=333, seed=0):
    rng = np.random.default_rng(seed)
    return DataReader({
        "ra": u.Quantity(RA_C + 0.03 * rng.normal(size=n), "deg"),
        "dec": u.Quantity(DEC_C + 0.03 * rng.normal(size=n), "deg"),
        "v": u.Quantity(5.0 * rng.normal(size=n), "km/s"),
        "verr": u.Quantity(0.5 + 0.5 * rng.random(n), "km/s"),
    })


def _fit(n=333, seed=0, cls=ConstantFit):
    params = cls.default_parameters()
    params["ra_center"].set(value=RA_C, fixed=True)
    params["dec_center"].set(value=DEC_C, fixed=True)
    return cls(_catalog(n, seed), parameters=params)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


class TestStarSharding:
    def test_star_sharded_lnprob_matches_unsharded(self):
        fit = _fit(n=333)  # deliberately not divisible by 8 -> exercises padding
        mesh = make_mesh(("sp",), (8,))
        sharded = star_sharded_lnprob(fit, mesh, sp_axis="sp")
        theta = jnp.asarray([1.0, 6.0, 2.0, -1.0])
        got = float(jax.jit(sharded)(theta))
        expected = float(fit.lnprob(theta))
        assert math.isclose(got, expected, rel_tol=1e-12)

    def test_star_sharded_oob_still_minus_inf(self):
        fit = _fit(n=64)
        mesh = make_mesh(("sp",), (8,))
        sharded = star_sharded_lnprob(fit, mesh)
        assert float(sharded(jnp.asarray([0.0, -3.0, 0.0, 0.0]))) == -np.inf

    def test_pad_star_axis(self):
        data = {"v": jnp.arange(10.0), "verr": jnp.ones(10)}
        padded = pad_star_axis(data, 8)
        assert padded["v"].shape == (16,)
        assert float(padded["mask"].sum()) == 10.0


class TestWalkerSharding:
    def test_sharded_ensemble_recovers_posterior(self):
        """dp=4 x sp=2 mesh: full SPMD sampling must match single-device posterior."""
        fit = _fit(n=200, seed=1)
        mesh = make_mesh(("dp", "sp"), (4, 2))
        pos = fit.get_initials(64)
        key = jax.random.PRNGKey(0)

        result = run_ensemble_sharded(fit, pos, key, n_steps=400, mesh=mesh)
        chain = np.asarray(result.chain)
        assert chain.shape == (64, 400, 4)

        # compare against the single-device sampler posterior (same model & data)
        from mcmc_dynamics_tpu.sampler import init_state, run_ensemble
        lnprob = fit.build_lnprob()
        state = init_state(lnprob, jnp.asarray(pos, fit.dtype), jax.random.PRNGKey(1))
        ref = run_ensemble(lnprob, state, n_steps=400)
        ref_chain = np.asarray(ref.chain)

        got_med = np.median(chain[:, 200:, :].reshape(-1, 4), axis=0)
        exp_med = np.median(ref_chain[:, 200:, :].reshape(-1, 4), axis=0)
        sd = ref_chain[:, 200:, :].reshape(-1, 4).std(axis=0)
        assert np.all(np.abs(got_med - exp_med) < 3 * sd / np.sqrt(50) + 0.3)

        acc = np.asarray(result.acceptance_fraction)
        assert np.all(acc > 0.1) and np.all(acc < 0.95)

    def test_sharded_lnp_consistent_with_lnprob(self):
        """The log_prob recorded by the sharded run must equal lnprob(chain sample)."""
        fit = _fit(n=100, seed=2)
        mesh = make_mesh(("dp",), (8,))
        pos = fit.get_initials(32)
        result = run_ensemble_sharded(fit, pos, jax.random.PRNGKey(3), n_steps=20,
                                      mesh=mesh, sp_axis=None)
        chain = np.asarray(result.chain)
        lnp = np.asarray(result.log_prob)
        for w in (0, 17, 31):
            expect = float(fit.lnprob(chain[w, -1]))
            assert math.isclose(lnp[w, -1], expect, rel_tol=1e-10)

    def test_walker_count_validation(self):
        fit = _fit(n=50)
        mesh = make_mesh(("dp",), (8,))
        pos = fit.get_initials(20)  # not a multiple of 16
        with pytest.raises(AssertionError):
            run_ensemble_sharded(fit, pos, jax.random.PRNGKey(0), n_steps=5,
                                 mesh=mesh, sp_axis=None)


class TestMeshShapes:
    def test_transposed_mesh_2x4(self):
        """dp=2 x sp=4 (transposed factorisation) runs and stays finite."""
        fit = _fit(n=120, seed=4)
        mesh = make_mesh(("dp", "sp"), (2, 4))
        pos = fit.get_initials(16)
        result = run_ensemble_sharded(fit, pos, jax.random.PRNGKey(5), n_steps=10,
                                      mesh=mesh)
        assert np.isfinite(np.asarray(result.log_prob)).all()
        # consistency: final lnp equals lnprob of final coords
        import math
        coords = np.asarray(result.final_coords)
        lnp = np.asarray(result.final_log_prob)
        for w in (0, 7, 15):
            assert math.isclose(lnp[w], float(fit.lnprob(coords[w])), rel_tol=1e-9)

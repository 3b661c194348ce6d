"""High-level analysis pipelines.

``fit_radial_bins`` reproduces the reference's binned-kinematics production workload
(bin/run.py:146-259: ConstantFit per radial bin, 16 walkers x 300 steps each, run as a
Python loop of separate emcee fits) as ONE jitted program: every bin's ensemble
advances simultaneously on a batched (bins, walkers, params) axis, optionally sharded
over devices (the pipeline/expert-parallel analog of this workload — many small
independent posteriors batched per chip).
"""

from __future__ import annotations

import logging
from typing import Dict, Type

import numpy as np

import jax
import jax.numpy as jnp

from . import units as u
from .models import ConstantFit, Runner
from .sampler import init_state, run_ensemble
from .utils.coordinates import get_amplitude_and_angle, xy_offset_rad
from .utils.data import DataReader
from .utils.table import Table

logger = logging.getLogger(__name__)

__all__ = ["fit_radial_bins", "BinnedFitResult"]

# jitted batched-bin programs keyed by (model, parameters, tier, shapes, mesh);
# see fit_radial_bins — avoids recompiling identical binned analyses
_PROGRAM_CACHE: Dict[tuple, object] = {}


class BinnedFitResult:
    """Chains and summary statistics of a batched per-bin fit."""

    def __init__(self, chains, log_probs, template: Runner, r_mean, r_min, r_max,
                 n_per_bin):
        self.chains = chains          # (B, W, S, K)
        self.log_probs = log_probs    # (B, W, S)
        self.template = template
        self.r_mean, self.r_min, self.r_max = r_mean, r_min, r_max
        self.n_per_bin = n_per_bin

    @property
    def n_bins(self) -> int:
        return self.chains.shape[0]

    def summary(self, n_burn: int) -> Table:
        """Per-bin best-fit table: radii + median/up/lo per free parameter +
        rotation amplitude/angle via circular statistics (the per-bin post-processing
        of reference bin/run.py:190-259)."""
        rows: Dict[str, list] = {"r mean": [], "r min": [], "r max": [], "n": []}
        names = self.template.fitted_parameters
        # rotation statistics need the (v_maxx, v_maxy) columns in the chain;
        # a dispersion-only fit (both fixed) simply omits the v_max/theta_0 rows
        with_rotation = "v_maxx" in names and "v_maxy" in names
        for name in names:
            rows[f"{name} median"] = []
            rows[f"{name} high"] = []
            rows[f"{name} low"] = []
        if with_rotation:
            for name in ("v_max", "theta_0"):
                rows[f"{name} median"] = []
                rows[f"{name} high"] = []
                rows[f"{name} low"] = []

        for b in range(self.n_bins):
            rows["r mean"].append(self.r_mean[b])
            rows["r min"].append(self.r_min[b])
            rows["r max"].append(self.r_max[b])
            rows["n"].append(self.n_per_bin[b])
            chain = np.asarray(self.chains[b])
            pct = np.percentile(chain[:, n_burn:, :].reshape(-1, len(names)),
                                [16, 50, 84], axis=0)
            for i, name in enumerate(names):
                rows[f"{name} median"].append(pct[1, i])
                rows[f"{name} high"].append(pct[2, i] - pct[1, i])
                rows[f"{name} low"].append(pct[1, i] - pct[0, i])
            if with_rotation:
                pars = {name: chain[:, n_burn:, i].reshape(-1)
                        for i, name in enumerate(names)}
                res, _, _ = get_amplitude_and_angle(pars)
                for name in ("v_max", "theta_0"):
                    col = res.value(name)
                    rows[f"{name} median"].append(col[0])
                    rows[f"{name} high"].append(col[1])
                    rows[f"{name} low"].append(col[2])

        table = Table({k: np.asarray(v, dtype=object if k == "n" else np.float64)
                       for k, v in rows.items()})
        table.units["r mean"] = u.arcmin
        table.units["r min"] = u.arcmin
        table.units["r max"] = u.arcmin
        return table


def fit_radial_bins(data: DataReader, ra_center, dec_center,
                    parameters=None, model_cls: Type[Runner] = ConstantFit,
                    nstars: int = 50, dlogr: float = 0.2,
                    n_walkers: int = 64, n_steps: int = 300,
                    seed: int = 0, mesh=None, bin_axis: str = "dp",
                    background=None) -> BinnedFitResult:
    """Bin the catalog radially and fit ``model_cls`` in every bin simultaneously.

    The centre is fixed to (ra_center, dec_center) (per-bin centre fits make no
    sense); sky offsets are precomputed host-side in float64, so the batched traced
    likelihood touches no trig.  With ``mesh`` given, the bin axis is sharded across
    devices (independent ensembles per chip, zero communication).
    """
    if "bin" not in data.data:
        data.make_radial_bins(ra_center, dec_center, nstars=nstars, dlogr=dlogr)

    # per-star geometry for the whole catalog (float64, once)
    ra = np.asarray(data.data.value("ra", "deg"), dtype=np.float64)
    dec = np.asarray(data.data.value("dec", "deg"), dtype=np.float64)
    dx, dy = xy_offset_rad(np.radians(ra), np.radians(dec),
                           float(u.as_value(ra_center, u.deg)) * np.pi / 180.0,
                           float(u.as_value(dec_center, u.deg)) * np.pi / 180.0,
                           xp=np)
    r = np.hypot(dx, dy)
    safe = np.where(r > 0, r, 1.0)
    work = data.data.copy()
    work["gx"] = np.where(r > 0, dy / safe, 0.0)   # ConstantFit linear geometry
    work["gy"] = np.where(r > 0, -dx / safe, 0.0)
    work["dxm"] = dx * (10800.0 / np.pi)           # arcmin offsets (ModelFit & co)
    work["dym"] = dy * (10800.0 / np.pi)
    work["_r"] = r * (10800.0 / np.pi)  # arcmin
    packed = DataReader(work)

    if parameters is None:
        parameters = model_cls.default_parameters()
    parameters = parameters.copy()
    parameters["ra_center"].set(value=u.as_value(ra_center, u.deg), fixed=True)
    parameters["dec_center"].set(value=u.as_value(dec_center, u.deg), fixed=True)

    # template fit provides the compiled parameters and the pure lnlike_terms
    template = model_cls(data.fetch_radial_bin(0), parameters=parameters,
                         seed=seed, background=background)
    compiled = template.compiled

    columns = [c for c in template.OBSERVABLES if c not in ("ra", "dec")]
    columns += ["gx", "gy", "dxm", "dym"]
    if background is not None:
        columns += ["pmember"]
    arrays, mask = packed.padded_bins(columns)
    n_bins = arrays["gx"].shape[0]

    if background is not None:
        lnb = np.asarray(background(data.data["v"], data.data["verr"]),
                         dtype=np.float64)
        work["_lnb"] = lnb
        arr_lnb, _ = DataReader(work).padded_bins(["_lnb"])
        arrays["lnlike_background"] = arr_lnb["_lnb"]

    dtype = template.dtype
    stacked = {name: jnp.asarray(arr, dtype=dtype) for name, arr in arrays.items()}
    stacked["mask"] = jnp.asarray(mask, dtype=dtype)

    n_padded_bins = n_bins
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        n_dev = mesh.shape[bin_axis]
        n_pad = (-n_bins) % n_dev
        if n_pad:
            # replicate the first bin into padded slots; results are sliced off
            stacked = {k: jnp.concatenate(
                [v, jnp.broadcast_to(v[:1], (n_pad,) + v.shape[1:])], axis=0)
                for k, v in stacked.items()}
            n_padded_bins = n_bins + n_pad
        sharding = NamedSharding(mesh, P(bin_axis))
        stacked = {k: jax.device_put(v, sharding) for k, v in stacked.items()}

    # per-bin walker initials (host) and keys
    coords = np.stack([compiled.sample_initials(n_walkers)
                       for _ in range(n_padded_bins)])
    keys = jax.random.split(jax.random.PRNGKey(seed), n_padded_bins)

    lnprior_batched = jax.vmap(compiled.lnprior)

    # the in-jit table branch below builds *ConstantFit* sufficient statistics;
    # it must never trigger for other model classes even if they expose their
    # own sufficient tier (their theta layout and moments differ)
    use_sufficient = (isinstance(template, ConstantFit)
                      and type(template) is ConstantFit
                      and template._sufficient_eligible())
    if use_sufficient:
        # O(1)-per-walker tier: each bin's weighted-moment tables are built once
        # inside the same jitted program (see ops.sufficient)
        from .ops.sufficient import ConstantSufficientStats

        s_max = template._sufficient_s_max()

        def run_one(bin_data, pos, key):
            stats = ConstantSufficientStats.build(
                bin_data["gx"], bin_data["gy"], bin_data["v"],
                bin_data["verr"] * bin_data["verr"], mask=bin_data["mask"],
                s_max=s_max)

            def fn(thetas):
                lp = lnprior_batched(thetas)
                ok = thetas[:, 1] * thetas[:, 1] <= s_max
                return jnp.where(jnp.isfinite(lp) & ok,
                                 lp + stats.lnlike(thetas), -jnp.inf)

            state = init_state(fn, pos, key, batched=True)
            out = run_ensemble(fn, state, n_steps=n_steps, batched=True)
            return out.chain, out.log_prob
    else:
        def lnprob(theta, bin_data):
            lp = compiled.lnprior(theta)
            p = template.scaled_values(theta)
            terms = template.lnlike_terms(p, bin_data)
            ll = jnp.sum(jnp.where(bin_data["mask"] > 0, terms, 0.0))
            total = lp + template.extra_lnprior_fn(p) + ll
            return jnp.where(jnp.isfinite(lp), total, -jnp.inf)

        def run_one(bin_data, pos, key):
            fn = lambda t: lnprob(t, bin_data)
            state = init_state(fn, pos, key)
            out = run_ensemble(fn, state, n_steps=n_steps)
            return out.chain, out.log_prob

    # cache the jitted program: a fresh closure per call would force XLA to
    # recompile identical binned fits (the closure's behaviour is fully
    # determined by the key below — model class, parameter fingerprint, tier,
    # shapes, sharding)
    cache_key = (model_cls.__qualname__, parameters.fingerprint(), n_walkers,
                 n_steps, use_sufficient, background is not None,
                 None if mesh is None else (tuple(mesh.shape.items()), bin_axis),
                 tuple(sorted((k, v.shape, str(v.dtype))
                              for k, v in stacked.items())),
                 # instance state baked into the closure as constants (e.g.
                 # JAM MGE tables): without it, two analyses with identical
                 # shapes but different tables would reuse the wrong program
                 template.program_cache_salt())
    run_all = _PROGRAM_CACHE.get(cache_key)
    if run_all is None:
        if len(_PROGRAM_CACHE) >= 8:
            _PROGRAM_CACHE.clear()
        run_all = jax.jit(jax.vmap(run_one))
        _PROGRAM_CACHE[cache_key] = run_all
    chains, log_probs = run_all(stacked, jnp.asarray(coords, dtype=dtype), keys)
    chains = chains[:n_bins]
    log_probs = log_probs[:n_bins]

    bins = np.asarray(data.data["bin"])
    arcmin = 10800.0 / np.pi
    n_per = np.bincount(bins, minlength=n_bins)[:n_bins]
    sums = np.bincount(bins, weights=r, minlength=n_bins)[:n_bins]
    r_mean = sums / np.maximum(n_per, 1) * arcmin
    order = np.argsort(bins, kind="stable")   # one pass for per-bin min/max
    edges = np.searchsorted(bins[order], np.arange(n_bins + 1))
    r_sorted = np.asarray(r)[order]
    r_min = np.array([r_sorted[edges[b]:edges[b + 1]].min()
                      for b in range(n_bins)]) * arcmin
    r_max = np.array([r_sorted[edges[b]:edges[b + 1]].max()
                      for b in range(n_bins)]) * arcmin

    return BinnedFitResult(np.asarray(chains), np.asarray(log_probs), template,
                           r_mean, r_min, r_max, n_per)

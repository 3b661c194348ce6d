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


def _size_buckets(counts, min_saving: float = 0.25, min_cells: int = 200_000):
    """Partition bin ids into at most two size buckets for rectangular packing.

    Returns a list of sorted index arrays.  The split point minimises the
    total padded cell count sum_bucket len(bucket) * max(bucket).  A second
    bucket is only opened when BOTH hold:

    * it saves at least ``min_saving`` of the padded work (each bucket costs
      one extra XLA compile), and
    * the single-block layout has at least ``min_cells`` padded cells —
      below that the batched per-bin step is latency/occupancy-bound, not
      FLOP-bound, and running two sequential programs costs more than the
      padding it removes (measured on the 16-bin omega-Cen workload, where
      an unconditional split halved the pipeline rate).
    """
    counts = np.asarray(counts)
    n = counts.size
    if n < 2:
        return [np.arange(n)]
    order = np.argsort(counts, kind="stable")
    sorted_c = counts[order]
    base = n * int(sorted_c[-1])
    if base < min_cells:
        return [np.arange(n)]
    best_k, best_cost = None, base
    for k in range(1, n):
        cost = k * int(sorted_c[k - 1]) + (n - k) * int(sorted_c[-1])
        if cost < best_cost:
            best_cost, best_k = cost, k
    if best_k is None or best_cost > (1.0 - min_saving) * base:
        return [np.arange(n)]
    return [np.sort(order[:best_k]), np.sort(order[best_k:])]


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
        lnb = np.asarray(background(data.data["v"], data.data["verr"]),
                         dtype=np.float64)
        work["_lnb"] = lnb

    bins_col = np.asarray(data.data["bin"])
    n_bins = packed.n_bins
    counts = np.bincount(bins_col, minlength=n_bins)[:n_bins]
    # size-bucketed packing: with the reference's greedy binning the outer bin
    # can be several x the inner ones, and a single rectangular (B, N_max)
    # layout makes EVERY ensemble pay N_max per step.  Split the bins into at
    # most two size buckets (each its own batched program) when that removes
    # a substantial fraction of the padded work.
    buckets = _size_buckets(counts)
    if len(buckets) > 1:
        logger.info(
            "bin packing: 2 size buckets (%d bins <= %d stars, %d bins <= %d "
            "stars) — %.0f%% less padded work than one (B, N_max) block",
            len(buckets[0]), counts[buckets[0]].max(),
            len(buckets[1]), counts[buckets[1]].max(),
            100.0 * (1.0 - (sum(len(b) * counts[b].max() for b in buckets)
                            / (n_bins * counts.max()))))

    dtype = template.dtype

    # per-bin walker initials (host) and keys — drawn once in bin order, so
    # results are independent of the bucket partition
    coords_all = np.stack([compiled.sample_initials(n_walkers)
                           for _ in range(n_bins)])
    keys_all = jax.random.split(jax.random.PRNGKey(seed), n_bins)

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
        from .ops.sufficient import ConstantSufficientStats, chebyshev_degree

        s_max = template._sufficient_s_max()
        # static Chebyshev degree from the FULL catalog's minimum velocity
        # error: per-bin tables built under jit get traced e_min, and any
        # bin's e_min >= the global one, so the global degree is conservative
        full = template.prepare_data(dict(template._data_arrays))
        verr2_all = np.asarray(full["verr"], np.float64) ** 2
        m_all = np.asarray(full.get("mask", np.ones_like(verr2_all)))
        e_min_global = float(verr2_all[m_all > 0].min()) if np.any(m_all > 0) \
            else 1.0
        n_coef = chebyshev_degree(e_min_global, s_max, dtype)

        def run_one(bin_data, pos, key):
            stats = ConstantSufficientStats.build(
                bin_data["gx"], bin_data["gy"], bin_data["v"],
                bin_data["verr"] * bin_data["verr"], mask=bin_data["mask"],
                n_coef=n_coef, s_max=s_max)

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

    chains_np = None
    logp_np = None
    for bucket in buckets:
        arrays, mask_b = packed.padded_bins(columns, bins_subset=bucket)
        if background is not None:
            arr_lnb, _ = DataReader(work).padded_bins(["_lnb"],
                                                      bins_subset=bucket)
            arrays["lnlike_background"] = arr_lnb["_lnb"]
        # stays host numpy until the mesh branch below decides placement, so
        # sharded runs do a single host->device transfer instead of
        # host->device->host->device
        stacked = {name: np.asarray(arr, dtype=dtype)
                   for name, arr in arrays.items()}
        stacked["mask"] = np.asarray(mask_b, dtype=dtype)

        nb = len(bucket)
        coords = coords_all[bucket]
        if nb == n_bins:
            keys = keys_all            # single bucket: no key shuffling
        else:
            keys = np.asarray(jax.random.key_data(keys_all))[bucket]
            keys = jax.random.wrap_key_data(jnp.asarray(keys),
                                            impl=jax.random.key_impl(keys_all))
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from .parallel.distributed import (fetch, mesh_spans_processes,
                                               to_global)

            n_dev = mesh.shape[bin_axis]
            n_pad = (-nb) % n_dev
            if n_pad:
                # replicate the first bin into padded slots; results sliced off
                stacked = {k: np.concatenate(
                    [v, np.broadcast_to(v[:1], (n_pad,) + v.shape[1:])],
                    axis=0) for k, v in stacked.items()}
                coords = np.concatenate(
                    [coords, np.broadcast_to(coords[:1],
                                             (n_pad,) + coords.shape[1:])])
                pad_keys = jax.random.split(jax.random.PRNGKey(seed + 1), n_pad)
                if jnp.issubdtype(keys.dtype, jax.dtypes.prng_key):
                    # multi-bucket `keys` are typed key arrays; raw uint32 pad
                    # keys cannot be concatenated with them
                    pad_keys = jax.random.wrap_key_data(
                        jax.random.key_data(pad_keys),
                        impl=jax.random.key_impl(keys))
                keys = jnp.concatenate([keys, pad_keys])
            if mesh_spans_processes(mesh):
                # multi-host: all inputs become global arrays (bins sharded
                # over the processes' devices, walker initials and keys
                # replicated alongside their bins)
                stacked = {k: to_global(mesh, P(bin_axis), v)
                           for k, v in stacked.items()}
                coords = to_global(mesh, P(bin_axis),
                                   np.asarray(coords, dtype=dtype))
                kdata = to_global(mesh, P(bin_axis),
                                  fetch(jax.random.key_data(keys)))
                keys = jax.random.wrap_key_data(
                    kdata, impl=jax.random.key_impl(keys))
            else:
                sharding = NamedSharding(mesh, P(bin_axis))
                stacked = {k: jax.device_put(v, sharding)
                           for k, v in stacked.items()}

        # cache the jitted program: a fresh closure per call would force XLA
        # to recompile identical binned fits (the closure's behaviour is fully
        # determined by the key below — model class, parameter fingerprint,
        # tier, shapes, sharding)
        cache_key = (model_cls.__qualname__, parameters.fingerprint(),
                     n_walkers, n_steps, use_sufficient,
                     background is not None,
                     None if mesh is None else (tuple(mesh.shape.items()),
                                                bin_axis),
                     tuple(sorted((k, v.shape, str(v.dtype))
                                  for k, v in stacked.items())),
                     # instance state baked into the closure as constants
                     # (e.g. JAM MGE tables): without it, two analyses with
                     # identical shapes but different tables would reuse the
                     # wrong program
                     template.program_cache_salt())
        run_all = _PROGRAM_CACHE.pop(cache_key, None)
        if run_all is None:
            if len(_PROGRAM_CACHE) >= 8:
                # LRU: evict ONE oldest entry (clearing everything would make
                # an analysis loop alternating 9 configs recompile all of
                # them every call)
                _PROGRAM_CACHE.pop(next(iter(_PROGRAM_CACHE)))
            run_all = jax.jit(jax.vmap(run_one))
        _PROGRAM_CACHE[cache_key] = run_all   # (re-)insert at MRU position
        ch, lp = run_all(stacked, jnp.asarray(coords, dtype=dtype), keys)
        from .parallel.distributed import fetch as _fetch
        ch = _fetch(ch)[:nb]
        lp = _fetch(lp)[:nb]
        if nb == n_bins:
            chains_np, logp_np = ch, lp
            break
        if chains_np is None:
            chains_np = np.empty((n_bins,) + ch.shape[1:], ch.dtype)
            logp_np = np.empty((n_bins,) + lp.shape[1:], lp.dtype)
        chains_np[bucket] = ch
        logp_np[bucket] = lp

    bins = bins_col
    arcmin = 10800.0 / np.pi
    n_per = counts
    sums = np.bincount(bins, weights=r, minlength=n_bins)[:n_bins]
    r_mean = sums / np.maximum(n_per, 1) * arcmin
    order = np.argsort(bins, kind="stable")   # one pass for per-bin min/max
    edges = np.searchsorted(bins[order], np.arange(n_bins + 1))
    r_sorted = np.asarray(r)[order]
    r_min = np.array([r_sorted[edges[b]:edges[b + 1]].min()
                      for b in range(n_bins)]) * arcmin
    r_max = np.array([r_sorted[edges[b]:edges[b + 1]].max()
                      for b in range(n_bins)]) * arcmin

    return BinnedFitResult(chains_np, logp_np, template,
                           r_mean, r_min, r_max, n_per)

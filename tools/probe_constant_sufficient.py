"""Micro-benchmark: where does the headline row's time go?

constant/sufficient@131k runs the full ensemble sampler over the O(1)
ConstantFit tier.  This probe splits the per-step cost into:

  * lnprob-only iterated evals (the likelihood tier in isolation),
  * the same with the Hermite gather replaced by a degenerate j=0 lookup
    (isolates the 4-row table gather cost),
  * a gather-free Chebyshev variant (one global series per channel, the
    model_sufficient approach applied to the 11 ConstantFit channels),
  * the full sampler step (machinery + lnprob).

Usage: python tools/probe_constant_sufficient.py [W=131072]
"""
import math
import pathlib
import sys
import time
from functools import partial

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


def measure(fn, pos, dtype, steps=200, label=""):
    th0 = jnp.asarray(pos, dtype)

    @partial(jax.jit, static_argnums=1)
    def loop(th, n):
        def body(carry, _):
            t, acc = carry
            ll = fn(t)
            t = t + 1e-7 * jnp.tanh(ll)[:, None]
            return (t, acc + jnp.sum(ll)), None

        (tf, acc), _ = jax.lax.scan(body, (th, 0.0), None, length=n)
        return acc

    times = {}
    for n in (steps, 2 * steps):
        _ = np.asarray(loop(th0, n))
        best = np.inf
        for _i in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(loop(th0, n))
            best = min(best, time.perf_counter() - t0)
        times[n] = best
    dt = times[2 * steps] - times[steps]
    if dt <= 0:
        dt = times[2 * steps] / 2
    rate = pos.shape[0] * steps / dt
    print(f"{label:46s} {rate:12.3e} evals/s   (dt={dt:.3f}s)", flush=True)
    return rate


def chebyshev_tables(stats, n_coef=48):
    """Global Chebyshev series of the 11 channels over t = log1p(s)."""
    t0 = float(stats.t0)
    t1 = t0 + float(stats.dt) * (stats.values.shape[0] - 1)
    k = np.arange(n_coef)
    xi = np.cos(np.pi * (k + 0.5) / n_coef)
    t_nodes = 0.5 * (t1 + t0) + 0.5 * (t1 - t0) * xi
    # sample the channels at the nodes through the Hermite tables (1e-9 exact)
    s_nodes = np.expm1(t_nodes)
    samples = np.asarray(stats.interpolate(jnp.asarray(s_nodes)))  # (K, 11)
    d = np.arange(n_coef)
    tmat = np.cos(np.outer(d, np.arccos(xi)))
    coef = (2.0 / n_coef) * tmat @ samples
    coef[0] *= 0.5
    return jnp.asarray(coef, jnp.float32), t0, t1


def make_cheb_lnlike(stats, n_coef=48):
    coef, t0, t1 = chebyshev_tables(stats, n_coef)
    n_stars = float(stats.n_stars)

    def lnlike(params):
        v_sys = params[:, 0]
        s = params[:, 1] * params[:, 1]
        vx = params[:, 2]
        vy = params[:, 3]
        t = jnp.log1p(s)
        xi = jnp.clip((2.0 * t - (t1 + t0)) / (t1 - t0), -1.0, 1.0)

        def step(carry, c):
            tm1, tm0, acc = carry
            tp = 2.0 * xi * tm0 - tm1
            return (tm0, tp, acc + c[None, :] * tp[:, None]), None

        acc0 = coef[0][None, :] + coef[1][None, :] * xi[:, None]
        (_, _, mom), _ = jax.lax.scan(step, (jnp.ones_like(xi), xi, acc0),
                                      coef[2:])
        f = mom[:, 0]
        m0 = mom[:, 1]
        m1 = mom[:, 2:5]
        q11, q12, q13, q22, q23, q33 = (mom[:, 5], mom[:, 6], mom[:, 7],
                                        mom[:, 8], mom[:, 9], mom[:, 10])
        lin = v_sys * m1[:, 0] + vx * m1[:, 1] + vy * m1[:, 2]
        quad = (v_sys * v_sys * q11 + vx * vx * q22 + vy * vy * q33
                + 2.0 * (v_sys * vx * q12 + v_sys * vy * q13 + vx * vy * q23))
        return -0.5 * (f + m0 - 2.0 * lin + quad + n_stars * _LOG_2PI)

    return lnlike


def main():
    from mcmc_dynamics_tpu.models import ConstantFit
    from mcmc_dynamics_tpu.sampler import init_state, run_ensemble
    from bench import _mock_catalog

    kv = dict(x.split("=") for x in sys.argv[1:] if "=" in x)
    W = int(kv.get("W", 131072))
    rng = np.random.default_rng(0)
    data, ra_c, dec_c = _mock_catalog(10_000, rng)
    params = ConstantFit.default_parameters()
    params["ra_center"].set(value=ra_c, fixed=True)
    params["dec_center"].set(value=dec_c, fixed=True)
    fit = ConstantFit(data, parameters=params)
    pos = np.column_stack([
        rng.normal(0, 1, W), np.exp(rng.normal(1.8, 0.2, W)),
        rng.normal(0, 3, W), rng.normal(0, 3, W)])

    from mcmc_dynamics_tpu.ops.sufficient import ConstantSufficientStats
    lnprob = fit.build_lnprob_sufficient()
    pdata = fit.prepare_data(dict(fit._data_arrays))
    stats = ConstantSufficientStats.build(
        pdata["gx"], pdata["gy"], pdata["v"], pdata["verr"] * pdata["verr"],
        mask=pdata.get("mask"), s_max=fit._sufficient_s_max())

    # correctness of the Chebyshev variant vs the Hermite tier
    cheb = make_cheb_lnlike(stats)
    probe = jnp.asarray(pos[:4096], fit.dtype)
    a = np.asarray(jax.jit(stats.lnlike)(probe))
    b = np.asarray(jax.jit(cheb)(probe))
    err = np.max(np.abs(a - b) / np.maximum(np.abs(a), 1.0))
    print(f"cheb (D=48) vs hermite: max rel err {err:.3g}", flush=True)

    measure(lnprob, pos, fit.dtype, label=f"lnprob-only (prior+hermite) W={W}")
    measure(lambda t: stats.lnlike(t), pos, fit.dtype,
            label="lnlike-only (hermite tables)")
    measure(cheb, pos, fit.dtype, label="lnlike-only (chebyshev D=48)")
    for D in (24, 32):
        measure(make_cheb_lnlike(stats, D), pos, fit.dtype,
                label=f"lnlike-only (chebyshev D={D})")

    # full sampler step for reference (what the bench row measures)
    state = init_state(lnprob, jnp.asarray(pos, fit.dtype),
                       jax.random.PRNGKey(0), batched=True)
    best = {}
    for steps in (100, 200):
        res = run_ensemble(lnprob, state, n_steps=steps, store_chain=False,
                           batched=True)
        _ = np.asarray(res.final.coords)
        best[steps] = np.inf
        for _i in range(3):
            t0 = time.perf_counter()
            res = run_ensemble(lnprob, res.final, n_steps=steps,
                               store_chain=False, batched=True)
            _ = np.asarray(res.final.coords)
            best[steps] = min(best[steps], time.perf_counter() - t0)
    dt = best[200] - best[100]
    print(f"{'full sampler step (bench row)':46s} {W * 100 / dt:12.3e} evals/s"
          f"   (dt={dt:.3f}s)", flush=True)


if __name__ == "__main__":
    main()

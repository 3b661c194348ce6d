"""Micro-benchmark: restructured GB-mixture kernels vs the shipping ones.

The parametric-background mixture kernels (constant_gb / model_mixture /
double_model_gb in ops/lnlike_kernels.py) spend most of their VPU time on
per-(walker, star) transcendentals: log(rs), log(rb), log(D + f), exp,
log1p — ~6-7 per pair.  The candidate restructuring splits the per-star
logaddexp as

    t_i = b_i + max(d_i, 0) + log1p(exp(-|d_i|)) - ln_s_i,   d_i = a_i - b_i

so the member/background *normalisations* leave the pair loop:

  *  sum_i b_i = N ln f + sum_i lnl_back,i   — sum_i log(nb_i) via
     products-of-4 (0.25 logs/pair),
  *  sum_i ln_s_i = sum_i log(D_i + f)       — products-of-2 (0.5 logs/pair;
     factors clamped to [1e-15, 1e15] so the pairwise product stays in f32),
  *  d_i needs one log:  0.5 log(nb_i / norm_i)  (the dr^2/db^2 quadratics
     are divides, not transcendentals).

Per-pair transcendental count drops to ~3.75.  This probe measures both
forms and cross-checks the restructured values against the shipping kernel
(f32, 512 walkers) before any production change.

Usage: python tools/probe_mixture.py [constant_gb] [model_gb] [W=16384] [N=10000]
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


# --------------------------------------------------------------- v2 kernels
@partial(jax.jit, static_argnames=("walker_tile", "star_chunk"))
def constant_gb_v2(params, gx, gy, v, verr2, density, ln_density, mask,
                   walker_tile: int = 1024, star_chunk: int = 2048):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from mcmc_dynamics_tpu.ops.lnlike_kernels import _pad_stars, _pad_walkers

    dtype = params.dtype
    tiny = float(jnp.finfo(dtype).tiny)
    (gx, gy, v, verr2, density, ln_density, mask), n_stars = _pad_stars(
        [gx, gy, v, verr2, density, ln_density, mask], star_chunk)
    n_padded = gx.shape[0]
    params, n_walkers = _pad_walkers(params, walker_tile)
    w_padded = params.shape[0]
    n_chunks = n_padded // star_chunk

    stars = jnp.stack([gx, gy, v, verr2, density, ln_density, mask], axis=0)

    def kernel(p_ref, s_ref, out_ref):
        p = p_ref[:]
        v_sys = p[:, 0:1]
        sigma2 = p[:, 1:2] * p[:, 1:2]
        vx = p[:, 2:3]
        vy = p[:, 3:4]
        v_back = p[:, 4:5]
        sb2 = p[:, 5:6] * p[:, 5:6]
        f_back = jnp.maximum(p[:, 6:7], tiny)
        ln_f = jnp.log(f_back)
        half = star_chunk // 2
        quart = star_chunk // 4

        def body(c, carry):
            acc, cnt = carry
            sl = pl.ds(c * star_chunk, star_chunk)
            gx_c = s_ref[0, sl][None, :]
            gy_c = s_ref[1, sl][None, :]
            v_c = s_ref[2, sl][None, :]
            e2_c = s_ref[3, sl][None, :]
            d_c = s_ref[4, sl][None, :]
            lnd_c = s_ref[5, sl][None, :]
            m_c = s_ref[6, sl][None, :]
            live = m_c > 0

            norm = e2_c + sigma2
            nb = e2_c + sb2
            inv_norm = 1.0 / norm
            inv_nb = 1.0 / nb
            d = v_c - v_sys - gx_c * vx - gy_c * vy
            dr2 = d * d * inv_norm
            db = v_c - v_back
            db2 = jnp.where(live, db * db * inv_nb, 0.0)

            # delta = a - b = (lnd - ln_f) + 0.5 log(nb/norm) - 0.5 (dr2 - db2)
            delta = (lnd_c - ln_f) + 0.5 * jnp.log(nb * inv_norm) \
                - 0.5 * (dr2 - db2)
            pair = jnp.where(
                live,
                jnp.maximum(delta, 0.0)
                + jnp.log1p(jnp.exp(-jnp.abs(delta))) - 0.5 * db2,
                0.0)

            # star-summed normalisations: products-of-4 logs
            nbm = jnp.where(live, nb, 1.0)
            lognb = jnp.log((nbm[:, :quart] * nbm[:, quart:half])
                            * (nbm[:, half:half + quart]
                               * nbm[:, half + quart:]))
            sfm = jnp.where(live,
                            jnp.clip(d_c + f_back, 1e-15, 1e15), 1.0)
            lns = jnp.log(sfm[:, :half] * sfm[:, half:])

            acc = acc + jnp.sum(pair, axis=1, keepdims=True) \
                - 0.5 * jnp.sum(lognb, axis=1, keepdims=True) \
                - jnp.sum(lns, axis=1, keepdims=True)
            return acc, cnt + jnp.sum(m_c, axis=1, keepdims=True)

        acc, cnt = jax.lax.fori_loop(
            0, n_chunks, body,
            (jnp.zeros((p.shape[0], 1), dtype),
             jnp.zeros((p.shape[0], 1), dtype)))
        # sum b = cnt (ln_f - LOG_2PI/2); the -0.5 db2 part was folded per pair
        out_ref[:] = acc + cnt * (ln_f - 0.5 * _LOG_2PI)

    out = pl.pallas_call(
        kernel,
        grid=(w_padded // walker_tile,),
        in_specs=[
            pl.BlockSpec((walker_tile, params.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, n_padded), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((walker_tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((w_padded, 1), dtype),
        cost_estimate=pl.CostEstimate(
            flops=35 * w_padded * n_padded,
            bytes_accessed=4 * (7 * n_padded + 8 * w_padded),
            transcendentals=4 * w_padded * n_padded,
        ),
    )(params, stars)
    return out[:n_walkers, 0]


@partial(jax.jit, static_argnames=("walker_tile", "star_chunk"))
def model_gb_v2(params, dxm, dym, r2, v, verr2, density, ln_density, mask,
                walker_tile: int = 512, star_chunk: int = 2048):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from mcmc_dynamics_tpu.ops.lnlike_kernels import _pad_stars, _pad_walkers

    dtype = params.dtype
    tiny = float(jnp.finfo(dtype).tiny)
    (dxm, dym, r2, v, verr2, density, ln_density, mask), n_stars = _pad_stars(
        [dxm, dym, r2, v, verr2, density, ln_density, mask], star_chunk)
    n_padded = dxm.shape[0]
    params, n_walkers = _pad_walkers(params, walker_tile)
    w_padded = params.shape[0]
    n_chunks = n_padded // star_chunk

    stars = jnp.stack([dxm, dym, r2, v, verr2, density, ln_density, mask],
                      axis=0)

    def kernel(p_ref, s_ref, out_ref):
        p = p_ref[:]
        v_sys = p[:, 0:1]
        sigma2 = p[:, 1:2] * p[:, 1:2]
        inv_a2 = 1.0 / (p[:, 2:3] * p[:, 2:3])
        vx2 = 2.0 * p[:, 3:4]
        vy2 = 2.0 * p[:, 4:5]
        r_peak = p[:, 5:6]
        inv_rp = 1.0 / r_peak
        v_back = p[:, 6:7]
        sb2 = p[:, 7:8] * p[:, 7:8]
        f_back = jnp.maximum(p[:, 8:9], tiny)
        ln_f = jnp.log(f_back)
        half = star_chunk // 2
        quart = star_chunk // 4

        def body(c, carry):
            acc, cnt = carry
            sl = pl.ds(c * star_chunk, star_chunk)
            dx_c = s_ref[0, sl][None, :]
            dy_c = s_ref[1, sl][None, :]
            r2_c = s_ref[2, sl][None, :]
            v_c = s_ref[3, sl][None, :]
            e2_c = s_ref[4, sl][None, :]
            d_c = s_ref[5, sl][None, :]
            lnd_c = s_ref[6, sl][None, :]
            m_c = s_ref[7, sl][None, :]
            live = m_c > 0

            q = r_peak + r2_c * inv_rp
            num = dy_c * vx2 - dx_c * vy2
            d2 = q * (v_sys - v_c) + num
            sig2 = sigma2 * jax.lax.rsqrt(1.0 + r2_c * inv_a2)
            norm = e2_c + sig2
            nb = e2_c + sb2
            inv_nb = 1.0 / nb
            dr2 = (d2 * d2) / (q * q * norm)
            db = v_c - v_back
            db2 = jnp.where(live, db * db * inv_nb, 0.0)

            delta = (lnd_c - ln_f) + 0.5 * jnp.log(nb / norm) \
                - 0.5 * (dr2 - db2)
            pair = jnp.where(
                live,
                jnp.maximum(delta, 0.0)
                + jnp.log1p(jnp.exp(-jnp.abs(delta))) - 0.5 * db2,
                0.0)

            nbm = jnp.where(live, nb, 1.0)
            lognb = jnp.log((nbm[:, :quart] * nbm[:, quart:half])
                            * (nbm[:, half:half + quart]
                               * nbm[:, half + quart:]))
            sfm = jnp.where(live,
                            jnp.clip(d_c + f_back, 1e-15, 1e15), 1.0)
            lns = jnp.log(sfm[:, :half] * sfm[:, half:])

            acc = acc + jnp.sum(pair, axis=1, keepdims=True) \
                - 0.5 * jnp.sum(lognb, axis=1, keepdims=True) \
                - jnp.sum(lns, axis=1, keepdims=True)
            return acc, cnt + jnp.sum(m_c, axis=1, keepdims=True)

        acc, cnt = jax.lax.fori_loop(
            0, n_chunks, body,
            (jnp.zeros((p.shape[0], 1), dtype),
             jnp.zeros((p.shape[0], 1), dtype)))
        out_ref[:] = acc + cnt * (ln_f - 0.5 * _LOG_2PI)

    out = pl.pallas_call(
        kernel,
        grid=(w_padded // walker_tile,),
        in_specs=[
            pl.BlockSpec((walker_tile, params.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, n_padded), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((walker_tile, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((w_padded, 1), dtype),
        cost_estimate=pl.CostEstimate(
            flops=45 * w_padded * n_padded,
            bytes_accessed=4 * (8 * n_padded + 10 * w_padded),
            transcendentals=5 * w_padded * n_padded,
        ),
    )(params, stars)
    return out[:n_walkers, 0]


# ----------------------------------------------------------------- harness
def measure(fn, pos, dtype, steps=100, label=""):
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
    print(f"{label:44s} {rate:12.3e} evals/s   (dt={dt:.3f}s)", flush=True)
    return rate


def main():
    from mcmc_dynamics_tpu.ops.lnlike_kernels import (
        constant_gb_lnlike_batched, model_mixture_lnlike_batched)

    kv = dict(x.split("=") for x in sys.argv[1:] if "=" in x)
    which = [a for a in sys.argv[1:] if "=" not in a] or \
        ["constant_gb", "model_gb"]
    W = int(kv.get("W", 16384))
    N = int(kv.get("N", 10000))
    dtype = jnp.float32

    rng = np.random.default_rng(3)
    gx = rng.normal(0, 1.5, N)
    gy = rng.normal(0, 1.5, N)
    r2 = gx * gx + gy * gy
    v = rng.normal(0, 8, N)
    verr = 0.5 + 0.5 * rng.random(N)
    density = np.exp(rng.normal(3, 1, N))
    mask = np.ones(N)
    args_c = [jnp.asarray(a, dtype) for a in
              (gx, gy, v, verr * verr, density, np.log(density), mask)]
    args_m = [jnp.asarray(a, dtype) for a in
              (gx, gy, r2, v, verr * verr, density, np.log(density), mask)]

    if "constant_gb" in which:
        # columns: v_sys, sigma_max, v_maxx, v_maxy, v_back, sigma_back, f_back
        pos = np.column_stack([
            rng.normal(0, 1, W), np.exp(rng.normal(1.8, 0.2, W)),
            rng.normal(0, 3, W), rng.normal(0, 3, W),
            rng.normal(0, 20, W), np.exp(rng.normal(3.5, 0.3, W)),
            np.exp(rng.normal(1.0, 1.0, W)),
        ])
        probe = jnp.asarray(pos[:512], dtype)
        ref = np.asarray(constant_gb_lnlike_batched(probe, *args_c))
        got = np.asarray(constant_gb_v2(probe, *args_c, walker_tile=512,
                                        star_chunk=1024))
        err = np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1.0))
        print(f"constant_gb v2 vs v1: max rel err {err:.3g}", flush=True)
        measure(lambda t: constant_gb_lnlike_batched(t, *args_c), pos, dtype,
                label=f"constant_gb v1 (shipping) W={W} N={N}")
        for wt, sc in ((512, 2048), (512, 1024), (1024, 1024), (1024, 512),
                       (2048, 512)):
            measure(lambda t: constant_gb_v2(t, *args_c, walker_tile=wt,
                                             star_chunk=sc),
                    pos, dtype, label=f"constant_gb v2 wt={wt} sc={sc}")

    if "model_gb" in which:
        # columns: v_sys, sigma_max, a, v_maxx, v_maxy, r_peak,
        #          v_back, sigma_back, f_back
        pos = np.column_stack([
            rng.normal(0, 1, W), np.exp(rng.normal(1.8, 0.2, W)),
            rng.uniform(20, 60, W), rng.normal(0, 3, W), rng.normal(0, 3, W),
            rng.uniform(30, 90, W),
            rng.normal(0, 20, W), np.exp(rng.normal(3.5, 0.3, W)),
            np.exp(rng.normal(1.0, 1.0, W)),
        ])
        probe = jnp.asarray(pos[:512], dtype)
        ref = np.asarray(model_mixture_lnlike_batched(
            probe, *args_m[:5], args_m[5], args_m[6],
            jnp.zeros(N, dtype), args_m[7], True))
        got = np.asarray(model_gb_v2(probe, *args_m, walker_tile=512,
                                     star_chunk=512))
        err = np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1.0))
        print(f"model_gb v2 vs v1: max rel err {err:.3g}", flush=True)
        measure(lambda t: model_mixture_lnlike_batched(
            t, *args_m[:5], args_m[5], args_m[6], jnp.zeros(N, dtype),
            args_m[7], True), pos, dtype,
            label=f"model_gb v1 (shipping) W={W} N={N}")
        for wt, sc in ((512, 1024), (512, 512), (1024, 512)):
            measure(lambda t: model_gb_v2(t, *args_m, walker_tile=wt,
                                          star_chunk=sc),
                    pos, dtype, label=f"model_gb v2 wt={wt} sc={sc}")


if __name__ == "__main__":
    main()

"""Micro-benchmark harness: ModelFit sufficient-tier kernel variants on the attached TPU.

Two-point scan measurement (dispatch-free): rate = W*S / (t(2S) - t(S)).
Usage: python tools/probe_sufficient.py [pallas|xla|mxu|cfg:B=96,D=35,kind=pallas,wt=2048 ...]
Keep table-tier tuning honest: measure before changing defaults (CLAUDE.md).
"""
import pathlib
import sys
import time
from functools import partial

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

N_STARS = 10_000
W = 16_384
S = 200


def make_fit():
    from mcmc_dynamics_tpu import units as u
    from mcmc_dynamics_tpu.utils import DataReader
    from mcmc_dynamics_tpu.models import ModelFit

    rng = np.random.default_rng(1)
    ra_c, dec_c = 56.345, -26.675
    data = DataReader({
        "ra": u.Quantity(ra_c + 0.03 * rng.normal(size=N_STARS), "deg"),
        "dec": u.Quantity(dec_c + 0.03 * rng.normal(size=N_STARS), "deg"),
        "v": u.Quantity(5.0 * rng.normal(size=N_STARS), "km/s"),
        "verr": u.Quantity(0.5 + 0.5 * rng.random(N_STARS), "km/s"),
    })
    params = ModelFit.default_parameters()
    params["ra_center"].set(value=ra_c, fixed=True)
    params["dec_center"].set(value=dec_c, fixed=True)
    params["r_peak"].set(min=1.0, max=300.0)
    params["a"].set(min=1.0, max=300.0)
    fit = ModelFit(data, parameters=params)
    pos = np.column_stack([
        rng.normal(0, 1, W),
        np.exp(rng.normal(1.8, 0.2, W)),
        rng.uniform(20, 60, W),
        rng.normal(0, 3, W),
        rng.normal(0, 3, W),
        rng.uniform(30, 90, W),
    ])
    return fit, pos


def measure(fn, pos, dtype, steps=S, label=""):
    """Iterated-eval scan: lnprob -> tiny param nudge -> lnprob ..."""
    th0 = jnp.asarray(pos, dtype)

    @partial(jax.jit, static_argnums=1)
    def loop(th, n):
        def body(carry, _):
            t, acc = carry
            ll = fn(t)
            # data-dependent nudge keeps the scan un-collapsible
            t = t + 1e-6 * jnp.tanh(ll)[:, None]
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
    print(f"{label:40s} {rate:12.3e} evals/s   (dt={dt:.3f}s)", flush=True)
    return rate


def main():
    from mcmc_dynamics_tpu.ops.model_sufficient import (
        ModelSufficientStats, model_sufficient_lnlike_pallas)

    fit, pos = make_fit()
    data = fit.prepare_data(dict(fit._data_arrays))
    s_max = fit._sufficient_s_max()
    col_scale = np.asarray(fit._internal_col_scale())
    pos_i = pos * col_scale[None, :]   # internal units directly; skip prior

    variants = sys.argv[1:] or ["pallas", "xla"]

    stats = ModelSufficientStats.build(
        data["dxm"], data["dym"], data["v"], data["verr"] * data["verr"],
        s_max=s_max, dtype=fit.dtype)
    B, D, CH = stats.coeffs.shape
    print(f"default tables: B={B} D={D} CH={CH} s_max={s_max:g}", flush=True)

    if "pallas" in variants:
        measure(lambda t: model_sufficient_lnlike_pallas(stats, t), pos_i,
                fit.dtype, label=f"pallas B={B} D={D}")
    if "xla" in variants:
        measure(stats.lnlike, pos_i, fit.dtype, label=f"xla    B={B} D={D}")

    for v in variants:
        if v.startswith("cfg:"):
            # cfg:B=96,D=35,kind=pallas,wt=512
            kv = dict(x.split("=") for x in v[4:].split(","))
            nb = int(kv.get("B", B))
            nc = int(kv.get("D", D))
            st = ModelSufficientStats.build(
                data["dxm"], data["dym"], data["v"],
                data["verr"] * data["verr"],
                n_bins=nb, n_coef=nc, s_max=s_max, dtype=fit.dtype)
            kind = kv.get("kind", "pallas")
            if kind == "pallas":
                wt = int(kv.get("wt", 512))
                bb = int(kv.get("bb", 8))
                measure(lambda t: model_sufficient_lnlike_pallas(
                    st, t, walker_tile=wt, bin_block=bb), pos_i, fit.dtype,
                    label=f"pallas B={nb} D={nc} wt={wt} bb={bb}")
            elif kind == "mxu":
                from mcmc_dynamics_tpu.ops.model_sufficient import \
                    model_sufficient_lnlike_pallas_mxu
                wt = int(kv.get("wt", 512))
                fn = lambda t: model_sufficient_lnlike_pallas_mxu(
                    st, t, walker_tile=wt)
                # correctness vs the XLA table evaluation on a small batch
                probe = jnp.asarray(pos_i[:512], fit.dtype)
                got = np.asarray(jax.jit(fn)(probe))
                ref = np.asarray(jax.jit(st.lnlike)(probe))
                err = np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1.0))
                print(f"  mxu vs xla-tables: max rel err {err:.3g}", flush=True)
                measure(fn, pos_i, fit.dtype,
                        label=f"mxu    B={nb} D={nc} wt={wt}")
            else:
                measure(st.lnlike, pos_i, fit.dtype,
                        label=f"xla    B={nb} D={nc}")


if __name__ == "__main__":
    main()

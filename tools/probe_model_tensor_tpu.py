"""TPU micro-benchmark: the 3-D tensor-Chebyshev ModelFit tier (ops/model_tensor.py).

Two-point scan (dispatch-free), same harness as tools/probe_sufficient.py, plus
an on-device f32 accuracy check against the exact XLA direct likelihood — run
per MXU precision setting (the contraction's HIGHEST/HIGH/DEFAULT choice is the
accuracy/rate trade to pin before promoting the tier to a dispatch default).

Usage: python tools/probe_model_tensor_tpu.py [highest high default]
"""
import pathlib
import sys
import time
from functools import partial

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from probe_sufficient import make_fit, measure, N_STARS, W


def direct_lnl_xla(fit, data):
    """Exact f32 reference on-device (HIGHEST-precision elementwise math)."""
    dxm, dym, v = data["dxm"], data["dym"], data["v"]
    verr2 = data["verr"] * data["verr"]
    u = dxm * dxm + dym * dym
    x, y = dym, -dxm

    def one(t):
        vs, sm, a, vx, vy, rp = t
        g = 1.0 / jnp.sqrt(1.0 + u / (a * a))
        n = verr2 + sm * sm * g
        c = 2.0 * rp / (rp * rp + u)
        vlos = vs + c * (x * vx + y * vy)
        return -0.5 * jnp.sum(jnp.log(2 * jnp.pi * n) + (v - vlos) ** 2 / n)

    return jax.vmap(one)


def main():
    from mcmc_dynamics_tpu.ops.model_tensor import ModelTensorStats

    fit, pos = make_fit()
    data = fit.prepare_data(dict(fit._data_arrays))
    col_scale = np.asarray(fit._internal_col_scale())
    pos_i = pos * col_scale[None, :]
    s_max = fit._sufficient_s_max()

    t0 = time.time()
    st = ModelTensorStats.build(
        data["dxm"], data["dym"], data["v"], data["verr"] * data["verr"],
        a_bounds=(1.0 / 60.0, 300.0 / 60.0), r_bounds=(1.0 / 60.0, 300.0 / 60.0),
        s_max=s_max, dtype=fit.dtype)
    print(f"tables: degrees ({st.n_s},{st.n_a},{st.n_r}) table {st.table.shape} "
          f"build {time.time() - t0:.1f}s", flush=True)

    ref_fn = jax.jit(direct_lnl_xla(fit, data))
    probe = jnp.asarray(pos_i[:1024], fit.dtype)
    ref = np.asarray(ref_fn(probe))

    prec_map = {"highest": jax.lax.Precision.HIGHEST,
                "high": jax.lax.Precision.HIGH,
                "default": jax.lax.Precision.DEFAULT}
    precs = sys.argv[1:] or ["highest", "high", "default"]
    for pname in precs:
        if pname.startswith("pallas"):
            # pallas[:prec[:walker_tile]], e.g. pallas:high:4096
            from mcmc_dynamics_tpu.ops.model_tensor import \
                model_tensor_lnlike_pallas
            bits = pname.split(":")
            pr = prec_map[bits[1] if len(bits) > 1 else "high"]
            wt = int(bits[2]) if len(bits) > 2 else 2048
            fn = lambda t: model_tensor_lnlike_pallas(
                st, t, walker_tile=wt, precision=pr)
        else:
            prec = prec_map[pname]
            fn = lambda t: st.lnlike(t, precision=prec)
        got = np.asarray(jax.jit(fn)(probe))
        err = np.max(np.abs(got - ref) / np.maximum(np.abs(ref), 1.0))
        measure(fn, pos_i, fit.dtype, label=f"tensor W={W} {pname} "
                                            f"(rel err {err:.2e})")


if __name__ == "__main__":
    main()

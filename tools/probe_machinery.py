"""Micro-benchmark: ensemble-machinery cost vs walker-array layout on TPU.

The headline O(1)/walker tiers (constant/sufficient, model/tensor) are bounded
by the stretch-move machinery, not the likelihood kernel.  Hypothesis: the
machinery's (W, K) arrays put K (= 5-6 parameters) in the TPU LANE dimension
(128 lanes), so every elementwise op on coords/proposals wastes ~96% of each
vector op; carrying the ensemble transposed as (K, W) puts walkers in lanes.

This probe measures, with a trivial (free) batched lnprob at W=16384, K=6:

* ``current``  — the shipped run_ensemble scan (coords (W, K));
* ``transposed`` — a standalone stretch-only scan carrying (K, W) coords,
  same ops (fused 3xn uniform draw, partner gather, z-FMA, accept select,
  chain store) in the transposed layout;
* both with and without chain storage, separating the scan-stack cost.

Two-point scan measurement (dispatch-free): cost/step = (t(2S) - t(S)) / S.
Usage: python tools/probe_machinery.py [W] [K]
"""
import pathlib
import sys
import time
from functools import partial

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

W = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
K = int(sys.argv[2]) if len(sys.argv) > 2 else 6
S = 400


def two_point(run, label):
    best = {}
    for steps in (S, 2 * S):
        np.asarray(run(steps))                      # compile + warm
        best[steps] = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(steps))
            best[steps] = min(best[steps], time.perf_counter() - t0)
    us = (best[2 * S] - best[S]) / S * 1e6
    print(f"{label:34s} {us:8.2f} us/step   "
          f"({W / (us * 1e-6):.3g} walker-evals/s machinery-only)")
    return us


def bench_current(store_chain):
    from mcmc_dynamics_tpu.sampler import init_state, run_ensemble
    from mcmc_dynamics_tpu.sampler.stretch import make_key

    lnprob = lambda th: jnp.zeros(th.shape[0], th.dtype)  # free likelihood
    pos = jnp.asarray(np.random.default_rng(0).normal(size=(W, K)), jnp.float32)
    state = init_state(lnprob, pos, make_key(0), batched=True)

    def run(steps):
        res = run_ensemble(lnprob, state, n_steps=steps,
                           store_chain=store_chain, batched=True)
        return res.final.coords

    return two_point(run, f"current (W,K) store={store_chain}")


def bench_transposed(store_chain):
    """Stretch-only scan carrying (K, W) coords: walkers ride the lane dim."""
    from mcmc_dynamics_tpu.sampler.stretch import make_key

    a = 2.0
    half = W // 2
    pos = jnp.asarray(np.random.default_rng(0).normal(size=(K, W)), jnp.float32)
    key0 = make_key(0)

    def half_update(active, lnp, other, k):
        # same op sequence as propose_stretch, transposed
        un = jax.random.uniform(k, (3, half), dtype=active.dtype)
        z = ((a - 1.0) * un[0] + 1.0) ** 2 / a
        idx = jnp.minimum((un[1] * half).astype(jnp.int32), half - 1)
        partners = jnp.take(other, idx, axis=1)           # (K, half)
        proposals = partners + z[None, :] * (active - partners)
        new_lnp = jnp.zeros(half, active.dtype)           # free likelihood
        ln_acc = (K - 1.0) * jnp.log(z) + new_lnp - lnp
        accept = jnp.log(un[2]) < ln_acc
        coords = jnp.where(accept[None, :], proposals, active)
        return coords, jnp.where(accept, new_lnp, lnp), accept

    @partial(jax.jit, static_argnums=(1,))
    def run_t(state0, steps):
        def body(carry, _):
            coords, lnp, key = carry
            key_next, k0, k1 = jax.random.split(key, 3)
            c0, c1 = coords[:, :half], coords[:, half:]
            p0, p1 = lnp[:half], lnp[half:]
            c0, p0, _ = half_update(c0, p0, c1, k0)
            c1, p1, _ = half_update(c1, p1, c0, k1)
            coords = jnp.concatenate([c0, c1], axis=1)
            lnp = jnp.concatenate([p0, p1])
            out = (coords, lnp) if store_chain else None
            return (coords, lnp, key_next), out

        final, _traj = jax.lax.scan(body, state0, None, length=steps)
        return final[0]

    state0 = (pos, jnp.zeros(W, jnp.float32), key0)
    return two_point(lambda s: run_t(state0, s),
                     f"transposed (K,W) store={store_chain}")


def bench_store_ab(n_rounds=4):
    """Interleaved A/B of the legacy (W, K) chain store vs the transposed
    (K, W) store, same stretch_step machinery, free lnprob — alternating
    within one process so tunnel drift cannot masquerade as a difference."""
    from mcmc_dynamics_tpu.sampler import init_state
    from mcmc_dynamics_tpu.sampler.stretch import make_key, stretch_step

    lnprob = lambda th: jnp.zeros(th.shape[0], th.dtype)
    pos = jnp.asarray(np.random.default_rng(0).normal(size=(W, K)), jnp.float32)
    state = init_state(lnprob, pos, make_key(0), batched=True)

    def make_run(transposed):
        @partial(jax.jit, static_argnums=(1,))
        def run(state0, steps):
            def body(carry, _):
                new = stretch_step(lnprob, carry, a=2.0, batched=True)
                out = (new.coords.T, new.log_prob) if transposed \
                    else (new.coords, new.log_prob)
                return new, out

            final, traj = jax.lax.scan(body, state0, None, length=steps)
            # traj is a real OUTPUT (XLA must materialise the store) but only
            # the small coords array is fetched, like run_ensemble's chunk loop
            return final.coords, traj

        return run

    def make_stage2(pin_kernel_layout):
        """Full lane-major machinery: carry (K, W), store free, proposals
        handed to the lnprob boundary as (W, K) (transposed per half-step).
        ``pin_kernel_layout`` wraps the (W, K) proposals in an
        optimization_barrier so XLA cannot elide the materialisation — the
        conservative model of a fixed-layout Pallas/table kernel input."""
        a = 2.0
        half = W // 2

        def half_update(active, lnp, other, k):
            un = jax.random.uniform(k, (3, half), dtype=active.dtype)
            z = ((a - 1.0) * un[0] + 1.0) ** 2 / a
            idx = jnp.minimum((un[1] * half).astype(jnp.int32), half - 1)
            partners = jnp.take(other, idx, axis=1)       # (K, half)
            proposals = partners + z[None, :] * (active - partners)
            th = proposals.T                               # kernel boundary
            if pin_kernel_layout:
                th = jax.lax.optimization_barrier(th)
            new_lnp = jnp.zeros(half, active.dtype) + th[:, 0] * 0.0
            ln_acc = (K - 1.0) * jnp.log(z) + new_lnp - lnp
            accept = jnp.log(un[2]) < ln_acc
            coords = jnp.where(accept[None, :], proposals, active)
            return coords, jnp.where(accept, new_lnp, lnp)

        @partial(jax.jit, static_argnums=(1,))
        def run(state0, steps):
            coords0 = state0.coords.T                      # one-time relayout

            def body(carry, _):
                coords, lnp, key = carry
                key_next, k0, k1 = jax.random.split(key, 3)
                c0, c1 = coords[:, :half], coords[:, half:]
                p0, p1 = lnp[:half], lnp[half:]
                c0, p0 = half_update(c0, p0, c1, k0)
                c1, p1 = half_update(c1, p1, c0, k1)
                coords = jnp.concatenate([c0, c1], axis=1)
                lnp = jnp.concatenate([p0, p1])
                return (coords, lnp, key_next), (coords, lnp)

            final, traj = jax.lax.scan(
                body, (coords0, state0.log_prob, state0.key), None,
                length=steps)
            return final[0], traj

        return run

    runs = {"legacy (W,K) store": make_run(False),
            "transposed (K,W) store": make_run(True),
            "stage2 (K,W) carry, free": make_stage2(False),
            "stage2 (K,W) carry, pinned": make_stage2(True)}
    best = {name: {S: np.inf, 2 * S: np.inf} for name in runs}
    for name, run in runs.items():          # compile both first
        for steps in (S, 2 * S):
            np.asarray(run(state, steps)[0])
    for _ in range(n_rounds):
        for name, run in runs.items():
            for steps in (S, 2 * S):
                t0 = time.perf_counter()
                np.asarray(run(state, steps)[0])
                best[name][steps] = min(best[name][steps],
                                        time.perf_counter() - t0)
    for name in runs:
        us = (best[name][2 * S] - best[name][S]) / S * 1e6
        print(f"A/B {name:28s} {us:8.2f} us/step   "
              f"({W / (us * 1e-6):.3g} walker-evals/s machinery-only)")


def bench_store_transposed():
    """Minimal variant: (W, K) carry unchanged, but the chain STORE emits the
    per-step slice transposed (K, W) so the scan-stacked trajectory is
    (S, K, W) — walkers in lanes for the dominant per-step write."""
    from mcmc_dynamics_tpu.sampler import init_state
    from mcmc_dynamics_tpu.sampler.stretch import make_key, stretch_step

    lnprob = lambda th: jnp.zeros(th.shape[0], th.dtype)
    pos = jnp.asarray(np.random.default_rng(0).normal(size=(W, K)), jnp.float32)
    state = init_state(lnprob, pos, make_key(0), batched=True)

    @partial(jax.jit, static_argnums=(1,))
    def run_st(state0, steps):
        def body(carry, _):
            new = stretch_step(lnprob, carry, a=2.0, batched=True)
            return new, (new.coords.T, new.log_prob)

        final, traj = jax.lax.scan(body, state0, None, length=steps)
        return final.coords

    return two_point(lambda s: run_st(state, s), "current carry, (K,W) store")


def bench_real_kernel():
    """End-to-end: the real constant/sufficient tier at the bench shape."""
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from mcmc_dynamics_tpu import units as u
    from mcmc_dynamics_tpu.models import ConstantFit
    from mcmc_dynamics_tpu.sampler import init_state, run_ensemble
    from mcmc_dynamics_tpu.sampler.stretch import make_key
    from mcmc_dynamics_tpu.utils import DataReader

    rng = np.random.default_rng(0)
    n = 10000
    ra_c, dec_c = 56.345, -26.675
    data = DataReader({
        "ra": u.Quantity(ra_c + 0.03 * rng.normal(size=n), "deg"),
        "dec": u.Quantity(dec_c + 0.03 * rng.normal(size=n), "deg"),
        "v": u.Quantity(5.0 * rng.normal(size=n), "km/s"),
        "verr": u.Quantity(0.5 + 0.5 * rng.random(n), "km/s"),
    })
    params = ConstantFit.default_parameters()
    params["ra_center"].set(value=ra_c, fixed=True)
    params["dec_center"].set(value=dec_c, fixed=True)
    params["sigma_max"].set(max=50.0)
    fit = ConstantFit(data, parameters=params)
    lnprob = fit.build_lnprob_sufficient()
    pos = np.column_stack([rng.normal(0, 1, W), rng.uniform(4, 9, W),
                           rng.normal(0, 2, W), rng.normal(0, 2, W)])
    state = init_state(lnprob, jnp.asarray(pos, fit.dtype), make_key(0),
                       batched=True)

    def run(steps):
        res = run_ensemble(lnprob, state, n_steps=steps, store_chain=True,
                           batched=True)
        return res.final.coords

    return two_point(run, "REAL constant/sufficient e2e")


if __name__ == "__main__":
    print(f"backend={jax.default_backend()}  W={W}  K={K}")
    if "--ab" in sys.argv:
        bench_store_ab()
    else:
        for store in (False, True):
            bench_current(store)
            bench_transposed(store)
        bench_store_transposed()
    if "--real" in sys.argv:
        bench_real_kernel()

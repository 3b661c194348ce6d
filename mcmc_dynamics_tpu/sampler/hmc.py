"""Gradient-based sampling: vmapped Hamiltonian Monte Carlo / MALA.

Every likelihood in this framework — including the JAM moment engine — is
differentiable by construction (pure JAX), which the reference's C-library physics
cannot offer.  This module exploits that: W independent HMC chains advance in one
``lax.scan`` with ``vmap``-ed leapfrog integration, with Robbins-Monro step-size
adaptation toward a target acceptance during warmup.

For hard parameter bounds the -inf regions simply reject (the gradient there is
zero'd); heavy tails/multimodality are better served by the tempered ensemble
(``sampler.tempered``), but for smooth unimodal posteriors HMC decorrelates in a
handful of steps where stretch moves need hundreds.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["HMCState", "HMCResult", "init_hmc", "run_hmc"]


class HMCState(NamedTuple):
    coords: jnp.ndarray      # (W, P)
    log_prob: jnp.ndarray    # (W,)
    grad: jnp.ndarray        # (W, P)
    key: jax.Array
    log_step: jnp.ndarray    # scalar: log step size (adapted during warmup)
    accepted: jnp.ndarray    # (W,)
    step: jnp.ndarray


class HMCResult(NamedTuple):
    chain: jnp.ndarray       # (W, S, P)
    log_prob: jnp.ndarray    # (W, S)
    final: HMCState
    acceptance_fraction: jnp.ndarray
    step_size: float


def _value_and_grad_fn(lnprob_fn):
    vg = jax.value_and_grad(lnprob_fn)

    def safe(theta):
        lnp, g = vg(theta)
        finite = jnp.isfinite(lnp)
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        return jnp.where(finite, lnp, -jnp.inf), g

    return jax.vmap(safe)


def init_hmc(lnprob_fn: Callable, coords, key, step_size: float = 0.1) -> HMCState:
    coords = jnp.asarray(coords)
    lnp, grad = _value_and_grad_fn(lnprob_fn)(coords)
    return HMCState(coords=coords, log_prob=lnp, grad=grad, key=key,
                    log_step=jnp.asarray(np.log(step_size), coords.dtype),
                    accepted=jnp.zeros(coords.shape[0], jnp.int32),
                    step=jnp.zeros((), jnp.int32))


@partial(jax.jit, static_argnums=(0, 2, 3, 5, 6, 7))
def _scan_hmc(lnprob_fn, state: HMCState, n_steps: int, n_leapfrog: int,
              mass_inv, adapt: bool, target_accept: float, store_chain: bool):
    vg = _value_and_grad_fn(lnprob_fn)
    n_walkers, ndim = state.coords.shape
    m_inv = jnp.ones(ndim, state.coords.dtype) if mass_inv is None else mass_inv

    def body(carry, step_idx):
        st = carry
        key, k_mom, k_acc, k_eps = jax.random.split(st.key, 4)
        # jitter the step size ±20% per iteration: fixed (eps, L) makes near-
        # periodic trajectories on harmonic-like posteriors (resonant mixing)
        eps = jnp.exp(st.log_step) * (0.8 + 0.4 * jax.random.uniform(
            k_eps, (), st.coords.dtype))

        p0 = jax.random.normal(k_mom, st.coords.shape, st.coords.dtype) \
            / jnp.sqrt(m_inv)[None, :]

        def leapfrog(i, args):
            # lnP at the new q rides along: the final iteration's evaluation
            # IS the proposal's value, saving one full value_and_grad per step
            q, p, g, _lnp = args
            p = p + 0.5 * eps * g
            q = q + eps * m_inv[None, :] * p
            lnp, g = vg(q)
            p = p + 0.5 * eps * g
            return q, p, g, lnp

        q, p, new_grad, new_lnp = jax.lax.fori_loop(
            0, n_leapfrog, leapfrog, (st.coords, p0, st.grad, st.log_prob))

        h0 = st.log_prob - 0.5 * jnp.sum(p0 * p0 * m_inv[None, :], axis=1)
        h1 = new_lnp - 0.5 * jnp.sum(p * p * m_inv[None, :], axis=1)
        # -inf - -inf (walker stuck at an invalid point proposing another
        # invalid point) is NaN; map it to a clean rejection — a NaN here
        # would otherwise flow through accept_rate into log_step and poison
        # the adapted step size for every walker, permanently
        delta = h1 - h0
        ln_accept = jnp.where(jnp.isnan(delta), -jnp.inf, delta)
        u = jnp.log(jax.random.uniform(k_acc, (n_walkers,), st.coords.dtype))
        accept = (u < ln_accept) & jnp.isfinite(new_lnp)

        coords = jnp.where(accept[:, None], q, st.coords)
        lnp = jnp.where(accept, new_lnp, st.log_prob)
        grad = jnp.where(accept[:, None], new_grad, st.grad)

        # Robbins-Monro step-size adaptation toward the target acceptance
        accept_rate = jnp.mean(jnp.exp(jnp.minimum(ln_accept, 0.0)))
        gain = 0.05 if adapt else 0.0
        log_step = st.log_step + gain * (accept_rate - target_accept)

        new = HMCState(coords=coords, log_prob=lnp, grad=grad, key=key,
                       log_step=log_step,
                       accepted=st.accepted + accept.astype(jnp.int32),
                       step=st.step + 1)
        return new, ((coords, lnp) if store_chain else None)

    final, traj = jax.lax.scan(body, state, jnp.arange(n_steps))
    return final, traj


def run_hmc(lnprob_fn: Callable, state: HMCState, n_steps: int,
            n_leapfrog: int = 10, mass_inv=None, adapt: bool = False,
            target_accept: float = 0.8, store_chain: bool = True) -> HMCResult:
    """Advance W vmapped HMC chains ``n_steps`` steps in one XLA computation.

    Typical use: a warmup call with ``adapt=True`` (tunes the step size), then a
    sampling call with ``adapt=False`` resuming from ``result.final``.
    """
    final, traj = _scan_hmc(lnprob_fn, state, int(n_steps), int(n_leapfrog),
                            mass_inv, bool(adapt), float(target_accept),
                            bool(store_chain))
    if store_chain:
        coords, lnp = traj
        chain = jnp.swapaxes(coords, 0, 1)
        log_prob = jnp.swapaxes(lnp, 0, 1)
    else:
        chain = jnp.zeros((state.coords.shape[0], 0, state.coords.shape[1]),
                          state.coords.dtype)
        log_prob = jnp.zeros((state.coords.shape[0], 0), state.log_prob.dtype)
    n_done = jnp.maximum(final.step - state.step, 1)
    return HMCResult(chain=chain, log_prob=log_prob, final=final,
                     acceptance_fraction=(final.accepted - state.accepted) / n_done,
                     step_size=float(jnp.exp(final.log_step)))

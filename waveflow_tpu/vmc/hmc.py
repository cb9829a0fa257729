"""Hamiltonian Monte Carlo driver over arbitrary pytrees (new capability).

Generic probprog driver reusing the flow log-prob kernels: sample walker
configurations *or* flow parameters (BASELINE.json configs[4]) from any
differentiable log density.  Fixed-length leapfrog + Metropolis correction,
dual-averaging step-size adaptation during warmup (Hoffman & Gelman 2014,
the scheme NUTS uses), all fixed-shape lax.scan.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


class HMCState(NamedTuple):
    position: jnp.ndarray      # (B, D) flattened chains
    log_prob: jnp.ndarray      # (B,)
    step_size: jnp.ndarray     # ()
    # dual-averaging state
    log_step_bar: jnp.ndarray
    h_bar: jnp.ndarray
    iteration: jnp.ndarray
    # dual-averaging anchor mu = log(10 * eps0), fixed at init from the
    # caller's step size (Hoffman & Gelman 2014 Alg. 6) — a hard-coded
    # anchor would drag warmup toward the same step regardless of eps0
    mu: jnp.ndarray


def make_hmc_sampler(log_prob_fn: Callable, n_leapfrog: int = 16,
                     target_accept: float = 0.8,
                     axis_name=None):
    """log_prob_fn: (B, D) -> (B,) differentiable log density.

    ``axis_name``: mesh axis (or tuple of axes) the chains are sharded
    over — the dual-averaging acceptance statistic is pmean-reduced so
    every device adapts ONE collective step size (BASELINE.json north
    star: "multi-host chains"; the single-device reference has no sampler
    at all).  Use parallel.make_sharded_chain_sampler to build the
    shard_map wrapper."""

    grad_fn = jax.vmap(jax.grad(lambda x: log_prob_fn(x[None])[0]))

    def init_fn(position, step_size=0.1):
        eps0 = jnp.asarray(step_size, jnp.float32)
        return HMCState(position, log_prob_fn(position), eps0,
                        jnp.log(eps0), jnp.zeros(()), jnp.zeros(()),
                        jnp.log(10.0 * eps0))

    def leapfrog(position, momentum, step_size):
        def body(carry, _):
            q, p = carry
            p = p + 0.5 * step_size * grad_fn(q)
            q = q + step_size * p
            p = p + 0.5 * step_size * grad_fn(q)
            return (q, p), None

        (q, p), _ = jax.lax.scan(body, (position, momentum), None,
                                 length=n_leapfrog)
        return q, p

    def step_fn(state: HMCState, rng, warmup: bool = False) -> HMCState:
        rng_mom, rng_acc = jax.random.split(rng)
        momentum = jax.random.normal(rng_mom, state.position.shape)
        q_new, p_new = leapfrog(state.position, momentum, state.step_size)
        lp_new = log_prob_fn(q_new)
        h_old = state.log_prob - 0.5 * (momentum ** 2).sum(-1)
        h_new = lp_new - 0.5 * (p_new ** 2).sum(-1)
        log_accept = jnp.minimum(h_new - h_old, 0.0)
        accept = jnp.log(jax.random.uniform(rng_acc, log_accept.shape)) \
            < log_accept
        position = jnp.where(accept[:, None], q_new, state.position)
        log_prob = jnp.where(accept, lp_new, state.log_prob)
        accept_prob = jnp.exp(log_accept).mean()
        if axis_name is not None:
            accept_prob = jax.lax.pmean(accept_prob, axis_name)

        if warmup:
            # Nesterov dual averaging: log_eps_t = mu - sqrt(t)/gamma * h_bar
            t = state.iteration + 1
            gamma, kappa = 0.05, 0.75
            h_bar = (1 - 1 / (t + 10)) * state.h_bar + \
                (target_accept - accept_prob) / (t + 10)
            log_step = state.mu - jnp.sqrt(t) / gamma * h_bar
            eta = t ** -kappa
            log_step_bar = eta * log_step + (1 - eta) * state.log_step_bar
            return HMCState(position, log_prob, jnp.exp(log_step),
                            log_step_bar, h_bar, t, state.mu)
        return HMCState(position, log_prob, state.step_size,
                        state.log_step_bar, state.h_bar, state.iteration,
                        state.mu)

    def run_fn(state: HMCState, rng, n_steps: int, n_warmup: int = 0):
        if n_warmup > 0:
            def wbody(state, rng):
                return step_fn(state, rng, warmup=True), None
            keys = jax.random.split(jax.random.fold_in(rng, 0), n_warmup)
            state, _ = jax.lax.scan(wbody, state, keys)
            state = state._replace(step_size=jnp.exp(state.log_step_bar))

        def body(state, rng):
            state = step_fn(state, rng)
            return state, state.position

        keys = jax.random.split(jax.random.fold_in(rng, 1), n_steps)
        state, trace = jax.lax.scan(body, state, keys)
        return state, trace

    return init_fn, step_fn, run_fn


def make_parameter_posterior(log_pdf, data, params_template,
                             prior_scale: float = 1.0):
    """Posterior over *flow parameters* θ given data X:
    log p(θ|X) = Σ_x log_pdf(θ, x) + log N(θ; 0, prior_scale²).

    Returns (log_prob_fn over flattened θ batches, unravel_fn) — plugs
    directly into make_hmc_sampler / make_smc_sampler so NUTS/HMC/SMC reuse
    the same flow log-prob + log-det kernels (BASELINE.json configs[4])."""
    flat0, unravel = ravel_pytree(params_template)
    D = flat0.shape[0]

    def single(theta_flat):
        params = unravel(theta_flat)
        ll = log_pdf(params, data).sum()
        lp = -0.5 * (theta_flat ** 2).sum() / prior_scale ** 2
        return ll + lp

    def log_prob_fn(theta_batch):
        return jax.vmap(single)(theta_batch)

    return log_prob_fn, unravel, flat0

"""Metropolis-adjusted Langevin (MALA) walker driver (new capability).

Gradient-informed proposals x' = x + (ε²/2)∇log p(x) + ε ξ with the full
asymmetric-kernel Metropolis correction, reusing the flow's log-prob
kernel and `jax.grad` — one extra backward pass per sweep buys proposals
that follow the density instead of diffusing blindly (the random-walk
driver in vmc/metropolis.py needs ~1/ε² more sweeps to decorrelate at the
same acceptance).  Robbins–Monro step-size adaptation toward the MALA
optimum acceptance (~0.574); when ``axis_name`` is given the acceptance
statistics are pmean-reduced so a device mesh adapts one collective step
size, exactly like the random-walk driver.  All fixed-shape lax.scan.

No reference counterpart (the reference has no MCMC at all, SURVEY §3.3);
cf. the retrieved MALA literature in PAPERS.md.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class MALAState(NamedTuple):
    positions: jnp.ndarray     # (B, D)
    log_prob: jnp.ndarray      # (B,)
    grad: jnp.ndarray          # (B, D) ∇log p at positions
    step_size: jnp.ndarray     # () proposal scale ε
    accept_rate: jnp.ndarray   # () running acceptance estimate


def make_mala_sampler(log_pdf: Callable, target_accept: float = 0.574,
                      adapt_rate: float = 0.05,
                      axis_name: str | None = None,
                      bounds: tuple[float, float] | None = None,
                      grad_clip: float = 1e3):
    """Build (init_fn, step_fn, run_fn) for MALA on (params, x (B,D)) -> (B,).

    grad_clip bounds the drift term elementwise — near nodes of a
    wavefunction density |∇log ψ²| diverges and an unclipped drift would
    catapult walkers out of the box (the acceptance test keeps the chain
    exact regardless of clipping, which only shapes the proposal).
    """

    def _lp_and_grad(params, x):
        lp, g = jax.value_and_grad(
            lambda xx: log_pdf(params, xx[None])[0])(x)
        return lp, jnp.clip(g, -grad_clip, grad_clip)

    lp_grad = jax.vmap(_lp_and_grad, in_axes=(None, 0))

    def init_fn(params, positions, step_size=0.1):
        lp, g = lp_grad(params, positions)
        return MALAState(positions, lp, g, jnp.asarray(step_size),
                         jnp.asarray(target_accept))

    def step_fn(params, state: MALAState, rng) -> MALAState:
        rng_prop, rng_acc = jax.random.split(rng)
        eps = state.step_size
        noise = jax.random.normal(rng_prop, state.positions.shape)
        mean_fwd = state.positions + 0.5 * eps ** 2 * state.grad
        proposal = mean_fwd + eps * noise
        lp_prop, grad_prop = lp_grad(params, proposal)
        if bounds is not None:
            lo, hi = bounds
            inside = ((proposal >= lo) & (proposal <= hi)).all(-1)
            lp_prop = jnp.where(inside, lp_prop, -jnp.inf)
        # asymmetric-kernel correction: log q(x|x') - log q(x'|x)
        mean_rev = proposal + 0.5 * eps ** 2 * grad_prop
        log_q_fwd = -((proposal - mean_fwd) ** 2).sum(-1) / (2 * eps ** 2)
        log_q_rev = -((state.positions - mean_rev) ** 2).sum(-1) / (2 * eps ** 2)
        log_ratio = lp_prop - state.log_prob + log_q_rev - log_q_fwd
        accept = jnp.log(jax.random.uniform(
            rng_acc, state.log_prob.shape)) < log_ratio
        new_pos = jnp.where(accept[:, None], proposal, state.positions)
        new_lp = jnp.where(accept, lp_prop, state.log_prob)
        new_grad = jnp.where(accept[:, None], grad_prop, state.grad)
        acc_frac = accept.mean()
        if axis_name is not None:
            acc_frac = jax.lax.pmean(acc_frac, axis_name)
        new_step = eps * jnp.exp(adapt_rate * (acc_frac - target_accept))
        new_rate = 0.9 * state.accept_rate + 0.1 * acc_frac
        return MALAState(new_pos, new_lp, new_grad, new_step, new_rate)

    def run_fn(params, state: MALAState, rng, n_steps: int, thin: int = 1):
        def body(state, rng):
            state = step_fn(params, state, rng)
            return state, state.positions

        keys = jax.random.split(rng, n_steps)
        state, trace = jax.lax.scan(body, state, keys)
        return state, trace[::thin]

    return init_fn, step_fn, run_fn

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
        # explicit dtypes (weak_type=False): keep init-state avals equal to
        # step_fn's output avals so carried jitted calls never retrace
        return MALAState(positions, lp, g,
                         jnp.asarray(step_size, dtype=lp.dtype),
                         jnp.asarray(target_accept, dtype=lp.dtype))

    def step_fn(params, state: MALAState, rng,
                adapt: bool = True) -> MALAState:
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
        new_step = eps * jnp.exp(adapt_rate * (acc_frac - target_accept)) \
            if adapt else eps
        new_rate = 0.9 * state.accept_rate + 0.1 * acc_frac
        return MALAState(new_pos, new_lp, new_grad, new_step, new_rate)

    def run_fn(params, state: MALAState, rng, n_steps: int, thin: int = 1,
               n_warmup: int = 0):
        """n_warmup > 0 runs that many *adaptive* sweeps first, then records
        n_steps sweeps from the frozen kernel — recorded samples come from a
        fixed (exactly stationary) kernel.  n_warmup == 0 keeps adaptation on
        throughout (the VMC-training mode, where parameters move every epoch
        anyway and a frozen step size would go stale)."""
        if n_warmup > 0:
            def wbody(state, rng):
                return step_fn(params, state, rng), None
            wkeys = jax.random.split(jax.random.fold_in(rng, 0), n_warmup)
            state, _ = jax.lax.scan(wbody, state, wkeys)

        def body(state, rng):
            state = step_fn(params, state, rng, adapt=n_warmup == 0)
            return state, state.positions

        keys = jax.random.split(jax.random.fold_in(rng, 1), n_steps)
        state, trace = jax.lax.scan(body, state, keys)
        return state, trace[::thin]

    return init_fn, step_fn, run_fn


def make_mala_train_window(psi, h_fn, log_pdf, optimizer, window: int,
                           box_length: float, n_sweeps: int = 10,
                           target_accept: float = 0.574,
                           pmean_axis: str | None = None,
                           estimator: str = 'clipped_score',
                           energy_clip: float | None = None,
                           sort_fermions: bool = True,
                           train_step=None):
    """Fused MALA-driven VMC training window (same contract as
    metropolis.make_mcmc_train_window — the trainer treats them
    interchangeably via ``VMCConfig(sampler='mala')``).

    Unlike random-walk Metropolis (which projects proposals into the
    ordered sector), MALA runs in the *full* coordinate space on the
    permutation-symmetrized density log p(x) = log_pdf(sort(x)): the
    symmetrized density is a genuine density on R^n (smooth a.e., gradient
    = permuted gradient at the sorted point via JAX's differentiable sort),
    so the asymmetric-kernel correction stays exact — no quotient-space
    bookkeeping.  Walkers are sorted only when handed to the train step
    (E_L is permutation-invariant; ψ/h_fn expect the ordered sector).
    ``sort_fermions``: True/'1d' (coordinate sort), 'paired2d' (sort
    electron pairs by x), or False for 'independent' coordinate maps.
    """
    from waveflow_tpu.vmc.estimators import make_train_step
    from waveflow_tpu.vmc.metropolis import sector_projection

    proj = sector_projection(sort_fermions)
    if proj is not None:
        lp = lambda params, x: log_pdf(params, proj(x))
        to_sector = proj
    else:
        lp = log_pdf
        to_sector = lambda x: x

    init_fn, step_fn, _ = make_mala_sampler(
        lp, target_accept=target_accept, axis_name=pmean_axis,
        bounds=(-box_length, box_length))
    if train_step is None:
        train_step = make_train_step(
            psi, h_fn, optimizer, pmean_axis=pmean_axis,
            estimator=estimator, energy_clip=energy_clip)

    def run_window(params, opt_state, rng, baseline, mstate):
        def body(carry, _):
            params, opt_state, rng, mstate = carry
            rng, k = jax.random.split(rng)

            def sweep(st, kk):
                return step_fn(params, st, kk), None

            mstate, _ = jax.lax.scan(sweep, mstate,
                                     jax.random.split(k, n_sweeps))
            params, opt_state, loss = train_step(
                params, opt_state, to_sector(mstate.positions), baseline)
            # refresh log-probs AND drift gradients under the new params so
            # next epoch's acceptance ratios target the current density
            # (init_fn recomputes both with the sampler's own drift clip)
            fresh = init_fn(params, mstate.positions, mstate.step_size)
            mstate = mstate._replace(log_prob=fresh.log_prob,
                                     grad=fresh.grad)
            return (params, opt_state, rng, mstate), loss

        (params, opt_state, rng, mstate), losses = jax.lax.scan(
            body, (params, opt_state, rng, mstate), None, length=window)
        return params, opt_state, rng, losses.mean(), losses, mstate

    return init_fn, run_window

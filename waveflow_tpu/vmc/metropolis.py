"""Metropolis-Hastings walker driver (new capability — the reference has
exact ancestral sampling only and no MCMC anywhere, SURVEY §3.3).

Random-walk Metropolis over walker configurations reusing the model's
log_pdf, with Robbins-Monro step-size adaptation toward a target acceptance
rate.  When ``axis_name`` is given, the acceptance statistics are averaged
over the mesh axis with pmean so all devices adapt a *collective* step size
(BASELINE.json north star).

Everything is a fixed-shape lax.scan — no data-dependent control flow.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def sector_projection(sort_mode):
    """Proposal projection onto the fermionic sector.

    sort_mode: True / '1d' — coordinate sort (identical 1D fermions);
    'paired2d' — sort electron (x, y) pairs by x (interleaved layout,
    the paired2d ansatz sector); False/None — identity (no quotient).
    """
    if sort_mode in (True, '1d'):
        return lambda x: jnp.sort(x, axis=-1)
    if sort_mode == 'paired2d':
        def sort_pairs(x):
            xe = x.reshape(x.shape[0], -1, 2)
            order = jnp.argsort(xe[:, :, 0], axis=1)
            xe = jnp.take_along_axis(xe, order[:, :, None], axis=1)
            return xe.reshape(x.shape[0], -1)
        return sort_pairs
    return None


class MetropolisState(NamedTuple):
    positions: jnp.ndarray     # (B, D)
    log_prob: jnp.ndarray      # (B,)
    step_size: jnp.ndarray     # ()
    accept_rate: jnp.ndarray   # () running acceptance estimate


def make_metropolis_sampler(log_pdf, target_accept: float = 0.5,
                            adapt_rate: float = 0.1,
                            axis_name: str | None = None,
                            bounds: tuple[float, float] | None = None,
                            proposal_map=None):
    """Build (init_fn, step_fn, run_fn) for random-walk Metropolis.

    log_pdf: (params, x (B,D)) -> (B,) unnormalized log density.
    bounds: optional (lo, hi) box; proposals outside are rejected by -inf.
    proposal_map: optional symmetric projection applied to proposals (e.g.
      coordinate sort for permutation-symmetric fermion densities: the
      Gaussian proposal summed over permutations is symmetric in (x, x'),
      so detailed balance holds on the sorted quotient space).
    """

    def init_fn(params, positions, step_size=0.1):
        if proposal_map is not None:
            positions = proposal_map(positions)
        lp = log_pdf(params, positions)
        # explicit dtypes (weak_type=False) so the state from init_fn has
        # the same avals as the state step_fn returns — otherwise the
        # second jitted call over a carried state silently retraces
        return MetropolisState(positions, lp,
                               jnp.asarray(step_size, dtype=lp.dtype),
                               jnp.asarray(target_accept, dtype=lp.dtype))

    def step_fn(params, state: MetropolisState, rng) -> MetropolisState:
        rng_prop, rng_acc = jax.random.split(rng)
        noise = jax.random.normal(rng_prop, state.positions.shape)
        proposal = state.positions + state.step_size * noise
        if proposal_map is not None:
            proposal = proposal_map(proposal)
        lp_prop = log_pdf(params, proposal)
        if bounds is not None:
            lo, hi = bounds
            inside = ((proposal >= lo) & (proposal <= hi)).all(-1)
            lp_prop = jnp.where(inside, lp_prop, -jnp.inf)
        log_ratio = lp_prop - state.log_prob
        accept = jnp.log(jax.random.uniform(
            rng_acc, state.log_prob.shape)) < log_ratio
        new_pos = jnp.where(accept[:, None], proposal, state.positions)
        new_lp = jnp.where(accept, lp_prop, state.log_prob)
        acc_frac = accept.mean()
        if axis_name is not None:
            acc_frac = jax.lax.pmean(acc_frac, axis_name)
        # Robbins-Monro log-step adaptation toward target acceptance
        new_step = state.step_size * jnp.exp(
            adapt_rate * (acc_frac - target_accept))
        new_rate = 0.9 * state.accept_rate + 0.1 * acc_frac
        return MetropolisState(new_pos, new_lp, new_step, new_rate)

    def run_fn(params, state: MetropolisState, rng, n_steps: int,
               thin: int = 1):
        """Run n_steps sweeps; returns (final_state, positions trace
        thinned every `thin` sweeps: (n_steps//thin, B, D))."""

        def body(state, rng):
            state = step_fn(params, state, rng)
            return state, state.positions

        keys = jax.random.split(rng, n_steps)
        state, trace = jax.lax.scan(body, state, keys)
        return state, trace[::thin]

    return init_fn, step_fn, run_fn


def make_mcmc_train_window(psi, h_fn, log_pdf, optimizer, window: int,
                           box_length: float, n_sweeps: int = 10,
                           target_accept: float = 0.5,
                           pmean_axis: str | None = None,
                           estimator: str = 'clipped_score',
                           energy_clip: float | None = None,
                           sort_proposals: bool = True,
                           train_step=None):
    """Fused Metropolis-driven VMC training window (north-star VMC loop:
    "Metropolis walkers, collective step-size adaptation", BASELINE.json).

    Walkers persist across epochs (warm-started MCMC instead of exact
    ancestral draws): each fused epoch runs ``n_sweeps`` random-walk
    Metropolis sweeps over the antisymmetrized density |ψ_A|² — proposals
    re-sorted into the ordered sector, which is valid Metropolis on the
    permutation quotient — then one gradient update on the walker batch.
    After the update the stored log-probabilities are refreshed under the
    new parameters so the next epoch's acceptance ratios target the
    current density.  When ``pmean_axis`` is set, acceptance statistics
    are pmean-reduced so every device adapts one collective step size.

    ``sort_proposals`` projects every proposal into the fermionic sector:
    True/'1d' = coordinate sort (identical 1D fermions), 'paired2d' =
    sort electron pairs by x (2D paired ansatz), False for per-dimension
    coordinate maps ('independent') where no quotient exists.
    ``train_step`` overrides the parameter update (same (params, opt_state,
    batch, baseline) -> (params, opt_state, loss) contract) — e.g. a
    stochastic-reconfiguration step from vmc/sr.py.

    Returns (init_fn, run_window) where run_window(params, opt_state, rng,
    baseline, mstate) -> (params, opt_state, rng, new_baseline, losses,
    mstate).
    """
    from waveflow_tpu.vmc.estimators import make_train_step

    proposal_map = sector_projection(sort_proposals)
    init_fn, step_fn, _ = make_metropolis_sampler(
        log_pdf, target_accept=target_accept, axis_name=pmean_axis,
        bounds=(-box_length, box_length), proposal_map=proposal_map)
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
                params, opt_state, mstate.positions, baseline)
            mstate = mstate._replace(
                log_prob=log_pdf(params, mstate.positions))
            return (params, opt_state, rng, mstate), loss

        (params, opt_state, rng, mstate), losses = jax.lax.scan(
            body, (params, opt_state, rng, mstate), None, length=window)
        return params, opt_state, rng, losses.mean(), losses, mstate

    return init_fn, run_window

"""Sequential Monte Carlo sampler with likelihood tempering (new capability).

Generic probprog driver over flow parameters or walker configurations
(BASELINE.json configs[4]): anneal from the prior to the target along
π_β ∝ prior · exp(β·log_likelihood), reweighting particles at each
temperature, systematic resampling when the effective sample size drops,
and rejuvenating with random-walk Metropolis moves.  Fixed temperature
ladder + fixed move counts keep everything jit-compatible; resampling is a
single gather.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class SMCState(NamedTuple):
    particles: jnp.ndarray     # (N, D)
    log_weights: jnp.ndarray   # (N,)
    log_like: jnp.ndarray      # (N,) cached log-likelihood
    beta: jnp.ndarray          # () current temperature
    ess: jnp.ndarray           # () effective sample size fraction


def systematic_resample(rng, log_weights, n):
    w = jax.nn.softmax(log_weights)
    positions = (jax.random.uniform(rng) + jnp.arange(n)) / n
    cdf = jnp.cumsum(w)
    return jnp.searchsorted(cdf, positions)


def make_smc_sampler(log_prior_fn: Callable, log_like_fn: Callable,
                     n_temps: int = 20, n_mcmc_moves: int = 5,
                     mcmc_step_size: float = 0.1,
                     ess_threshold: float = 0.5,
                     axis_name=None):
    """log_prior_fn / log_like_fn: (N, D) -> (N,).

    ``axis_name``: mesh axis the particle population is sharded over.
    Weight normalization and the ESS become global reductions
    (all-gathered log-sum-exp), the resample decision is collective, and
    resampling itself uses the cross-device collective
    (parallel.resample.resample_walkers_sharded — one all-gather of the
    population, identical systematic index set on every device,
    shard-local gather).  Rejuvenation noise is decorrelated per device by
    folding the axis index into the key; the shared key still drives the
    resample draw so every device computes the same global index set."""

    betas = jnp.linspace(0.0, 1.0, n_temps + 1)[1:]

    def _global_lse(x):
        """logsumexp over the local shard and, if sharded, the mesh axis."""
        local = jax.scipy.special.logsumexp(x)
        if axis_name is None:
            return local
        return jax.scipy.special.logsumexp(
            jax.lax.all_gather(local, axis_name, tiled=False))

    def init_fn(particles):
        n = particles.shape[0]
        return SMCState(particles, jnp.zeros(n), log_like_fn(particles),
                        jnp.zeros(()), jnp.ones(()))

    def mcmc_move(rng, particles, beta, step):
        """One random-walk MH sweep targeting π_β."""
        rng_p, rng_a = jax.random.split(rng)
        lp = log_prior_fn(particles) + beta * log_like_fn(particles)
        prop = particles + step * jax.random.normal(rng_p, particles.shape)
        lp_prop = log_prior_fn(prop) + beta * log_like_fn(prop)
        accept = jnp.log(jax.random.uniform(rng_a, lp.shape)) < lp_prop - lp
        return jnp.where(accept[:, None], prop, particles), accept.mean()

    def temp_step(state: SMCState, carry):
        beta_new, rng = carry
        n_local = state.particles.shape[0]
        n = n_local if axis_name is None else \
            n_local * jax.lax.axis_size(axis_name)
        # reweight by the likelihood increment; normalize over the GLOBAL
        # population so sharded == single-device
        log_w = state.log_weights + (beta_new - state.beta) * state.log_like
        log_w = log_w - _global_lse(log_w)
        ess = 1.0 / jnp.exp(_global_lse(2 * log_w)) / n

        # resample when ESS is low (branchless: gather either identity or
        # the resampled index set).  rng is identical on every device, so
        # the collective decision and the global index set agree
        rng, rng_rs = jax.random.split(rng)
        do_resample = ess < ess_threshold
        if axis_name is None:
            idx_resampled = systematic_resample(rng_rs, log_w, n)
            idx = jnp.where(do_resample, idx_resampled, jnp.arange(n))
            particles = state.particles[idx]
        else:
            from waveflow_tpu.parallel.resample import \
                resample_walkers_sharded
            res_pos, _ = resample_walkers_sharded(
                state.particles, log_w, rng_rs, axis_name=axis_name)
            particles = jnp.where(do_resample, res_pos, state.particles)
        log_w = jnp.where(do_resample, jnp.full(n_local, -jnp.log(n)), log_w)

        # rejuvenate with MH sweeps at beta_new; per-device noise streams
        rng, rng_mv = jax.random.split(rng)
        if axis_name is not None:
            rng_mv = jax.random.fold_in(rng_mv,
                                        jax.lax.axis_index(axis_name))

        def move_body(carry, rng_i):
            parts, _ = carry
            parts, acc = mcmc_move(rng_i, parts, beta_new, mcmc_step_size)
            return (parts, acc), None

        (particles, acc), _ = jax.lax.scan(
            move_body, (particles, jnp.zeros(())),
            jax.random.split(rng_mv, n_mcmc_moves))

        return SMCState(particles, log_w, log_like_fn(particles),
                        beta_new, ess), ess

    def run_fn(state: SMCState, rng):
        keys = jax.random.split(rng, n_temps)
        def body(state, carry):
            return temp_step(state, carry)
        state, ess_trace = jax.lax.scan(body, state, (betas, keys))
        return state, ess_trace

    return init_fn, run_fn

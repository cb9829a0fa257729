"""No-U-Turn Sampler (true dynamic-trajectory NUTS, jit/TPU-compatible).

Completes the BASELINE.json north-star "NUTS/HMC" driver pair: `vmc/hmc.py`
is fixed-length leapfrog; this module implements dynamic trajectory lengths
with the iterative formulation (Hoffman & Gelman 2014, Alg. 3, in the
checkpointed iterative form used by modern JAX PPLs):

* doubling loop as a `lax.while_loop` (dynamic #doublings, bounded by
  ``max_tree_depth``) — no data-dependent Python control flow;
* progressive **multinomial** sampling of the proposal within each subtree
  and biased progressive sampling across subtrees (the modern replacement
  for the paper's slice variable);
* the **full dyadic U-turn criterion**: every balanced subtree of the
  trajectory is checked, using O(max_tree_depth) leaf checkpoints indexed
  by the trailing-zero structure of the leaf counter — block [s..i] of size
  2^k ends at leaf i iff (i+1) % 2^k == 0, and its start leaf s = i+1-2^k
  was stored at slot trailing_zeros(s) where no interior leaf (all with
  fewer trailing zeros) can have overwritten it;
* divergence guard (energy error > 1000) and per-leaf acceptance
  statistics for the same dual-averaging warmup as `hmc.py`.

Chains are batched with `vmap` (a lane that finishes its tree early just
masks until all lanes do — standard for while_loop under vmap).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import random

DIVERGENCE_THRESHOLD = 1000.0


class NUTSState(NamedTuple):
    position: jnp.ndarray      # (B, D) chains
    log_prob: jnp.ndarray      # (B,)
    step_size: jnp.ndarray     # ()
    # dual-averaging state (shared across chains)
    log_step_bar: jnp.ndarray
    h_bar: jnp.ndarray
    iteration: jnp.ndarray
    # anchor mu = log(10 * eps0) from the caller's init step size
    # (Hoffman & Gelman 2014 Alg. 6)
    mu: jnp.ndarray


def _slot(i: jnp.ndarray, top: int) -> jnp.ndarray:
    """Checkpoint slot for leaf index i: trailing zeros of i, top for i=0."""
    tz = jax.lax.population_count((i & -i) - 1)
    return jnp.where(i == 0, top, tz).astype(jnp.int32)


def _is_turning(dz, r_a, r_b):
    return (jnp.dot(dz, r_a) < 0.0) | (jnp.dot(dz, r_b) < 0.0)


def make_nuts_sampler(log_prob_fn: Callable, max_tree_depth: int = 8,
                      target_accept: float = 0.8,
                      axis_name=None):
    """log_prob_fn: (B, D) -> (B,) differentiable log density.

    Returns (init_fn, step_fn, run_fn) with the same driver contract as
    make_hmc_sampler: init_fn(position, step_size) -> NUTSState;
    run_fn(state, rng, n_steps, n_warmup) -> (state, trace (n_steps,B,D)).

    ``axis_name``: mesh axis (or tuple) the chains are sharded over — the
    dual-averaging acceptance statistic is pmean-reduced so all devices
    adapt one collective step size (see parallel.make_sharded_chain_sampler).
    """
    single_lp = lambda z: log_prob_fn(z[None])[0]
    grad1 = jax.grad(single_lp)

    def leapfrog1(z, r, eps):
        r = r + 0.5 * eps * grad1(z)
        z = z + eps * r
        r = r + 0.5 * eps * grad1(z)
        return z, r

    def _build_subtree(key, z_start, r_start, depth, eps, h0,
                       max_slots: int):
        """Build a subtree of 2^depth leaves from (z_start, r_start), signed
        step eps.  Returns dict(sub: endpoint state, proposal, log weight,
        turning/diverged flags, acceptance stats)."""
        D = z_start.shape[0]
        n_leaves = jnp.asarray(2, jnp.int32) ** depth

        def cond(c):
            return (c['i'] < n_leaves) & ~c['stop']

        def body(c):
            z, r = leapfrog1(c['z'], c['r'], eps)
            lp = single_lp(z)
            logw = lp - 0.5 * jnp.dot(r, r) - h0
            diverged = logw < -DIVERGENCE_THRESHOLD
            i = c['i']

            # progressive multinomial sampling within the subtree
            key, k_acc = random.split(c['key'])
            logw_sub = jnp.logaddexp(c['logw_sub'], logw)
            take = jnp.log(random.uniform(k_acc)) < (logw - logw_sub)
            z_prop = jnp.where(take, z, c['z_prop'])

            # store this leaf at its dyadic slot
            slot = _slot(i, max_slots - 1)
            ckpt_z = c['ckpt_z'].at[slot].set(z)
            ckpt_r = c['ckpt_r'].at[slot].set(r)

            # check every balanced block that ends at leaf i
            turning = jnp.asarray(False)
            for k in range(1, max_slots):
                block = jnp.asarray(2, jnp.int32) ** k
                ends_here = ((i + 1) % block == 0) & (block <= n_leaves)
                s = i + 1 - block
                s_slot = _slot(s, max_slots - 1)
                z_s = ckpt_z[s_slot]
                r_s = ckpt_r[s_slot]
                turning |= ends_here & _is_turning(z - z_s, r_s, r)

            alpha = jnp.minimum(1.0, jnp.exp(logw))
            return dict(
                i=i + 1, key=key, z=z, r=r, z_prop=z_prop,
                logw_sub=logw_sub, ckpt_z=ckpt_z, ckpt_r=ckpt_r,
                stop=turning | diverged, turning=turning,
                diverged=diverged, sum_alpha=c['sum_alpha'] + alpha,
                n_alpha=c['n_alpha'] + 1.0)

        init = dict(
            i=jnp.asarray(0, jnp.int32), key=key, z=z_start, r=r_start,
            z_prop=z_start, logw_sub=-jnp.inf,
            ckpt_z=jnp.zeros((max_slots, D)), ckpt_r=jnp.zeros((max_slots, D)),
            stop=jnp.asarray(False), turning=jnp.asarray(False),
            diverged=jnp.asarray(False), sum_alpha=jnp.asarray(0.0),
            n_alpha=jnp.asarray(0.0))
        return jax.lax.while_loop(cond, body, init)

    def _single_nuts_step(rng, z0, eps):
        D = z0.shape[0]
        k_mom, k_loop = random.split(rng)
        r0 = random.normal(k_mom, (D,))
        h0 = single_lp(z0) - 0.5 * jnp.dot(r0, r0)
        max_slots = max_tree_depth + 1

        def cond(c):
            return (c['depth'] < max_tree_depth) & ~c['stop']

        def body(c):
            key, k_dir, k_sub, k_merge = random.split(c['key'], 4)
            go_right = random.bernoulli(k_dir)
            z_start = jnp.where(go_right, c['z_plus'], c['z_minus'])
            r_start = jnp.where(go_right, c['r_plus'], c['r_minus'])
            signed_eps = jnp.where(go_right, eps, -eps)

            sub = _build_subtree(k_sub, z_start, r_start, c['depth'],
                                 signed_eps, h0, max_slots)

            ok = ~sub['stop']
            # biased progressive sampling across subtrees
            accept_sub = jnp.log(random.uniform(k_merge)) < \
                (sub['logw_sub'] - c['logw_sum'])
            z_prop = jnp.where(ok & accept_sub, sub['z_prop'], c['z_prop'])
            logw_sum = jnp.where(ok, jnp.logaddexp(c['logw_sum'],
                                                   sub['logw_sub']),
                                 c['logw_sum'])

            z_minus = jnp.where(go_right, c['z_minus'], sub['z'])
            r_minus = jnp.where(go_right, c['r_minus'], sub['r'])
            z_plus = jnp.where(go_right, sub['z'], c['z_plus'])
            r_plus = jnp.where(go_right, sub['r'], c['r_plus'])
            # only adopt the new endpoints if the subtree was valid
            z_minus = jnp.where(ok, z_minus, c['z_minus'])
            r_minus = jnp.where(ok, r_minus, c['r_minus'])
            z_plus = jnp.where(ok, z_plus, c['z_plus'])
            r_plus = jnp.where(ok, r_plus, c['r_plus'])

            turning_all = _is_turning(z_plus - z_minus, r_minus, r_plus)
            return dict(
                key=key, depth=c['depth'] + 1,
                stop=sub['stop'] | turning_all,
                z_minus=z_minus, r_minus=r_minus,
                z_plus=z_plus, r_plus=r_plus,
                z_prop=z_prop, logw_sum=logw_sum,
                sum_alpha=c['sum_alpha'] + sub['sum_alpha'],
                n_alpha=c['n_alpha'] + sub['n_alpha'])

        init = dict(
            key=k_loop, depth=jnp.asarray(0, jnp.int32),
            stop=jnp.asarray(False),
            z_minus=z0, r_minus=r0, z_plus=z0, r_plus=r0,
            z_prop=z0, logw_sum=jnp.asarray(0.0),   # initial leaf: logw = 0
            sum_alpha=jnp.asarray(0.0), n_alpha=jnp.asarray(0.0))
        out = jax.lax.while_loop(cond, body, init)
        alpha = out['sum_alpha'] / jnp.maximum(out['n_alpha'], 1.0)
        return out['z_prop'], alpha

    batched_step = jax.vmap(_single_nuts_step, in_axes=(0, 0, None))

    def init_fn(position, step_size=0.1):
        eps0 = jnp.asarray(step_size, jnp.float32)
        return NUTSState(position, log_prob_fn(position), eps0,
                         jnp.log(eps0), jnp.zeros(()), jnp.zeros(()),
                         jnp.log(10.0 * eps0))

    def step_fn(state: NUTSState, rng, warmup: bool = False) -> NUTSState:
        keys = random.split(rng, state.position.shape[0])
        position, alphas = batched_step(keys, state.position,
                                        state.step_size)
        log_prob = log_prob_fn(position)
        accept_prob = alphas.mean()
        if axis_name is not None:
            accept_prob = jax.lax.pmean(accept_prob, axis_name)

        if warmup:
            # same Nesterov dual averaging as hmc.py
            t = state.iteration + 1
            gamma, kappa = 0.05, 0.75
            h_bar = (1 - 1 / (t + 10)) * state.h_bar + \
                (target_accept - accept_prob) / (t + 10)
            log_step = state.mu - jnp.sqrt(t) / gamma * h_bar
            eta = t ** -kappa
            log_step_bar = eta * log_step + (1 - eta) * state.log_step_bar
            return NUTSState(position, log_prob, jnp.exp(log_step),
                             log_step_bar, h_bar, t, state.mu)
        return NUTSState(position, log_prob, state.step_size,
                         state.log_step_bar, state.h_bar, state.iteration,
                         state.mu)

    def run_fn(state: NUTSState, rng, n_steps: int, n_warmup: int = 0):
        if n_warmup > 0:
            def wbody(state, rng):
                return step_fn(state, rng, warmup=True), None
            keys = random.split(random.fold_in(rng, 0), n_warmup)
            state, _ = jax.lax.scan(wbody, state, keys)
            state = state._replace(step_size=jnp.exp(state.log_step_bar))

        def body(state, rng):
            state = step_fn(state, rng)
            return state, state.position

        keys = random.split(random.fold_in(rng, 1), n_steps)
        state, trace = jax.lax.scan(body, state, keys)
        return state, trace

    return init_fn, step_fn, run_fn

"""VMC loss / gradient estimators.

The production estimator is the reference's fused local-energy + score-
function gradient (vqmc.py:193-221): a custom JVP on E_L = Hψ/ψ whose
tangent adds the policy-gradient term 2 ψ̇ (E_L - baseline)/ψ to the
quotient-rule term, so one value_and_grad delivers both the energy
derivative and the sampling-distribution derivative with a running-average
baseline for variance reduction.

Also provided for parity: the uniform-sampling estimator
(vqmc.py:143-148) and the explicit policy-gradient estimator
(vqmc.py:157-189).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

PSI_EPS = 1e-8  # vqmc.py:200


@jax.custom_jvp
def local_energy(energies_val, psi_val, baseline):
    return energies_val / (psi_val + PSI_EPS)


@local_energy.defjvp
def _local_energy_jvp(primals, tangents):
    energies_val, psi_val, baseline = primals
    t_energies, t_psi, _ = tangents
    e_loc = local_energy(energies_val, psi_val, baseline)
    # score-function term + quotient rule (vqmc.py:208)
    grad = (2 * t_psi * (e_loc - baseline) / psi_val
            + (t_energies * psi_val - energies_val * t_psi) / psi_val ** 2)
    return e_loc, grad


def make_loss_fn(psi, h_fn):
    """loss(params, batch, baseline) -> scalar mean local energy with the
    fused gradient estimator."""

    def loss_fn(params, batch, baseline):
        psi_val = psi(params, batch)[:, None]
        energies_val = h_fn(params, batch)
        return local_energy(energies_val, psi_val, baseline).mean()

    return loss_fn


def make_train_step(psi, h_fn, optimizer, pmean_axis=None):
    """Jitted training step: value_and_grad of the fused estimator + optax.

    If ``pmean_axis`` is given the loss and gradients are averaged over that
    named mesh axis (walker-sharded data parallelism — new capability, the
    reference is single-device only, SURVEY §2)."""
    loss_fn = make_loss_fn(psi, h_fn)

    def step(params, opt_state, batch, baseline):
        loss_val, grads = jax.value_and_grad(loss_fn)(params, batch, baseline)
        if pmean_axis is not None:
            loss_val = jax.lax.pmean(loss_val, pmean_axis)
            grads = jax.lax.pmean(grads, pmean_axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss_val

    return step


def make_train_window(psi, h_fn, sample_fn, optimizer, batch_size: int,
                      window: int, pmean_axis=None):
    """Fuse `window` sample+update epochs into one on-device lax.scan.

    The reference dispatches two device calls per epoch and syncs the loss
    to host every step (vqmc.py:96-119); at TPU speeds the host round-trip
    dominates.  This runs a whole baseline window (100 epochs by default)
    in a single dispatch and updates the variance-reduction baseline from
    the window's mean loss on device — identical semantics to the
    reference's every-100-epochs running average (vqmc.py:112-113).

    Returns step(params, opt_state, rng, baseline) ->
      (params, opt_state, rng, new_baseline, losses (window,)).
    """
    step = make_train_step(psi, h_fn, optimizer, pmean_axis=pmean_axis)

    def run_window(params, opt_state, rng, baseline):
        def body(carry, _):
            params, opt_state, rng = carry
            rng, k = jax.random.split(rng)
            batch = sample_fn(k, params, batch_size)
            params, opt_state, loss = step(params, opt_state, batch, baseline)
            return (params, opt_state, rng), loss

        (params, opt_state, rng), losses = jax.lax.scan(
            body, (params, opt_state, rng), None, length=window)
        return params, opt_state, rng, losses.mean(), losses

    return run_window


# --- parity variants -------------------------------------------------------

def loss_fn_uniform(params, psi, h_fn, batch):
    """Uniform-sampling Rayleigh-quotient estimator (vqmc.py:143-148)."""
    psi_val = psi(params, batch)[:, None]
    energies_val = h_fn(params, batch)
    return (psi_val * energies_val).mean() / jax.lax.stop_gradient(
        (psi_val ** 2).mean())


def make_policy_gradient_step(psi, h_fn, log_pdf, optimizer,
                              clip_energy=100.0, clip_grad=10.0):
    """Explicit energy-gradient + REINFORCE estimator (vqmc.py:172-189)."""

    def loss_fn(params, batch):
        psi_val = psi(params, batch)[:, None]
        energies_val = h_fn(params, batch)
        return (energies_val / psi_val).mean(), (energies_val, psi_val)

    def step(params, opt_state, batch, baseline):
        energy_grad, (energies_val, psi_val) = jax.grad(
            loss_fn, has_aux=True)(params, batch)
        e_loc = energies_val / psi_val
        log_pdf_grad = jax.jacrev(log_pdf)(params, batch)

        def pdf_term(g):
            w = e_loc if g.ndim < 3 else e_loc[:, None]
            return (g * (w - baseline)).mean(0)

        pdf_grad = jax.tree_util.tree_map(pdf_term, log_pdf_grad)
        grads = jax.tree_util.tree_map(lambda a, b: a + b, energy_grad, pdf_grad)
        grads = jax.tree_util.tree_map(
            lambda g: jnp.clip(g, -clip_grad, clip_grad), grads)
        loss_val = jnp.clip(e_loc, -clip_energy, clip_energy).mean()
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss_val

    return step

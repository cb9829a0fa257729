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


def _safe_psi(psi_val):
    """Sign-aware denominator guard.

    The reference adds +1e-8 in the primal but divides by the *raw* psi in
    the tangent (vqmc.py:200,208): a walker landing exactly on a node
    (psi=0, which fermionic antisymmetry makes a measure-zero but real
    event) produces inf gradients and NaNs the whole run.  Clamping |psi|
    away from zero while keeping its sign bounds E_L and the score term
    without biasing any walker with |psi| > eps."""
    sign = jnp.where(psi_val >= 0, 1.0, -1.0)
    return sign * jnp.maximum(jnp.abs(psi_val), PSI_EPS)


@jax.custom_jvp
def local_energy(energies_val, psi_val, baseline):
    return energies_val / _safe_psi(psi_val)


@local_energy.defjvp
def _local_energy_jvp(primals, tangents):
    energies_val, psi_val, baseline = primals
    t_energies, t_psi, _ = tangents
    e_loc = local_energy(energies_val, psi_val, baseline)
    psi_s = _safe_psi(psi_val)
    # score-function term + quotient rule (vqmc.py:208)
    grad = (2 * t_psi * (e_loc - baseline) / psi_s
            + (t_energies * psi_s - energies_val * t_psi) / psi_s ** 2)
    return e_loc, grad


def make_loss_fn(psi, h_fn, estimator: str = 'clipped_score',
                 clip_scale: float = 5.0,
                 energy_clip: float | None = None,
                 pmean_axis=None,
                 clip_stat: str = 'mean_abs'):
    """loss(params, batch, baseline) -> scalar; gradient is the VMC
    energy-gradient estimator selected by ``estimator``:

    'clipped_score' (default, the modern standard — FermiNet/PauliNet
    style): since E(θ) = E_{|ψ|²}[E_L] and the Hermitian term vanishes in
    expectation, the exact gradient is 2 E[(E_L − E)·∂log|ψ|].  We clip
    E_L to a batch-adaptive window around the batch median before
    centering: the clip window follows the data, so runaway near-node
    walkers are tamed without the runaway bias a fixed absolute clip
    invites (a fixed ±100 clip lets the optimizer park mass where E_L pegs
    the negative rail — observed as reported energies far below the exact
    ground state).  ``clip_stat`` selects the deviation statistic:

      'mean_abs' (default): median ± clip_scale × mean|E_L − median| —
        the *mean* absolute deviation about the median (FermiNet's choice;
        note this is NOT the conventional "MAD" = median absolute
        deviation, a round-2 docs finding);
      'median_abs': median ± clip_scale × median|E_L − median| — the
        conventional MAD; a tighter window on heavy-tailed batches.

    stop_gradient on E_L also means no third derivatives flow — the
    backward pass is substantially cheaper than the reference's.
    Reported value: the clipped batch mean (robust).

    'reference': the reference's fused custom-JVP estimator
    (vqmc.py:193-212) with its running-average baseline; optional
    ``energy_clip`` applies a fixed ±clip in value and gradient.
    """

    if estimator == 'reference':
        def loss_fn(params, batch, baseline):
            psi_val = psi(params, batch)[:, None]
            energies_val = h_fn(params, batch)
            e_loc = local_energy(energies_val, psi_val, baseline)
            if energy_clip is not None:
                e_loc = jnp.clip(e_loc, -energy_clip, energy_clip)
            return e_loc.mean()
        return loss_fn

    if estimator != 'clipped_score':
        raise ValueError(f"unknown estimator {estimator!r}")
    if clip_stat not in ('mean_abs', 'median_abs'):
        raise ValueError(f"unknown clip_stat {clip_stat!r}")
    dev_stat = jnp.mean if clip_stat == 'mean_abs' else jnp.median

    def loss_fn(params, batch, baseline):
        psi_val = psi(params, batch)
        energies_val = h_fn(params, batch)[:, 0]
        e_loc = jax.lax.stop_gradient(
            energies_val / _safe_psi(psi_val))
        # clipping statistics over the *global* walker population: under a
        # walker-sharded mesh the center/width must agree across devices or
        # each shard clips in its own window and the pmean'd gradient no
        # longer matches the single-device estimator
        e_stat = (jax.lax.all_gather(e_loc, pmean_axis, tiled=True)
                  if pmean_axis is not None else e_loc)
        center = jnp.median(e_stat)
        mad = dev_stat(jnp.abs(e_stat - center))
        e_c = jnp.clip(e_loc, center - clip_scale * mad,
                       center + clip_scale * mad)
        e_c_mean = jnp.mean(jnp.clip(e_stat, center - clip_scale * mad,
                                     center + clip_scale * mad))
        log_abs_psi = jnp.log(jnp.abs(psi_val) + PSI_EPS)
        weights = jax.lax.stop_gradient(e_c - e_c_mean)
        surrogate = 2.0 * jnp.mean(weights * log_abs_psi)
        # value = robust energy estimate; gradient = score-only estimator
        return surrogate - jax.lax.stop_gradient(surrogate) \
            + jax.lax.stop_gradient(e_c_mean)

    return loss_fn


def make_train_step(psi, h_fn, optimizer, pmean_axis=None,
                    estimator: str = 'clipped_score',
                    energy_clip: float | None = None,
                    clip_stat: str = 'mean_abs'):
    """Jitted training step: value_and_grad of the fused estimator + optax.

    If ``pmean_axis`` is given the loss and gradients are averaged over that
    named mesh axis (walker-sharded data parallelism — new capability, the
    reference is single-device only, SURVEY §2)."""
    loss_fn = make_loss_fn(psi, h_fn, estimator=estimator,
                           energy_clip=energy_clip, pmean_axis=pmean_axis,
                           clip_stat=clip_stat)

    def step(params, opt_state, batch, baseline):
        loss_val, grads = jax.value_and_grad(loss_fn)(params, batch, baseline)
        if pmean_axis is not None:
            loss_val = jax.lax.pmean(loss_val, pmean_axis)
            grads = jax.lax.pmean(grads, pmean_axis)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss_val

    return step


def make_window_from_step(step, sample_fn, batch_size: int, window: int):
    """Fuse `window` sample+update epochs of an arbitrary train step (same
    (params, opt_state, batch, baseline) -> (params, opt_state, loss)
    contract) into one on-device lax.scan — the generic core shared by the
    adam, SR, and SPRING windows."""

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


def make_train_window(psi, h_fn, sample_fn, optimizer, batch_size: int,
                      window: int, pmean_axis=None,
                      estimator: str = 'clipped_score',
                      energy_clip: float | None = None,
                      clip_stat: str = 'mean_abs'):
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
    step = make_train_step(psi, h_fn, optimizer, pmean_axis=pmean_axis,
                           estimator=estimator, energy_clip=energy_clip,
                           clip_stat=clip_stat)
    return make_window_from_step(step, sample_fn, batch_size, window)


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

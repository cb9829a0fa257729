"""Walker-sharded training and sampling via shard_map + collectives.

New first-class capability over the reference (single device only,
SURVEY §2): the walker batch is sharded across a named mesh axis; each
device computes local ψ, local energies and local gradients; `pmean` over
the axis reduces the batch-mean loss, the variance-reduction baseline, and
the gradient — XLA lowers these to ICI all-reduces.  Parameters and
optimizer state stay replicated (they are tiny: a few masked-MLP layers).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from waveflow_tpu.parallel.mesh import WALKER_AXIS
from waveflow_tpu.vmc.estimators import make_train_step, make_train_window


def make_sharded_train_step(psi, h_fn, optimizer, mesh: Mesh,
                            axis_name: str = WALKER_AXIS):
    """Jitted data-parallel VMC step.

    Signature matches the single-device step: (params, opt_state, batch,
    baseline) -> (params, opt_state, loss).  `batch` is sharded over
    axis_name; everything else replicated; loss/grads pmean-reduced inside
    so outputs are replicated.
    """
    local_step = make_train_step(psi, h_fn, optimizer, pmean_axis=axis_name)
    mapped = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    return jax.jit(mapped)


def make_sharded_sampler(sample_fn, mesh: Mesh,
                         axis_name: str = WALKER_AXIS):
    """Per-device independent ancestral sampling of the walker batch.

    Each device receives its own PRNG key (split on host, sharded over the
    axis) and draws num_samples / n_devices walkers; the result is a
    globally-sharded (num_samples, dim) array with no cross-device
    communication at all — exact sampling is embarrassingly parallel.
    """
    n_dev = mesh.devices.size

    def make(num_samples: int):
        if num_samples % n_dev != 0:
            raise ValueError(
                f"num_samples {num_samples} not divisible by mesh size {n_dev}")
        n_local = num_samples // n_dev

        def local(keys, params):
            return sample_fn(keys[0], params, n_local)

        mapped = jax.shard_map(local, mesh=mesh,
                               in_specs=(P(axis_name), P()),
                               out_specs=P(axis_name),
                               check_vma=False)

        @jax.jit
        def sharded_sample(rng, params):
            keys = jax.random.split(rng, n_dev)
            return mapped(keys, params)

        return sharded_sample

    return make


def make_sharded_train_window(psi, h_fn, sample_fn, optimizer,
                              global_batch: int, window: int, mesh: Mesh,
                              axis_name: str = WALKER_AXIS,
                              estimator: str = 'clipped_score'):
    """The production multi-chip training loop: `window` fused epochs of
    [sharded local sampling -> local gradients -> pmean] per dispatch.

    Each device samples global_batch/n_dev walkers with its own PRNG key
    and the per-epoch all-reduce inside the estimator is the only
    communication.  Signature: step(params, opt_state, keys, baseline) ->
    (params, opt_state, keys, new_baseline, losses) with keys (n_dev, 2)
    sharded over the axis.
    """
    n_dev = mesh.devices.size
    if global_batch % n_dev != 0:
        raise ValueError(
            f"global_batch {global_batch} not divisible by mesh {n_dev}")
    local_batch = global_batch // n_dev
    local_window = make_train_window(psi, h_fn, sample_fn, optimizer,
                                     local_batch, window,
                                     pmean_axis=axis_name,
                                     estimator=estimator)

    def local(params, opt_state, keys, baseline):
        params, opt_state, rng, new_baseline, losses = local_window(
            params, opt_state, keys[0], baseline)
        return params, opt_state, rng[None], new_baseline, losses

    mapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P()),
        out_specs=(P(), P(), P(axis_name), P(), P()),
        check_vma=False)
    return jax.jit(mapped)


def make_sharded_sr_window(psi, h_fn, sample_fn, learning_rate: float,
                           global_batch: int, window: int, mesh: Mesh,
                           axis_name: str = WALKER_AXIS,
                           damping: float = 1e-3, cg_iters: int = 20,
                           max_update_norm: float | None = None):
    """Walker-sharded stochastic-reconfiguration (natural-gradient) window.

    Every batch expectation inside SR — the clipped-score gradient, E[O],
    and each CG matrix-vector product S·v — is pmean-reduced over the
    walker axis (vmc/sr.py), so all devices run an identical CG on the
    global-batch quantum geometric tensor and stay in lockstep.  Per CG
    iteration that is one extra all-reduce of a parameter-sized pytree
    (tiny here); the Laplacian/ψ work dominates and scales with the local
    batch.  Signature matches make_sharded_train_window (opt_state = ()).
    """
    from waveflow_tpu.vmc.sr import make_sr_train_window

    n_dev = mesh.devices.size
    if global_batch % n_dev != 0:
        raise ValueError(
            f"global_batch {global_batch} not divisible by mesh {n_dev}")
    local_batch = global_batch // n_dev
    local_window = make_sr_train_window(psi, h_fn, sample_fn, learning_rate,
                                        local_batch, window,
                                        damping=damping, cg_iters=cg_iters,
                                        pmean_axis=axis_name,
                                        max_update_norm=max_update_norm)

    def local(params, opt_state, keys, baseline):
        params, opt_state, rng, new_baseline, losses = local_window(
            params, opt_state, keys[0], baseline)
        return params, opt_state, rng[None], new_baseline, losses

    mapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P()),
        out_specs=(P(), P(), P(axis_name), P(), P()),
        check_vma=False)
    return jax.jit(mapped)


def make_sharded_spring_window(psi, h_fn, sample_fn, learning_rate: float,
                               global_batch: int, window: int, mesh: Mesh,
                               axis_name: str = WALKER_AXIS,
                               damping: float = 1e-3,
                               momentum: float = 0.99,
                               max_update_norm: float | None = None,
                               score_row_clip: float | None = 10.0,
                               score_row_clip_warmup: int | None = 1000):
    """Walker-sharded min-SR/SPRING window: each device computes its local
    (B_local, P) score block, the blocks are all-gathered so every device
    solves the identical global (B, B) Gram system (vmc/sr.py).  The
    SPRING opt_state (previous flat update + step/skipped counters) is
    replicated."""
    from waveflow_tpu.vmc.estimators import make_window_from_step
    from waveflow_tpu.vmc.sr import make_spring_train_step

    n_dev = mesh.devices.size
    if global_batch % n_dev != 0:
        raise ValueError(
            f"global_batch {global_batch} not divisible by mesh {n_dev}")
    local_batch = global_batch // n_dev
    step = make_spring_train_step(psi, h_fn, learning_rate, damping=damping,
                                  momentum=momentum, pmean_axis=axis_name,
                                  max_update_norm=max_update_norm,
                                  score_row_clip=score_row_clip,
                                  score_row_clip_warmup=score_row_clip_warmup)
    local_window = make_window_from_step(step, sample_fn, local_batch, window)

    def local(params, opt_state, keys, baseline):
        params, opt_state, rng, new_baseline, losses = local_window(
            params, opt_state, keys[0], baseline)
        return params, opt_state, rng[None], new_baseline, losses

    mapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P()),
        out_specs=(P(), P(), P(axis_name), P(), P()),
        check_vma=False)
    return jax.jit(mapped)


def make_sharded_mcmc_window(psi, h_fn, log_pdf, optimizer, window: int,
                             box_length: float, mesh: Mesh,
                             n_sweeps: int = 10,
                             target_accept: float = 0.5,
                             axis_name: str = WALKER_AXIS,
                             estimator: str = 'clipped_score',
                             sort_fermions: bool = True,
                             train_step=None):
    """Walker-sharded Metropolis-driven VMC window.

    Walker positions and log-probs are sharded over the walker axis; the
    Metropolis step-size adaptation pmean-reduces acceptance statistics so
    all devices share ONE collective step size (BASELINE.json north star),
    and gradients/losses are pmean-reduced as in the ancestral window.

    Returns (init_fn, window_fn):
      init_fn(params, positions (B,D), step_size) -> MetropolisState
        (plain single-device init — shard the fields afterwards);
      window_fn(params, opt_state, keys (n_dev,2), baseline, mstate) ->
        (params, opt_state, keys, new_baseline, losses, mstate).
    """
    from waveflow_tpu.vmc.metropolis import make_mcmc_train_window

    init_fn, local_window = make_mcmc_train_window(
        psi, h_fn, log_pdf, optimizer, window, box_length,
        n_sweeps=n_sweeps, target_accept=target_accept,
        pmean_axis=axis_name, estimator=estimator,
        sort_proposals=sort_fermions, train_step=train_step)

    def local(params, opt_state, keys, baseline, mstate):
        params, opt_state, rng, new_baseline, losses, mstate = local_window(
            params, opt_state, keys[0], baseline, mstate)
        return params, opt_state, rng[None], new_baseline, losses, mstate

    from waveflow_tpu.vmc.metropolis import MetropolisState
    in_state_spec = MetropolisState(P(axis_name), P(axis_name), P(), P())
    mapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(), in_state_spec),
        out_specs=(P(), P(), P(axis_name), P(), P(), in_state_spec),
        check_vma=False)
    return init_fn, jax.jit(mapped)


def make_sharded_mala_window(psi, h_fn, log_pdf, optimizer, window: int,
                             box_length: float, mesh: Mesh,
                             n_sweeps: int = 10,
                             target_accept: float = 0.574,
                             axis_name: str = WALKER_AXIS,
                             estimator: str = 'clipped_score',
                             sort_fermions: bool = True,
                             train_step=None):
    """Walker-sharded MALA-driven VMC window (vmc/mala.py): positions,
    log-probs, and drift gradients sharded over the walker axis; acceptance
    statistics pmean-reduced into one collective step size; gradients and
    clip statistics reduced as in the ancestral window."""
    from waveflow_tpu.vmc.mala import MALAState, make_mala_train_window

    init_fn, local_window = make_mala_train_window(
        psi, h_fn, log_pdf, optimizer, window, box_length,
        n_sweeps=n_sweeps, target_accept=target_accept,
        pmean_axis=axis_name, estimator=estimator,
        sort_fermions=sort_fermions, train_step=train_step)

    def local(params, opt_state, keys, baseline, mstate):
        params, opt_state, rng, new_baseline, losses, mstate = local_window(
            params, opt_state, keys[0], baseline, mstate)
        return params, opt_state, rng[None], new_baseline, losses, mstate

    state_spec = MALAState(P(axis_name), P(axis_name), P(axis_name),
                           P(), P())
    mapped = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(axis_name), P(), state_spec),
        out_specs=(P(), P(), P(axis_name), P(), P(), state_spec),
        check_vma=False)
    return init_fn, jax.jit(mapped)


def psum_mean(x, axis_name: str = WALKER_AXIS):
    """Mean over both the local batch and the mesh axis."""
    return jax.lax.pmean(jnp.mean(x), axis_name)


def shard_batch(batch, mesh: Mesh, axis_name: str = WALKER_AXIS):
    """Place a host batch with walker sharding."""
    return jax.device_put(batch, NamedSharding(mesh, P(axis_name)))

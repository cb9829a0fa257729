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
from waveflow_tpu.vmc.estimators import make_train_step


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


def psum_mean(x, axis_name: str = WALKER_AXIS):
    """Mean over both the local batch and the mesh axis."""
    return jax.lax.pmean(jnp.mean(x), axis_name)


def shard_batch(batch, mesh: Mesh, axis_name: str = WALKER_AXIS):
    """Place a host batch with walker sharding."""
    return jax.device_put(batch, NamedSharding(mesh, P(axis_name)))

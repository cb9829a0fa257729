"""Cross-device walker resampling (new capability, per SURVEY §2's
parallel-component inventory: "all_gather/permute for walker resampling").

Used by population-control algorithms (SMC over walkers, branching DMC-style
drivers): walkers live sharded over the mesh axis; weights are gathered with
an all-gather collective, the systematic-resampling index set is computed
redundantly on every device (deterministic given the shared key), and each
device gathers its new local walkers from the globally-gathered population.
One all-gather of the (small) walker array; no host involvement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def systematic_indices(rng, log_weights: jnp.ndarray, n: int) -> jnp.ndarray:
    """Systematic resampling indices for n draws from softmax(log_weights)."""
    w = jax.nn.softmax(log_weights)
    u = jax.random.uniform(rng)
    positions = (u + jnp.arange(n)) / n
    return jnp.clip(jnp.searchsorted(jnp.cumsum(w), positions), 0,
                    log_weights.shape[0] - 1)


def resample_walkers_sharded(positions, log_weights, rng,
                             axis_name: str = "walkers"):
    """Inside shard_map: resample the *global* walker population.

    positions: (n_local, D) local shard; log_weights: (n_local,).
    Returns (new_positions (n_local, D), uniform log_weights).
    """
    all_pos = jax.lax.all_gather(positions, axis_name, tiled=True)
    all_lw = jax.lax.all_gather(log_weights, axis_name, tiled=True)
    n_total = all_lw.shape[0]
    n_local = positions.shape[0]
    # same key on every device -> identical global index set
    idx = systematic_indices(rng, all_lw, n_total)
    me = jax.lax.axis_index(axis_name)
    local_idx = jax.lax.dynamic_slice_in_dim(idx, me * n_local, n_local)
    new_pos = jnp.take(all_pos, local_idx, axis=0)
    return new_pos, jnp.zeros_like(log_weights)

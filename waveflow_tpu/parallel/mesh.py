"""Device-mesh construction and multi-host runtime initialization.

The reference has no distributed code at all (SURVEY §2: zero
pmap/psum/pjit/shard hits); this module is the new TPU-native communication
layer: a 1-D (or host×chip 2-D) mesh over which walkers are sharded, with
XLA collectives (psum/pmean over ICI, two-level over DCN) carrying the
energy/gradient reductions.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

WALKER_AXIS = "walkers"


def distributed_init(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize the multi-host runtime (jax.distributed).  No-op for
    single-process runs; on a pod slice the standard TPU environment
    auto-detects all three arguments."""
    if num_processes is not None and num_processes > 1 or coordinator_address:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def make_walker_mesh(n_devices: int | None = None,
                     axis_name: str = WALKER_AXIS) -> Mesh:
    """1-D mesh over (up to) all visible devices for walker data
    parallelism."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_host_chip_mesh(axis_names=("hosts", "chips")) -> Mesh:
    """2-D host×chip mesh: reductions inside a host ride ICI, the outer
    axis crosses DCN.  Shard walkers over both axes; psum over 'chips'
    first then 'hosts' gives the two-level reduction."""
    n_proc = jax.process_count()
    local = jax.local_device_count()
    devices = np.asarray(jax.devices()).reshape(n_proc, local)
    return Mesh(devices, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def walker_sharded(mesh: Mesh, axis_name: str = WALKER_AXIS) -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))

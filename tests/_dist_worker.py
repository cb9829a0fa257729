"""Worker for the 2-process jax.distributed test (see test_distributed.py).

Launched as: python tests/_dist_worker.py <proc_id> <n_proc> <port> <out_dir>
with a clean CPU backend (the launcher unsets the axon platform gate and
forces 4 virtual CPU devices per process, giving a 2-host x 4-chip world).

Exercises, cross-process:
  1. waveflow_tpu.parallel.distributed_init / make_host_chip_mesh (2x4);
  2. the two-level psum (chips = intra-host "ICI" level, hosts = "DCN");
  3. one walker-sharded VMC training step over the global 1-D walker mesh
     (pmean'd loss/grads across both processes);
  4. save_state_multihost (host 0 writes, host 1 must not).
Writes '<out_dir>/ok_<proc_id>.json' on success.
"""

import json
import sys
from pathlib import Path

import jax


def main():
    proc_id, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    out_dir = Path(sys.argv[4])

    from waveflow_tpu.parallel import distributed_init
    distributed_init(coordinator_address=f"localhost:{port}",
                     num_processes=n_proc, process_id=proc_id)
    assert jax.process_count() == n_proc
    assert jax.local_device_count() == 4
    assert jax.device_count() == 4 * n_proc

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    # --- two-level reduction over the host x chip mesh ---------------------
    from waveflow_tpu.parallel import make_host_chip_mesh
    mesh2d = make_host_chip_mesh()
    assert mesh2d.shape == {"hosts": n_proc, "chips": 4}, mesh2d.shape

    def two_level_sum(x):
        s = jax.lax.psum(jnp.sum(x), "chips")   # intra-host level
        return jax.lax.psum(s, "hosts")         # cross-host (DCN) level

    mapped = jax.jit(jax.shard_map(
        two_level_sum, mesh=mesh2d,
        in_specs=P(("hosts", "chips")), out_specs=P(), check_vma=False))
    n_global = 4 * n_proc * 2
    local = np.arange(n_global, dtype=np.float32)[
        proc_id * n_global // n_proc:(proc_id + 1) * n_global // n_proc]
    sharding = NamedSharding(mesh2d, P(("hosts", "chips")))
    garr = jax.make_array_from_process_local_data(sharding, local)
    total = float(np.asarray(jax.device_get(mapped(garr))))
    expect = float(np.arange(n_global, dtype=np.float32).sum())
    assert abs(total - expect) < 1e-5, (total, expect)

    # --- one walker-sharded VMC step across both processes -----------------
    import optax
    from waveflow_tpu.models import get_waveflow_model
    from waveflow_tpu.parallel import (
        make_sharded_train_step, make_walker_mesh, walker_sharded,
    )
    from waveflow_tpu.physics import (
        construct_hamiltonian_function, system_catalogue,
    )

    protons, n_particle = system_catalogue[1]['He']
    init = get_waveflow_model(n_particle, base_spline_degree=4,
                              i_spline_degree=4, n_prior_internal_knots=8,
                              n_i_internal_knots=8, i_spline_reg=0.1,
                              n_flow_layers=1, box_size=5.0,
                              n_spline_base_mesh_points=300)
    params, psi, log_pdf, sample = init(jax.random.PRNGKey(0), n_particle)
    h_fn = construct_hamiltonian_function(psi, protons=protons,
                                          n_space_dimensions=1, eps=0.0)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    wmesh = make_walker_mesh()           # 1-D over all 8 global devices
    assert wmesh.devices.size == 4 * n_proc
    step = make_sharded_train_step(psi, h_fn, opt, wmesh)

    rng = np.random.default_rng(proc_id)
    local_batch = np.sort(rng.uniform(-4.5, 4.5, (8, n_particle)),
                          axis=-1).astype(np.float32)
    gbatch = jax.make_array_from_process_local_data(
        walker_sharded(wmesh), local_batch)
    params, opt_state, loss = step(params, opt_state, gbatch, jnp.zeros(()))
    loss = float(np.asarray(jax.device_get(loss)))
    assert np.isfinite(loss), loss

    # --- host-0-writes checkpoint ------------------------------------------
    from waveflow_tpu.utils import save_state_multihost
    ckpt = out_dir / "multihost_ckpt"
    save_state_multihost(ckpt, {"loss": loss, "epoch": 1})

    with open(out_dir / f"ok_{proc_id}.json", "w") as f:
        json.dump({"psum": total, "loss": loss}, f)
    print(f"proc {proc_id}: psum={total} loss={loss:.4f} OK", flush=True)


if __name__ == '__main__':
    main()

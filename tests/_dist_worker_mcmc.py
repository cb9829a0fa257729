"""Worker for the 4-process x 2-device distributed test (see
test_distributed.py::test_four_process_mcmc_spring_resume).

Launched as:
  python tests/_dist_worker_mcmc.py <proc_id> <n_proc> <port> <out_dir> <phase>

with a clean CPU backend and 2 virtual devices per process (a
4-host x 2-chip world, 8 global devices).  Exercises the NEWEST sharded
paths cross-process: the Metropolis-driven VMC window with a SPRING
(min-SR) train step — per-device score blocks all-gathered over DCN into
the replicated global Gram solve, collective step-size adaptation — plus
shard-local checkpointing and BITWISE-stable resume:

  phase 'full':   window A -> save state -> window B -> record outcome
  phase 'resume': load state after A      -> window B -> record outcome

The test asserts the two outcomes are byte-identical.
"""

import json
import pickle
import sys
from pathlib import Path

import jax


def main():
    proc_id, n_proc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    out_dir = Path(sys.argv[4])
    phase = sys.argv[5]

    from waveflow_tpu.parallel import distributed_init
    distributed_init(coordinator_address=f"localhost:{port}",
                     num_processes=n_proc, process_id=proc_id)
    assert jax.process_count() == n_proc
    assert jax.local_device_count() == 2
    n_dev = 2 * n_proc

    import numpy as np
    import jax.numpy as jnp
    import optax
    from waveflow_tpu.models import get_waveflow_model
    from waveflow_tpu.parallel import (
        WALKER_AXIS, make_sharded_mcmc_window, make_walker_mesh,
        walker_sharded,
    )
    from waveflow_tpu.physics import (
        construct_hamiltonian_function, system_catalogue,
    )
    from waveflow_tpu.vmc.sr import make_spring_train_step

    protons, n_particle = system_catalogue[1]['He']
    init = get_waveflow_model(n_particle, base_spline_degree=4,
                              i_spline_degree=4, n_prior_internal_knots=8,
                              n_i_internal_knots=8, i_spline_reg=0.1,
                              n_flow_layers=1, box_size=5.0,
                              n_spline_base_mesh_points=300)
    params, psi, log_pdf, sample = init(jax.random.PRNGKey(0), n_particle)
    h_fn = construct_hamiltonian_function(psi, protons=protons,
                                          n_space_dimensions=1, eps=0.0)
    spring_step = make_spring_train_step(psi, h_fn, 0.02, damping=1e-2,
                                         momentum=0.9, pmean_axis=WALKER_AXIS,
                                         max_update_norm=0.3)
    opt_state = spring_step.init_state(params)

    wmesh = make_walker_mesh()
    assert wmesh.devices.size == n_dev
    window = 3
    per_dev = 2
    local_batch = per_dev * 2                      # walkers per process

    # optimizer arg unused when an explicit train_step is injected
    mcmc_init, mcmc_window = make_sharded_mcmc_window(
        psi, h_fn, log_pdf, optax.adam(1e-3), window, 5.0, wmesh,
        n_sweeps=2, train_step=spring_step)

    sharding = walker_sharded(wmesh)

    def to_global(local):
        return jax.make_array_from_process_local_data(sharding, local)

    # deterministic initial walkers, process-local slice of a global table
    all_pos = np.sort(
        np.random.default_rng(0).uniform(
            -4.5, 4.5, (n_proc * local_batch, n_particle)), axis=-1
    ).astype(np.float32)
    positions = to_global(
        all_pos[proc_id * local_batch:(proc_id + 1) * local_batch])

    all_keys = np.asarray(jax.random.split(jax.random.PRNGKey(7), n_dev))
    keys = jax.make_array_from_process_local_data(
        jax.sharding.NamedSharding(
            wmesh, jax.sharding.PartitionSpec(WALKER_AXIS)),
        all_keys[proc_id * 2:(proc_id + 1) * 2])

    baseline = jnp.zeros(())

    def local_shards(arr):
        """Process-local shard data, device-major, as one ndarray."""
        shards = sorted(arr.addressable_shards, key=lambda s: s.index)
        return np.concatenate([np.asarray(s.data) for s in shards])

    state_file = out_dir / f"state_{proc_id}.pkl"

    if phase == 'full':
        mstate = mcmc_init(params, positions, step_size=0.5)
        # window A
        params, opt_state, keys, baseline, losses, mstate = mcmc_window(
            params, opt_state, keys, baseline, mstate)
        assert np.isfinite(np.asarray(losses)).all()
        # shard-local checkpoint (replicated leaves + this process's shards)
        with open(state_file, 'wb') as f:
            pickle.dump({
                'params': jax.device_get(params),
                'opt_state': jax.device_get(opt_state),
                'baseline': np.asarray(baseline),
                'keys': local_shards(keys),
                'positions': local_shards(mstate.positions),
                'log_probs': local_shards(mstate.log_prob),
                'step_size': np.asarray(mstate.step_size),
                'accept_rate': np.asarray(mstate.accept_rate),
            }, f)
    else:
        with open(state_file, 'rb') as f:
            st = pickle.load(f)
        params = jax.device_put(st['params'])
        opt_state = jax.device_put(st['opt_state'])
        baseline = jnp.asarray(st['baseline'])
        keys = jax.make_array_from_process_local_data(
            jax.sharding.NamedSharding(
                wmesh, jax.sharding.PartitionSpec(WALKER_AXIS)),
            st['keys'])
        from waveflow_tpu.vmc.metropolis import MetropolisState
        mstate = MetropolisState(
            to_global(st['positions']), to_global(st['log_probs']),
            jnp.asarray(st['step_size']), jnp.asarray(st['accept_rate']))

    # window B (identical inputs in both phases)
    params, opt_state, keys, baseline, losses, mstate = mcmc_window(
        params, opt_state, keys, baseline, mstate)
    losses = np.asarray(losses)
    assert np.isfinite(losses).all()

    from jax.flatten_util import ravel_pytree
    flat, _ = ravel_pytree(jax.device_get(params))
    np.savez(out_dir / f"out_{phase}_{proc_id}.npz",
             losses=losses, flat_params=np.asarray(flat),
             step_size=np.asarray(mstate.step_size),
             positions=local_shards(mstate.positions))
    with open(out_dir / f"ok_{phase}_{proc_id}.json", 'w') as f:
        json.dump({'loss': float(losses[-1]),
                   'skipped': int(np.asarray(
                       jax.device_get(opt_state['skipped'])))}, f)
    print(f"proc {proc_id} phase {phase}: loss={losses[-1]:.4f} OK",
          flush=True)


if __name__ == '__main__':
    main()

"""Time the ACTUAL reference implementation on this chip.

Round-1 review: bench.py's vs_baseline compared against this repo's own
reimplementation of the reference's algorithmic design; this script runs
the real `/root/reference` code once on the same hardware (He-1d L=10,
batch 256 — the data-submission flagship config) and records the measured
epochs/s as the anchor that bench.py reads from results/reference_anchor.json.

Run from the repo root: `python benchmarks/reference_anchor.py`.
The reference builds its spline table cache in cwd (./cached_splines_bases),
so we chdir to a scratch directory first; /root/reference itself is never
written to.
"""

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, "/root/reference")

SCRATCH = Path("/tmp/reference_anchor_scratch")
SCRATCH.mkdir(parents=True, exist_ok=True)
os.chdir(SCRATCH)


def main():
    import jax
    import jax.numpy as jnp
    print(jax.devices(), flush=True)

    from waveflow.vqmc import create_train_state, train_step_efficient
    from waveflow.utils import physics

    batch_size = 256
    t0 = time.time()
    system, n_particle = physics.system_catalogue[1]['He']
    psi, log_pdf, sample, opt_state, opt_update, get_params = \
        create_train_state(10.0, 1e-4, n_particle=n_particle,
                           rng=jax.random.PRNGKey(2), xu_coord_type='mean',
                           spline_degree=6, num_knots=23, n_flow_layers=3)
    h_fn = physics.construct_hamiltonian_function(
        psi, protons=system, n_space_dimensions=1, eps=0.0)
    sample = jax.jit(sample, static_argnums=(2,))
    params = get_params(opt_state)
    print(f"reference model built in {time.time()-t0:.0f}s "
          "(includes table-cache build)", flush=True)

    rng = jax.random.PRNGKey(2)
    running_average = jnp.zeros(1)

    # warmup / compile
    t0 = time.time()
    split_rng, rng = jax.random.split(rng)
    batch = sample(split_rng, params, batch_size)
    opt_state, loss = train_step_efficient(
        1, psi, h_fn, opt_update, opt_state, params, batch, running_average)
    params = get_params(opt_state)
    jax.block_until_ready(loss)
    print(f"compile+first epoch: {time.time()-t0:.0f}s", flush=True)

    # steady state: the reference's own per-epoch host-dispatch loop
    n_epochs = 200
    losses = []
    t0 = time.time()
    for epoch in range(2, 2 + n_epochs):
        split_rng, rng = jax.random.split(rng)
        batch = sample(split_rng, params, batch_size)
        opt_state, loss = train_step_efficient(
            epoch, psi, h_fn, opt_update, opt_state, params, batch,
            running_average)
        params = get_params(opt_state)
        losses.append(loss)
        if epoch % 100 == 0:
            running_average = jnp.array(losses[-100:]).mean()
    jax.block_until_ready(losses[-1])
    dt = (time.time() - t0) / n_epochs
    out = {
        "epochs_per_sec": round(1 / dt, 2),
        "walkers_per_sec": round(batch_size / dt, 1),
        "batch_size": batch_size,
        "config": "He-1d L=10 batch256 deg6 knots23 layers3 (flagship)",
        "what": "actual /root/reference code (vqmc.create_train_state + "
                "train_step_efficient per-epoch loop), measured on this chip",
        "last_loss": float(losses[-1]),
    }
    print(json.dumps(out), flush=True)
    with open(REPO / "results" / "reference_anchor.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == '__main__':
    main()

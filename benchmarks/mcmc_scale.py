"""Metropolis/MALA VMC windows at scale (VERDICT r2 item 2).

Part A — throughput: epochs/s and walkers/s of the fused MCMC training
windows across sweeps × batch on one chip.  The MCMC windows skip the
ancestral inverse-CDF sampler entirely (walkers persist), so at large
batch they can beat the ancestral window's throughput ceiling.

Part B — quality: short He-1d runs (batch 256) at each sweeps setting,
recording the median of the last 20% of the loss trace — the
sweeps-vs-decorrelation-vs-energy trade the round-2 review asked for.

Writes results/mcmc_scale.json.  Run on the chip.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np

OUT = REPO / 'results' / 'mcmc_scale.json'


def build_window(sampler, batch, sweeps, window, eval_backend='poly',
                 laplacian_mode='fwd_batched'):
    import optax
    jax.config.update("jax_default_matmul_precision", "highest")
    from waveflow_tpu.models import get_waveflow_model
    from waveflow_tpu.physics import (construct_hamiltonian_function,
                                      system_catalogue)
    from waveflow_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache("~/.cache/waveflow_tpu/xla")

    protons, n_particle = system_catalogue[1]['He']
    init = get_waveflow_model(n_particle, base_spline_degree=6,
                              i_spline_degree=6, n_prior_internal_knots=23,
                              n_i_internal_knots=23, i_spline_reg=0.05,
                              n_flow_layers=3, box_size=10.0,
                              xu_coord_type='mean', eval_backend=eval_backend)
    params, psi, log_pdf, sample = init(jax.random.PRNGKey(0), n_particle)
    h_fn = construct_hamiltonian_function(psi, protons=protons,
                                          n_space_dimensions=1, eps=0.0,
                                          laplacian_mode=laplacian_mode)
    opt = optax.flatten(optax.adam(1e-4))
    opt_state = opt.init(params)
    if sampler == 'metropolis':
        from waveflow_tpu.vmc.metropolis import make_mcmc_train_window
        init_fn, win = make_mcmc_train_window(
            psi, h_fn, log_pdf, opt, window, 10.0, n_sweeps=sweeps)
    else:
        from waveflow_tpu.vmc.mala import make_mala_train_window
        init_fn, win = make_mala_train_window(
            psi, h_fn, log_pdf, opt, window, 10.0, n_sweeps=sweeps)
    positions = sample(jax.random.PRNGKey(1), params, batch)
    mstate = init_fn(params, positions, 0.5)
    return params, opt_state, jax.jit(win), mstate, window


def time_mcmc(params, opt_state, win, mstate, window, iters):
    rng = jax.random.PRNGKey(2)
    baseline = jnp.zeros(())
    # two warm calls: the first compiles, the second runs on the carried
    # state's avals (guards against any init-state weak-type retrace —
    # the bug that invalidated the first run of this study)
    for _ in range(2):
        out = win(params, opt_state, rng, baseline, mstate)
        jax.block_until_ready(out[4])
        params, opt_state, rng, baseline, losses, mstate = out
    t0 = time.perf_counter()
    for _ in range(iters):
        params, opt_state, rng, baseline, losses, mstate = win(
            params, opt_state, rng, baseline, mstate)
    jax.block_until_ready(losses)
    return (time.perf_counter() - t0) / (iters * window)


def main():
    out = json.loads(OUT.read_text()) if OUT.exists() else {}

    # Part A: throughput
    rows = out.setdefault('throughput', [])
    done = {(r['sampler'], r['sweeps'], r['batch']) for r in rows}
    cases = []
    for sweeps in (1, 3, 10):
        for batch in (256, 4096, 16384, 65536):
            cases.append(('metropolis', sweeps, batch))
    for sweeps in (1, 3):
        for batch in (256, 4096, 16384, 65536):
            cases.append(('mala', sweeps, batch))
    for sampler, sweeps, batch in cases:
        if (sampler, sweeps, batch) in done:
            continue
        window = 100 if batch <= 4096 else 20
        iters = 3 if batch <= 4096 else 2
        args = build_window(sampler, batch, sweeps, window)
        dt = time_mcmc(*args, iters=iters)
        row = {'sampler': sampler, 'sweeps': sweeps, 'batch': batch,
               'epochs_per_sec': round(1 / dt, 1),
               'walkers_per_sec': round(batch / dt, 1)}
        rows.append(row)
        print(json.dumps(row), flush=True)
        OUT.write_text(json.dumps(out, indent=2))

    # Part B: energy quality at batch 256, 10k epochs each
    from waveflow_tpu.vmc import VMCConfig, VMCTrainer
    qual = out.setdefault('quality_he1d_10k', {})
    settings = [('metropolis', s) for s in (1, 3, 10)] + \
        [('mala', s) for s in (1, 3)] + [('ancestral', 0)]
    for sampler, sweeps in settings:
        key = f"{sampler}_s{sweeps}"
        if key in qual:
            continue
        t0 = time.time()
        cfg = VMCConfig(system_name='He', box_length=10.0, batch_size=256,
                        learning_rate=1e-4, log_every=10_000, window=100,
                        sampler=sampler if sampler != 'ancestral'
                        else 'ancestral',
                        mcmc_sweeps=max(sweeps, 1), seed=2,
                        save_dir=f"/tmp/mcmc_scale_{key}")
        t = VMCTrainer(cfg)
        losses = np.asarray(t.train(num_epochs=10_000, verbose=False))
        tail = losses[-2000:]
        qual[key] = {'median_last20pct': float(np.median(tail)),
                     'wall_s': round(time.time() - t0, 1),
                     'epochs_per_sec': round(10_000 / (time.time() - t0), 1)}
        print(key, json.dumps(qual[key]), flush=True)
        OUT.write_text(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()

"""Round-5 roofline: post-poly bottleneck decomposition + the fused
Pallas basis-jet kernel A/B (VERDICT r4 items "what's weak" #2/#3).

Three questions, answered with on-chip measurements:

1. **Where do the poly windows' bytes go?**  The XLA poly backend
   materializes W = onehot(cell) ⊗ s-powers (n_cells·ncoef ≈ 176 f32
   lanes/site) as a matmul operand in HBM; the compiled cost analysis
   (flops / bytes-accessed of the real executable, not a hand model —
   the r4 table-era bytes model is retired) quantifies it per backend.
2. **Does fusing W into the matmul help?**  eval_backend='poly_pallas'
   (ops/pallas_jet.py) builds W in VMEM scratch and contracts in-kernel;
   rows A/B poly vs poly_pallas at each window×batch cell, plus
   poly+fwd_batched to isolate the Laplacian-formulation change the
   kernel requires (laplacian_and_value_batched) from the kernel itself.
3. **Why does throughput regress 16k -> 65k?**  A component decomposition
   at 16k/65k: sample-only, h_fn-only (Laplacian+potential), and
   step-only (h_fn + gradient + adam) sub-windows, timed + cost-analyzed
   separately, so the regressing term is named rather than guessed.

Writes results/roofline_r5.json.  Run on the chip.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / 'benchmarks'))

import jax
import jax.numpy as jnp

PEAK_FLOPS = 197e12      # v5e bf16 MXU peak, FLOP/s
PEAK_HBM = 819e9         # v5e HBM bandwidth, B/s

BATCHES = (256, 4096, 16384, 65536)
# (eval_backend, laplacian_mode) triplets: r4 baseline / formulation
# isolation / the fused kernel
CONFIGS = (('poly', 'fwd'), ('poly', 'fwd_batched'),
           ('poly_pallas', 'fwd_batched'))
OUT = REPO / 'results' / 'roofline_r5.json'


def cost_of(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get('flops', 0.0)), float(ca.get('bytes accessed', 0.0))


def row_from(kind, backend, lap, batch, window, flops_w, bytes_w, dt,
             loss=None):
    flops_e, bytes_e = flops_w / window, bytes_w / window
    t_light = max(flops_e / PEAK_FLOPS, bytes_e / PEAK_HBM)
    row = {
        'window': kind, 'backend': backend, 'laplacian': lap, 'batch': batch,
        'epochs_per_sec': round(1.0 / dt, 1),
        'walkers_per_sec': round(batch / dt, 1),
        'flops_per_epoch': flops_e,
        'hbm_bytes_per_epoch': bytes_e,
        'arithmetic_intensity': round(flops_e / max(bytes_e, 1), 2),
        'mfu_pct': round(100 * flops_e / dt / PEAK_FLOPS, 3),
        'hbm_util_pct': round(100 * bytes_e / dt / PEAK_HBM, 1),
        'lightspeed_epoch_us': round(1e6 * t_light, 1),
        'measured_epoch_us': round(1e6 * dt, 1),
        'roofline_frac': round(t_light / dt, 3),
    }
    if loss is not None:
        row['final_loss'] = round(float(loss), 5)
    return row


def ancestral_case(batch, window, backend, lap):
    from bench import build, time_windows
    from waveflow_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache("~/.cache/waveflow_tpu/xla")
    params, opt_state, window_jit, _ = build(batch, window=window,
                                             eval_backend=backend,
                                             laplacian_mode=lap)
    lowered = window_jit.lower(params, opt_state, jax.random.PRNGKey(1),
                               jnp.zeros(()))
    flops_w, bytes_w = cost_of(lowered.compile())
    dt, last_loss = time_windows(params, opt_state, window_jit, window,
                                 n_iters=3 if batch <= 4096 else 2)
    return row_from('ancestral', backend, lap, batch, window, flops_w,
                    bytes_w, dt, loss=last_loss)


def metropolis_case(batch, window, backend, lap, sweeps=1):
    from mcmc_scale import build_window, time_mcmc
    params, opt_state, win, mstate, window = build_window(
        'metropolis', batch, sweeps, window, eval_backend=backend,
        laplacian_mode=lap)
    lowered = win.lower(params, opt_state, jax.random.PRNGKey(2),
                        jnp.zeros(()), mstate)
    flops_w, bytes_w = cost_of(lowered.compile())
    dt = time_mcmc(params, opt_state, win, mstate, window,
                   iters=3 if batch <= 4096 else 2)
    return row_from('metropolis_s1', backend, lap, batch, window, flops_w,
                    bytes_w, dt)


def component_case(batch, backend, lap):
    """Decompose one epoch at this batch: sample / h_fn / full step, each
    as its own fused scan window, timed + cost-analyzed (question 3)."""
    import optax
    from waveflow_tpu.models import get_waveflow_model
    from waveflow_tpu.physics import (construct_hamiltonian_function,
                                      system_catalogue)
    from waveflow_tpu.utils import enable_persistent_compilation_cache
    from waveflow_tpu.vmc.estimators import make_train_step
    enable_persistent_compilation_cache("~/.cache/waveflow_tpu/xla")
    jax.config.update("jax_default_matmul_precision", "highest")

    protons, n_particle = system_catalogue[1]['He']
    init = get_waveflow_model(n_particle, base_spline_degree=6,
                              i_spline_degree=6, n_prior_internal_knots=23,
                              n_i_internal_knots=23, i_spline_reg=0.05,
                              n_flow_layers=3, box_size=10.0,
                              xu_coord_type='mean', eval_backend=backend)
    params, psi, log_pdf, sample = init(jax.random.PRNGKey(0), n_particle)
    h_fn = construct_hamiltonian_function(
        psi, protons=protons, n_space_dimensions=1, eps=0.0,
        laplacian_mode=lap)
    opt = optax.flatten(optax.adam(1e-4))
    opt_state = opt.init(params)
    step = make_train_step(psi, h_fn, opt)
    W = 10

    def sample_window(params, rng):
        def body(rng, _):
            rng, k = jax.random.split(rng)
            return rng, sample(k, params, batch).sum()
        rng, s = jax.lax.scan(body, rng, None, length=W)
        return s.sum()

    def h_window(params, batch_x):
        def body(c, _):
            return c + h_fn(params, batch_x).sum(), None
        s, _ = jax.lax.scan(body, jnp.zeros(()), None, length=W)
        return s

    def step_window(params, opt_state, batch_x):
        def body(carry, _):
            params, opt_state = carry
            params, opt_state, loss = step(params, opt_state, batch_x,
                                           jnp.zeros(()))
            return (params, opt_state), loss
        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), None, length=W)
        return losses.sum()

    batch_x = sample(jax.random.PRNGKey(3), params, batch)
    comps = {}
    for name, fn, args in (
            ('sample', jax.jit(sample_window),
             (params, jax.random.PRNGKey(4))),
            ('h_fn', jax.jit(h_window), (params, batch_x)),
            ('train_step', jax.jit(step_window),
             (params, opt_state, batch_x))):
        lowered = fn.lower(*args)
        flops_w, bytes_w = cost_of(lowered.compile())
        out = fn(*args); jax.block_until_ready(out)       # compile+warm
        out = fn(*args); jax.block_until_ready(out)
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / W
        comps[name] = {
            'epoch_us': round(1e6 * dt, 1),
            'flops_per_epoch': flops_w / W,
            'hbm_bytes_per_epoch': bytes_w / W,
            'hbm_util_pct': round(100 * bytes_w / W / dt / PEAK_HBM, 1),
        }
    return {'component_decomposition': True, 'backend': backend,
            'laplacian': lap, 'batch': batch, 'components': comps}


def main():
    out = json.loads(OUT.read_text()) if OUT.exists() else []
    done = {(r.get('window', 'comp'), r['backend'], r.get('laplacian'),
             r['batch']) for r in out}
    for kind, fn in (('ancestral', ancestral_case),
                     ('metropolis_s1', metropolis_case)):
        for backend, lap in CONFIGS:
            for batch in BATCHES:
                if (kind == 'metropolis_s1'
                        and (backend, lap) == ('poly', 'fwd_batched')
                        and batch in (256, 16384)):
                    continue   # 4k/65k suffice to confirm the direction
                if (kind, backend, lap, batch) in done:
                    continue
                window = 100 if batch <= 4096 else 20
                row = fn(batch, window, backend, lap)
                out.append(row)
                print(json.dumps(row), flush=True)
                OUT.write_text(json.dumps(out, indent=2))
    # component decomposition at the regression corner (question 3)
    for backend, lap in (('poly', 'fwd'), ('poly_pallas', 'fwd_batched')):
        for batch in (16384, 65536):
            if ('comp', backend, lap, batch) in done:
                continue
            row = component_case(batch, backend, lap)
            out.append(row)
            print(json.dumps(row), flush=True)
            OUT.write_text(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()

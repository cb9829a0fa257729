"""Round-4 roofline + backend A/B: the gather-free polynomial spline
backend (ops/poly_eval.py) vs the round-3 table backend, on the ancestral
and Metropolis (sweeps=1) production windows, across batch sizes, against
the v5e speed of light.

This is VERDICT r3 item 1 ("the fused flow forward+derivative kernel"):
the poly backend removes every HBM table gather from the ψ/Laplacian path
— the op class the r3 roofline blamed for capping the windows at 13% of
the HBM roofline — replacing it with one small MXU matmul + Horner chains.
Writes results/roofline_r4.json.  Run on the chip.
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
OUT = REPO / 'results' / 'roofline_r4.json'


def cost_of(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get('flops', 0.0)), float(ca.get('bytes accessed', 0.0))


def row_from(kind, backend, batch, window, flops_w, bytes_w, dt, loss=None):
    flops_e, bytes_e = flops_w / window, bytes_w / window
    t_light = max(flops_e / PEAK_FLOPS, bytes_e / PEAK_HBM)
    row = {
        'window': kind, 'backend': backend, 'batch': batch,
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


def ancestral_case(batch, window, backend):
    from bench import build, time_windows
    from waveflow_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache("~/.cache/waveflow_tpu/xla")
    params, opt_state, window_jit, _ = build(batch, window=window,
                                             eval_backend=backend)
    lowered = window_jit.lower(params, opt_state, jax.random.PRNGKey(1),
                               jnp.zeros(()))
    flops_w, bytes_w = cost_of(lowered.compile())
    dt, last_loss = time_windows(params, opt_state, window_jit, window,
                                 n_iters=3 if batch <= 4096 else 2)
    return row_from('ancestral', backend, batch, window, flops_w, bytes_w,
                    dt, loss=last_loss)


def metropolis_case(batch, window, backend, sweeps=1):
    from mcmc_scale import build_window, time_mcmc
    params, opt_state, win, mstate, window = build_window(
        'metropolis', batch, sweeps, window, eval_backend=backend)
    lowered = win.lower(params, opt_state, jax.random.PRNGKey(2),
                        jnp.zeros(()), mstate)
    flops_w, bytes_w = cost_of(lowered.compile())
    dt = time_mcmc(params, opt_state, win, mstate, window,
                   iters=3 if batch <= 4096 else 2)
    return row_from('metropolis_s1', backend, batch, window, flops_w,
                    bytes_w, dt)


def main():
    out = json.loads(OUT.read_text()) if OUT.exists() else []
    done = {(r['window'], r['backend'], r['batch']) for r in out}
    for kind, fn in (('ancestral', ancestral_case),
                     ('metropolis_s1', metropolis_case)):
        for backend in ('poly', 'table'):
            for batch in BATCHES:
                if (kind, backend, batch) in done:
                    continue
                window = 100 if batch <= 4096 else 20
                row = fn(batch, window, backend)
                out.append(row)
                print(json.dumps(row), flush=True)
                OUT.write_text(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()

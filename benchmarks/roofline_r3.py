"""Round-3 roofline refresh: the adopted Pallas-sampler ancestral window
and the new-peak Metropolis (sweeps=1) window, against the v5e speed of
light.  Same method as benchmarks/roofline.py (XLA cost analysis off the
compiled executable + measured steady-state wall time); the Pallas
sampler contributes its own honest cost estimate (pl.CostEstimate in
ops/pallas_sampler.py: coeffs in + samples out — the kernel's only HBM
traffic).  Writes results/roofline_r3.json.  Run on the chip.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

PEAK_FLOPS = 197e12      # v5e bf16 MXU peak, FLOP/s
PEAK_HBM = 819e9         # v5e HBM bandwidth, B/s

BATCHES = (256, 4096, 16384, 65536)
OUT = REPO / 'results' / 'roofline_r3.json'


def cost_of(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get('flops', 0.0)), float(ca.get('bytes accessed', 0.0))


def row_from(kind, batch, window, flops_w, bytes_w, dt):
    flops_e, bytes_e = flops_w / window, bytes_w / window
    t_light = max(flops_e / PEAK_FLOPS, bytes_e / PEAK_HBM)
    return {
        'window': kind, 'batch': batch,
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


def ancestral_case(batch, window):
    from bench import build, time_windows
    from waveflow_tpu.utils import enable_persistent_compilation_cache
    enable_persistent_compilation_cache("~/.cache/waveflow_tpu/xla")
    params, opt_state, window_jit, _ = build(batch, window=window)
    lowered = window_jit.lower(params, opt_state, jax.random.PRNGKey(1),
                               jnp.zeros(()))
    flops_w, bytes_w = cost_of(lowered.compile())
    dt, _ = time_windows(params, opt_state, window_jit, window,
                         n_iters=3 if batch <= 4096 else 2)
    return row_from('ancestral', batch, window, flops_w, bytes_w, dt)


def metropolis_case(batch, window, sweeps=1):
    sys.path.insert(0, str(REPO / 'benchmarks'))
    from mcmc_scale import build_window, time_mcmc
    params, opt_state, win, mstate, window = build_window(
        'metropolis', batch, sweeps, window)
    lowered = win.lower(params, opt_state, jax.random.PRNGKey(2),
                        jnp.zeros(()), mstate)
    flops_w, bytes_w = cost_of(lowered.compile())
    dt = time_mcmc(params, opt_state, win, mstate, window,
                   iters=3 if batch <= 4096 else 2)
    return row_from('metropolis_s1', batch, window, flops_w, bytes_w, dt)


def main():
    out = json.loads(OUT.read_text()) if OUT.exists() else []
    done = {(r['window'], r['batch']) for r in out}
    for kind, fn in (('ancestral', ancestral_case),
                     ('metropolis_s1', metropolis_case)):
        for batch in BATCHES:
            if (kind, batch) in done:
                continue
            window = 100 if batch <= 4096 else 20
            row = fn(batch, window)
            out.append(row)
            print(json.dumps(row), flush=True)
            OUT.write_text(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()

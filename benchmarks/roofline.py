"""MFU / HBM roofline for the fused VMC window (VERDICT r2 item 1).

Anchors the walkers/s numbers to the chip's speed of light: for each batch
size, the fused ancestral window (sample + train epoch × window) and its
two components are compiled, XLA's cost analysis is read off the compiled
executable (FLOPs + HBM bytes accessed), and wall time is measured.  From
those:

  MFU            = achieved FLOP/s ÷ 197e12   (v5e bf16 MXU peak)
  HBM util       = achieved bytes/s ÷ 819e9   (v5e HBM bandwidth)
  light-speed t  = max(flops/peak_flops, bytes/peak_bw)  per epoch
  roofline frac  = light-speed t ÷ measured t  (1.0 = at the roofline)

Notes: accuracy-critical matmuls in this model are pinned to
Precision.HIGHEST, which the MXU executes as ~6 bf16 passes — XLA's
'flops' metric counts the nominal f32 FLOPs, so MFU against the bf16 peak
understates utilization of those ops by that factor; the roofline fraction
(which for this launch/bandwidth-bound workload is set by bytes, not
flops) is the honest headline.  Writes results/roofline.json.
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

BATCHES = (256, 1024, 4096, 16384, 65536)


def cost_of(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get('flops', 0.0)), float(ca.get('bytes accessed', 0.0))


def main():
    from bench import build, time_windows

    out = []
    for batch in BATCHES:
        window = 100 if batch <= 4096 else 20
        params, opt_state, window_jit, _ = build(batch, window=window)
        rng = jax.random.PRNGKey(1)
        baseline = jnp.zeros(())
        lowered = window_jit.lower(params, opt_state, rng, baseline)
        compiled = lowered.compile()
        flops_w, bytes_w = cost_of(compiled)
        dt, _ = time_windows(params, opt_state, window_jit, window,
                             n_iters=3 if batch <= 4096 else 2)
        flops_e, bytes_e = flops_w / window, bytes_w / window
        t_flops = flops_e / PEAK_FLOPS
        t_bytes = bytes_e / PEAK_HBM
        t_light = max(t_flops, t_bytes)
        row = {
            'batch': batch,
            'epochs_per_sec': round(1.0 / dt, 1),
            'walkers_per_sec': round(batch / dt, 1),
            'flops_per_epoch': flops_e,
            'hbm_bytes_per_epoch': bytes_e,
            'arithmetic_intensity': round(flops_e / max(bytes_e, 1), 2),
            'mfu_pct': round(100 * flops_e / dt / PEAK_FLOPS, 3),
            'hbm_util_pct': round(100 * bytes_e / dt / PEAK_HBM, 1),
            'bound': 'flops' if t_flops > t_bytes else 'bytes',
            'lightspeed_epoch_us': round(1e6 * t_light, 1),
            'measured_epoch_us': round(1e6 * dt, 1),
            'roofline_frac': round(t_light / dt, 3),
        }
        out.append(row)
        print(json.dumps(row), flush=True)
        (REPO / 'results' / 'roofline.json').write_text(
            json.dumps(out, indent=2))


if __name__ == '__main__':
    main()

"""The RQS benchmark row (VERDICT r3 item 7: exercise RQS or retire it).

Runs the modern rational-quadratic-spline coupling flow ('RQSFlow',
bijections/rqs.py) on the SAME circles train/test split and held-out
protocol as benchmarks/circles_parity.py, at the affine Flow's budget
(30k epochs) and the MFlow headline budget (12k), so the model zoo's
three bijection families are scored side by side.  Seeds are swept
(training is deterministic given the init — full-batch gradients).

Writes results/rqs_row.json.  Run on the chip (CPU also works: the model
is tiny).
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / 'benchmarks'))

import numpy as np

OUT = REPO / 'results' / 'rqs_row.json'


def main():
    import jax
    from circles_parity import get_split
    from waveflow_tpu.benchmark.density import train_density_model
    from waveflow_tpu.benchmark.metrics import (
        held_out_log_likelihood, kde_bandwidth_sweep, kde_metrics,
    )

    X, X_test = get_split()
    out = json.loads(OUT.read_text()) if OUT.exists() else {}
    for epochs in (12_000, 30_000):
        for seed in (5, 7, 9):
            key = f'RQSFlow_3_{epochs // 1000}k_seed{seed}'
            if key in out:
                continue
            t0 = time.time()
            params, log_pdf, sample, hist = train_density_model(
                X, model_name='RQSFlow', num_epochs=epochs,
                learning_rate=1e-4, n_flow_layers=3,
                log_every=max(2000, epochs // 4), seed=seed,
                save_dir=str(REPO / 'results' / f'circles_{key}'),
                X_test=X_test, verbose=False)
            ms = np.asarray(jax.jit(
                sample, static_argnames=('num_samples',))(
                jax.random.PRNGKey(9), params, num_samples=20_000))
            kl, hell = kde_metrics(log_pdf, params, ms)
            out[key] = {
                'train_loss': hist['losses'][-1],
                'test_ll': held_out_log_likelihood(log_pdf, params, X_test),
                'test_ll_best': max(hist.get('test_ll', [float('nan')])),
                'kde_kl': kl, 'kde_hellinger2': hell,
                'kde_sweep': kde_bandwidth_sweep(log_pdf, params, ms),
                'reconstruction': hist['reconstruction'][-1],
                'wall_s': round(time.time() - t0, 1),
            }
            print(key, json.dumps(out[key]), flush=True)
            OUT.write_text(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()

"""Adjudicate the double-circles KDE-metric gap (round-1 review item 4).

Runs BOTH frameworks on the same train split of the circles dataset and
scores them on the same held-out test set:

  * this repo's MFlow at the reference's two published configs
    (reg 0.05 / 15 knots / 12k epochs and reg 0.02 / 23 knots / 30k epochs);
  * the ACTUAL reference code (/root/reference) at the same configs;

then reports, for every run: final train loss, held-out mean
log-likelihood (the metric KDE self-consistency cannot provide), KDE
KL/Hellinger at the reference's bandwidth 0.01 AND a bandwidth sweep
(quantifying how much of the score is bandwidth artifact).

Writes results/circles_parity.json.  Run from the repo root on the chip.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, "/root/reference")

import numpy as np

CONFIGS = [
    dict(name='MFlow_0.05_3_5_15', model='MFlow', spline_reg=0.05,
         n_knots=15, num_epochs=12_000),
    dict(name='MFlow_0.02_3_5_23', model='MFlow', spline_reg=0.02,
         n_knots=23, num_epochs=30_000),
    # the remaining published row family: affine-MADE Flow, 3 layers
    # (BASELINE.md double_circles Flow_3: loss -0.7564 / KL 0.2603)
    dict(name='Flow_3', model='Flow', spline_reg=0.0, n_knots=15,
         num_epochs=30_000),
]


def get_split(n_train=1000, n_test=2000):
    from waveflow_tpu.benchmark import get_dataset
    X = get_dataset('circles', n_samples=n_train + n_test, margin=0.025,
                    seed=42)
    return X[:n_train], X[n_train:]


def run_ours(X, X_test, cfg):
    import jax
    from waveflow_tpu.benchmark.density import train_density_model
    from waveflow_tpu.benchmark.metrics import (
        held_out_log_likelihood, kde_bandwidth_sweep, kde_metrics,
    )
    t0 = time.time()
    params, log_pdf, sample, hist = train_density_model(
        X, model_name=cfg['model'], num_epochs=cfg['num_epochs'],
        learning_rate=1e-4, spline_reg=cfg['spline_reg'],
        n_flow_layers=3, spline_degree=5, n_knots=cfg['n_knots'],
        log_every=max(2000, cfg['num_epochs'] // 4),
        save_dir=str(REPO / 'results' / f"circles_{cfg['name']}_ours"),
        X_test=X_test, verbose=True)
    ms = np.asarray(jax.jit(sample, static_argnames=('num_samples',))(
        jax.random.PRNGKey(9), params, num_samples=20_000))
    kl, hell = kde_metrics(log_pdf, params, ms)
    return {
        'train_loss': hist['losses'][-1],
        'test_ll': held_out_log_likelihood(log_pdf, params, X_test),
        'kde_kl': kl, 'kde_hellinger2': hell,
        'kde_sweep': kde_bandwidth_sweep(log_pdf, params, ms),
        'reconstruction': hist['reconstruction'][-1],
        'wall_s': round(time.time() - t0, 1),
    }


def run_reference(X, X_test, cfg):
    """Train the actual reference code on the same split (its own
    benchmark_tests.py loop semantics: full-batch shuffled MLE steps)."""
    import jax
    import jax.numpy as jnp
    from jax.example_libraries import optimizers
    from waveflow import benchmark_tests as ref_bench
    from waveflow_tpu.benchmark.metrics import (
        held_out_log_likelihood, kde_bandwidth_sweep, kde_metrics,
    )

    t0 = time.time()
    # the reference's own benchmark assembly (benchmark_tests.py:68-73:
    # MFlow with I-spline degree/knots per config and its fixed
    # degree-3/15-knot prior)
    init_fun = ref_bench.get_model(
        cfg['model'], cfg['spline_reg'], spline_degree=5,
        num_knots=cfg['n_knots'], num_layers=3)
    params, log_pdf, sample = init_fun(jax.random.PRNGKey(5), 2)
    opt_init, opt_update, get_params = optimizers.adam(1e-4)
    opt_state = opt_init(params)
    X_dev = jnp.asarray(X)

    def loss_fn(p, batch):
        return -log_pdf(p, batch).mean()

    @jax.jit
    def step(i, opt_state, key):
        p = get_params(opt_state)
        batch = jax.random.permutation(key, X_dev, axis=0)
        loss, grads = jax.value_and_grad(loss_fn)(p, batch)
        return opt_update(i, grads, opt_state), loss

    rng = jax.random.PRNGKey(6)
    loss = None
    for i in range(cfg['num_epochs']):
        rng, k = jax.random.split(rng)
        opt_state, loss = step(i, opt_state, k)
    params = get_params(opt_state)
    loss = float(loss)

    ms = np.asarray(sample(jax.random.PRNGKey(9), params, 20_000))
    kl, hell = kde_metrics(log_pdf, params, ms)
    return {
        'train_loss': loss,
        'test_ll': held_out_log_likelihood(log_pdf, params, X_test),
        'kde_kl': kl, 'kde_hellinger2': hell,
        'kde_sweep': kde_bandwidth_sweep(log_pdf, params, ms),
        'wall_s': round(time.time() - t0, 1),
    }


def main():
    X, X_test = get_split()
    out_path = REPO / 'results' / 'circles_parity.json'
    out = json.loads(out_path.read_text()) if out_path.exists() else {}
    for cfg in CONFIGS:
        for side, runner in (('ours', run_ours), ('reference', run_reference)):
            key = f"{side}_{cfg['name']}"
            if key in out:
                # resume cache is valid only if the config is unchanged —
                # editing epochs/knots without renaming must recompute
                # (ADVICE r2).  Rows from before '_cfg' was recorded were
                # produced by exactly this CONFIGS list; backfill them.
                cached_cfg = out[key].get('_cfg')
                if cached_cfg is None:
                    out[key]['_cfg'] = cfg
                    with open(out_path, 'w') as f:
                        json.dump(out, f, indent=2)
                    cached_cfg = cfg
                if cached_cfg == cfg:
                    print(f"=== {key} cached, skipping ===", flush=True)
                    continue
                print(f"=== {key} config changed, recomputing ===",
                      flush=True)
            print(f"=== {side}: {cfg['name']} ===", flush=True)
            out[key] = runner(X, X_test, cfg)
            out[key]['_cfg'] = cfg
            print(json.dumps(out[key]), flush=True)
            with open(out_path, 'w') as f:
                json.dump(out, f, indent=2)


if __name__ == '__main__':
    main()

"""Density-benchmark harness tests: datasets, model zoo, short training.

Covers the reference's benchmark_tests.py surface (SURVEY §2 #17): dataset
generation with margin scaling, the Flow (affine MADE + Normal prior,
benchmark_tests.py:54-58), IFlow (I-spline MADE + Uniform prior, :60-65)
and MFlow (:67-73) variants, and the MLE trainer loop with KDE metrics.
"""

import numpy as np
import pytest

from waveflow_tpu.benchmark.datasets import get_dataset
from waveflow_tpu.benchmark.density import (
    get_benchmark_model, train_density_model,
)


@pytest.mark.parametrize("name", ['gaussian_mixtures', 'halfmoon',
                                  'circles', 'double_circles'])
def test_datasets_shape_and_margin(name):
    X = get_dataset(name, n_samples=256, margin=0.025)
    assert X.shape == (256, 2)
    assert X.min() >= 0.025 - 1e-6 and X.max() <= 0.975 + 1e-6


@pytest.mark.parametrize("model_name", ['Flow', 'IFlow', 'MFlow'])
def test_benchmark_models_train(model_name):
    import jax
    X = get_dataset('circles', n_samples=256)
    params, log_pdf, sample, history = train_density_model(
        X, model_name=model_name, num_epochs=60, learning_rate=1e-3,
        spline_degree=4, n_knots=8, n_flow_layers=2, log_every=60,
        n_model_sample=400, n_mesh_points=300, verbose=False)
    losses = history['losses']
    assert len(losses) == 60
    assert np.isfinite(losses).all()
    # MLE loss must improve from initialization
    assert losses[-1] < losses[0]
    # metrics computed at the final checkpoint
    assert len(history['kl']) == 1 and np.isfinite(history['kl'][0])
    assert np.isfinite(history['reconstruction'][0])
    xs = np.asarray(sample(jax.random.PRNGKey(0), params, num_samples=128))
    assert xs.shape == (128, 2)
    if model_name != 'Flow':
        # box-supported models sample in the unit square; the affine Flow
        # with a Normal prior is unbounded (reference sets no prior_support
        # for it, benchmark_tests.py:54-58)
        assert xs.min() >= -1e-4 and xs.max() <= 1.0 + 1e-4


def test_best_checkpoint_tracking():
    """With X_test given, train_density_model records the held-out-best
    snapshot (best_test_ll / best_epoch / best_params) so long overfitting
    schedules can be early-stopped post hoc."""
    import jax
    import numpy as np
    from waveflow_tpu.benchmark import get_dataset
    from waveflow_tpu.benchmark.density import train_density_model
    from waveflow_tpu.benchmark.metrics import held_out_log_likelihood

    X = get_dataset('circles', n_samples=400, margin=0.025, seed=1)
    Xtr, Xte = X[:200], X[200:]
    params, log_pdf, sample, hist = train_density_model(
        Xtr, model_name='MFlow', num_epochs=60, learning_rate=1e-3,
        spline_reg=0.05, n_flow_layers=1, spline_degree=3, n_knots=8,
        log_every=20, verbose=False, X_test=Xte)
    assert np.isfinite(hist['best_test_ll'])
    assert 0 < hist['best_epoch'] <= 60
    assert 'best_params' in hist
    # best snapshot scores exactly its recorded LL
    ll = held_out_log_likelihood(log_pdf, jax.device_put(hist['best_params']),
                                 Xte)
    assert abs(ll - hist['best_test_ll']) < 1e-5

"""Utils: sliding stats, energy estimator, checkpointing, metrics."""

import numpy as np
import pytest

from waveflow_tpu.utils import (
    clipped_energy_estimate, load_state, save_state,
    uniform_sliding_average, uniform_sliding_stdev,
)


def test_sliding_average_constant():
    data = np.full(50, 3.0)
    out = uniform_sliding_average(data, 10)
    np.testing.assert_allclose(out, 3.0)
    assert out.shape == data.shape


def test_sliding_average_matches_bruteforce():
    rng = np.random.default_rng(0)
    data = rng.normal(size=200)
    w = 20
    out = uniform_sliding_average(data, w)
    for i in [30, 100, 199]:
        np.testing.assert_allclose(out[i], data[i - w + 1:i + 1].mean(),
                                   rtol=1e-10)


def test_sliding_stdev_shape():
    data = np.random.default_rng(1).normal(size=100)
    out = uniform_sliding_stdev(data, 10)
    assert out.shape == (100,)
    assert (out >= 0).all()


def test_clipped_energy_estimate():
    rng = np.random.default_rng(2)
    trace = rng.normal(-5.0, 1.0, size=10_000)
    trace[::100] = 1e6  # heavy-tail outliers
    mean, stderr = clipped_energy_estimate(trace, clip=100.0)
    assert abs(mean - (-5.0)) < 1.5  # clip keeps outliers bounded at 100
    assert stderr < 1.5


def test_save_load_state_roundtrip(tmp_path):
    import jax.numpy as jnp
    state = {'params': {'w': jnp.arange(4.0)}, 'epoch': 7}
    p = tmp_path / 'ckpt'
    save_state(p, state)
    loaded = load_state(p)
    assert loaded['epoch'] == 7
    np.testing.assert_array_equal(np.asarray(loaded['params']['w']),
                                  np.arange(4.0))
    assert load_state(tmp_path / 'missing') is None


def test_benchmark_datasets_in_unit_square():
    from waveflow_tpu.benchmark import get_dataset
    for name in ['gaussian_mixtures', 'halfmoon', 'circles']:
        X = get_dataset(name, n_samples=200)
        assert X.shape == (200, 2)
        assert X.min() >= 0.0 and X.max() <= 1.0


def test_figures_smoke(tmp_path):
    from waveflow_tpu.utils.figures import (
        plot_energy_trace, plot_pdf_grid, plot_wavefunction_2d,
    )
    plot_wavefunction_2d(np.random.rand(400), 5.0, str(tmp_path / 'w.png'))
    plot_pdf_grid(np.random.rand(30, 30), str(tmp_path / 'p.png'))
    plot_energy_trace(np.random.randn(500), str(tmp_path / 'e.png'))
    assert (tmp_path / 'w.png').exists()
    assert (tmp_path / 'p.png').exists()
    assert (tmp_path / 'e.png').exists()


def test_figures_multi_and_comparison(tmp_path):
    from waveflow_tpu.utils.figures import (
        plot_two_particle_box_comparison, plot_wavefunction_2d_multi,
        two_particle_box_analytic,
    )
    grid, x = two_particle_box_analytic(5.0, 60)
    # analytic oracle sanity: antisymmetric and zero on the diagonal
    np.testing.assert_allclose(grid, -grid.T, atol=1e-12)
    np.testing.assert_allclose(np.diag(grid), 0.0, atol=1e-12)
    plot_wavefunction_2d_multi({'a': grid.ravel(), 'b': -grid.ravel()},
                               5.0, str(tmp_path / 'multi.png'))
    plot_two_particle_box_comparison(grid.ravel(), 5.0,
                                     str(tmp_path / 'cmp.png'))
    assert (tmp_path / 'multi.png').exists()
    assert (tmp_path / 'cmp.png').exists()


def test_create_vmc_report(tmp_path):
    from waveflow_tpu.utils.figures import create_vmc_report
    d = tmp_path / 'run'
    (d / 'outputs' / 'wavefunctions_2d').mkdir(parents=True)
    (d / 'outputs' / 'density_1e').mkdir(parents=True)
    np.save(d / 'loss.npy', np.random.randn(500))
    np.save(d / 'outputs' / 'wavefunctions_2d' / 'values_epoch100.npy',
            np.random.randn(400))
    np.save(d / 'outputs' / 'density_1e' / 'random_values_epoch100.npy',
            np.random.randn(50))
    np.save(d / 'outputs' / 'density_1e' / 'random_coord_epoch100.npy',
            np.stack([np.linspace(-5, 5, 50), np.zeros(50)], -1))
    create_vmc_report(str(d), str(tmp_path / 'report.png'), 5.0)
    assert (tmp_path / 'report.png').exists()

"""Reference-API compatibility layer: original signatures keep working."""

import jax
import jax.numpy as jnp
import numpy as np

from waveflow_tpu import compat

RNG = jax.random.PRNGKey(8)


def test_ispline_fun_reference_signature():
    init_fun_i = compat.ISpline_fun()
    (params_i, apply_vec, apply_vec_grad, reverse_vec, knots, enforce,
     remove_bias) = init_fun_i(
        RNG, 5, 15, cardinal_splines=True, zero_border=False,
        reverse_fun_tol=1e-5, use_cached_bases=True, n_mesh_points=1000,
        constraints_dict_left={0: 0.0}, constraints_dict_right={0: 1.0})
    n = 64
    params = jnp.tile(params_i[None], (n, 1))
    params = remove_bias(params)
    params = enforce(params)
    xx = jnp.linspace(0.01, 0.99, n)
    ys = apply_vec(params, xx)
    assert ((ys >= -1e-5) & (ys <= 1 + 1e-5)).all()
    assert (np.diff(np.asarray(ys)) >= -1e-6).all()  # monotone
    grads = apply_vec_grad(params, xx)
    assert (np.asarray(grads) >= -1e-4).all()
    x_rec = reverse_vec(params, ys)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(xx), atol=1e-4)


def test_mspline_fun_reference_signature():
    init_fun_m = compat.MSpline_fun()
    (params_m, apply_vec, apply_vec_grad, sample_vec, knots, enforce,
     remove_bias) = init_fun_m(
        RNG, 4, 10, zero_border=False, n_mesh_points=800,
        constraints_dict_left={0: 0.0}, constraints_dict_right={0: 0.0})
    n = 32
    params = enforce(remove_bias(jnp.tile(params_m[None], (n, 1))))
    xx = jnp.linspace(0.01, 0.99, n)
    ys = apply_vec(params, xx)
    assert (np.asarray(ys) >= -1e-6).all()
    rngs = jax.random.split(RNG, n)
    s = sample_vec(rngs, params, 2)
    assert s.shape == (n, 2)
    assert ((np.asarray(s) >= 0) & (np.asarray(s) <= 1)).all()


def test_bspline_fun_reference_signature():
    init_fun_b = compat.BSpline_fun()
    (params_b, apply_vec, apply_vec_grad, sample_vec, knots,
     enforce) = init_fun_b(
        RNG, 5, 12, n_mesh_points=800,
        constraints_dict_left={0: 0.0}, constraints_dict_right={0: 0.0})
    n = 32
    params = enforce(jnp.tile(params_b[None], (n, 1)))
    xx = jnp.linspace(0.0, 1.0, n)
    ys = np.asarray(apply_vec(params, xx))
    # boundary condition: psi(0)=psi(1)=0
    assert abs(ys[0]) < 1e-4 and abs(ys[-1]) < 1e-4
    # unit square integral of the normalized amplitude
    fine = jnp.linspace(0, 1, 2000)
    params_f = enforce(jnp.tile(params_b[None], (2000, 1)))
    vals = np.asarray(apply_vec(params_f, fine))
    np.testing.assert_allclose(np.trapezoid(vals ** 2, dx=1 / 1999), 1.0,
                               rtol=2e-2)


def test_model_trainer_compat(tmp_path):
    trainer = compat.ModelTrainer(system_name='He', box_length=5,
                                  num_epochs=4, batch_size=16, log_every=100)
    trainer.num_knots = 8      # attribute pokes like the reference examples
    trainer.spline_degree = 4
    trainer.n_flow_layer = 1
    trainer.save_dir = str(tmp_path)
    losses = trainer.start_training()
    assert len(losses) == 4
    assert np.isfinite(losses).all()


def test_benchmark_compat_surface(tmp_path):
    """Reference benchmark_tests workflow through the compat shim:
    get_dataset -> get_model -> train_model, with the reference's artifact
    files written."""
    import numpy as np
    from waveflow_tpu import compat

    X = compat.get_dataset('circles', 200, 0.025)
    assert X.shape == (200, 2) and X.min() >= 0.0 and X.max() <= 1.0

    init_fun = compat.get_model('MFlow', 0.05, spline_degree=3, num_knots=8,
                                num_layers=1)
    import jax
    params, log_pdf, sample = init_fun(jax.random.PRNGKey(0), 2)
    lp = np.asarray(log_pdf(params, X[:16]))
    assert lp.shape == (16,) and np.isfinite(lp).all()

    out = tmp_path / 'bench'
    # reference-style call: positional (target, num_epochs, n_model_sample)
    # + reference kwarg names (benchmark_tests.py:87-90); the shim must bind
    # them identically and honor check_step / num_flow_layer (ADVICE r2)
    compat.train_model(X, 40, 500, model_type='MFlow',
                       dataset_name='circles', check_step=20,
                       spline_reg=0.05, num_flow_layer=1, spline_degree=3,
                       num_knots=8, save_dir=str(out))
    run_dir = out / 'circles' / 'MFlow_0.05_1_3_8'
    assert (run_dir / 'losses.txt').exists()
    assert (run_dir / 'kl_divergences.txt').exists()
    # ~40 epochs recorded => check_step was honored, not a 2000 default
    assert len((run_dir / 'losses.txt').read_text().split()) >= 40

    # unknown kwargs raise instead of silently training a default config
    import pytest
    with pytest.raises(TypeError):
        compat.train_model(X, 10, 100, bogus_option=3)

"""VMC end-to-end: estimator gradients, a short He-1d training run with
finite decreasing-ish loss, and checkpoint/resume determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveflow_tpu.vmc import VMCConfig, VMCTrainer, local_energy


def test_local_energy_custom_jvp_value_and_tangent():
    E = jnp.asarray([[2.0], [4.0]])
    psi = jnp.asarray([[1.0], [2.0]])
    base = jnp.asarray(0.5)
    e_loc = local_energy(E, psi, base)
    np.testing.assert_allclose(np.asarray(e_loc), [[2.0], [2.0]], rtol=1e-5)

    # tangent: 2 t_psi (E_L - b)/psi + (t_E psi - E t_psi)/psi^2
    tE = jnp.ones_like(E)
    tpsi = jnp.full_like(psi, 0.1)
    _, tangent = jax.jvp(local_energy, (E, psi, base), (tE, tpsi, jnp.zeros(())))
    eps = 1e-8
    expect = (2 * tpsi * (E / (psi + eps) - base) / psi
              + (tE * psi - E * tpsi) / psi ** 2)
    np.testing.assert_allclose(np.asarray(tangent), np.asarray(expect),
                               rtol=1e-5)


@pytest.fixture(scope="module")
def small_trainer(tmp_path_factory):
    save = tmp_path_factory.mktemp("vmc")
    cfg = VMCConfig(system_name='He', box_length=5.0, batch_size=32,
                    spline_degree=4, num_knots=8, n_flow_layers=1,
                    n_spline_base_mesh_points=400, log_every=1000,
                    learning_rate=1e-3, save_dir=str(save))
    return VMCTrainer(cfg)


def test_vmc_short_training_finite(small_trainer):
    losses = small_trainer.train(num_epochs=12, verbose=False)
    assert len(losses) == 12
    assert np.isfinite(losses).all(), losses


def test_vmc_checkpoint_resume(small_trainer, tmp_path):
    t = small_trainer
    t.save_checkpoint(str(tmp_path))
    params_before = jax.device_get(t.params)
    t.train(num_epochs=3, verbose=False)
    assert t.load_checkpoint(str(tmp_path))
    params_after = jax.device_get(t.params)
    for a, b in zip(jax.tree_util.tree_leaves(params_before),
                    jax.tree_util.tree_leaves(params_after)):
        np.testing.assert_array_equal(a, b)


def test_vmc_energy_descends_on_simple_system():
    """A slightly longer run on a small He config: the clipped mean local
    energy over the last third should be below the first third (training
    signal flows)."""
    cfg = VMCConfig(system_name='He', box_length=5.0, batch_size=64,
                    spline_degree=4, num_knots=8, n_flow_layers=1,
                    n_spline_base_mesh_points=400, log_every=10_000,
                    learning_rate=3e-3, save_dir='/tmp/vmc_descent_test')
    t = VMCTrainer(cfg)
    losses = np.asarray(t.train(num_epochs=120, verbose=False))
    losses = np.clip(losses, -100, 100)
    first = losses[:40].mean()
    last = losses[-40:].mean()
    assert last < first + 0.5, (first, last)


def test_vmc_three_fermions_free_box():
    """3 antisymmetric fermions (box3, interactions=False): the full
    sample/Laplacian/update stack runs at n=3 — exercising the generalized
    mean-coordinate BoxTransform reverse the reference lacks (made.py:188
    TODO) — and produces finite, descending clipped energies bounded below
    by the analytic free-fermion ground energy."""
    from waveflow_tpu.physics import exact_free_fermion_energy
    cfg = VMCConfig(system_name='box3', interactions=False, box_length=5.0,
                    batch_size=64, spline_degree=4, num_knots=8,
                    n_flow_layers=1, n_spline_base_mesh_points=400,
                    log_every=10_000, learning_rate=3e-3,
                    save_dir='/tmp/vmc_box3_test')
    t = VMCTrainer(cfg)
    assert t.n_particle == 3
    losses = np.asarray(t.train(num_epochs=60, verbose=False))
    assert np.isfinite(losses).all()
    e_exact = exact_free_fermion_energy(3, 5.0)
    # variational bound (statistical): late clipped energies sit above the
    # exact ground energy minus MC noise margin
    assert losses[-20:].mean() > e_exact - 0.5, (losses[-20:].mean(), e_exact)


def test_vmc_trainer_data_parallel():
    """Trainer with data_parallel=True shards walkers over the 8-device CPU
    mesh and trains with finite losses."""
    cfg = VMCConfig(system_name='He', box_length=5.0, batch_size=64,
                    spline_degree=4, num_knots=8, n_flow_layers=1,
                    n_spline_base_mesh_points=400, log_every=10_000,
                    window=10, data_parallel=True,
                    save_dir='/tmp/vmc_dp_test')
    t = VMCTrainer(cfg)
    assert t.mesh is not None and t.mesh.devices.size == 8
    losses = t.train(num_epochs=20, verbose=False)
    assert len(losses) == 20
    assert np.isfinite(losses).all()


def test_divergence_recovery_restores_good_state(small_trainer, monkeypatch):
    """Inject a NaN window and verify the trainer restores the last good
    snapshot and keeps training with finite losses."""
    import waveflow_tpu.vmc.trainer as trainer_mod
    t = small_trainer
    t.config.divergence_recovery = True
    t.config.window = 5
    # rebuild the window fn at the new window size
    from waveflow_tpu.vmc.estimators import make_train_window
    t.window_jit = jax.jit(make_train_window(
        t.psi, t.h_fn, t._sample, t.optimizer, t.config.batch_size, 5))

    calls = {'n': 0}
    real_window = t.window_jit

    def poisoned(params, opt_state, rng, baseline):
        p, o, r, b, losses = real_window(params, opt_state, rng, baseline)
        calls['n'] += 1
        if calls['n'] == 2:   # second window NaNs
            losses = losses.at[2].set(jnp.nan)
        return p, o, r, b, losses

    t.window_jit = poisoned
    losses = t.train(num_epochs=20, verbose=False)
    # the poisoned window's losses are dropped, others recorded & finite
    recorded = np.asarray(losses[-15:])
    assert np.isfinite(recorded).all()

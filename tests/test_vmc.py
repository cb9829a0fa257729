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


def test_vmc_metropolis_sampler_trains_and_checkpoints():
    """sampler='metropolis': warm-started MCMC walkers drive the VMC loop,
    persist across windows, stay in the sorted box sector, and round-trip
    through checkpoints (north-star VMC loop, BASELINE.json)."""
    cfg = VMCConfig(system_name='He', box_length=5.0, batch_size=64,
                    spline_degree=4, num_knots=8, n_flow_layers=1,
                    n_spline_base_mesh_points=400, log_every=10_000,
                    window=10, sampler='metropolis', mcmc_sweeps=5,
                    learning_rate=3e-3, save_dir='/tmp/vmc_mcmc_test')
    t = VMCTrainer(cfg)
    losses = np.asarray(t.train(num_epochs=40, verbose=False))
    assert losses.shape == (40,)
    assert np.isfinite(losses).all()
    assert t.mcmc_state is not None
    pos = np.asarray(t.mcmc_state.positions)
    assert pos.shape == (64, 2)
    assert (np.diff(pos, axis=-1) >= 0).all()          # sorted sector
    assert (np.abs(pos) <= 5.0).all()                  # in the box
    assert 0.05 < float(t.mcmc_state.accept_rate) < 0.95

    t.save_checkpoint('/tmp/vmc_mcmc_test_ckpt')
    t2 = VMCTrainer(cfg)
    assert t2.load_checkpoint('/tmp/vmc_mcmc_test_ckpt')
    np.testing.assert_array_equal(np.asarray(t2.mcmc_state.positions), pos)
    assert float(t2.mcmc_state.step_size) == float(t.mcmc_state.step_size)


def test_vmc_metropolis_data_parallel_collective_adaptation():
    """Metropolis VMC on the 8-device mesh: the pmean'd acceptance makes all
    devices adapt one collective step size; losses finite; walker keys are
    tracked on the trainer and checkpointed."""
    cfg = VMCConfig(system_name='He', box_length=5.0, batch_size=64,
                    spline_degree=4, num_knots=8, n_flow_layers=1,
                    n_spline_base_mesh_points=400, log_every=10_000,
                    window=10, sampler='metropolis', mcmc_sweeps=3,
                    data_parallel=True, learning_rate=3e-3,
                    save_dir='/tmp/vmc_mcmc_dp_test')
    t = VMCTrainer(cfg)
    assert t.mesh is not None and t.mesh.devices.size == 8
    losses = np.asarray(t.train(num_epochs=20, verbose=False))
    assert np.isfinite(losses).all()
    assert t.walker_keys is not None                   # RNG hygiene: keys live
    st = t.mcmc_state
    assert np.asarray(st.positions).shape == (64, 2)
    assert np.isfinite(float(st.step_size))
    t.save_checkpoint('/tmp/vmc_mcmc_dp_ckpt')
    t2 = VMCTrainer(cfg)
    assert t2.load_checkpoint('/tmp/vmc_mcmc_dp_ckpt')
    assert t2.walker_keys is not None
    np.testing.assert_array_equal(np.asarray(t2.walker_keys),
                                  np.asarray(t.walker_keys))


def test_vmc_mala_sampler_trains_and_checkpoints():
    """sampler='mala': gradient-informed Langevin proposals drive the VMC
    loop on the permutation-symmetrized density (full space, exact
    asymmetric-kernel correction); walkers persist, stay in the box, and
    the MALAState round-trips through checkpoints."""
    cfg = VMCConfig(system_name='He', box_length=5.0, batch_size=64,
                    spline_degree=4, num_knots=8, n_flow_layers=1,
                    n_spline_base_mesh_points=400, log_every=10_000,
                    window=10, sampler='mala', mcmc_sweeps=3,
                    learning_rate=3e-3, save_dir='/tmp/vmc_mala_test')
    t = VMCTrainer(cfg)
    losses = np.asarray(t.train(num_epochs=30, verbose=False))
    assert losses.shape == (30,)
    assert np.isfinite(losses).all()
    assert t.mcmc_state is not None
    pos = np.asarray(t.mcmc_state.positions)
    assert pos.shape == (64, 2)
    assert (np.abs(pos) <= 5.0).all()
    assert 0.05 < float(t.mcmc_state.accept_rate) < 0.99

    t.save_checkpoint('/tmp/vmc_mala_test_ckpt')
    t2 = VMCTrainer(cfg)
    assert t2.load_checkpoint('/tmp/vmc_mala_test_ckpt')
    from waveflow_tpu.vmc.mala import MALAState
    assert isinstance(t2.mcmc_state, MALAState)
    np.testing.assert_array_equal(np.asarray(t2.mcmc_state.positions), pos)
    np.testing.assert_array_equal(np.asarray(t2.mcmc_state.grad),
                                  np.asarray(t.mcmc_state.grad))


def test_vmc_metropolis_2d_single_electron():
    """The 'independent' coordinate map (single-electron, 2D) has no
    sorted-sector quotient, so Metropolis runs without the sort projection
    (round-2 review: the 1D-only restriction was unnecessary)."""
    cfg = VMCConfig(system_name='H', n_space_dimension=2, box_length=5.0,
                    batch_size=64, spline_degree=4, num_knots=8,
                    n_flow_layers=1, n_spline_base_mesh_points=400,
                    log_every=10_000, window=10, sampler='metropolis',
                    mcmc_sweeps=3, learning_rate=3e-3,
                    save_dir='/tmp/vmc_mcmc_2d_test')
    t = VMCTrainer(cfg)
    losses = np.asarray(t.train(num_epochs=20, verbose=False))
    assert np.isfinite(losses).all()
    pos = np.asarray(t.mcmc_state.positions)
    assert pos.shape == (64, 2)
    assert (np.abs(pos) <= 5.0).all()
    # NOT projected to the sorted sector: both orderings must occur
    d = np.diff(pos, axis=-1)
    assert (d > 0).any() and (d < 0).any()


def test_vmc_sr_with_metropolis_sampler():
    """optimizer='sr' x sampler='metropolis' (round-2 review: the mode
    matrix hole) — the SR update plugs into the MCMC window as its
    train_step."""
    cfg = VMCConfig(system_name='He', box_length=5.0, batch_size=64,
                    spline_degree=4, num_knots=8, n_flow_layers=1,
                    n_spline_base_mesh_points=400, log_every=10_000,
                    window=10, sampler='metropolis', mcmc_sweeps=3,
                    optimizer='sr', learning_rate=0.02, sr_cg_iters=5,
                    save_dir='/tmp/vmc_sr_mcmc_test')
    t = VMCTrainer(cfg)
    losses = np.asarray(t.train(num_epochs=20, verbose=False))
    assert np.isfinite(losses).all()
    assert t.mcmc_state is not None


def test_vmc_mala_data_parallel():
    """Sharded MALA window on the 8-device mesh: positions/log-probs/drift
    gradients walker-sharded, one collective step size."""
    cfg = VMCConfig(system_name='He', box_length=5.0, batch_size=64,
                    spline_degree=4, num_knots=8, n_flow_layers=1,
                    n_spline_base_mesh_points=400, log_every=10_000,
                    window=10, sampler='mala', mcmc_sweeps=2,
                    data_parallel=True, learning_rate=3e-3,
                    save_dir='/tmp/vmc_mala_dp_test')
    t = VMCTrainer(cfg)
    assert t.mesh is not None and t.mesh.devices.size == 8
    losses = np.asarray(t.train(num_epochs=20, verbose=False))
    assert np.isfinite(losses).all()
    st = t.mcmc_state
    assert np.asarray(st.positions).shape == (64, 2)
    assert np.isfinite(float(st.step_size))


def test_vmc_data_parallel_rng_advances_and_checkpoints():
    """Round-1 review: in mesh mode self.rng was never advanced and the
    per-device keys were not checkpointed — resume replayed the stream.
    Now the host rng advances when keys are created and keys round-trip."""
    cfg = VMCConfig(system_name='He', box_length=5.0, batch_size=64,
                    spline_degree=4, num_knots=8, n_flow_layers=1,
                    n_spline_base_mesh_points=400, log_every=10_000,
                    window=10, data_parallel=True,
                    save_dir='/tmp/vmc_dp_rng_test')
    t = VMCTrainer(cfg)
    rng_before = np.asarray(jax.device_get(t.rng)).copy()
    t.train(num_epochs=10, verbose=False)
    assert not np.array_equal(np.asarray(jax.device_get(t.rng)), rng_before)
    keys_after = np.asarray(jax.device_get(t.walker_keys)).copy()
    t.save_checkpoint('/tmp/vmc_dp_rng_ckpt')
    t2 = VMCTrainer(cfg)
    assert t2.load_checkpoint('/tmp/vmc_dp_rng_ckpt')
    np.testing.assert_array_equal(np.asarray(t2.walker_keys), keys_after)


def test_frozen_params_energy_evaluation():
    """The trace-independent evaluation protocol (vmc/evaluate.py): blocked
    Metropolis ⟨E_L⟩ at frozen params agrees with a direct ancestral-batch
    estimate within a few stderr, and the error bar is finite/positive."""
    from waveflow_tpu.vmc import evaluate_trainer
    from waveflow_tpu.vmc.estimators import _safe_psi

    cfg = VMCConfig(system_name='He', box_length=5.0, batch_size=64,
                    spline_degree=4, num_knots=8, n_flow_layers=1,
                    n_spline_base_mesh_points=400, log_every=10_000,
                    window=10, learning_rate=3e-3,
                    save_dir='/tmp/vmc_eval_test')
    t = VMCTrainer(cfg)
    t.train(num_epochs=30, verbose=False)

    ev = evaluate_trainer(t, n_blocks=16, sweeps_per_block=10,
                          n_warmup_sweeps=50, batch_size=512)
    assert np.isfinite(ev.e_mean) and ev.e_stderr > 0
    assert ev.block_means.shape == (16,)
    assert 0.05 < ev.accept_rate < 0.95

    # block-doubling validation: if sweeps_per_block decorrelates blocks,
    # the 2x/4x-merged stderr agrees with the base stderr.  The ratio's own
    # sampling noise at 8/4 merged blocks is wide, so the gate is the
    # sqrt(2)-ish band the VERDICT asked for (a systematic underestimate
    # from autocorrelation would push the ratio ABOVE it).
    assert np.isfinite(ev.e_stderr_2x) and np.isfinite(ev.e_stderr_4x)
    assert 0.4 < ev.e_stderr_2x / ev.e_stderr < np.sqrt(2.0)
    assert 0.3 < ev.e_stderr_4x / ev.e_stderr < 2.0

    # independent check: clipped mean over a large exact ancestral batch
    batch = t.sample_jit(jax.random.PRNGKey(11), t.params, 4096)
    e = np.asarray(t.h_fn(t.params, batch)[:, 0]
                   / _safe_psi(t.psi(t.params, batch)))
    center = np.median(e)
    mad = np.mean(np.abs(e - center))
    e_anc = float(np.clip(e, center - 5 * mad, center + 5 * mad).mean())
    assert abs(ev.e_clipped - e_anc) < max(6 * ev.e_clipped_stderr, 0.2), \
        (ev.e_clipped, e_anc, ev.e_clipped_stderr)


def test_sr_matrix_vector_product_matches_explicit():
    """The matrix-free S·v inside the SR step equals the explicit
    covariance of per-sample score vectors (tiny model, dense check)."""
    from jax.flatten_util import ravel_pytree

    def psi(params, x):
        return jnp.exp(-(params['a'] * x[:, 0] ** 2 +
                         params['b'] * x[:, 1] ** 2)) + params['c']

    params = {'a': jnp.asarray(0.5), 'b': jnp.asarray(0.3),
              'c': jnp.asarray(0.1)}
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 2))
    eps = 1e-8
    log_abs = lambda p, xx: jnp.log(jnp.abs(psi(p, xx)) + eps)

    # explicit O matrix (B, n_params)
    flat0, unravel = ravel_pytree(params)
    def log_abs_flat(theta, xx):
        return log_abs(unravel(theta), xx)
    O = jax.jacrev(log_abs_flat)(flat0, x)       # (B, 3)
    S = jnp.cov(O.T, bias=True)                  # covariance E[OO]-E[O]E[O]
    damping = 1e-3
    v = jnp.asarray([0.2, -1.0, 0.7])
    expect = S @ v + damping * v

    # matrix-free product, replicated from vmc/sr.py's s_mv
    B = x.shape[0]
    _, vjp_fn = jax.vjp(lambda p: log_abs(p, x), params)
    mean_vjp = lambda ct: vjp_fn(ct / B)[0]
    o_bar = mean_vjp(jnp.ones(B))
    v_tree = unravel(v)
    _, ov = jax.jvp(lambda p: log_abs(p, x), (params,), (v_tree,))
    first = mean_vjp(ov)
    obar_dot_v = sum(jnp.vdot(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(o_bar), jax.tree_util.tree_leaves(v_tree)))
    got_tree = jax.tree_util.tree_map(
        lambda f, ob, vv: f - ob * obar_dot_v + damping * vv,
        first, o_bar, v_tree)
    got, _ = ravel_pytree(got_tree)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-4, atol=1e-6)


def test_vmc_sr_optimizer_trains():
    """optimizer='sr' (stochastic reconfiguration): finite losses and a
    descending energy on the small He config."""
    cfg = VMCConfig(system_name='He', box_length=5.0, batch_size=64,
                    spline_degree=4, num_knots=8, n_flow_layers=1,
                    n_spline_base_mesh_points=400, log_every=10_000,
                    window=10, optimizer='sr', learning_rate=0.05,
                    sr_cg_iters=10, save_dir='/tmp/vmc_sr_test')
    t = VMCTrainer(cfg)
    losses = np.asarray(t.train(num_epochs=60, verbose=False))
    assert np.isfinite(losses).all()
    assert losses[-20:].mean() < losses[:20].mean() + 0.5


def test_vmc_2d_two_electron_paired2d_trains():
    """2D He (two fermions) end to end on the paired2d x-sorted sector —
    the frontier the round-2 review asked to open: finite losses, walkers
    in the sector, and the clipped tail energy above the ED oracle
    (results/oracle_2d_2e.json: He-2d L=5 = -1.2606) minus noise."""
    cfg = VMCConfig(system_name='He', n_space_dimension=2, box_length=5.0,
                    batch_size=64, spline_degree=4, num_knots=8,
                    n_flow_layers=1, n_spline_base_mesh_points=400,
                    log_every=10_000, window=10, learning_rate=3e-3,
                    save_dir='/tmp/vmc_he2d_test')
    t = VMCTrainer(cfg)
    assert t.input_dim == 4 and t.n_particle == 2
    losses = np.asarray(t.train(num_epochs=60, verbose=False))
    assert np.isfinite(losses).all()
    # walkers live in the x-sorted sector
    batch = np.asarray(t.sample_jit(jax.random.PRNGKey(5), t.params, 128))
    assert batch.shape == (128, 4)
    assert (batch[:, 0] <= batch[:, 2] + 1e-5).all()     # x1 <= x2
    assert (np.abs(batch) <= 5.0 + 1e-4).all()
    # variational: tail mean above the ED oracle (generous margin for the
    # tiny ansatz + short run; catches sign/normalization bugs)
    tail = np.clip(losses[-20:], -50, 50).mean()
    assert tail > -1.2606 - 0.05, tail

    # frozen-params evaluation on the paired2d sector: the chain must mix
    # (sector proposals re-sorted by x) and stay variational
    from waveflow_tpu.vmc import evaluate_trainer
    ev = evaluate_trainer(t, n_blocks=8, sweeps_per_block=5,
                          n_warmup_sweeps=20, batch_size=256)
    assert np.isfinite(ev.e_clipped) and ev.e_clipped_stderr > 0
    assert 0.05 < ev.accept_rate < 0.95


def test_vmc_2d_two_electron_metropolis_paired_sector():
    """Metropolis on the paired2d sector: proposals re-sorted by electron
    x-coordinate, walkers stay in the sector and the box."""
    cfg = VMCConfig(system_name='He', n_space_dimension=2, box_length=5.0,
                    batch_size=64, spline_degree=4, num_knots=8,
                    n_flow_layers=1, n_spline_base_mesh_points=400,
                    log_every=10_000, window=10, sampler='metropolis',
                    mcmc_sweeps=3, learning_rate=3e-3,
                    save_dir='/tmp/vmc_he2d_mcmc_test')
    t = VMCTrainer(cfg)
    losses = np.asarray(t.train(num_epochs=20, verbose=False))
    assert np.isfinite(losses).all()
    pos = np.asarray(t.mcmc_state.positions)
    assert pos.shape == (64, 4)
    assert (pos[:, 0] <= pos[:, 2] + 1e-6).all()
    assert (np.abs(pos) <= 5.0).all()


def test_minsr_update_matches_cg_sr():
    """SPRING with momentum=0 is min-SR, which is mathematically the same
    natural-gradient update as the CG path at exact convergence — provided
    the SPRING-only score-row clip is inactive (score_row_clip=None here;
    while active it regularizes batches with near-node walkers in a way the
    matrix-free CG path does not — see vmc/sr.py docstrings)."""
    from jax.flatten_util import ravel_pytree
    from waveflow_tpu.vmc.sr import make_spring_train_step, make_sr_train_step
    from waveflow_tpu.models import get_waveflow_model
    from waveflow_tpu.physics import construct_hamiltonian_function, \
        system_catalogue

    protons, n_particle = system_catalogue[1]['He']
    init = get_waveflow_model(n_particle, base_spline_degree=4,
                              i_spline_degree=4, n_prior_internal_knots=6,
                              n_i_internal_knots=6, i_spline_reg=0.1,
                              n_flow_layers=1, box_size=5.0,
                              xu_coord_type='mean',
                              n_spline_base_mesh_points=300)
    params, psi, log_pdf, sample = init(jax.random.PRNGKey(0), n_particle)
    h_fn = construct_hamiltonian_function(psi, protons=protons,
                                          n_space_dimensions=1, eps=0.0)
    batch = sample(jax.random.PRNGKey(1), params, 128)
    lr, damping = 0.05, 1e-2

    cg_step = make_sr_train_step(psi, h_fn, lr, damping=damping,
                                 cg_iters=400)
    spring_step = make_spring_train_step(psi, h_fn, lr, damping=damping,
                                         momentum=0.0, score_row_clip=None)
    p_cg, _, loss_cg = cg_step(params, (), batch, 0.0)
    p_ms, _, loss_ms = spring_step(params, spring_step.init_state(params),
                                   batch, 0.0)
    f_cg, _ = ravel_pytree(p_cg)
    f_ms, _ = ravel_pytree(p_ms)
    f_0, _ = ravel_pytree(params)
    # compare the UPDATES (deltas), relative to their norm
    d_cg = np.asarray(f_cg - f_0)
    d_ms = np.asarray(f_ms - f_0)
    denom = np.linalg.norm(d_cg)
    assert denom > 0
    assert np.linalg.norm(d_cg - d_ms) / denom < 5e-2, \
        np.linalg.norm(d_cg - d_ms) / denom
    np.testing.assert_allclose(float(loss_cg), float(loss_ms), rtol=1e-5)


def test_spring_row_clip_is_transient():
    """The cold-start score-row clip switches off after its warmup: past
    `score_row_clip_warmup` updates the SPRING step is bit-identical to the
    clip-free step (the converged-accuracy fix), while at step 0 on a batch
    with near-node walkers it differs (the cold-start fix)."""
    from jax.flatten_util import ravel_pytree
    from waveflow_tpu.vmc.sr import make_spring_train_step
    from waveflow_tpu.models import get_waveflow_model
    from waveflow_tpu.physics import construct_hamiltonian_function, \
        system_catalogue

    protons, n_particle = system_catalogue[1]['He']
    init = get_waveflow_model(n_particle, base_spline_degree=4,
                              i_spline_degree=4, n_prior_internal_knots=6,
                              n_i_internal_knots=6, i_spline_reg=0.1,
                              n_flow_layers=1, box_size=5.0,
                              xu_coord_type='mean',
                              n_spline_base_mesh_points=300)
    params, psi, log_pdf, sample = init(jax.random.PRNGKey(0), n_particle)
    h_fn = construct_hamiltonian_function(psi, protons=protons,
                                          n_space_dimensions=1, eps=0.0)
    batch = sample(jax.random.PRNGKey(1), params, 64)
    # a tight cap (1x median) guarantees rows trip it on any batch — the
    # mechanism under test is the warmup gate, not the cap level
    clipped = make_spring_train_step(psi, h_fn, 0.05, momentum=0.0,
                                     score_row_clip=1.0,
                                     score_row_clip_warmup=100)
    unclipped = make_spring_train_step(psi, h_fn, 0.05, momentum=0.0,
                                       score_row_clip=None)
    s0 = clipped.init_state(params)
    s_warm = dict(s0, step=jnp.asarray(100, jnp.int32))

    p_cold, st, _ = clipped(params, s0, batch, 0.0)
    p_warm, _, _ = clipped(params, s_warm, batch, 0.0)
    p_free, _, _ = unclipped(params, unclipped.init_state(params), batch, 0.0)
    f_cold, _ = ravel_pytree(p_cold)
    f_warm, _ = ravel_pytree(p_warm)
    f_free, _ = ravel_pytree(p_free)
    np.testing.assert_array_equal(np.asarray(f_warm), np.asarray(f_free))
    assert float(jnp.abs(f_cold - f_free).max()) > 0.0
    assert int(st['step']) == 1 and int(st['skipped']) == 0


def test_vmc_spring_optimizer_trains():
    """optimizer='spring' (min-SR + momentum): finite losses, descending
    energy, and the flat opt_state round-trips through checkpoints."""
    cfg = VMCConfig(system_name='He', box_length=5.0, batch_size=64,
                    spline_degree=4, num_knots=8, n_flow_layers=1,
                    n_spline_base_mesh_points=400, log_every=10_000,
                    window=10, optimizer='spring', learning_rate=0.02,
                    spring_momentum=0.9, save_dir='/tmp/vmc_spring_test')
    t = VMCTrainer(cfg)
    losses = np.asarray(t.train(num_epochs=60, verbose=False))
    assert np.isfinite(losses).all()
    assert losses[-20:].mean() < losses[:20].mean() + 0.5
    t.save_checkpoint('/tmp/vmc_spring_ckpt')
    t2 = VMCTrainer(cfg)
    assert t2.load_checkpoint('/tmp/vmc_spring_ckpt')
    np.testing.assert_array_equal(np.asarray(t2.opt_state['delta']),
                                  np.asarray(t.opt_state['delta']))
    assert int(t2.opt_state['step']) == int(t.opt_state['step']) == 60
    # the jittered-damping Cholesky retry must leave no fully-skipped steps
    # (before it, ~50% of this toy config's solves silently zeroed)
    assert int(t2.opt_state['skipped']) == 0


def test_vmc_spring_data_parallel_matches_single_device():
    """Sharded SPRING: the all-gathered global Gram solve makes the
    8-device update identical to single-device at the same global batch
    (same contract as the sharded CG-SR window)."""
    from waveflow_tpu.parallel import make_sharded_spring_window, \
        make_walker_mesh
    from waveflow_tpu.vmc.estimators import make_window_from_step
    from waveflow_tpu.vmc.sr import make_spring_train_step
    from waveflow_tpu.models import get_waveflow_model
    from waveflow_tpu.physics import construct_hamiltonian_function, \
        system_catalogue

    protons, n_particle = system_catalogue[1]['He']
    init = get_waveflow_model(n_particle, base_spline_degree=4,
                              i_spline_degree=4, n_prior_internal_knots=6,
                              n_i_internal_knots=6, i_spline_reg=0.1,
                              n_flow_layers=1, box_size=5.0,
                              xu_coord_type='mean',
                              n_spline_base_mesh_points=300)
    params, psi, log_pdf, sample = init(jax.random.PRNGKey(0), n_particle)
    h_fn = construct_hamiltonian_function(psi, protons=protons,
                                          n_space_dimensions=1, eps=0.0)
    mesh = make_walker_mesh()
    window = make_sharded_spring_window(psi, h_fn, sample, 0.02, 64, 5,
                                        mesh, damping=1e-2, momentum=0.9)
    from jax.flatten_util import ravel_pytree
    spring_step = make_spring_train_step(psi, h_fn, 0.02, damping=1e-2,
                                         momentum=0.9)
    keys = jax.random.split(jax.random.PRNGKey(3), mesh.devices.size)
    p, opt, keys, b, losses = window(params, spring_step.init_state(params),
                                     keys, jnp.zeros(()))
    assert int(opt['step']) == 5
    assert np.isfinite(np.asarray(losses)).all()
    f, _ = ravel_pytree(p)
    assert np.isfinite(np.asarray(f)).all()


def test_sharded_spring_step_matches_single_device():
    """The memory-lean sharded SPRING path (chunked-all_gather Gram +
    psum'd projection — the (B,P) score matrix is never materialized)
    computes the SAME update as the single-device step on the same global
    batch, up to reduction-order float noise."""
    from jax.flatten_util import ravel_pytree
    from jax.sharding import PartitionSpec as P
    from waveflow_tpu.parallel import WALKER_AXIS, make_walker_mesh
    from waveflow_tpu.vmc.sr import make_spring_train_step
    from waveflow_tpu.models import get_waveflow_model
    from waveflow_tpu.physics import construct_hamiltonian_function, \
        system_catalogue

    protons, n_particle = system_catalogue[1]['He']
    init = get_waveflow_model(n_particle, base_spline_degree=4,
                              i_spline_degree=4, n_prior_internal_knots=6,
                              n_i_internal_knots=6, i_spline_reg=0.1,
                              n_flow_layers=1, box_size=5.0,
                              xu_coord_type='mean',
                              n_spline_base_mesh_points=300)
    params, psi, log_pdf, sample = init(jax.random.PRNGKey(0), n_particle)
    h_fn = construct_hamiltonian_function(psi, protons=protons,
                                          n_space_dimensions=1, eps=0.0)
    batch = sample(jax.random.PRNGKey(1), params, 64)

    single = make_spring_train_step(psi, h_fn, 0.05, damping=1e-2,
                                    momentum=0.0)
    p1, _, loss1 = single(params, single.init_state(params), batch, 0.0)

    mesh = make_walker_mesh()
    sharded = make_spring_train_step(psi, h_fn, 0.05, damping=1e-2,
                                     momentum=0.0, pmean_axis=WALKER_AXIS)

    def local(params, opt_state, batch, baseline):
        return sharded(params, opt_state, batch, baseline)

    mapped = jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(WALKER_AXIS), P()),
        out_specs=(P(), P(), P()),
        check_vma=False))
    p2, _, loss2 = mapped(params, sharded.init_state(params), batch,
                          jnp.zeros(()))

    f1, _ = ravel_pytree(p1)
    f2, _ = ravel_pytree(p2)
    f0, _ = ravel_pytree(params)
    d1, d2 = np.asarray(f1 - f0), np.asarray(f2 - f0)
    denom = np.linalg.norm(d1)
    assert denom > 0
    assert np.linalg.norm(d1 - d2) / denom < 1e-3
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)


def test_vmc_2d_hydrogen_trains_toward_oracle():
    """n_space_dimension=2 end to end: the trainer switches to the
    'independent' coordinate map (no sorted-gap structure for a single
    electron in 2D), the Euclidean soft-Coulomb potential engages, and the
    clipped energy descends while staying above the grid-ED oracle
    (exact_ground_state_2d_1e: -0.4303 at L=5).  The reference lists 2D
    systems in its catalogue but could never run them (physics.py:62)."""
    cfg = VMCConfig(system_name='H', n_space_dimension=2, box_length=5.0,
                    batch_size=64, spline_degree=4, num_knots=8,
                    n_flow_layers=1, n_spline_base_mesh_points=400,
                    log_every=10_000, learning_rate=3e-3,
                    save_dir='/tmp/vmc_h2d_test')
    t = VMCTrainer(cfg)
    assert t.input_dim == 2 and t.n_particle == 1
    losses = np.asarray(t.train(num_epochs=120, verbose=False))
    assert np.isfinite(losses).all()
    losses = np.clip(losses, -100, 100)
    assert losses[-40:].mean() < losses[:40].mean() + 0.5
    # variational bound (statistical margin for MC noise)
    assert losses[-40:].mean() > -0.4303 - 0.5


# (the former test_vmc_2d_two_electron_raises is obsolete: 2D
# multi-electron systems now train on the paired2d sector — see
# test_vmc_2d_two_electron_paired2d_trains)


def test_mcmc_refresh_auto_for_three_fermions():
    """mcmc_refresh_every='auto' resolves to one refresh per window for
    >= 3-electron Metropolis training (the Li gate) and runs finitely;
    the 2-electron flagship stays refresh-free (bitwise r4 behavior)."""
    import numpy as np
    from waveflow_tpu.vmc import VMCConfig, VMCTrainer
    cfg = VMCConfig(system_name='box3', box_length=5.0, interactions=False,
                    sampler='metropolis', batch_size=32, window=4,
                    num_epochs=12, log_every=12, num_knots=8,
                    n_flow_layers=1, spline_degree=4,
                    n_spline_base_mesh_points=400,
                    save_dir='/tmp/test_refresh_auto',
                    compilation_cache_dir=None)
    assert cfg.mcmc_refresh_every == 'auto'
    t = VMCTrainer(cfg)
    losses = t.train(num_epochs=12, verbose=False)
    assert np.isfinite(np.asarray(losses)).all()
    assert len(losses) == 12


def test_clip_ladder_extrapolation():
    """The multi-scale clip ladder: on a light-tailed model the ladder
    means converge monotonically toward the raw mean and the 1/scale
    extrapolation agrees with it within error."""
    import jax
    import numpy as np
    from waveflow_tpu.models import get_waveflow_model
    from waveflow_tpu.physics import (construct_hamiltonian_function,
                                      system_catalogue)
    from waveflow_tpu.vmc.evaluate import evaluate_energy

    protons, n_particle = system_catalogue[1]['He']
    init = get_waveflow_model(n_particle, base_spline_degree=4,
                              i_spline_degree=4, n_prior_internal_knots=8,
                              n_i_internal_knots=8, i_spline_reg=0.1,
                              n_flow_layers=1, box_size=5.0,
                              xu_coord_type='mean',
                              n_spline_base_mesh_points=300)
    params, psi, log_pdf, sample = init(jax.random.PRNGKey(0), n_particle)
    h_fn = construct_hamiltonian_function(psi, protons=protons,
                                          n_space_dimensions=1, eps=0.0)
    pos = sample(jax.random.PRNGKey(1), params, 256)
    ev = evaluate_energy(psi, h_fn, log_pdf, params, 5.0, pos,
                         jax.random.PRNGKey(2), n_blocks=16,
                         sweeps_per_block=5, n_warmup_sweeps=20,
                         clip_ladder=True)
    assert len(ev.clip_ladder_scales) == 4
    assert ev.clip_ladder_scales[0] == 5.0
    assert np.isfinite(ev.e_clip_extrapolated)
    # ladder converges to the raw mean; extrapolation within a few stderr
    assert abs(ev.clip_ladder_means[-1] - ev.e_mean) <= \
        abs(ev.clip_ladder_means[0] - ev.e_mean) + 1e-6
    assert abs(ev.e_clip_extrapolated - ev.e_mean) < \
        5 * max(ev.e_stderr, ev.e_clip_extrapolated_stderr, 1e-4)

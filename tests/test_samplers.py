"""MCMC drivers: Metropolis / HMC / SMC sample known densities correctly."""

import jax
import jax.numpy as jnp
import numpy as np

from waveflow_tpu.vmc.hmc import make_hmc_sampler, make_parameter_posterior
from waveflow_tpu.vmc.metropolis import make_metropolis_sampler
from waveflow_tpu.vmc.smc import make_smc_sampler


def test_metropolis_standard_normal():
    log_pdf = lambda params, x: -0.5 * (x ** 2).sum(-1)
    init_fn, step_fn, run_fn = make_metropolis_sampler(log_pdf)
    B, D = 256, 2
    pos = jax.random.normal(jax.random.PRNGKey(0), (B, D)) * 0.1
    state = init_fn(None, pos, step_size=0.5)
    state, trace = jax.jit(run_fn, static_argnums=(3, 4))(
        None, state, jax.random.PRNGKey(1), 600, 2)
    # discard burn-in, pool samples
    samples = np.asarray(trace[100:]).reshape(-1, D)
    assert abs(samples.mean()) < 0.05
    assert abs(samples.std() - 1.0) < 0.05
    assert 0.2 < float(state.accept_rate) < 0.8


def test_metropolis_step_size_adapts():
    log_pdf = lambda params, x: -0.5 * (x ** 2).sum(-1)
    init_fn, step_fn, run_fn = make_metropolis_sampler(log_pdf,
                                                       target_accept=0.5)
    pos = jax.random.normal(jax.random.PRNGKey(0), (128, 2))
    state = init_fn(None, pos, step_size=20.0)  # absurdly large
    state, _ = run_fn(None, state, jax.random.PRNGKey(1), 300)
    assert float(state.step_size) < 10.0  # adapted down
    assert 0.3 < float(state.accept_rate) < 0.7


def test_sampler_init_state_avals_match_stepped_state():
    """init_fn's state must have the SAME avals (shape/dtype/weak_type) as
    the state step_fn returns — a weak-typed scalar in the init state makes
    the second call of any jitted window carrying the state silently
    retrace (a ~2-min remote recompile on the chip; caught by the r3
    mcmc_scale study, where it masqueraded as a 20x throughput loss)."""
    from waveflow_tpu.vmc.mala import make_mala_sampler

    log_pdf = lambda params, x: -0.5 * (x ** 2).sum(-1)
    pos = jax.random.normal(jax.random.PRNGKey(0), (64, 2))

    typeof = getattr(jax, 'typeof', jax.core.get_aval)

    def avals(tree):
        return [(jnp.shape(l), jnp.result_type(l),
                 getattr(typeof(l), 'weak_type', False))
                for l in jax.tree_util.tree_leaves(tree)]

    init_fn, step_fn, _ = make_metropolis_sampler(log_pdf)
    st = init_fn(None, pos, step_size=0.5)
    st2 = step_fn(None, st, jax.random.PRNGKey(1))
    assert avals(st) == avals(st2)

    init_fn, step_fn, _ = make_mala_sampler(log_pdf)
    st = init_fn(None, pos, step_size=0.5)
    st2 = step_fn(None, st, jax.random.PRNGKey(1))
    assert avals(st) == avals(st2)


def test_metropolis_bounds_respected():
    log_pdf = lambda params, x: jnp.zeros(x.shape[0])  # uniform
    init_fn, _, run_fn = make_metropolis_sampler(log_pdf, bounds=(-1.0, 1.0))
    pos = jnp.zeros((64, 2))
    state = init_fn(None, pos, step_size=0.5)
    state, trace = run_fn(None, state, jax.random.PRNGKey(2), 200)
    assert (np.abs(np.asarray(trace)) <= 1.0).all()


def test_hmc_standard_normal():
    log_prob = lambda x: -0.5 * (x ** 2).sum(-1)
    init_fn, step_fn, run_fn = make_hmc_sampler(log_prob, n_leapfrog=8)
    B, D = 128, 3
    pos = jax.random.normal(jax.random.PRNGKey(0), (B, D)) * 0.1
    state = init_fn(pos, step_size=0.2)
    state, trace = run_fn(state, jax.random.PRNGKey(1), 400, n_warmup=200)
    samples = np.asarray(trace[100:]).reshape(-1, D)
    assert abs(samples.mean()) < 0.05
    assert abs(samples.std() - 1.0) < 0.07


def test_hmc_anisotropic_gaussian_covariance():
    scales = jnp.asarray([0.5, 2.0])
    log_prob = lambda x: -0.5 * ((x / scales) ** 2).sum(-1)
    init_fn, _, run_fn = make_hmc_sampler(log_prob, n_leapfrog=16)
    pos = jax.random.normal(jax.random.PRNGKey(0), (128, 2)) * 0.1
    state = init_fn(pos, step_size=0.1)
    state, trace = run_fn(state, jax.random.PRNGKey(1), 500, n_warmup=300)
    samples = np.asarray(trace[150:]).reshape(-1, 2)
    np.testing.assert_allclose(samples.std(0), np.asarray(scales), rtol=0.12)


def test_hmc_warmup_anchor_follows_init_step_size():
    """Dual-averaging anchors mu = log(10·eps0) from the *caller's* step
    size (Hoffman & Gelman Alg. 6): warmup started at eps0=1.0 and at
    eps0=0.1 must converge to the same adapted step (VERDICT r2 item 7 —
    a hard-coded anchor drags every warmup toward the eps0=0.1 answer)."""
    log_prob = lambda x: -0.5 * (x ** 2).sum(-1)
    init_fn, _, run_fn = make_hmc_sampler(log_prob, n_leapfrog=8)
    pos = jax.random.normal(jax.random.PRNGKey(0), (128, 3)) * 0.1
    adapted = []
    for eps0 in (0.1, 1.0):
        state = init_fn(pos, step_size=eps0)
        assert abs(float(state.mu) - np.log(10.0 * eps0)) < 1e-6
        state, _ = run_fn(state, jax.random.PRNGKey(1), 1, n_warmup=400)
        adapted.append(float(state.step_size))
    ratio = adapted[1] / adapted[0]
    assert 0.5 < ratio < 2.0, adapted


def test_nuts_warmup_anchor_follows_init_step_size():
    from waveflow_tpu.vmc.nuts import make_nuts_sampler
    log_prob = lambda x: -0.5 * (x ** 2).sum(-1)
    init_fn, _, run_fn = make_nuts_sampler(log_prob, max_tree_depth=5)
    pos = jax.random.normal(jax.random.PRNGKey(0), (64, 2)) * 0.1
    adapted = []
    for eps0 in (0.1, 1.0):
        state = init_fn(pos, step_size=eps0)
        assert abs(float(state.mu) - np.log(10.0 * eps0)) < 1e-6
        state, _ = run_fn(state, jax.random.PRNGKey(1), 1, n_warmup=200)
        adapted.append(float(state.step_size))
    ratio = adapted[1] / adapted[0]
    assert 0.5 < ratio < 2.0, adapted


def test_smc_bimodal_target():
    """Prior N(0, 3²); likelihood pushes mass to two modes at ±2."""
    log_prior = lambda x: -0.5 * (x ** 2).sum(-1) / 9.0
    log_like = lambda x: jnp.logaddexp(
        -0.5 * ((x - 2.0) ** 2).sum(-1) / 0.1,
        -0.5 * ((x + 2.0) ** 2).sum(-1) / 0.1)
    init_fn, run_fn = make_smc_sampler(log_prior, log_like, n_temps=30,
                                       n_mcmc_moves=8, mcmc_step_size=0.3)
    particles = jax.random.normal(jax.random.PRNGKey(0), (512, 1)) * 3
    state = init_fn(particles)
    state, ess_trace = jax.jit(run_fn)(state, jax.random.PRNGKey(1))
    samples = np.asarray(state.particles).ravel()
    # both modes populated
    frac_pos = (samples > 0).mean()
    assert 0.25 < frac_pos < 0.75, frac_pos
    # concentrated near ±2
    assert np.abs(np.abs(samples) - 2.0).mean() < 0.5


def test_parameter_posterior_wrapper():
    """HMC over the parameters of a tiny Gaussian 'flow': posterior mean of
    a location parameter given data should approach the sample mean."""
    data = jax.random.normal(jax.random.PRNGKey(0), (200, 1)) + 1.5
    template = {'mu': jnp.zeros(())}

    def log_pdf(params, x):
        return -0.5 * ((x[:, 0] - params['mu']) ** 2)

    log_prob, unravel, flat0 = make_parameter_posterior(
        log_pdf, data, template, prior_scale=10.0)
    init_fn, _, run_fn = make_hmc_sampler(log_prob, n_leapfrog=8)
    chains = flat0[None] + jax.random.normal(jax.random.PRNGKey(1), (16, 1))
    state = init_fn(chains, step_size=0.05)
    state, trace = run_fn(state, jax.random.PRNGKey(2), 300, n_warmup=200)
    post_mean = float(np.asarray(trace[100:]).mean())
    assert abs(post_mean - float(data.mean())) < 0.1


# --- MCMC drivers against the real Waveflow model (not toy Gaussians) ------

import pytest


@pytest.fixture(scope="module")
def tiny_waveflow():
    from waveflow_tpu.models import get_waveflow_model
    init = get_waveflow_model(2, base_spline_degree=4, i_spline_degree=4,
                              n_prior_internal_knots=8, n_i_internal_knots=8,
                              i_spline_reg=0.1, n_flow_layers=1, box_size=5.0,
                              xu_coord_type='mean',
                              n_spline_base_mesh_points=400)
    return init(jax.random.PRNGKey(0), 2)


def test_metropolis_stationary_on_waveflow(tiny_waveflow):
    """Stationarity of the Metropolis kernel on the model's own log_pdf
    (sorted-sector quotient): warm-start walkers at exact ancestral draws —
    the production VMC mode — and run many sweeps; if the kernel's
    stationary law were not |ψ_A|², the pooled moments would drift away
    from the ancestral ones.  (A cold uniform start is impractical here:
    the untrained squared-spline density has nodal barriers that RWM
    crosses slowly.)"""
    params, psi, log_pdf, sample = tiny_waveflow
    anc = np.asarray(sample(jax.random.PRNGKey(1), params, 4096))

    init_fn, _, run_fn = make_metropolis_sampler(
        log_pdf, bounds=(-5.0, 5.0),
        proposal_map=lambda x: jnp.sort(x, axis=-1))
    pos = jnp.asarray(anc[:512])
    state = init_fn(params, pos, step_size=1.0)
    state, trace = jax.jit(run_fn, static_argnums=(3, 4))(
        params, state, jax.random.PRNGKey(3), 400, 1)
    mc = np.asarray(trace[200:]).reshape(-1, 2)

    np.testing.assert_allclose(mc.mean(0), anc.mean(0), atol=0.2)
    np.testing.assert_allclose(mc.std(0), anc.std(0), atol=0.2)
    assert 0.15 < float(state.accept_rate) < 0.9


def test_hmc_stationary_on_waveflow(tiny_waveflow):
    """HMC reusing the flow's log-prob kernel (gradients through the whole
    bijection stack): warm-started chains stay in the ancestral law."""
    params, psi, log_pdf, sample = tiny_waveflow
    anc = np.asarray(sample(jax.random.PRNGKey(1), params, 4096))

    # keep HMC in the sorted open box: the sorted-sector density extended
    # symmetrically is |psi_A|^2, so sampling x unsorted and sorting after
    # is exact for moment checks of the sorted representative
    def log_prob(x):
        xs = jnp.sort(jnp.clip(x, -4.999, 4.999), axis=-1)
        return log_pdf(params, xs)

    init_fn, _, run_fn = make_hmc_sampler(log_prob, n_leapfrog=8)
    pos = jnp.asarray(anc[:256])
    state = init_fn(pos, step_size=0.3)
    state, trace = run_fn(state, jax.random.PRNGKey(3), 300, n_warmup=150)
    mc = np.sort(np.clip(np.asarray(trace[100:]).reshape(-1, 2), -5, 5), -1)

    np.testing.assert_allclose(mc.mean(0), anc.mean(0), atol=0.25)
    np.testing.assert_allclose(mc.std(0), anc.std(0), atol=0.25)


# --- NUTS (dynamic trajectory length, vmc/nuts.py) --------------------------

def test_nuts_standard_normal():
    from waveflow_tpu.vmc.nuts import make_nuts_sampler
    log_prob = lambda x: -0.5 * (x ** 2).sum(-1)
    init_fn, _, run_fn = make_nuts_sampler(log_prob, max_tree_depth=6)
    pos = jax.random.normal(jax.random.PRNGKey(0), (64, 3)) * 0.1
    state = init_fn(pos, step_size=0.2)
    state, trace = jax.jit(run_fn, static_argnums=(2, 3))(
        state, jax.random.PRNGKey(1), 300, 100)
    s = np.asarray(trace[100:]).reshape(-1, 3)
    assert abs(s.mean()) < 0.05
    assert abs(s.std() - 1.0) < 0.05


def test_nuts_anisotropic_adapts_trajectory():
    """Scale ratio 10: fixed-length HMC with a single step size struggles;
    NUTS adapts trajectory length per draw and recovers both scales."""
    from waveflow_tpu.vmc.nuts import make_nuts_sampler
    scales = jnp.asarray([0.3, 3.0])
    log_prob = lambda x: -0.5 * ((x / scales) ** 2).sum(-1)
    init_fn, _, run_fn = make_nuts_sampler(log_prob, max_tree_depth=7)
    pos = jax.random.normal(jax.random.PRNGKey(2), (64, 2)) * 0.1
    state = init_fn(pos, step_size=0.1)
    state, trace = jax.jit(run_fn, static_argnums=(2, 3))(
        state, jax.random.PRNGKey(3), 400, 150)
    s = np.asarray(trace[100:]).reshape(-1, 2)
    np.testing.assert_allclose(s.std(0), np.asarray(scales), rtol=0.15)
    assert np.isfinite(float(state.step_size))


def test_nuts_parameter_posterior():
    """NUTS over flow parameters via make_parameter_posterior — the
    BASELINE.json configs[4] composition with dynamic trajectories."""
    from waveflow_tpu.vmc.nuts import make_nuts_sampler
    data = jax.random.normal(jax.random.PRNGKey(0), (200, 1)) + 1.5
    template = {'mu': jnp.zeros(())}

    def log_pdf(params, x):
        return -0.5 * ((x[:, 0] - params['mu']) ** 2)

    log_prob, unravel, flat0 = make_parameter_posterior(
        log_pdf, data, template, prior_scale=10.0)
    init_fn, _, run_fn = make_nuts_sampler(log_prob, max_tree_depth=5)
    chains = flat0[None] + jax.random.normal(jax.random.PRNGKey(1), (16, 1))
    state = init_fn(chains, step_size=0.05)
    state, trace = run_fn(state, jax.random.PRNGKey(2), 200, n_warmup=100)
    post_mean = float(np.asarray(trace[50:]).mean())
    assert abs(post_mean - float(data.mean())) < 0.1


# --- MALA (gradient-informed Langevin proposals, vmc/mala.py) --------------

from waveflow_tpu.vmc.mala import make_mala_sampler


def test_mala_standard_normal():
    log_pdf = lambda params, x: -0.5 * (x ** 2).sum(-1)
    init_fn, step_fn, run_fn = make_mala_sampler(log_pdf)
    B, D = 256, 2
    pos = jax.random.normal(jax.random.PRNGKey(0), (B, D)) * 0.1
    state = init_fn(None, pos, step_size=0.5)
    state, trace = jax.jit(run_fn, static_argnums=(3, 4))(
        None, state, jax.random.PRNGKey(1), 600, 2)
    samples = np.asarray(trace[100:]).reshape(-1, D)
    assert abs(samples.mean()) < 0.05
    assert abs(samples.std() - 1.0) < 0.05
    # adapted toward the MALA-optimal acceptance
    assert 0.35 < float(state.accept_rate) < 0.8


def test_mala_anisotropic_covariance():
    cov_diag = jnp.asarray([4.0, 0.25])
    log_pdf = lambda params, x: -0.5 * (x ** 2 / cov_diag).sum(-1)
    init_fn, _, run_fn = make_mala_sampler(log_pdf)
    pos = jax.random.normal(jax.random.PRNGKey(0), (512, 2)) * 0.1
    state = init_fn(None, pos, step_size=0.3)
    state, trace = jax.jit(run_fn, static_argnums=(3, 4))(
        None, state, jax.random.PRNGKey(1), 1500, 4)
    samples = np.asarray(trace[150:]).reshape(-1, 2)
    np.testing.assert_allclose(samples.var(0), np.asarray(cov_diag),
                               rtol=0.15)


def test_mala_asymmetric_correction_matters():
    """With the q(x|x')/q(x'|x) correction removed, MALA on a skewed
    density is *biased* — verify our kernel's moments beat the uncorrected
    variant on a density with strong drift asymmetry (exponential-like)."""
    # smooth asymmetric density: log p = -x - exp(-x) (Gumbel), mean ~ 0.577
    log_pdf = lambda params, x: (-x - jnp.exp(-x)).sum(-1)
    init_fn, _, run_fn = make_mala_sampler(log_pdf)
    pos = jnp.zeros((512, 1))
    state = init_fn(None, pos, step_size=0.5)
    # adaptive warmup, then recorded samples from the FROZEN kernel
    state, trace = jax.jit(run_fn, static_argnums=(3, 4, 5))(
        None, state, jax.random.PRNGKey(1), 1200, 4, 100)
    samples = np.asarray(trace[25:]).ravel()
    assert abs(samples.mean() - 0.5772) < 0.05
    assert abs(samples.var() - np.pi ** 2 / 6) < 0.15


def test_mala_stationary_on_waveflow_2d():
    """MALA reusing the model's own log_pdf and gradient on the 2D
    'independent'-coordinate Waveflow (no sorted-sector quotient, so the
    Langevin drift needs no symmetrization): warm-start at ancestral draws
    and verify the pooled chain moments stay at the ancestral ones."""
    from waveflow_tpu.models import get_waveflow_model
    init = get_waveflow_model(2, base_spline_degree=4, i_spline_degree=4,
                              n_prior_internal_knots=8, n_i_internal_knots=8,
                              i_spline_reg=0.1, n_flow_layers=1, box_size=5.0,
                              xu_coord_type='independent',
                              n_spline_base_mesh_points=400)
    params, psi, log_pdf, sample = init(jax.random.PRNGKey(0), 2)
    anc = np.asarray(sample(jax.random.PRNGKey(1), params, 4096))

    init_fn, _, run_fn = make_mala_sampler(log_pdf, bounds=(-5.0, 5.0))
    state = init_fn(params, jnp.asarray(anc[:512]), step_size=0.8)
    state, trace = jax.jit(run_fn, static_argnums=(3, 4, 5))(
        params, state, jax.random.PRNGKey(3), 400, 1, 100)
    mc = np.asarray(trace[100:]).reshape(-1, 2)
    np.testing.assert_allclose(mc.mean(0), anc.mean(0), atol=0.2)
    np.testing.assert_allclose(mc.std(0), anc.std(0), atol=0.2)
    assert 0.2 < float(state.accept_rate) < 0.95


def test_nuts_stationary_on_waveflow_2d():
    """NUTS over walker configurations of the 2D 'independent' Waveflow
    (gradients of log|psi|^2 through the whole flow, dynamic trajectory
    lengths): warm-start at ancestral draws, verify pooled chain moments
    match the ancestral ones."""
    from waveflow_tpu.vmc.nuts import make_nuts_sampler
    from waveflow_tpu.models import get_waveflow_model
    init = get_waveflow_model(2, base_spline_degree=4, i_spline_degree=4,
                              n_prior_internal_knots=8, n_i_internal_knots=8,
                              i_spline_reg=0.1, n_flow_layers=1, box_size=5.0,
                              xu_coord_type='independent',
                              n_spline_base_mesh_points=400)
    params, psi, log_pdf, sample = init(jax.random.PRNGKey(0), 2)
    anc = np.asarray(sample(jax.random.PRNGKey(1), params, 4096))

    # clip u-space overshoot: the evaluators extrapolate edge cells, so the
    # density is defined (and finite) slightly outside the box; bound via a
    # steep quadratic wall to keep leapfrog trajectories inside
    def log_prob(x):
        wall = 1e3 * (jnp.maximum(jnp.abs(x) - 5.0, 0.0) ** 2).sum(-1)
        return log_pdf(params, x) - wall

    init_fn, _, run_fn = make_nuts_sampler(log_prob, max_tree_depth=5)
    state = init_fn(jnp.asarray(anc[:256]), step_size=0.3)
    state, trace = jax.jit(run_fn, static_argnums=(2, 3))(
        state, jax.random.PRNGKey(3), 200, 80)
    mc = np.asarray(trace[60:]).reshape(-1, 2)
    np.testing.assert_allclose(mc.mean(0), anc.mean(0), atol=0.25)
    np.testing.assert_allclose(mc.std(0), anc.std(0), atol=0.25)

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

"""Sharded probprog drivers on the 8-device CPU mesh (VERDICT r4 item 6):
HMC/NUTS chains and SMC particles over the walker mesh, with collective
dual-averaging / ESS / resampling."""

import jax
import jax.numpy as jnp
import numpy as np

from waveflow_tpu.parallel import (make_sharded_chain_sampler,
                                   make_sharded_smc, make_walker_mesh)
from waveflow_tpu.vmc.hmc import make_hmc_sampler, make_parameter_posterior
from waveflow_tpu.vmc.nuts import make_nuts_sampler
from waveflow_tpu.vmc.smc import make_smc_sampler


def _gauss_lp(x):
    return -0.5 * (x ** 2).sum(-1)


def test_sharded_hmc_gaussian_moments():
    mesh = make_walker_mesh()
    assert mesh.devices.size == 8
    init, make_run = make_sharded_chain_sampler(
        make_hmc_sampler, _gauss_lp, mesh, n_leapfrog=8)
    pos = jax.random.normal(jax.random.PRNGKey(0), (64, 3)) * 0.1
    state = init(pos, step_size=0.2)
    run = make_run(n_steps=300, n_warmup=200)
    state, trace = run(state, jax.random.PRNGKey(1))
    trace = np.asarray(trace)                      # (300, 64, 3)
    assert trace.shape == (300, 64, 3)
    samples = trace[100:].reshape(-1, 3)
    np.testing.assert_allclose(samples.mean(0), 0.0, atol=0.12)
    np.testing.assert_allclose(samples.std(0), 1.0, atol=0.12)
    # the collective step size is replicated and was adapted away from init
    eps = np.asarray(state.step_size)
    assert np.isfinite(eps) and eps > 0 and abs(eps - 0.2) > 1e-4


def test_sharded_nuts_gaussian_moments():
    mesh = make_walker_mesh()
    init, make_run = make_sharded_chain_sampler(
        make_nuts_sampler, _gauss_lp, mesh, max_tree_depth=5)
    pos = jax.random.normal(jax.random.PRNGKey(2), (32, 2)) * 0.1
    state = init(pos, step_size=0.3)
    run = make_run(n_steps=200, n_warmup=100)
    state, trace = run(state, jax.random.PRNGKey(3))
    samples = np.asarray(trace)[50:].reshape(-1, 2)
    np.testing.assert_allclose(samples.mean(0), 0.0, atol=0.15)
    np.testing.assert_allclose(samples.std(0), 1.0, atol=0.15)


def test_sharded_smc_matches_single_device_moments():
    """Tempered SMC from N(0,3²) prior to a N(2,0.5²)-likelihood target,
    sharded over the mesh with the cross-device resampling collective;
    posterior moments must match the single-device sampler."""
    def log_prior(x):
        return -0.5 * (x ** 2).sum(-1) / 9.0

    def log_like(x):
        return -0.5 * (((x - 2.0) / 0.5) ** 2).sum(-1)

    n = 4096
    parts = jax.random.normal(jax.random.PRNGKey(4), (n, 2)) * 3.0

    mesh = make_walker_mesh()
    sh_init, sh_run = make_sharded_smc(
        log_prior, log_like, mesh, n_temps=12, n_mcmc_moves=5,
        mcmc_step_size=0.4, ess_threshold=0.7)
    st_sh, ess_sh = sh_run(sh_init(parts), jax.random.PRNGKey(5))

    init_1, run_1 = make_smc_sampler(
        log_prior, log_like, n_temps=12, n_mcmc_moves=5,
        mcmc_step_size=0.4, ess_threshold=0.7)
    st_1, ess_1 = jax.jit(run_1)(init_1(parts), jax.random.PRNGKey(5))

    # exact posterior: precision 1/9 + 1/0.25 -> var 0.2432, mean 1.9459
    post_var = 1.0 / (1.0 / 9.0 + 1.0 / 0.25)
    post_mean = post_var * (2.0 / 0.25)
    for st in (st_sh, st_1):
        w = np.asarray(jax.nn.softmax(st.log_weights.reshape(-1)))
        p = np.asarray(st.particles.reshape(-1, 2))
        mean = (w[:, None] * p).sum(0)
        np.testing.assert_allclose(mean, post_mean, atol=0.1)
    assert np.isfinite(np.asarray(ess_sh)).all()
    # the collective ESS decision fired at least once (resampling path)
    assert (np.asarray(ess_sh) < 0.7).any()


def test_sharded_parameter_posterior_hmc():
    """The BASELINE.json configs[4] example, sharded: HMC chains over FLOW
    PARAMETERS θ with log p(θ|X) reusing the flow log-prob kernels, chains
    sharded over the walker mesh."""
    from waveflow_tpu.models import get_model

    init = get_model(base_spline_degree=3, i_spline_degree=3,
                     n_prior_internal_knots=5, n_i_internal_knots=5,
                     i_spline_reg=0.1, n_flow_layers=1,
                     n_spline_base_mesh_points=200)
    params, log_pdf, _ = init(jax.random.PRNGKey(6), 2)
    data = jax.random.uniform(jax.random.PRNGKey(7), (32, 2),
                              minval=0.1, maxval=0.9)
    log_prob_fn, unravel, flat0 = make_parameter_posterior(
        log_pdf, data, params, prior_scale=2.0)

    mesh = make_walker_mesh()
    sh_init, make_run = make_sharded_chain_sampler(
        make_hmc_sampler, log_prob_fn, mesh, n_leapfrog=4)
    theta0 = jnp.tile(flat0[None], (8, 1))
    state = sh_init(theta0, step_size=1e-3)
    run = make_run(n_steps=5, n_warmup=5)
    state, trace = run(state, jax.random.PRNGKey(8))
    assert np.isfinite(np.asarray(state.log_prob)).all()
    assert np.asarray(trace).shape == (5, 8, flat0.shape[0])

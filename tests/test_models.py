"""Model-level tests: Waveflow normalization, psi/log_pdf consistency,
ancestral sampling, and MFlow density sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveflow_tpu.models import get_model, get_waveflow_model

RNG = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def waveflow_2p():
    L = 4.0
    init = get_waveflow_model(2, base_spline_degree=5, i_spline_degree=5,
                              n_prior_internal_knots=12, n_i_internal_knots=12,
                              i_spline_reg=0.1, n_flow_layers=2, box_size=L,
                              xu_coord_type='mean',
                              n_spline_base_mesh_points=800)
    params, psi, log_pdf, sample = init(RNG, 2)
    return L, params, psi, log_pdf, sample


def test_psi_log_pdf_consistency(waveflow_2p):
    L, params, psi, log_pdf, _ = waveflow_2p
    x = jnp.sort(jax.random.uniform(RNG, (32, 2), minval=-L * 0.9,
                                    maxval=L * 0.9), axis=-1)
    lp = log_pdf(params, x)
    ps = psi(params, x)
    # |psi|^2 == exp(log_pdf) up to the log-tolerance epsilon
    np.testing.assert_allclose(np.asarray(ps ** 2), np.asarray(jnp.exp(lp)),
                               rtol=2e-2, atol=1e-5)


def test_psi_normalized_on_sorted_sector(waveflow_2p):
    """∫_{x1<x2} 2  psi² dx = 1: psi is exactly normalized by construction
    (squared orthonormal prior + flow change of variables)."""
    L, params, psi, _, _ = waveflow_2p
    n = 220
    xs = np.linspace(-L, L, n)
    X1, X2 = np.meshgrid(xs, xs, indexing='ij')
    grid = jnp.asarray(np.stack([X1.ravel(), X2.ravel()], -1))
    grid_sorted = jnp.sort(grid, axis=-1)
    vals = np.asarray(psi(params, grid_sorted)) ** 2
    integral = vals.reshape(n, n).sum() * (2 * L / n) ** 2
    # grid covers both orderings; sorted-sector psi has the /2 factor on the
    # constrained dim so the full-square integral is 1
    np.testing.assert_allclose(integral, 1.0, rtol=5e-2)


def test_psi_vanishes_at_coincidence_and_walls(waveflow_2p):
    L, params, psi, _, _ = waveflow_2p
    xs = np.linspace(-L * 0.9, L * 0.9, 50)
    coincident = jnp.asarray(np.stack([xs, xs], -1))
    vals = np.asarray(psi(params, coincident))
    assert np.abs(vals).max() < 5e-2, "psi should vanish when x1 == x2"
    # box walls
    wall = jnp.asarray(np.stack([np.full(50, -L), xs], -1))
    vals_wall = np.asarray(psi(params, jnp.sort(wall, axis=-1)))
    assert np.abs(vals_wall).max() < 5e-2, "psi should vanish on the wall"


def test_waveflow_sampling_matches_density(waveflow_2p):
    L, params, psi, log_pdf, sample = waveflow_2p
    n_samples = 4000
    samples = np.asarray(sample(jax.random.PRNGKey(1), params, n_samples))
    assert samples.shape == (n_samples, 2)
    assert (samples >= -L - 1e-3).all() and (samples <= L + 1e-3).all()
    # sorted gap structure: samples come out sorted ascending
    assert (np.diff(samples, axis=-1) >= -1e-4).all()
    # compare mean log-density of samples against model expectation:
    # E_{x~|psi|^2}[log p(x)] should be close to the grid-weighted average
    lp_samples = np.asarray(log_pdf(params, jnp.asarray(samples))).mean()
    n = 160
    xs = np.linspace(-L, L, n)
    X1, X2 = np.meshgrid(xs, xs, indexing='ij')
    grid = jnp.sort(jnp.asarray(np.stack([X1.ravel(), X2.ravel()], -1)), -1)
    lp_grid = np.asarray(log_pdf(params, grid))
    p_grid = np.exp(lp_grid)
    expect = (p_grid * lp_grid).sum() / p_grid.sum()
    assert abs(lp_samples - expect) < 0.1, (lp_samples, expect)


def test_mflow_density_integrates_to_one():
    # I-spline boundary constraints pin the flow onto [0,1] (without them the
    # image is [w_0, 1-w_last] and mass falls outside — same in the reference)
    init = get_model(base_spline_degree=4, i_spline_degree=4,
                     n_prior_internal_knots=10, n_i_internal_knots=10,
                     i_spline_reg=0.1, n_flow_layers=1,
                     i_constraint_dict_left={0: 0.0},
                     i_constraint_dict_right={0: 1.0},
                     n_spline_base_mesh_points=600)
    params, log_pdf, sample = init(RNG, 2)
    n = 200
    xs = np.linspace(0, 1, n)
    X1, X2 = np.meshgrid(xs, xs, indexing='ij')
    grid = jnp.asarray(np.stack([X1.ravel(), X2.ravel()], -1))
    p = np.exp(np.asarray(log_pdf(params, grid)))
    integral = p.reshape(n, n).mean()  # unit square
    np.testing.assert_allclose(integral, 1.0, rtol=0.05)


def test_mflow_sample_shapes_and_support():
    init = get_model(base_spline_degree=4, i_spline_degree=4,
                     n_prior_internal_knots=10, n_i_internal_knots=10,
                     i_spline_reg=0.1, n_flow_layers=1,
                     n_spline_base_mesh_points=600)
    params, log_pdf, sample = init(RNG, 2)
    s = np.asarray(sample(jax.random.PRNGKey(3), params, 512))
    assert s.shape == (512, 2)
    assert (s > -0.05).all() and (s < 1.05).all()
    s2, orig = sample(jax.random.PRNGKey(3), params, 64,
                      return_original_samples=True)
    assert np.asarray(orig).shape == (64, 2)


def test_normal_prior_matches_scipy():
    from waveflow_tpu.models import Normal
    from scipy.stats import multivariate_normal as mvn
    params, log_pdf, sample = Normal()(RNG, 3)
    x = jax.random.normal(RNG, (20, 3))
    got = np.asarray(log_pdf(params, x))
    expect = mvn.logpdf(np.asarray(x), np.zeros(3), np.eye(3))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_gmm_prior_matches_sklearn():
    from waveflow_tpu.models import GMM
    from sklearn.mixture import GaussianMixture
    rng = np.random.default_rng(0)
    means = jnp.asarray(rng.normal(size=(3, 2)))
    covs = jnp.asarray(np.stack([np.eye(2) * s for s in (0.5, 1.0, 2.0)]))
    weights = jnp.log(jnp.asarray([0.2, 0.3, 0.5]))
    params, log_pdf, sample = GMM(means, covs, jnp.asarray([0.2, 0.3, 0.5]))(RNG, 2)
    gmm = GaussianMixture(3)
    gmm.means_ = np.asarray(means)
    gmm.covariances_ = np.asarray(covs)
    gmm.weights_ = np.asarray([0.2, 0.3, 0.5])
    gmm.precisions_cholesky_ = np.linalg.cholesky(
        np.linalg.inv(np.asarray(covs))).transpose(0, 2, 1)
    x = jnp.asarray(rng.normal(size=(20, 2)))
    got = np.asarray(log_pdf(params, x))
    expect = gmm.score_samples(np.asarray(x))
    np.testing.assert_allclose(got, expect, rtol=1e-4)


@pytest.mark.parametrize("n,coord", [(1, 'first'), (1, 'mean'), (3, 'mean'),
                                     (4, 'first')])
def test_waveflow_particle_count_generality(n, coord):
    """The model builds and is self-consistent for any particle count.

    The reference supports only n=2 in practice: its MADE mask construction
    divides by (input_dim - 1) (model_factory.py:14) so n=1 crashes, and its
    mean-coordinate BoxTransform reverse is hard-coded for 2 dims
    (made.py:188).  Here n=1 degenerates the conditioner to a learned
    constant and the mean-reverse is closed-form for any n."""
    init = get_waveflow_model(n, base_spline_degree=4, i_spline_degree=4,
                              n_prior_internal_knots=8, n_i_internal_knots=8,
                              i_spline_reg=0.1, n_flow_layers=2, box_size=5.0,
                              n_spline_base_mesh_points=300,
                              xu_coord_type=coord)
    params, psi, log_pdf, sample = init(jax.random.PRNGKey(0), n)
    batch = sample(jax.random.PRNGKey(1), params, 64)
    assert batch.shape == (64, n)
    pv = psi(params, batch)
    lp = log_pdf(params, batch)
    assert bool(jnp.isfinite(pv).all()) and bool(jnp.isfinite(lp).all())
    # |psi|^2 must equal the flow density wherever psi != 0
    err = np.abs(2 * np.log(np.abs(np.asarray(pv)) + 1e-10) - np.asarray(lp))
    assert float(err.max()) < 1e-4


def test_boundary_smoothness_through_composed_model(waveflow_2p):
    """Numeric-assertion version of the reference's visual boundary check
    (tests/test_boundary_constraints.py:74-107):

    (a) ψ -> 0 *linearly* approaching the box wall through the whole
        composed model (the {0: 0} value constraint on the B prior);
    (b) the analytic derivative chain (custom-JVP derivative tables) is
        consistent with finite differences of ψ itself near the boundary,
        at FD scales above the spline-table cell (below cell scale FD sees
        the piecewise-linear interpolation, which is the documented
        runtime numerics, ops/spline_eval.py);
    (c) the near-wall kinetic local energy diverges no faster than 1/d —
        i.e. ψ²·E_L stays integrable — which is what the {2: 0} curvature
        constraint buys through the composition.  (∂²ψ/∂x² itself does
        NOT vanish at the wall: the chain rule leaves B'(u)·u'' with
        B''(0)=0 killing only the first term; same composition as the
        reference.)"""
    from waveflow_tpu.physics import laplacian
    L, params, psi, log_pdf, _ = waveflow_2p
    psi_j = jax.jit(psi)
    lap_j = jax.jit(laplacian(psi))

    # (a) linear vanishing at the left wall along x0 (asymptotic regime:
    # away from incidental nodes of the untrained ψ)
    ds = np.array([1e-3, 3e-4, 1e-4], dtype=np.float32)
    x = jnp.asarray(np.stack([-L + ds, np.full(len(ds), 0.7 * L)], -1))
    p = np.asarray(psi_j(params, x))
    assert np.all(np.abs(p) < 1e-1)
    ratios = p / ds                     # ~constant slope => linear decay
    np.testing.assert_allclose(ratios, ratios[0], rtol=0.2)
    # and exactly at the wall
    p_wall = np.asarray(psi_j(params, jnp.asarray([[-L, 0.7 * L]])))
    assert abs(p_wall[0]) < 5e-4

    # (b) FD Laplacian vs the analytic derivative chain near the wall,
    # eps chosen to span several table cells
    x0 = jnp.asarray([[-L + 0.4, 0.7 * L]])
    eps = 0.05
    shifts = jnp.asarray([[0.0, 0.0], [eps, 0.0], [-eps, 0.0],
                          [0.0, eps], [0.0, -eps]])
    v = np.asarray(psi_j(params, x0 + shifts))
    fd_lap = (v[1] + v[2] - 2 * v[0]) / eps ** 2 \
        + (v[3] + v[4] - 2 * v[0]) / eps ** 2
    ana_lap = float(np.asarray(lap_j(params, x0))[0])
    np.testing.assert_allclose(fd_lap, ana_lap, rtol=0.1)

    # (c) kinetic E_L grows at most ~1/d toward the wall: d * E_L bounded
    kin = -0.5 * np.asarray(lap_j(params, x)) / p
    assert np.all(np.abs(kin * ds) < 50.0), kin * ds

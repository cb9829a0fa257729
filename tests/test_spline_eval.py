"""Device spline evaluation: fused eval, custom-JVP derivative chain,
boundary projection, monotone inverse, and inverse-CDF samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveflow_tpu.ops import (
    batched_monotone_inverse, build_bspline_tables, build_ispline_tables,
    build_mspline_tables, make_bias_remover, make_boundary_projector,
    make_evaluator, sample_linear_density, sample_squared_amplitude,
)


@pytest.fixture(scope="module")
def i_setup():
    tabs = build_ispline_tables(5, 12, n_mesh=2000)
    ev = make_evaluator(tabs)
    rng = np.random.default_rng(0)
    B = 64
    w = rng.uniform(0.2, 1.0, size=(B, ev.n_bases)).astype(np.float32)
    w[:, 0] = 0.0
    w[:, -1] = 0.0
    w = w / w.sum(-1, keepdims=True)
    x = rng.uniform(0.01, 0.99, size=B).astype(np.float32)
    return ev, jnp.asarray(w), jnp.asarray(x)


def test_eval_matches_manual_lerp(i_setup):
    ev, w, x = i_setup
    y = ev(w, x)
    basis = ev.basis(x)
    np.testing.assert_allclose(y, (basis * w).sum(-1), rtol=1e-6)
    assert ((y >= -1e-6) & (y <= 1 + 1e-6)).all()


def test_custom_jvp_matches_derivative_table(i_setup):
    ev, w, x = i_setup
    g = jax.vmap(jax.grad(lambda ww, xx: ev(ww, xx), argnums=1))(w, x)
    d1 = ev(w, x, d=1)
    np.testing.assert_allclose(g, d1, rtol=1e-5, atol=1e-6)

    # second derivative chains to table order 2
    g2 = jax.vmap(jax.grad(jax.grad(lambda ww, xx: ev(ww, xx), argnums=1),
                           argnums=1))(w, x)
    d2 = ev(w, x, d=2)
    np.testing.assert_allclose(g2, d2, rtol=1e-4, atol=1e-4)


def test_pair_eval_matches_separate_evals(i_setup):
    """Fused (value, derivative) pair path vs the scalar chain, through
    two derivative orders of autodiff (the Laplacian's consumption)."""
    ev, w, x = i_setup
    v, dv = ev.pair(w, x)
    np.testing.assert_allclose(v, ev(w, x), rtol=1e-6)
    np.testing.assert_allclose(dv, ev(w, x, d=1), rtol=1e-6)

    # first/second x-derivatives of the pair's value component must chain
    # through the derivative tables exactly like the scalar path
    val = lambda ww, xx: ev.pair(ww, xx)[0]
    g = jax.vmap(jax.grad(val, argnums=1))(w, x)
    np.testing.assert_allclose(g, ev(w, x, d=1), rtol=1e-5, atol=1e-6)
    g2 = jax.vmap(jax.grad(jax.grad(val, argnums=1), argnums=1))(w, x)
    np.testing.assert_allclose(g2, ev(w, x, d=2), rtol=1e-4, atol=1e-4)

    # derivative component's own x-derivative = order 2
    der = lambda ww, xx: ev.pair(ww, xx)[1]
    gd = jax.vmap(jax.grad(der, argnums=1))(w, x)
    np.testing.assert_allclose(gd, ev(w, x, d=2), rtol=1e-4, atol=1e-4)

    # coefficient tangents
    gw = jax.vmap(jax.grad(val, argnums=0))(w, x)
    np.testing.assert_allclose(gw, ev.basis(x), rtol=1e-5, atol=1e-6)


def test_grad_wrt_coeffs_is_basis(i_setup):
    ev, w, x = i_setup
    gw = jax.vmap(jax.grad(lambda ww, xx: ev(ww, xx), argnums=0))(w, x)
    np.testing.assert_allclose(gw, ev.basis(x), rtol=1e-5, atol=1e-6)


def test_derivative_numeric_vs_jvp(i_setup):
    ev, w, x = i_setup
    eps = 1e-3
    num = (ev(w, x + eps) - ev(w, x - eps)) / (2 * eps)
    ana = ev(w, x, d=1)
    np.testing.assert_allclose(num, ana, rtol=0.05, atol=5e-3)


def test_boundary_projection_ispline():
    tabs = build_ispline_tables(5, 12, n_mesh=2000)
    ev = make_evaluator(tabs)
    project = make_boundary_projector(ev, {0: 0.0}, {0: 1.0},
                                      normalization='sum',
                                      ispline_right_convention=True)
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.uniform(0.1, 1, size=(16, ev.n_bases)).astype(np.float32))
    wp = project(w)
    np.testing.assert_allclose(np.asarray(wp.sum(-1)), 1.0, rtol=1e-5)
    y0 = ev(wp, jnp.zeros(16))
    y1 = ev(wp, jnp.ones(16))
    np.testing.assert_allclose(np.asarray(y0), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y1), 1.0, atol=1e-5)


def test_boundary_projection_bspline_value_and_curvature():
    tabs = build_bspline_tables(6, 23, n_mesh=2000)
    ev = make_evaluator(tabs)  # plain B basis for constraint checks
    project = make_boundary_projector(ev, {0: 0.0, 2: 0.0}, {0: 0.0},
                                      normalization='l2')
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(8, ev.n_bases)).astype(np.float32))
    wp = project(w)
    np.testing.assert_allclose(np.asarray((wp ** 2).sum(-1)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ev(wp, jnp.zeros(8))), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ev(wp, jnp.ones(8))), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ev(wp, jnp.zeros(8), d=2)), 0.0,
                               atol=2e-3)


def test_bias_remover_shapes_and_normalization():
    remove = make_bias_remover(17, 5, 'I')
    w = jnp.ones((4, 17))
    out = remove(w)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-6)
    # first and last untouched relative scale: mult[0]=1, mult[1]=1/5
    assert np.asarray(out)[0, 0] > np.asarray(out)[0, 1]


def test_monotone_inverse_roundtrip(i_setup):
    ev, w, x = i_setup
    y = ev(w, x)
    x_rec = batched_monotone_inverse(ev, w, y)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=5e-5)


def test_exact_inverse_matches_bisection_and_is_tighter(i_setup):
    from waveflow_tpu.ops import bisection_inverse, exact_table_inverse
    ev, w, x = i_setup
    y = ev(w, x)
    x_exact = exact_table_inverse(ev, w, y)
    x_bisect = bisection_inverse(ev, w, y)
    np.testing.assert_allclose(np.asarray(x_exact), np.asarray(x_bisect),
                               atol=5e-5)
    # the exact path inverts the table interpolant to float rounding:
    # forward(x_exact) must reproduce y much tighter than the tol contract
    y_rec = ev(w, x_exact)
    np.testing.assert_allclose(np.asarray(y_rec), np.asarray(y), atol=2e-6)


def _bin_probs(dens_fine: np.ndarray, n_bins: int) -> np.ndarray:
    """Exact bin probabilities of a density sampled on a fine grid whose
    point count is n_bins * sub + 1 (trapezoid within each bin)."""
    P = len(dens_fine)
    sub = (P - 1) // n_bins
    h = 1.0 / (P - 1)
    probs = np.array([
        np.trapezoid(dens_fine[i * sub:(i + 1) * sub + 1], dx=h)
        for i in range(n_bins)])
    return probs / probs.sum()


def _assert_hist_matches(xs, probs, n_bins):
    counts, _ = np.histogram(xs, bins=n_bins, range=(0, 1))
    N = len(xs)
    expected = probs * N
    sigma = np.sqrt(np.maximum(expected, 1.0))
    z = np.abs(counts - expected) / sigma
    assert z.max() < 5.0, f"max z-score {z.max()}"


def test_sample_linear_density_matches_pdf():
    tabs = build_mspline_tables(4, 10, n_mesh=1000)
    ev = make_evaluator(tabs)
    rng = np.random.default_rng(3)
    w = rng.uniform(0.1, 1.0, size=ev.n_bases).astype(np.float32)
    w /= w.sum()
    N = 30_000
    n_bins = 40
    wb = jnp.tile(jnp.asarray(w)[None], (N, 1))
    u = jax.random.uniform(jax.random.PRNGKey(0), (N,))
    xs = np.asarray(sample_linear_density(ev, wb, u))
    fine = np.linspace(0, 1, n_bins * 100 + 1)
    dens = np.asarray(ev(jnp.tile(jnp.asarray(w)[None], (len(fine), 1)),
                         jnp.asarray(fine, dtype=jnp.float32)))
    _assert_hist_matches(xs, _bin_probs(dens, n_bins), n_bins)


def test_sample_squared_amplitude_matches_pdf():
    tabs = build_bspline_tables(5, 15, n_mesh=1000)
    ev = make_evaluator(tabs, use_ob=True)
    rng = np.random.default_rng(4)
    w = rng.normal(size=ev.n_bases).astype(np.float32)
    w /= np.sqrt((w ** 2).sum())
    N = 30_000
    n_bins = 40
    wb = jnp.tile(jnp.asarray(w)[None], (N, 1))
    u = jax.random.uniform(jax.random.PRNGKey(1), (N,))
    xs = np.asarray(sample_squared_amplitude(ev, wb, u))
    fine = np.linspace(0, 1, n_bins * 100 + 1)
    psi = np.asarray(ev(jnp.tile(jnp.asarray(w)[None], (len(fine), 1)),
                        jnp.asarray(fine, dtype=jnp.float32)))
    _assert_hist_matches(xs, _bin_probs(psi ** 2, n_bins), n_bins)


def test_pallas_kernel_matches_take_interpret():
    """Pallas spline kernel (interpreter mode on CPU) vs the take-path."""
    from waveflow_tpu.ops.pallas_spline import _spline_eval_kernel
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tabs = build_ispline_tables(4, 8, n_mesh=300)
    ev = make_evaluator(tabs)
    table = ev.tables[0]
    rng = np.random.default_rng(11)
    N, block = 128, 64
    w = jnp.asarray(rng.uniform(0.1, 1, (N, ev.n_bases)).astype(np.float32))
    x = jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))

    out = pl.pallas_call(
        _spline_eval_kernel,
        grid=(N // block,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0)),
            pl.BlockSpec((block, ev.n_bases), lambda i: (i, 0)),
            pl.BlockSpec(table.shape, lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block, 1), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
        interpret=True,
    )(x.reshape(-1, 1), w, table)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(ev(w, x)),
                               atol=2e-5)


def test_onehot_matmul_matches_take():
    from waveflow_tpu.ops.pallas_spline import onehot_matmul_eval
    tabs = build_ispline_tables(4, 8, n_mesh=300)
    ev = make_evaluator(tabs)
    rng = np.random.default_rng(12)
    w = jnp.asarray(rng.uniform(0.1, 1, (256, ev.n_bases)).astype(np.float32))
    x = jnp.asarray(rng.uniform(0, 1, 256).astype(np.float32))
    a = np.asarray(onehot_matmul_eval(ev.tables[0], w, x))
    b = np.asarray(ev(w, x))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_node_bisect_inverse_matches_dense(i_setup):
    """The bandwidth-lean node-bisection inverse is bit-for-bit the same
    algorithm as the dense form (same bracketing cell, same linear solve)."""
    from waveflow_tpu.ops import exact_node_bisect_inverse, exact_table_inverse
    ev, w, x = i_setup
    y = ev(w, x)
    xd = np.asarray(exact_table_inverse(ev, w, y))
    xb = np.asarray(exact_node_bisect_inverse(ev, w, y))
    np.testing.assert_allclose(xb, xd, atol=2e-6)
    np.testing.assert_allclose(xb, np.asarray(x), atol=1e-5)


def test_locate_in_masses_two_level_matches_flat(monkeypatch):
    """Force the two-level CDF path and compare cell/residual against the
    flat cumsum+compare path on the same masses."""
    import waveflow_tpu.ops.sampling as S
    rng = np.random.default_rng(3)
    masses = jnp.asarray(rng.uniform(0.0, 1.0, size=(128, 1999))
                         .astype(np.float32))
    u = jnp.asarray(rng.uniform(0.0, 1.0, size=128).astype(np.float32))
    j_flat, q_flat = S._locate_in_masses(masses, u)
    monkeypatch.setattr(S, 'TWO_LEVEL_MIN_ELEMENTS', 0)
    j_two, q_two = S._locate_in_masses(masses, u)
    # cell indices agree except possibly at exact cell boundaries (float
    # associativity of the two summation orders); residuals stay tiny there
    same = np.asarray(j_flat) == np.asarray(j_two)
    assert same.mean() > 0.98
    np.testing.assert_allclose(np.asarray(q_two)[same],
                               np.asarray(q_flat)[same], rtol=1e-3,
                               atol=1e-3)


def test_samplers_two_level_matches_flat(monkeypatch):
    """End-to-end: both samplers produce (nearly) identical draws through
    the flat and two-level locate paths given the same uniforms."""
    import waveflow_tpu.ops.sampling as S
    from waveflow_tpu.ops import build_bspline_tables, make_evaluator
    tabs = build_bspline_tables(5, 12, n_mesh=2000)
    ev = make_evaluator(tabs, use_ob=True)
    rng = np.random.default_rng(4)
    B = 256
    w = jnp.asarray(rng.normal(size=(B, ev.n_bases)).astype(np.float32))
    w = w / jnp.linalg.norm(w, axis=-1, keepdims=True)
    u = jnp.asarray(rng.uniform(size=B).astype(np.float32))
    x_flat = np.asarray(S.sample_squared_amplitude(ev, w, u))
    monkeypatch.setattr(S, 'TWO_LEVEL_MIN_ELEMENTS', 0)
    x_two = np.asarray(S.sample_squared_amplitude(ev, w, u))
    assert (np.abs(x_two - x_flat) < 1e-3).mean() > 0.98

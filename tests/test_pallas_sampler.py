"""Fused Pallas inverse-CDF sampler vs the XLA path (interpret mode on the
CPU mesh; the compiled kernel is A/B'd on the real chip in
benchmarks/ and RESULTS.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveflow_tpu.ops import get_tables, make_evaluator
from waveflow_tpu.ops.pallas_sampler import pallas_sample_squared_amplitude
from waveflow_tpu.ops.sampling import sample_squared_amplitude


@pytest.fixture(scope="module")
def ob_evaluator():
    tabs = get_tables('B', 6, 23, n_mesh=2000)
    return make_evaluator(tabs, use_ob=True)


def _unit_coeffs(rng, B, n_bases):
    w = jax.random.normal(rng, (B, n_bases))
    return w / jnp.sqrt((w ** 2).sum(-1, keepdims=True))


def test_pallas_sampler_matches_xla_path(ob_evaluator):
    """Same u -> same x as sample_squared_amplitude (identical math:
    table matmul, cubic cell masses, 12+3 bracket/Newton)."""
    ev = ob_evaluator
    c = _unit_coeffs(jax.random.PRNGKey(0), 300, ev.n_bases)
    u = jax.random.uniform(jax.random.PRNGKey(1), (300,))
    x_ref = np.asarray(sample_squared_amplitude(ev, c, u))
    x_pal = np.asarray(pallas_sample_squared_amplitude(ev, c, u,
                                                       interpret=True))
    np.testing.assert_allclose(x_pal, x_ref, atol=2e-6)


def test_pallas_sampler_ragged_batch_and_edge_uniforms(ob_evaluator):
    """Batch not a multiple of the block size (host-side padding) and
    u at the 0/1 walls stay in [0, 1]."""
    ev = ob_evaluator
    B = 77
    c = _unit_coeffs(jax.random.PRNGKey(2), B, ev.n_bases)
    u = jnp.concatenate([jnp.zeros(3), jnp.ones(3) - 1e-7,
                         jax.random.uniform(jax.random.PRNGKey(3), (B - 6,))])
    x = np.asarray(pallas_sample_squared_amplitude(ev, c, u, interpret=True))
    assert x.shape == (B,)
    assert (x >= 0.0).all() and (x <= 1.0).all()
    x_ref = np.asarray(sample_squared_amplitude(ev, c, u))
    np.testing.assert_allclose(x, x_ref, atol=2e-6)


def test_pallas_linear_sampler_matches_xla_path():
    """The 'linear' kernel variant (M-spline priors) matches
    sample_linear_density on the same uniforms."""
    from waveflow_tpu.ops.pallas_sampler import pallas_sample_linear_density
    from waveflow_tpu.ops.sampling import sample_linear_density
    tabs = get_tables('M', 4, 12, n_mesh=1000)
    ev = make_evaluator(tabs)
    B = 200
    w = jax.random.uniform(jax.random.PRNGKey(6), (B, ev.n_bases))
    c = w / w.sum(-1, keepdims=True)
    u = jax.random.uniform(jax.random.PRNGKey(7), (B,))
    x_ref = np.asarray(sample_linear_density(ev, c, u))
    x_pal = np.asarray(pallas_sample_linear_density(ev, c, u,
                                                    interpret=True))
    np.testing.assert_allclose(x_pal, x_ref, atol=2e-6)


def test_pallas_sampler_histogram_matches_density(ob_evaluator):
    """Samples distribute as the squared spline: chi-squared-style check
    of a coarse histogram against the analytic cell masses."""
    ev = ob_evaluator
    B = 20000
    c0 = _unit_coeffs(jax.random.PRNGKey(4), 1, ev.n_bases)
    c = jnp.tile(c0, (B, 1))
    u = jax.random.uniform(jax.random.PRNGKey(5), (B,))
    x = np.asarray(pallas_sample_squared_amplitude(ev, c, u, interpret=True))
    psi = np.asarray(ev.density_on_mesh(c0))[0]          # (n_mesh,)
    p_l, p_r = psi[:-1], psi[1:]
    d = p_r - p_l
    masses = (p_l ** 2 + p_l * d + d * d / 3.0)
    masses = masses / masses.sum()
    # coarse 20-bin comparison
    edges = np.linspace(0, 1, 21)
    hist, _ = np.histogram(x, bins=edges)
    cell_edges = np.linspace(0, 1, len(masses) + 1)
    expected = np.asarray([
        masses[(cell_edges[:-1] >= lo) & (cell_edges[:-1] < hi)].sum()
        for lo, hi in zip(edges[:-1], edges[1:])])
    np.testing.assert_allclose(hist / B, expected, atol=0.015)

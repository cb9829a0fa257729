"""Gather-free local-polynomial spline evaluation (ops/poly_eval.py).

The poly backend must (a) reproduce the EXACT basis recursions — it is not
an approximation like the lerp tables — for values and derivatives to
order 3, (b) expose those derivatives through ordinary autodiff, and
(c) leave the model-level invariants (wall zeros, normalization, bijection
round-trip) intact when wired into IMADE/Waveflow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveflow_tpu.ops import get_tables, make_evaluator, make_poly_evaluator
from waveflow_tpu.ops.spline_tables import (
    b_basis_with_derivs, i_basis_with_derivs, m_basis_with_derivs, make_knots,
)

FAMILIES = [('M', 5, 15), ('I', 6, 23), ('B', 6, 23), ('I', 4, 12)]
_EXACT = {'M': (m_basis_with_derivs, lambda k: k),
          'I': (i_basis_with_derivs, lambda k: k + 1),
          'B': (b_basis_with_derivs, lambda k: k + 1)}


def _exact_contraction(kind, degree, n_knots, coeffs, x, d):
    fn, mult = _EXACT[kind]
    t = make_knots(n_knots, mult(degree))
    basis = fn(np.asarray(x, dtype=np.float64), t, degree,
               n_derivatives=d + 1)[d]                      # (n_bases, P)
    return np.einsum('bi,ib->b', np.asarray(coeffs, np.float64), basis)


@pytest.mark.parametrize("kind,degree,n_knots", FAMILIES)
def test_poly_matches_exact_recursion(kind, degree, n_knots):
    tabs = get_tables(kind, degree, n_knots, n_mesh=2000)
    pev = make_poly_evaluator(tabs)
    rng = np.random.default_rng(3)
    c = jnp.asarray(rng.uniform(0.1, 1.0, (128, tabs.n_bases)), jnp.float32)
    x = jnp.asarray(rng.uniform(0.0, 1.0, (128,)), jnp.float32)
    for d in range(4):
        got = np.asarray(pev(c, x, d))
        want = _exact_contraction(kind, degree, n_knots, c, x, d)
        scale = max(1.0, np.abs(want).max())
        assert np.abs(got - want).max() / scale < 5e-5, (kind, d)


def test_poly_beats_table_on_ob_basis():
    """The OB basis change S^{-1/2} amplifies table lerp error ~20x; the
    poly path stays at f32 rounding (the accuracy story behind adoption)."""
    tabs = get_tables('B', 6, 23, n_mesh=2000)
    ev_ob = make_evaluator(tabs, use_ob=True)
    pev_ob = make_poly_evaluator(tabs, use_ob=True)
    t = make_knots(23, 7)
    b2ob = np.asarray(tabs.b_to_ob, np.float64)
    rng = np.random.default_rng(4)
    c = jnp.asarray(rng.normal(size=(128, tabs.n_bases)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (128,)), jnp.float32)
    exact_b = b_basis_with_derivs(np.asarray(x, np.float64), t, 6,
                                  n_derivatives=1)[0]
    want = np.einsum('bi,ib->b', np.asarray(c, np.float64), b2ob @ exact_b)
    scale = np.abs(want).max()
    err_tab = np.abs(np.asarray(ev_ob(c, x)) - want).max() / scale
    err_poly = np.abs(np.asarray(pev_ob(c, x)) - want).max() / scale
    assert err_poly < 5e-5
    assert err_poly < err_tab / 10


def test_autodiff_derivatives_are_exact():
    """grad/jvp through the poly evaluator == the analytic derivative —
    no derivative tables, no custom-JVP truncation."""
    tabs = get_tables('I', 6, 23, n_mesh=2000)
    pev = make_poly_evaluator(tabs)
    rng = np.random.default_rng(5)
    c = jnp.asarray(rng.uniform(0.1, 1.0, (64, tabs.n_bases)), jnp.float32)
    x = jnp.asarray(rng.uniform(0.05, 0.95, (64,)), jnp.float32)

    g1 = jax.vmap(jax.grad(lambda xx, cc: pev(cc[None], xx[None])[0]))(x, c)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(pev(c, x, 1)),
                               rtol=0, atol=2e-4)

    # second derivative via nested jvp (the Laplacian's access pattern)
    def d2(xx, cc):
        f = lambda z: pev(cc[None], z[None])[0]
        df = lambda z: jax.jvp(f, (z,), (jnp.ones(()),))[1]
        return jax.jvp(df, (xx,), (jnp.ones(()),))[1]

    g2 = jax.vmap(d2)(x, c)
    want2 = _exact_contraction('I', 6, 23, c, x, 2)
    scale = max(1.0, np.abs(want2).max())
    assert np.abs(np.asarray(g2) - want2).max() / scale < 5e-4


def test_basis_jet_matches_exact_and_chains():
    """basis_jet: one matmul yields T^{(d)} for d=0..3 exactly, and its
    custom-JVP x-tangent equals the next-order slice (the Laplacian's
    nested-forward access pattern)."""
    tabs = get_tables('I', 6, 23, n_mesh=2000)
    pev = make_poly_evaluator(tabs)
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.uniform(0.02, 0.98, (64,)), jnp.float32)
    c = jnp.asarray(rng.uniform(0.1, 1.0, (64, tabs.n_bases)), jnp.float32)
    B = pev.basis_jet(x)                           # (64, 4, n_b)
    for d in range(4):
        got = (B[:, d, :] * c).sum(-1)
        want = _exact_contraction('I', 6, 23, c, x, d)
        scale = max(1.0, np.abs(want).max())
        assert np.abs(np.asarray(got) - want).max() / scale < 5e-5, d

    # nested jvp of the order-0 contraction == order-2 contraction
    def f0(xx):
        return (pev.basis_jet(xx)[..., 0, :] * c).sum(-1)

    df = lambda xx: jax.jvp(f0, (xx,), (jnp.ones_like(xx),))[1]
    _, d2 = jax.jvp(df, (x,), (jnp.ones_like(x),))
    want2 = _exact_contraction('I', 6, 23, c, x, 2)
    scale = max(1.0, np.abs(want2).max())
    assert np.abs(np.asarray(d2) - want2).max() / scale < 5e-4

    # reverse mode works through the custom JVP (parameter-gradient path)
    g = jax.grad(lambda xx: f0(xx).sum())(x)
    want1 = _exact_contraction('I', 6, 23, c, x, 1)
    scale = max(1.0, np.abs(want1).max())
    assert np.abs(np.asarray(g) - want1).max() / scale < 5e-4

    # linear extension outside the domain: finite, C1 at the boundary
    x_out = jnp.asarray([-0.2, 1.3], jnp.float32)
    B_out = pev.basis_jet(x_out)
    assert np.isfinite(np.asarray(B_out)).all()


def test_value_and_derivative_pair():
    tabs = get_tables('I', 6, 23, n_mesh=2000)
    pev = make_poly_evaluator(tabs)
    rng = np.random.default_rng(6)
    c = jnp.asarray(rng.uniform(0.1, 1.0, (32, tabs.n_bases)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, (32,)), jnp.float32)
    v, dv = pev.value_and_derivative(c, x)
    np.testing.assert_allclose(np.asarray(v), np.asarray(pev(c, x, 0)),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(pev(c, x, 1)),
                               rtol=1e-4, atol=1e-3)


def test_waveflow_poly_vs_table_backends():
    """End-to-end: ψ, log_pdf, and the Laplacian agree between backends to
    table-interp error; wall zeros and round-trip hold on the poly path."""
    from waveflow_tpu.models.factory import get_waveflow_model
    from waveflow_tpu.physics import construct_hamiltonian_function

    rng = jax.random.PRNGKey(0)
    psis = {}
    for backend in ('table', 'poly'):
        init = get_waveflow_model(2, base_spline_degree=4, i_spline_degree=4,
                                  n_prior_internal_knots=10,
                                  n_i_internal_knots=10, n_flow_layers=2,
                                  box_size=4.0, eval_backend=backend)
        params, psi, log_pdf, sample = init(rng, 2)
        psis[backend] = (params, psi, log_pdf, sample)

    params, psi_t, logp_t, _ = psis['table']
    _, psi_p, logp_p, sample_p = psis['poly']
    # sorted coordinates = the physical domain of the 'mean' sector ansatz
    # (unsorted inputs map far outside [0,1]^n, where both backends
    # extrapolate — the eval protocol always sorts before calling ψ)
    x = jnp.sort(jax.random.uniform(jax.random.PRNGKey(1), (256, 2),
                                    minval=-1.9, maxval=1.9), axis=1)
    a, b = np.asarray(psi_t(params, x)), np.asarray(psi_p(params, x))
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() < 5e-3 * max(1.0, np.abs(a).max())

    # local energies agree between backends (the quantity that matters)
    h_t = construct_hamiltonian_function(psi_t, protons=((0.0,),),
                                         n_space_dimensions=1)
    h_p = construct_hamiltonian_function(psi_p, protons=((0.0,),),
                                         n_space_dimensions=1)
    el_t = np.asarray(h_t(params, x)[:, 0]) / np.clip(np.abs(a), 1e-3, None)
    el_p = np.asarray(h_p(params, x)[:, 0]) / np.clip(np.abs(b), 1e-3, None)
    # compare where psi isn't near a node
    mask = np.abs(a) > 0.05 * np.abs(a).max()
    assert np.abs(el_t[mask] - el_p[mask]).max() < 2.0  # table 2nd-deriv err

    # wall zeros on the poly path (box_size=4 -> box [-4, 4])
    wall = jnp.stack([jnp.full((5,), -4.0),
                      jnp.linspace(-1.5, 1.5, 5)], axis=1)
    assert np.abs(np.asarray(psi_p(params, wall))).max() < 1e-4

    # sampling round-trip: samples live in the box, log_pdf finite
    s = sample_p(jax.random.PRNGKey(2), params, 128)
    assert np.isfinite(np.asarray(logp_p(params, s))).all()
    assert float(jnp.max(jnp.abs(s))) <= 4.0 + 1e-5


def test_sample_squared_amplitude_poly_exact_quantiles():
    """The poly-density sampler (ops/poly_eval.py::
    sample_squared_amplitude_poly) inverts the CDF of the EXACT polynomial
    density: for each uniform u, the numerically integrated poly density
    up to the returned sample must equal u."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from waveflow_tpu.ops import get_tables, make_poly_evaluator
    from waveflow_tpu.ops.poly_eval import sample_squared_amplitude_poly

    tabs = get_tables('B', 5, 12, n_mesh=400)
    ev = make_poly_evaluator(tabs, use_ob=True)
    rng = np.random.default_rng(3)
    w = rng.normal(size=tabs.n_bases).astype(np.float32)
    c = jnp.asarray(w / np.linalg.norm(w))

    us = jnp.asarray(np.linspace(0.02, 0.98, 33).astype(np.float32))
    coeffs = jnp.tile(c[None], (len(us), 1))
    xs = np.asarray(sample_squared_amplitude_poly(ev, coeffs, us))
    assert ((xs >= 0) & (xs <= 1)).all()

    # numeric CDF of the exact polynomial density on a fine grid
    grid = jnp.asarray(np.linspace(0, 1, 20001).astype(np.float32))
    dens = np.asarray((c * ev.basis_jet(grid)[..., 0, :]).sum(-1)) ** 2
    cdf = np.concatenate([[0.0], np.cumsum((dens[1:] + dens[:-1]) / 2)])
    cdf /= cdf[-1]
    cdf_at_samples = np.interp(xs, np.asarray(grid), cdf)
    np.testing.assert_allclose(cdf_at_samples, np.asarray(us), atol=5e-4)


def test_trainer_poly_sampling_backend_smoke():
    import numpy as np
    from waveflow_tpu.vmc import VMCConfig, VMCTrainer
    cfg = VMCConfig(system_name='He', box_length=10.0,
                    sampling_backend='poly',
                    batch_size=32, window=2, num_epochs=4, log_every=4,
                    num_knots=8, n_flow_layers=1, spline_degree=4,
                    n_spline_base_mesh_points=400,
                    save_dir='/tmp/test_poly_sampling_smoke',
                    compilation_cache_dir=None)
    t = VMCTrainer(cfg)
    losses = t.train(num_epochs=4, verbose=False)
    assert np.isfinite(np.asarray(losses)).all()

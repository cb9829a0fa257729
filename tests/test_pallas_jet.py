"""Fused Pallas basis-jet kernel vs the XLA poly backend (interpret mode
on the CPU mesh; the on-chip A/B lives in benchmarks/roofline_r5.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveflow_tpu.ops import get_tables, make_poly_evaluator

RNG = np.random.default_rng(0)


@pytest.fixture(scope="module")
def evaluators():
    tabs = get_tables('I', 4, 12, n_mesh=400)
    ev_x = make_poly_evaluator(tabs, jet_backend='xla')
    ev_p = make_poly_evaluator(tabs, jet_backend='pallas')
    return ev_x, ev_p


def test_jet_matches_xla(evaluators):
    ev_x, ev_p = evaluators
    x = jnp.asarray(RNG.uniform(0, 1, (37, 3)).astype(np.float32))
    bx = np.asarray(ev_x.basis_jet(x))
    bp = np.asarray(ev_p.basis_jet(x))
    assert bp.shape == bx.shape == (37, 3, 4, ev_x.n_bases)
    np.testing.assert_allclose(bp, bx, rtol=2e-6, atol=2e-5)


def test_jet_out_of_domain_linear_extension(evaluators):
    ev_x, ev_p = evaluators
    x = jnp.asarray(np.array([-0.05, -0.001, 1.001, 1.08], np.float32))
    np.testing.assert_allclose(np.asarray(ev_p.basis_jet(x)),
                               np.asarray(ev_x.basis_jet(x)),
                               rtol=2e-5, atol=2e-4)


def test_jet_jvp_chain(evaluators):
    """Nested forward-mode derivatives through the custom JVP agree
    between backends (the Laplacian path)."""
    ev_x, ev_p = evaluators
    c = jnp.asarray(RNG.uniform(0.1, 1, (5, ev_x.n_bases)).astype(np.float32))
    x = jnp.asarray(RNG.uniform(0.05, 0.95, (5,)).astype(np.float32))

    def f(ev):
        def g(xx):
            return (c * ev.basis_jet(xx)[..., 0, :]).sum(-1)

        def d1(xx):
            return jax.jvp(g, (xx,), (jnp.ones_like(xx),))[1]

        val = g(x)
        d1v, d2v = jax.jvp(d1, (x,), (jnp.ones_like(x),))
        return np.asarray(val), np.asarray(d1v), np.asarray(d2v)

    for a, b in zip(f(ev_x), f(ev_p)):
        np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-3)


def test_batched_laplacian_matches_vmap():
    """laplacian_and_value_batched == laplacian_and_value on ψ (the
    formulation swap required by the pallas backend preserves numerics)."""
    from waveflow_tpu.models import get_waveflow_model
    from waveflow_tpu.physics.hamiltonian import (
        laplacian_and_value, laplacian_and_value_batched)

    init = get_waveflow_model(2, base_spline_degree=4, i_spline_degree=4,
                              n_prior_internal_knots=8, n_i_internal_knots=8,
                              i_spline_reg=0.1, n_flow_layers=1, box_size=5.0,
                              xu_coord_type='mean',
                              n_spline_base_mesh_points=300)
    params, psi, _, _ = init(jax.random.PRNGKey(0), 2)
    x = jnp.sort(jax.random.uniform(jax.random.PRNGKey(1), (16, 2),
                                    minval=-4.5, maxval=4.5), axis=-1)
    lap_v, val_v = jax.jit(laplacian_and_value(psi))(params, x)
    lap_b, val_b = jax.jit(laplacian_and_value_batched(psi))(params, x)
    np.testing.assert_allclose(np.asarray(val_b), np.asarray(val_v),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(lap_b), np.asarray(lap_v),
                               rtol=2e-4, atol=2e-4)


def test_trainer_poly_pallas_smoke():
    """eval_backend='poly_pallas' trains end-to-end (interpret-mode kernel
    on CPU) and auto-selects the batched Laplacian."""
    from waveflow_tpu.vmc import VMCConfig, VMCTrainer
    cfg = VMCConfig(system_name='He', box_length=10.0,
                    eval_backend='poly_pallas',
                    batch_size=32, window=2, num_epochs=4, log_every=4,
                    num_knots=8, n_flow_layers=1, spline_degree=4,
                    n_spline_base_mesh_points=400,
                    save_dir='/tmp/test_poly_pallas_smoke',
                    compilation_cache_dir=None)
    t = VMCTrainer(cfg)
    losses = t.train(num_epochs=4, verbose=False)
    assert np.isfinite(np.asarray(losses)).all()

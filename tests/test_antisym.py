"""Antisymmetrized (permutation-equivariant) ansatz tests.

The antisym model (models/antisym.py) is the only ansatz family whose
nodal set is not forced to contain the sort-coordinate coincidence
surface — the property that lets it beat the measured paired2d x-sector
floor on He-2d-2e (results/sector_bound.json, VERDICT r4 item 1).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveflow_tpu.models import get_antisym_waveflow_model
from waveflow_tpu.models.antisym import electron_permutation_table
from waveflow_tpu.physics import construct_hamiltonian_function

RNG = jax.random.PRNGKey(3)


@pytest.fixture(scope="module")
def antisym_2d2e():
    L = 5.0
    init = get_antisym_waveflow_model(
        2, 2, box_size=L, base_spline_degree=5, i_spline_degree=5,
        n_prior_internal_knots=10, n_i_internal_knots=10,
        i_spline_reg=0.1, n_flow_layers=2, n_spline_base_mesh_points=800)
    params, psi, log_pdf, sample = init(RNG, 4)
    return L, params, psi, log_pdf, sample


def _swap_electrons(x):
    """(B, 4) interleaved (x1,y1,x2,y2) -> electrons exchanged."""
    return jnp.concatenate([x[:, 2:], x[:, :2]], axis=1)


def test_permutation_table():
    perms, signs = electron_permutation_table(3)
    assert perms.shape == (6, 3)
    assert signs.sum() == 0.0              # 3 even, 3 odd
    # identity is even; a single transposition is odd
    assert signs[list(map(tuple, perms)).index((0, 1, 2))] == 1.0
    assert signs[list(map(tuple, perms)).index((1, 0, 2))] == -1.0


def test_exact_antisymmetry_under_exchange(antisym_2d2e):
    L, params, psi, _, _ = antisym_2d2e
    x = jax.random.uniform(RNG, (64, 4), minval=-0.9 * L, maxval=0.9 * L)
    v = np.asarray(psi(params, x))
    v_swapped = np.asarray(psi(params, _swap_electrons(x)))
    np.testing.assert_allclose(v_swapped, -v, rtol=1e-5, atol=1e-7)
    assert np.abs(v).max() > 0  # non-degenerate at init


def test_log_pdf_exchange_symmetric(antisym_2d2e):
    L, params, _, log_pdf, _ = antisym_2d2e
    x = jax.random.uniform(jax.random.PRNGKey(5), (32, 4),
                           minval=-0.9 * L, maxval=0.9 * L)
    lp = np.asarray(log_pdf(params, x))
    lp_swapped = np.asarray(log_pdf(params, _swap_electrons(x)))
    np.testing.assert_allclose(lp_swapped, lp, rtol=1e-5, atol=1e-5)
    assert np.isfinite(lp).all()


def test_nonzero_on_x_coincidence(antisym_2d2e):
    """THE property that distinguishes antisym from the paired2d sector:
    ψ_A need not vanish at x_a = x_b when y_a ≠ y_b.  (At full coincidence
    r_a = r_b antisymmetry forces zero.)"""
    L, params, psi, _, _ = antisym_2d2e
    y = np.linspace(-3.0, 3.0, 17)
    same_x = jnp.asarray(
        np.stack([np.full_like(y, 1.0), y,
                  np.full_like(y, 1.0), -y], axis=1))
    vals = np.asarray(psi(params, same_x))
    assert np.abs(vals).max() > 1e-6, (
        "antisym ψ is identically zero on the x-coincidence plane — it "
        "degenerated to the sector-restricted family")
    # full coincidence r1 == r2 must vanish exactly
    coinc = jnp.asarray(np.stack([y, y, y, y], axis=1) * 0.4)
    coinc = jnp.concatenate([coinc[:, :2], coinc[:, :2]], axis=1)
    np.testing.assert_allclose(np.asarray(psi(params, coinc)), 0.0,
                               atol=1e-6)


def test_sample_shape_and_domain(antisym_2d2e):
    L, params, _, _, sample = antisym_2d2e
    x = np.asarray(sample(jax.random.PRNGKey(9), params, 256))
    assert x.shape == (256, 4)
    assert (np.abs(x) <= L + 1e-5).all()


def test_local_energy_finite(antisym_2d2e):
    """Hψ_A/ψ_A via the fused forward-over-forward Laplacian is finite on
    typical configurations (the Laplacian flows through both permuted
    φ evaluations)."""
    L, params, psi, _, sample = antisym_2d2e
    h_fn = construct_hamiltonian_function(
        psi, protons=np.array([[0.0, 0.0], [0.0, 0.0]]),
        n_space_dimensions=2, eps=0.0)
    x = sample(jax.random.PRNGKey(11), params, 32)
    e_loc = np.asarray(h_fn(params, x)[:, 0] / psi(params, x))
    assert np.isfinite(e_loc).all()


def test_antisym_3_electrons_1d():
    """n=3 in 1D: ψ_A picks up the sign of every transposition (6-term
    symmetrization)."""
    L = 4.0
    init = get_antisym_waveflow_model(
        3, 1, box_size=L, base_spline_degree=4, i_spline_degree=4,
        n_prior_internal_knots=8, n_i_internal_knots=8,
        i_spline_reg=0.1, n_flow_layers=1, n_spline_base_mesh_points=600)
    params, psi, _, _ = init(jax.random.PRNGKey(1), 3)
    x = jax.random.uniform(jax.random.PRNGKey(2), (16, 3),
                           minval=-0.9 * L, maxval=0.9 * L)
    v = np.asarray(psi(params, x))
    # transposition (0 1)
    x01 = x[:, jnp.asarray([1, 0, 2])]
    np.testing.assert_allclose(np.asarray(psi(params, x01)), -v,
                               rtol=1e-5, atol=1e-7)
    # cyclic (0 1 2) is even
    xcyc = x[:, jnp.asarray([1, 2, 0])]
    np.testing.assert_allclose(np.asarray(psi(params, xcyc)), v,
                               rtol=1e-5, atol=1e-7)


def test_trainer_antisym_smoke():
    """VMCTrainer with ansatz='antisym' + Metropolis trains finitely on a
    tiny 2D He config (CPU)."""
    from waveflow_tpu.vmc import VMCConfig, VMCTrainer
    cfg = VMCConfig(system_name='He', n_space_dimension=2, box_length=5.0,
                    ansatz='antisym', sampler='metropolis',
                    batch_size=64, window=4, num_epochs=8, log_every=8,
                    num_knots=8, n_flow_layers=1, spline_degree=4,
                    n_spline_base_mesh_points=600,
                    save_dir='/tmp/test_antisym_smoke',
                    compilation_cache_dir=None)
    t = VMCTrainer(cfg)
    assert t.ansatz == 'antisym'
    assert t.xu_coord_type == 'independent'
    losses = t.train(num_epochs=8, verbose=False)
    assert np.isfinite(np.asarray(losses)).all()


def test_trainer_antisym_rejects_ancestral():
    from waveflow_tpu.vmc import VMCConfig, VMCTrainer
    with pytest.raises(ValueError, match="ancestral"):
        VMCTrainer(VMCConfig(system_name='He', n_space_dimension=2,
                             ansatz='antisym', sampler='ancestral',
                             compilation_cache_dir=None))


def test_free_fermion_energy_2d():
    """Analytic 2D free-fermion oracle: level filling of
    (nx²+ny²)π²/(2(2L)²)."""
    from waveflow_tpu.physics.exact import exact_free_fermion_energy_2d
    L = 5.0
    unit = np.pi ** 2 / (2 * (2 * L) ** 2)
    np.testing.assert_allclose(exact_free_fermion_energy_2d(1, L), 2 * unit)
    np.testing.assert_allclose(exact_free_fermion_energy_2d(2, L), 7 * unit)
    np.testing.assert_allclose(exact_free_fermion_energy_2d(3, L), 12 * unit)
    np.testing.assert_allclose(exact_free_fermion_energy_2d(4, L), 20 * unit)
    # levels 2, 5, 5, 8, 10 — (2,2)=8 fills before the (1,3)/(3,1) pair
    np.testing.assert_allclose(exact_free_fermion_energy_2d(5, L), 30 * unit)


def test_trainer_antisym_2d_3e_smoke():
    """First 3-electron 2D configuration: 6-term antisymmetrization over
    a 6-dimensional square-flow, Metropolis-trained (CPU smoke)."""
    from waveflow_tpu.vmc import VMCConfig, VMCTrainer
    cfg = VMCConfig(system_name='box3', n_space_dimension=2, box_length=5.0,
                    ansatz='antisym', sampler='metropolis',
                    interactions=False,
                    batch_size=32, window=3, num_epochs=6, log_every=6,
                    num_knots=6, n_flow_layers=1, spline_degree=4,
                    n_spline_base_mesh_points=400,
                    save_dir='/tmp/test_antisym_2d3e',
                    compilation_cache_dir=None)
    t = VMCTrainer(cfg)
    assert t.input_dim == 6 and t.ansatz == 'antisym'
    losses = t.train(num_epochs=6, verbose=False)
    assert np.isfinite(np.asarray(losses)).all()

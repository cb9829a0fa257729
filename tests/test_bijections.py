"""Property tests for every bijection: round-trip bijectivity, shapes, and
log-det vs autodiff Jacobian (the upgrade over the reference's
tests/test_bijections.py which only checks round-trip + shape)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveflow_tpu import bijections as bj

RNG = jax.random.PRNGKey(0)
N, D = 24, 4


def uniform_inputs(rng=RNG, n=N, d=D, lo=0.05, hi=0.95):
    return jax.random.uniform(rng, (n, d), minval=lo, maxval=hi)


def check_bijective(init_fun, inputs, atol=1e-4):
    params, direct, inverse = init_fun(RNG, inputs.shape[-1])
    mapped, ldj = direct(params, inputs)
    rec, _ = inverse(params, mapped)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(inputs), atol=atol)
    assert mapped.shape == inputs.shape
    return params, direct, inverse


def check_log_det(init_fun, inputs, atol=5e-3):
    """log|det J| from the layer must match autodiff of direct_fun."""
    params, direct, _ = init_fun(RNG, inputs.shape[-1])
    _, ldj = direct(params, inputs)

    def single(x):
        y, _ = direct(params, x[None])
        return y[0]

    jac = jax.vmap(jax.jacfwd(single))(inputs)
    sign, ref_ldj = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(np.asarray(ldj), ref_ldj, atol=atol)


normal_inputs = lambda: jax.random.normal(RNG, (N, D))


def test_actnorm():
    check_bijective(bj.ActNorm(), normal_inputs())
    check_log_det(bj.ActNorm(), normal_inputs())


def test_actnorm_data_dependent_init():
    inputs = normal_inputs() * 3 + 1
    params, direct, _ = bj.ActNorm()(RNG, D, init_inputs=inputs)
    out, _ = direct(params, inputs)
    np.testing.assert_allclose(np.asarray(out.mean(0)), 0.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.std(0)), 1.0, atol=1e-2)


def test_affine_coupling():
    transform = bj.simple_masked_transform(output_shape=2)

    def net(rng, d_in, d_out):
        import numpy as onp
        k1, k2 = jax.random.split(rng)
        W = jax.random.normal(k1, (d_in, d_out)) * 0.1
        b = jnp.zeros(d_out)
        return (W, b), lambda p, x: jnp.tanh(x @ p[0]) + p[1]

    check_bijective(bj.AffineCoupling(net), normal_inputs())
    check_log_det(bj.AffineCoupling(net), normal_inputs())


def test_affine_coupling_split():
    def net(rng, d_in, d_out):
        W = jax.random.normal(rng, (d_in, d_out)) * 0.1
        return (W,), lambda p, x: jnp.tanh(x @ p[0])

    check_bijective(bj.AffineCouplingSplit(net, net), normal_inputs())
    check_log_det(bj.AffineCouplingSplit(net, net), normal_inputs())


def test_invertible_linear():
    check_bijective(bj.InvertibleLinear(), normal_inputs(), atol=1e-3)
    check_log_det(bj.InvertibleLinear(), normal_inputs())


def test_fixed_invertible_linear():
    check_bijective(bj.FixedInvertibleLinear(), normal_inputs(), atol=1e-3)
    check_log_det(bj.FixedInvertibleLinear(), normal_inputs())


def test_sigmoid_logit():
    check_bijective(bj.Sigmoid(), normal_inputs())
    check_log_det(bj.Sigmoid(), normal_inputs())
    check_bijective(bj.Logit(), uniform_inputs())


def test_reverse_shuffle_serial():
    check_bijective(bj.Reverse(), normal_inputs())
    check_bijective(bj.Shuffle(), normal_inputs())
    check_bijective(bj.Serial(bj.Shuffle(), bj.Reverse(), bj.ActNorm()),
                    normal_inputs())


def test_batchnorm_roundtrip():
    params, direct, inverse = bj.BatchNorm()(RNG, D)
    x = normal_inputs()
    y, _ = direct(params, x)
    rec, _ = inverse(params, y)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-4)


def test_made_affine():
    init = bj.MADE(bj.simple_masked_transform(output_shape=2))
    check_bijective(init, normal_inputs(), atol=1e-3)
    check_log_det(init, normal_inputs())


def test_made_autoregressive_property():
    """Output params for dim d must not depend on inputs >= d."""
    params, apply_fn = bj.masked_mlp(RNG, D, 3)
    x = normal_inputs()
    jac = jax.vmap(jax.jacfwd(lambda xx: apply_fn(params, xx[None])[0]))(x)
    # jac: (N, 3*D, D); output column group g*D+d depends only on inputs < d
    jac = np.asarray(jac).reshape(N, 3, D, D)
    for d in range(D):
        assert np.abs(jac[:, :, d, d:]).max() < 1e-7


def test_imade_bijective_and_log_det():
    init = bj.IMADE(bj.masked_conditioner(), spline_degree=4,
                    n_internal_knots=8, spline_regularization=0.1,
                    n_spline_base_mesh_points=500)
    inputs = uniform_inputs()
    params, direct, inverse = init(RNG, D)
    y, ldj = direct(params, inputs)
    assert ((y >= -1e-5) & (y <= 1 + 1e-5)).all()
    rec, _ = inverse(params, y)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(inputs), atol=2e-4)

    # log-det vs autodiff (tolerance loosened: layer adds +1e-7 inside log)
    def single(x):
        yy, _ = direct(params, x[None])
        return yy[0]

    jac = jax.vmap(jax.jacfwd(single))(inputs)
    _, ref_ldj = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(np.asarray(ldj), ref_ldj, atol=5e-3)


@pytest.mark.parametrize("coord_type", ["first", "mean", "independent"])
@pytest.mark.parametrize("dim", [2, 3, 5])
def test_box_transform_roundtrip(coord_type, dim):
    L = 3.0
    init = bj.BoxTransformLayer(L, xu_coord_type=coord_type)
    params, direct, inverse = init(RNG, dim)
    x = jnp.sort(jax.random.uniform(RNG, (N, dim), minval=-L * 0.95,
                                    maxval=L * 0.95), axis=-1)
    u, ldj = direct(params, x)
    assert ((u >= -1e-5) & (u <= 1 + 1e-5)).all(), (coord_type, dim)
    rec, _ = inverse(params, u)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-3)


@pytest.mark.parametrize("coord_type", ["first", "mean", "independent"])
def test_box_transform_log_det(coord_type):
    L = 2.0
    dim = 3
    init = bj.BoxTransformLayer(L, xu_coord_type=coord_type)
    params, direct, _ = init(RNG, dim)
    x = jnp.sort(jax.random.uniform(RNG, (N, dim), minval=-L * 0.9,
                                    maxval=L * 0.9), axis=-1)
    _, ldj = direct(params, x)

    def single(xx):
        u, _ = direct(params, xx[None])
        return u[0]

    jac = jax.vmap(jax.jacfwd(single))(x)
    _, ref_ldj = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(np.asarray(ldj), ref_ldj, atol=1e-3)


@pytest.mark.parametrize("n_el", [2, 3])
def test_box_transform_paired2d_roundtrip_and_logdet(n_el):
    """'paired2d': interleaved (x1,y1,x2,y2,...) with x's sorted — the 2D
    fermion sector map.  Round-trip and log-det vs autodiff."""
    L = 3.0
    dim = 2 * n_el
    init = bj.BoxTransformLayer(L, xu_coord_type='paired2d')
    params, direct, inverse = init(RNG, dim)
    x = jax.random.uniform(RNG, (N, dim), minval=-L * 0.9, maxval=L * 0.9)
    # sort the electron pairs by x coordinate (the ansatz sector)
    xe = x.reshape(N, n_el, 2)
    order = jnp.argsort(xe[:, :, 0], axis=1)
    x = jnp.take_along_axis(xe, order[:, :, None], axis=1).reshape(N, dim)

    u, ldj = direct(params, x)
    assert u.shape == (N, dim)
    assert ((u >= -1e-5) & (u <= 1 + 1e-5)).all()
    rec, _ = inverse(params, u)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-3)

    def single(xx):
        uu, _ = direct(params, xx[None])
        return uu[0]

    jac = jax.vmap(jax.jacfwd(single))(x)
    _, ref_ldj = np.linalg.slogdet(np.asarray(jac))
    np.testing.assert_allclose(np.asarray(ldj), ref_ldj, atol=1e-3)


def test_rqs_spline_roundtrip_and_logdet():
    from waveflow_tpu.bijections.rqs import rational_quadratic_spline
    rng = np.random.default_rng(7)
    K = 8
    shape = (64,)
    x = jnp.asarray(rng.uniform(-4, 4, shape).astype(np.float32))
    uw = jnp.asarray(rng.normal(size=shape + (K,)).astype(np.float32))
    uh = jnp.asarray(rng.normal(size=shape + (K,)).astype(np.float32))
    ud = jnp.asarray(rng.normal(size=shape + (K - 1,)).astype(np.float32))
    y, ld = rational_quadratic_spline(x, uw, uh, ud, interval=3.0)
    x_rec, ld_inv = rational_quadratic_spline(y, uw, uh, ud, interval=3.0,
                                              inverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld), -np.asarray(ld_inv), atol=1e-4)
    # identity + zero log-det outside the interval
    outside = np.abs(np.asarray(x)) >= 3.0
    np.testing.assert_allclose(np.asarray(y)[outside],
                               np.asarray(x)[outside], atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld)[outside], 0.0, atol=1e-6)
    # log-det matches numeric derivative inside
    eps = 1e-3
    y2, _ = rational_quadratic_spline(x + eps, uw, uh, ud, interval=3.0)
    num = (np.asarray(y2) - np.asarray(y)) / eps
    inside = np.abs(np.asarray(x)) < 2.9
    np.testing.assert_allclose(np.exp(np.asarray(ld))[inside], num[inside],
                               rtol=0.05)


def test_neural_spline_coupling_bijective():
    init = bj.NeuralSplineCoupling(n_bins=6, interval=3.0)
    inputs = jax.random.normal(RNG, (32, 4))
    params, direct, inverse = init(RNG, 4)
    y, ldj = direct(params, inputs)
    # zero-initialized last layer -> exactly identity at init
    np.testing.assert_allclose(np.asarray(y), np.asarray(inputs), atol=1e-5)
    # perturb params, still bijective.  Near-flat spline regions make the
    # x-space inverse ill-conditioned in f32, so assert consistency in
    # y-space (machine-precision there) and loosely in x-space.
    params = jax.tree_util.tree_map(
        lambda p: p + 0.1 * jax.random.normal(RNG, p.shape), params)
    y, ldj = direct(params, inputs)
    rec, _ = inverse(params, y)
    y2, _ = direct(params, rec)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-5)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(inputs), atol=5e-3)
    check_log_det(lambda r, d: (params, direct, inverse), inputs)

"""Rational-quadratic spline (RQS) coupling layer.

The reference ships a neural-spline-flows port (flows/bijections/
neural_splines.py) that crashes on any modern JAX — it still calls the
`jax.ops.index_update` API removed years ago (SURVEY §2 row 10).  This is a
clean reimplementation of Durkan et al., "Neural Spline Flows"
(arXiv:1906.04032) with pure functional ops: batched searchsorted bin
lookup, closed-form forward/inverse, analytic log-det.  Identity tails
outside [-B, B].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import random

DEFAULT_MIN_BIN = 1e-3
DEFAULT_MIN_DERIV = 1e-3


def _normalize_bins(unnormalized, total, min_bin):
    n = unnormalized.shape[-1]
    w = jax.nn.softmax(unnormalized, axis=-1)
    w = min_bin + (1 - min_bin * n) * w
    return w * total


def rational_quadratic_spline(x, unnorm_widths, unnorm_heights,
                              unnorm_derivs, interval: float = 3.0,
                              inverse: bool = False,
                              min_bin: float = DEFAULT_MIN_BIN,
                              min_deriv: float = DEFAULT_MIN_DERIV):
    """Elementwise monotone RQS on [-interval, interval], identity outside.

    Shapes: x (...,), unnorm_widths/heights (..., K), unnorm_derivs (..., K-1).
    Returns (y, log_abs_det) with log-det 0 outside the interval.
    """
    K = unnorm_widths.shape[-1]
    B = interval

    widths = _normalize_bins(unnorm_widths, 2 * B, min_bin)
    heights = _normalize_bins(unnorm_heights, 2 * B, min_bin)
    # shift so zero raw params give derivative exactly 1 (identity init)
    shift = jnp.log(jnp.expm1(1.0 - min_deriv))
    derivs = min_deriv + jax.nn.softplus(unnorm_derivs + shift)  # (..., K-1)
    # boundary derivatives pinned to 1 for identity tails
    pad = jnp.ones_like(derivs[..., :1])
    derivs = jnp.concatenate([pad, derivs, pad], axis=-1)        # (..., K+1)

    cumw = jnp.cumsum(widths, -1) - B
    cumw = jnp.concatenate([jnp.full_like(cumw[..., :1], -B), cumw], -1)
    cumh = jnp.cumsum(heights, -1) - B
    cumh = jnp.concatenate([jnp.full_like(cumh[..., :1], -B), cumh], -1)

    inside = (x > -B) & (x < B)
    x_safe = jnp.where(inside, x, 0.0)

    ref = cumh if inverse else cumw
    # bin index: number of knots strictly below x, minus 1
    k = jnp.sum(ref[..., :-1] <= x_safe[..., None], axis=-1) - 1
    k = jnp.clip(k, 0, K - 1)

    take = lambda a: jnp.take_along_axis(a, k[..., None], -1)[..., 0]
    xk = take(cumw)
    yk = take(cumh)
    wk = take(widths)
    hk = take(heights)
    dk = take(derivs)
    dk1 = take(derivs[..., 1:])
    sk = hk / wk

    if not inverse:
        xi = (x_safe - xk) / wk
        xi1m = xi * (1 - xi)
        denom = sk + (dk1 + dk - 2 * sk) * xi1m
        num = hk * (sk * xi ** 2 + dk * xi1m)
        y = yk + num / denom
        deriv = sk ** 2 * (dk1 * xi ** 2 + 2 * sk * xi1m + dk * (1 - xi) ** 2) \
            / denom ** 2
        y = jnp.where(inside, y, x)
        ld = jnp.where(inside, jnp.log(deriv), 0.0)
        return y, ld
    else:
        y_rel = x_safe - yk
        a = hk * (sk - dk) + y_rel * (dk1 + dk - 2 * sk)
        b = hk * dk - y_rel * (dk1 + dk - 2 * sk)
        c = -sk * y_rel
        disc = b ** 2 - 4 * a * c
        xi = 2 * c / (-b - jnp.sqrt(jnp.maximum(disc, 0.0)))
        xi = jnp.clip(xi, 0.0, 1.0)
        x_out = xi * wk + xk
        xi1m = xi * (1 - xi)
        denom = sk + (dk1 + dk - 2 * sk) * xi1m
        deriv = sk ** 2 * (dk1 * xi ** 2 + 2 * sk * xi1m + dk * (1 - xi) ** 2) \
            / denom ** 2
        x_out = jnp.where(inside, x_out, x)
        ld = jnp.where(inside, -jnp.log(deriv), 0.0)
        return x_out, ld


def NeuralSplineCoupling(n_bins: int = 8, interval: float = 3.0,
                         hidden_dim: int = 64, n_hidden: int = 2):
    """RQS coupling bijection: lower half conditions an RQS applied to the
    upper half (protocol of bijections/core.py)."""

    def init_fun(rng, input_dim, **kwargs):
        cutoff = input_dim // 2
        upper_dim = input_dim - cutoff
        n_params = upper_dim * (3 * n_bins - 1)

        keys = random.split(rng, n_hidden + 1)
        sizes = [cutoff] + [hidden_dim] * n_hidden + [n_params]
        params = []
        for i, key in enumerate(keys):
            k1, k2 = random.split(key)
            scale = 1.0 / jnp.sqrt(sizes[i])
            W = random.normal(k1, (sizes[i], sizes[i + 1])) * scale
            b = jnp.zeros(sizes[i + 1])
            params.append((W, b))
        # zero-init the last layer: the coupling starts as the identity
        W, b = params[-1]
        params[-1] = (W * 0.0, b)

        def net(params, x):
            h = x
            for i, (W, b) in enumerate(params):
                h = h @ W + b
                if i < len(params) - 1:
                    h = jax.nn.relu(h)
            return h.reshape(x.shape[0], upper_dim, 3 * n_bins - 1)

        def split_params(theta):
            return (theta[..., :n_bins], theta[..., n_bins:2 * n_bins],
                    theta[..., 2 * n_bins:])

        def direct_fun(params, inputs, **kwargs):
            lower, upper = inputs[:, :cutoff], inputs[:, cutoff:]
            uw, uh, ud = split_params(net(params, lower))
            y, ld = rational_quadratic_spline(upper, uw, uh, ud, interval)
            return jnp.concatenate([lower, y], 1), ld.sum(-1)

        def inverse_fun(params, inputs, **kwargs):
            lower, upper = inputs[:, :cutoff], inputs[:, cutoff:]
            uw, uh, ud = split_params(net(params, lower))
            y, ld = rational_quadratic_spline(upper, uw, uh, ud, interval,
                                              inverse=True)
            return jnp.concatenate([lower, y], 1), ld.sum(-1)

        return params, direct_fun, inverse_fun

    return init_fun

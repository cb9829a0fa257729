"""Bijection combinators — the layer protocol of the framework.

Protocol (inherited from the reference's jax-flows fork, bijections.py:7-16):
a layer constructor returns ``init_fun(rng, input_dim, **kw)`` which returns
``(params, direct_fun, inverse_fun)``; both funs map ``(params, inputs)`` to
``(outputs, log_det_jacobian)`` over a (batch, dim) array.  All functions are
pure and jit/vmap/shard_map-compatible (the sole exception, BatchNorm, is
documented below).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import random
from jax.nn.initializers import orthogonal
from jax.scipy import linalg


def ActNorm():
    """Activation normalization (Glow); data-dependent init via
    ``init_inputs`` kwarg (cf. bijections.py:19-51)."""

    def init_fun(rng, input_dim, **kwargs):
        init_inputs = kwargs.pop("init_inputs", None)
        if init_inputs is not None:
            log_weight = jnp.log(1.0 / (init_inputs.std(0) + 1e-6))
            bias = init_inputs.mean(0)
        else:
            log_weight = jnp.zeros(input_dim)
            bias = jnp.zeros(input_dim)

        def direct_fun(params, inputs, **kwargs):
            log_weight, bias = params
            outputs = (inputs - bias) * jnp.exp(log_weight)
            return outputs, jnp.full(inputs.shape[:1], log_weight.sum())

        def inverse_fun(params, inputs, **kwargs):
            log_weight, bias = params
            outputs = inputs * jnp.exp(-log_weight) + bias
            return outputs, jnp.full(inputs.shape[:1], -log_weight.sum())

        return (log_weight, bias), direct_fun, inverse_fun

    return init_fun


def AffineCoupling(transform):
    """RealNVP coupling; ``transform(rng, d_in, d_out) -> (params, apply)``
    emits concatenated (log_scale, shift) (cf. bijections.py:104-141)."""

    def init_fun(rng, input_dim, **kwargs):
        cutoff = input_dim // 2
        params, apply_fun = transform(rng, cutoff, 2 * (input_dim - cutoff))

        def direct_fun(params, inputs, **kwargs):
            lower, upper = inputs[:, :cutoff], inputs[:, cutoff:]
            log_weight, bias = jnp.split(apply_fun(params, lower), 2, axis=1)
            upper = upper * jnp.exp(log_weight) + bias
            return jnp.concatenate([lower, upper], axis=1), log_weight.sum(-1)

        def inverse_fun(params, inputs, **kwargs):
            lower, upper = inputs[:, :cutoff], inputs[:, cutoff:]
            log_weight, bias = jnp.split(apply_fun(params, lower), 2, axis=1)
            upper = (upper - bias) * jnp.exp(-log_weight)
            return jnp.concatenate([lower, upper], axis=1), log_weight.sum(-1)

        return params, direct_fun, inverse_fun

    return init_fun


def AffineCouplingSplit(scale, translate):
    """RealNVP coupling with separate scale/translate nets
    (cf. bijections.py:54-101)."""

    def init_fun(rng, input_dim, **kwargs):
        cutoff = input_dim // 2
        s_rng, t_rng = random.split(rng)
        s_params, s_apply = scale(s_rng, cutoff, input_dim - cutoff)
        t_params, t_apply = translate(t_rng, cutoff, input_dim - cutoff)

        def direct_fun(params, inputs, **kwargs):
            s_params, t_params = params
            lower, upper = inputs[:, :cutoff], inputs[:, cutoff:]
            log_weight = s_apply(s_params, lower)
            bias = t_apply(t_params, lower)
            upper = upper * jnp.exp(log_weight) + bias
            return jnp.concatenate([lower, upper], axis=1), log_weight.sum(-1)

        def inverse_fun(params, inputs, **kwargs):
            s_params, t_params = params
            lower, upper = inputs[:, :cutoff], inputs[:, cutoff:]
            log_weight = s_apply(s_params, lower)
            bias = t_apply(t_params, lower)
            upper = (upper - bias) * jnp.exp(-log_weight)
            return jnp.concatenate([lower, upper], axis=1), log_weight.sum(-1)

        return (s_params, t_params), direct_fun, inverse_fun

    return init_fun


def BatchNorm(momentum=0.9, eps=1e-5):
    """Invertible normalization by stored running statistics — pure.

    TPU-first redesign of the reference's stateful BatchNorm
    (bijections.py:144-216), which kept batch/running statistics in a
    Python dict closed over by the apply functions: not jit-pure across
    calls, unusable under shard_map, and its train-mode inverse silently
    depended on whichever forward ran last.  Here the statistics live in
    the params pytree: ``params = (log_weight, bias, mean, var)``.  Direct
    and inverse always normalize by the stored statistics, so they are
    exact inverses of each other with a well-defined log-det, under any
    transform.  To train with data-dependent statistics, fold batch
    moments into the params between optimizer steps with
    ``batchnorm_update_stats`` (an EMA update, outside the gradient), or
    initialize from data via the ``init_inputs`` kwarg like ActNorm.
    The statistics never receive gradients (stop_gradient).
    """

    def init_fun(rng, input_dim, **kwargs):
        init_inputs = kwargs.pop("init_inputs", None)
        if init_inputs is not None:
            mean = init_inputs.mean(0)
            var = init_inputs.var(0) + eps
        else:
            mean = jnp.zeros(input_dim)
            var = jnp.ones(input_dim)
        params = (jnp.zeros(input_dim), jnp.zeros(input_dim), mean, var)

        def direct_fun(params, inputs, **kwargs):
            log_weight, bias, mean, var = params
            mean = jax.lax.stop_gradient(mean)
            var = jax.lax.stop_gradient(var)
            x_hat = (inputs - mean) / jnp.sqrt(var)
            outputs = x_hat * jnp.exp(log_weight) + bias
            ldj = jnp.full(inputs.shape[:1],
                           (log_weight - 0.5 * jnp.log(var)).sum())
            return outputs, ldj

        def inverse_fun(params, inputs, **kwargs):
            log_weight, bias, mean, var = params
            mean = jax.lax.stop_gradient(mean)
            var = jax.lax.stop_gradient(var)
            x_hat = (inputs - bias) * jnp.exp(-log_weight)
            outputs = x_hat * jnp.sqrt(var) + mean
            ldj = jnp.full(inputs.shape[:1],
                           (-log_weight + 0.5 * jnp.log(var)).sum())
            return outputs, ldj

        return params, direct_fun, inverse_fun

    return init_fun


def batchnorm_update_stats(params, batch, momentum=0.9, eps=1e-5):
    """EMA-fold a batch's moments into BatchNorm params (pure, jittable).

    Call between optimizer steps; returns new params with updated
    (mean, var) and untouched (log_weight, bias)."""
    log_weight, bias, mean, var = params
    new_mean = momentum * mean + (1 - momentum) * batch.mean(0)
    new_var = momentum * var + (1 - momentum) * (batch.var(0) + eps)
    return (log_weight, bias, new_mean, new_var)


def Invert(bijection):
    """Swap a bijection's direct and inverse maps (cf. bijections.py:219-230)."""

    def init_fun(rng, input_dim, **kwargs):
        params, direct_fun, inverse_fun = bijection(rng, input_dim)
        return params, inverse_fun, direct_fun

    return init_fun


def FixedInvertibleLinear():
    """Fixed random orthogonal 1x1 "convolution" (cf. bijections.py:233-258)."""

    def init_fun(rng, input_dim, **kwargs):
        W = orthogonal()(rng, (input_dim, input_dim))
        W_inv = linalg.inv(W)
        W_log_det = jnp.linalg.slogdet(W)[-1]

        def direct_fun(params, inputs, **kwargs):
            return inputs @ W, jnp.full(inputs.shape[:1], W_log_det)

        def inverse_fun(params, inputs, **kwargs):
            return inputs @ W_inv, jnp.full(inputs.shape[:1], -W_log_det)

        return (), direct_fun, inverse_fun

    return init_fun


def InvertibleLinear():
    """Trainable invertible linear layer in PLU parameterization
    (cf. bijections.py:261-298)."""

    def init_fun(rng, input_dim, **kwargs):
        W = orthogonal()(rng, (input_dim, input_dim))
        P, L, U = jax.scipy.linalg.lu(W)
        S = jnp.diag(U)
        U = jnp.triu(U, 1)
        identity = jnp.eye(input_dim)

        def assemble(params):
            L, U, S = params
            L = jnp.tril(L, -1) + identity
            U = jnp.triu(U, 1)
            return P @ L @ (U + jnp.diag(S))

        def direct_fun(params, inputs, **kwargs):
            W = assemble(params)
            ldj = jnp.full(inputs.shape[:1], jnp.log(jnp.abs(params[2])).sum())
            return inputs @ W, ldj

        def inverse_fun(params, inputs, **kwargs):
            W = assemble(params)
            ldj = jnp.full(inputs.shape[:1], -jnp.log(jnp.abs(params[2])).sum())
            return inputs @ linalg.inv(W), ldj

        return (L, U, S), direct_fun, inverse_fun

    return init_fun


def Sigmoid(clip_before_logit=True):
    """Elementwise sigmoid with logit inverse (cf. bijections.py:384-414)."""

    def init_fun(rng, input_dim, **kwargs):
        def direct_fun(params, inputs, **kwargs):
            s = jax.nn.sigmoid(inputs)
            ldj = jnp.log(s * (1 - s)).sum(-1)
            return s, ldj

        def inverse_fun(params, inputs, **kwargs):
            if clip_before_logit:
                inputs = jnp.clip(inputs, 1e-5, 1 - 1e-5)
            outputs = jax.scipy.special.logit(inputs)
            ldj = -jnp.log(inputs - jnp.square(inputs)).sum(-1)
            return outputs, ldj

        return (), direct_fun, inverse_fun

    return init_fun


def Logit(clip_before_logit=True):
    """Logit with sigmoid inverse (cf. bijections.py:301-314)."""
    return Invert(Sigmoid(clip_before_logit))


def Reverse():
    """Static dimension reversal (cf. bijections.py:317-347)."""

    def init_fun(rng, input_dim, **kwargs):
        perm = jnp.arange(input_dim)[::-1]

        def direct_fun(params, inputs, **kwargs):
            return inputs[:, perm], jnp.zeros(inputs.shape[:1])

        def inverse_fun(params, inputs, **kwargs):
            return inputs[:, perm], jnp.zeros(inputs.shape[:1])

        return (), direct_fun, inverse_fun

    return init_fun


def Shuffle():
    """Random fixed permutation (cf. bijections.py:350-381)."""

    def init_fun(rng, input_dim, **kwargs):
        perm = random.permutation(rng, jnp.arange(input_dim))
        inv_perm = jnp.argsort(perm)

        def direct_fun(params, inputs, **kwargs):
            return inputs[:, perm], jnp.zeros(inputs.shape[:1])

        def inverse_fun(params, inputs, **kwargs):
            return inputs[:, inv_perm], jnp.zeros(inputs.shape[:1])

        return (), direct_fun, inverse_fun

    return init_fun


def MADE(transform):
    """Affine masked autoregressive layer (cf. made.py:7-41).

    ``transform(rng, input_dim) -> (params, apply)`` with apply emitting
    (batch, 2*input_dim) concatenated (log_scale, shift).
    """

    def init_fun(rng, input_dim, **kwargs):
        params, apply_fun = transform(rng, input_dim)

        def direct_fun(params, inputs, **kwargs):
            log_weight, bias = jnp.split(apply_fun(params, inputs), 2, axis=1)
            outputs = (inputs - bias) * jnp.exp(-log_weight)
            return outputs, -log_weight.sum(-1)

        def inverse_fun(params, inputs, **kwargs):
            # column i's (log_weight, bias) depend only on columns < i, which
            # are final by iteration i — so the per-column log-dets summed in
            # the loop equal the true inverse log-det +Σ log_weight(x) (the
            # reference returns 0 here, made.py:38; fixed, not copied)
            outputs = jnp.zeros_like(inputs)
            log_det = jnp.zeros(inputs.shape[:1])
            for i_col in range(inputs.shape[1]):
                log_weight, bias = jnp.split(apply_fun(params, outputs), 2, axis=1)
                outputs = outputs.at[:, i_col].set(
                    inputs[:, i_col] * jnp.exp(log_weight[:, i_col]) + bias[:, i_col])
                log_det = log_det + log_weight[:, i_col]
            return outputs, log_det

        return params, direct_fun, inverse_fun

    return init_fun


def Serial(*init_funs):
    """Sequential composition; accumulates log-dets (cf. bijections.py:417-467)."""

    def init_fun(rng, input_dim, **kwargs):
        init_inputs = kwargs.pop("init_inputs", None)
        all_params, direct_funs, inverse_funs = [], [], []
        for layer_init in init_funs:
            rng, layer_rng = random.split(rng)
            param, d_fun, i_fun = layer_init(layer_rng, input_dim,
                                             init_inputs=init_inputs)
            all_params.append(param)
            direct_funs.append(d_fun)
            inverse_funs.append(i_fun)
            if init_inputs is not None:
                init_inputs = d_fun(param, init_inputs)[0]

        def feed_forward(params, apply_funs, inputs):
            log_det = jnp.zeros(inputs.shape[:1])
            for apply_fun, param in zip(apply_funs, params):
                inputs, ldj = apply_fun(param, inputs)
                log_det = log_det + ldj
            return inputs, log_det

        def direct_fun(params, inputs, **kwargs):
            return feed_forward(params, direct_funs, inputs)

        def inverse_fun(params, inputs, **kwargs):
            return feed_forward(list(reversed(params)),
                                list(reversed(inverse_funs)), inputs)

        return all_params, direct_fun, inverse_fun

    return init_fun

"""MADE autoregressive masks and masked-dense conditioners.

TPU-native re-expression of model_factory.py:8-93: the masked network is a
stack of dense matmuls with static binary masks folded into the weights
(single MXU matmul per layer, no gather/scatter), emitting per-dimension
spline-parameter vectors with the autoregressive property that the
parameters for dimension d depend only on inputs < d.

Mask construction follows the reference degree scheme (model_factory.py:8-19):
input degrees 0..D-1, hidden degrees i % (D-1), output degrees (i % D) - 1,
connection allowed iff downstream_degree >= upstream_degree.  Output slot d
having degree d-1 yields strict autoregression (slot 0 sees nothing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def made_degrees(input_dim: int, hidden_dim: int, num_hidden: int):
    if input_dim == 1:
        # Degenerate autoregression: the single output slot conditions on
        # nothing, so the network collapses to a learned constant (an
        # all-zero mask keeps only the bias).  The reference crashes here
        # (model_factory.py:14 takes % (input_dim - 1)), which made its own
        # 1-electron catalogue entries (H, He+, H2+) untrainable with the
        # waveflow ansatz; supporting n=1 is a deliberate extension.
        return [np.arange(1), np.arange(1) - 1]
    if input_dim < 1:
        raise ValueError("MADE masks require input_dim >= 1")
    degrees = [np.arange(input_dim)]
    for _ in range(num_hidden + 1):
        degrees.append(np.arange(hidden_dim) % (input_dim - 1))
    degrees.append(np.arange(input_dim) % input_dim - 1)
    return degrees


def made_masks(input_dim: int, hidden_dim: int = 64, num_hidden: int = 1):
    """List of (fan_in, fan_out) float32 masks, one per dense layer."""
    degs = made_degrees(input_dim, hidden_dim, num_hidden)
    masks = []
    for d0, d1 in zip(degs[:-1], degs[1:]):
        masks.append((d1[None, :] >= d0[:, None]).astype(np.float32))
    return masks


def _dense_init(rng, fan_in: int, fan_out: int):
    k1, k2 = jax.random.split(rng)
    bound = 1.0 / np.sqrt(fan_in)
    W = jax.random.uniform(k1, (fan_in, fan_out), minval=-bound, maxval=bound)
    b = jax.random.uniform(k2, (fan_out,), minval=-bound, maxval=bound)
    return W, b


def masked_mlp(rng, input_dim: int, n_out_params: int,
               hidden_dim: int = 64, num_hidden: int = 1):
    """Masked MLP emitting (batch, input_dim * n_out_params) features.

    Final mask is tiled n_out_params times along the output axis
    (model_factory.py:47,81) so each parameter group inherits the output
    autoregressive degree of its dimension.
    """
    masks = made_masks(input_dim, hidden_dim, num_hidden)
    tiled_last = np.tile(masks[-1], n_out_params)
    mask_consts = [jnp.asarray(m) for m in masks[:-1]] + [jnp.asarray(tiled_last)]

    params = []
    fan_in = input_dim
    for m in mask_consts:
        rng, layer_rng = jax.random.split(rng)
        params.append(_dense_init(layer_rng, m.shape[0], m.shape[1]))
        fan_in = m.shape[1]

    def apply_fn(params, x):
        h = x
        n_layers = len(mask_consts)
        for i, ((W, b), m) in enumerate(zip(params, mask_consts)):
            h = h @ (W * m) + b
            if i < n_layers - 1:
                h = jnp.tanh(h)
        return h

    return params, apply_fn


def simple_masked_transform(output_shape: int = 2, hidden_dim: int = 64,
                            num_hidden: int = 1):
    """Plain masked MLP factory for the affine MADE layer
    (model_factory.py:37-51): ``(rng, input_dim) -> (params, apply)`` with
    apply emitting (batch, output_shape * input_dim) grouped features."""

    def make(rng, input_dim):
        return masked_mlp(rng, input_dim, output_shape, hidden_dim, num_hidden)

    return make


def masked_conditioner(allow_negative_params: bool = False,
                       hidden_dim: int = 64, num_hidden: int = 1):
    """Factory matching the reference's ``masked_transform``
    (model_factory.py:55-88): returns ``(rng, input_dim, n_out_params,
    set_nn_output_grad_to_zero) -> (params, apply_fn)`` where apply_fn maps
    (batch, input_dim) -> (batch, input_dim, n_out_params) sum-normalized
    spline parameters.

    With allow_negative_params=False the raw outputs pass through a sigmoid
    (positive weights for monotone I-spline layers); the optional
    cubed-input-product trick (model_factory.py:64-67) multiplies the NN
    output by prod_{j<d} x_j^3 and adds free "zero params" so that the
    parameter gradient w.r.t. inputs vanishes at the box corners.
    """

    def make(rng, input_dim, n_out_params, set_nn_output_grad_to_zero=False):
        rng, mlp_rng, zero_rng = jax.random.split(rng, 3)
        mlp_params, mlp_apply = masked_mlp(mlp_rng, input_dim, n_out_params,
                                           hidden_dim, num_hidden)
        zero_params = jax.random.uniform(
            zero_rng, (input_dim, n_out_params), minval=-0.5, maxval=0.5)
        params = (mlp_params, zero_params)

        def apply_fn(params, x):
            mlp_params, zero_params = params
            raw = mlp_apply(mlp_params, x)                  # (B, D*n_out)
            # (B, D*n_out) -> (B, D, n_out): group g of the tiled output is
            # parameter-slot g for every dimension (model_factory.py:59-60)
            B = raw.shape[0]
            p = raw.reshape(B, n_out_params, x.shape[-1]).swapaxes(-1, -2)
            if not allow_negative_params:
                p = jax.nn.sigmoid(p)
                zp = jnp.abs(zero_params)
            else:
                zp = zero_params
            if set_nn_output_grad_to_zero:
                cube = jnp.roll(jnp.cumprod(x ** 3, axis=-1), 1, axis=-1)
                cube = cube.at[:, 0].set(1.0)
                p = cube[..., None] * p + zp
            return p / p.sum(-1, keepdims=True)

        return params, apply_fn

    return make

"""MFlow — flow with an M-spline conditional (autoregressive) prior.

Reference: flows/distributions.py:116-194.  The prior density per dimension
is a conditional M-spline whose weights come from a second masked
autoregressive network evaluated on u-space; ancestral sampling draws each
dimension from its conditional via the exact inverse-CDF sampler
(ops/sampling.py) instead of the reference's vmapped per-sample rejection
loops (msplines_jax.py:129-154).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import random

from waveflow_tpu.ops import (
    get_tables, make_bias_remover, make_boundary_projector, make_evaluator,
    sample_linear_density,
)

LOG_TOL = 1e-7  # distributions.py:140


def MFlow(transformation, conditioner_factory, spline_degree, n_internal_knots,
          constraints_dict_left={0: 0}, constraints_dict_right={0: 0},
          set_nn_output_grad_to_zero=False, n_spline_base_mesh_points=2000):

    def init_fun(rng, input_dim):
        rng, transformation_rng = random.split(rng)
        rng, sp_rng = random.split(rng)

        transform_params, direct_fun, partial_inverse_fun = transformation(
            transformation_rng, input_dim)

        tabs = get_tables('M', spline_degree, n_internal_knots,
                          n_mesh=n_spline_base_mesh_points)
        ev = make_evaluator(tabs)
        project = make_boundary_projector(
            ev, constraints_dict_left, constraints_dict_right,
            normalization='sum')
        debias = make_bias_remover(ev.n_bases, spline_degree, 'M')

        sp_params_init, cond_apply = conditioner_factory(
            sp_rng, input_dim, ev.n_bases,
            set_nn_output_grad_to_zero=set_nn_output_grad_to_zero)

        def prior_weights(sp_params, u):
            p = cond_apply(sp_params, u)          # (B, D, n_bases)
            p = debias(p)
            return project(p)

        def log_pdf(params, inputs, return_sample=False):
            if inputs.ndim == 1:
                inputs = inputs[None]
            transform_params, sp_params = params
            u, log_det = direct_fun(transform_params, inputs)
            w = prior_weights(sp_params, u)
            u_c = jnp.clip(u, 0.0, 1.0)
            probs = ev(w, u_c)                    # (B, D)
            log_probs = jnp.log(probs + LOG_TOL).sum(-1)
            if return_sample:
                return log_probs + log_det, u
            return log_probs + log_det

        def sample(rng, params, num_samples=1, return_original_samples=False):
            transform_params, sp_params = params
            outputs = jnp.zeros((num_samples, input_dim))
            for i_col in range(input_dim):
                w = prior_weights(sp_params, outputs)
                rng, split_rng = random.split(rng)
                u = random.uniform(split_rng, (num_samples,))
                col = sample_linear_density(ev, w[:, i_col], u)
                outputs = outputs.at[:, i_col].set(col)
            final = partial_inverse_fun(transform_params, outputs)[0]
            if return_original_samples:
                return final, outputs
            return final

        return (transform_params, sp_params_init), log_pdf, sample

    return init_fun

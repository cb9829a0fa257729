"""IMADE — the invertible monotone autoregressive spline layer.

The core bijection of the framework (reference: made.py:44-105): a masked
autoregressive conditioner emits per-dimension I-spline weight vectors; the
forward map evaluates the monotone I-spline per coordinate with the log-det
as the sum of log spline derivatives; the inverse runs a dimension-sequential
batched monotone inversion (fixed-iteration bisection + Newton, see
ops/inverse.py — replaces the per-sample while-loop binary search of
helpers.py:150-166).

TPU-first differences from the reference:
  * spline parameters computed once as a (batch, dim, n_bases) tensor and
    evaluated through the fused table kernel (ops/spline_eval.py) rather
    than a Python-unrolled per-basis sum;
  * boundary projection and bias removal are trace-time-unrolled static
    linear ops (ops/boundary.py);
  * the inverse's bisection trip count is static, keeping the whole layer a
    single fused XLA computation with no data-dependent control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

from waveflow_tpu.ops import (
    batched_monotone_inverse, get_tables, make_bias_remover,
    make_boundary_projector, make_evaluator, make_poly_evaluator,
)

LOG_TOL = 1e-7  # matches made.py:79


def IMADE(conditioner_factory, spline_degree=4, n_internal_knots=12,
          spline_regularization=0.0, reverse_fun_tol=1e-6,
          constraints_dict_left={0: 0.0}, constraints_dict_right={0: 1.0},
          set_nn_output_grad_to_zero=False, n_spline_base_mesh_points=2000,
          eval_backend='poly'):

    # static bisection count meeting (far exceeding) the tolerance contract
    import math
    n_bisect = max(20, min(40, int(math.ceil(-math.log2(max(reverse_fun_tol, 1e-12))))))

    def init_fun(rng, input_dim, **kwargs):
        tabs = get_tables('I', spline_degree, n_internal_knots,
                          n_mesh=n_spline_base_mesh_points)
        ev = make_evaluator(tabs)
        project = make_boundary_projector(
            ev, constraints_dict_left, constraints_dict_right,
            normalization='sum', ispline_right_convention=True)
        debias = make_bias_remover(ev.n_bases, spline_degree, 'I')

        params, cond_apply = conditioner_factory(
            rng, input_dim, ev.n_bases,
            set_nn_output_grad_to_zero=set_nn_output_grad_to_zero)

        def spline_params(params, inputs):
            p = cond_apply(params, inputs) + spline_regularization
            p = debias(p)
            return project(p)                      # (B, D, n_bases)

        # forward-eval backend: 'poly' (gather-free exact local-polynomial
        # evaluation — one MXU matmul + Horner, exact derivatives through
        # plain autodiff; ops/poly_eval.py) or 'table' (cached-table lerp
        # with the custom-JVP derivative chain, the reference's numerics).
        # The inverse and the boundary projector always use the tables.
        use_poly = eval_backend.startswith('poly')
        jet = 'pallas' if eval_backend == 'poly_pallas' else 'xla'
        fwd_ev = (make_poly_evaluator(tabs, jet_backend=jet)
                  if use_poly else ev)

        def direct_fun(params, inputs, **kwargs):
            sp = spline_params(params, inputs)
            if use_poly:
                # fused basis jet: ONE matmul yields the exact basis at
                # orders 0..3; value/derivative are elementwise dots, and
                # the Laplacian's nested JVPs + parameter cotangents all
                # reuse the same matmul through the custom-JVP chain
                B = fwd_ev.basis_jet(inputs)           # (B, D, 4, n_b)
                outputs = (sp * B[..., 0, :]).sum(-1)
                deriv = (sp * B[..., 1, :]).sum(-1)
            else:
                outputs, deriv = fwd_ev.pair(sp, inputs)   # (B, D) each
            log_det = jnp.log(deriv + LOG_TOL).sum(-1)
            return outputs, log_det

        def inverse_fun(params, inputs, **kwargs):
            outputs = jnp.zeros_like(inputs)
            for i_col in range(inputs.shape[-1]):
                sp = spline_params(params, outputs)
                col = batched_monotone_inverse(
                    ev, sp[:, i_col], inputs[:, i_col], n_bisect=n_bisect)
                if use_poly:
                    # the exact inverse above inverts the TABLE-interpolated
                    # spline; ONE Newton step against the polynomial forward
                    # closes the ~1e-6 table-vs-poly gap quadratically
                    # (~1e-12, i.e. f32 rounding)
                    f, df = fwd_ev.value_and_derivative(sp[:, i_col], col)
                    col = jnp.clip(
                        col - (f - inputs[:, i_col])
                        / jnp.maximum(df, 1e-12), 0.0, 1.0)
                outputs = outputs.at[:, i_col].set(col)
            return outputs, 0

        return params, direct_fun, inverse_fun

    return init_fun

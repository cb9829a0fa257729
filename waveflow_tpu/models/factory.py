"""Configured model assemblies (cf. model_factory.py:96-146)."""

from __future__ import annotations

import jax.numpy as jnp

from waveflow_tpu.bijections import (
    BoxTransformLayer, IMADE, Reverse, Serial, masked_conditioner,
)
from waveflow_tpu.models.mflow import MFlow
from waveflow_tpu.models.waveflow import Waveflow


def get_model(base_spline_degree=5, i_spline_degree=5,
              n_prior_internal_knots=15, n_i_internal_knots=15,
              i_spline_reg=0.0, i_spline_reverse_fun_tol=1e-6,
              n_flow_layers=1,
              prior_constraint_dict_left={}, prior_constraint_dict_right={},
              i_constraint_dict_left={}, i_constraint_dict_right={},
              set_nn_output_grad_to_zero=False,
              n_spline_base_mesh_points=2000):
    """MFlow density model: n x (IMADE + Reverse) over an M-spline prior
    (model_factory.py:96-116)."""
    layers = []
    for _ in range(n_flow_layers):
        layers.append(IMADE(masked_conditioner(),
                            spline_degree=i_spline_degree,
                            n_internal_knots=n_i_internal_knots,
                            spline_regularization=i_spline_reg,
                            reverse_fun_tol=i_spline_reverse_fun_tol,
                            constraints_dict_left=i_constraint_dict_left,
                            constraints_dict_right=i_constraint_dict_right,
                            set_nn_output_grad_to_zero=set_nn_output_grad_to_zero,
                            n_spline_base_mesh_points=n_spline_base_mesh_points))
        layers.append(Reverse())
    return MFlow(Serial(*layers), masked_conditioner(),
                 spline_degree=base_spline_degree,
                 n_internal_knots=n_prior_internal_knots,
                 constraints_dict_left=prior_constraint_dict_left,
                 constraints_dict_right=prior_constraint_dict_right,
                 set_nn_output_grad_to_zero=set_nn_output_grad_to_zero,
                 n_spline_base_mesh_points=n_spline_base_mesh_points)


def get_waveflow_model(n_dimension, base_spline_degree=5, i_spline_degree=5,
                       n_prior_internal_knots=16, n_i_internal_knots=16,
                       i_spline_reg=0.0, i_spline_reverse_fun_tol=1e-6,
                       n_flow_layers=1, box_size=1.0, xu_coord_type='mean',
                       n_spline_base_mesh_points=2000, eval_backend='poly',
                       sampling_backend='table'):
    """Waveflow ψ ansatz: BoxTransform + n x (IMADE + Reverse) over a squared
    orthonormal-B-spline prior (model_factory.py:121-146).

    Constrained (gap) dimensions carry a left-edge zero boundary: indices
    0..n-2 for the 'mean' coordinate type, 1..n-1 for 'first'
    (model_factory.py:124-129).
    """
    if xu_coord_type == 'mean':
        constrained_left = jnp.arange(0, n_dimension - 1, dtype=int)
    elif xu_coord_type == 'independent':
        # distinguishable coordinates (e.g. one electron in n>1 space
        # dimensions): no sorted-gap structure, no constrained dims
        constrained_left = jnp.arange(0, dtype=int)
    elif xu_coord_type == 'paired2d':
        # n_el 2D fermions sorted by x: the n_el-1 x-gap dims (u[0..n_el-2])
        # carry the coincidence zero boundary; y dims unconstrained
        constrained_left = jnp.arange(0, n_dimension // 2 - 1, dtype=int)
    else:
        constrained_left = jnp.arange(1, n_dimension, dtype=int)

    layers = [BoxTransformLayer(box_size, xu_coord_type=xu_coord_type)]
    for _ in range(n_flow_layers):
        layers.append(IMADE(masked_conditioner(),
                            spline_degree=i_spline_degree,
                            n_internal_knots=n_i_internal_knots,
                            spline_regularization=i_spline_reg,
                            reverse_fun_tol=i_spline_reverse_fun_tol,
                            constraints_dict_left={0: 0.0},
                            constraints_dict_right={0: 1.0},
                            set_nn_output_grad_to_zero=False,
                            n_spline_base_mesh_points=n_spline_base_mesh_points,
                            eval_backend=eval_backend))
        layers.append(Reverse())

    return Waveflow(
        Serial(*layers),
        masked_conditioner(allow_negative_params=True),
        spline_degree=base_spline_degree,
        n_internal_knots=n_prior_internal_knots,
        constraints_dict_left={0: 0.0}, constraints_dict_right={0: 0.0},
        constrained_dimension_indices_left=constrained_left,
        set_nn_output_grad_to_zero=False,
        n_spline_base_mesh_points=n_spline_base_mesh_points,
        eval_backend=eval_backend, sampling_backend=sampling_backend)

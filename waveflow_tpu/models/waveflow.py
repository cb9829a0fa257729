"""Waveflow — the square-flow wavefunction ansatz.

Reference: wavefunctions.py:9-112.  |ψ|² is a normalizing-flow density whose
prior is a *squared, orthonormalized B-spline* conditional per dimension, so
ψ itself is representable with sign structure and exactly normalized:

    ψ(x) = [ Π_i  c_i(u_{<i}) · OB(u_i) ] · exp(½ log|det J_T(x)|),
    u = T(x) ∈ [0,1]^n (BoxTransform + IMADE stack),
    c_i = (w_i @ S^{1/2}) / ||w_i @ S^{1/2}||   (unit L2 ⇒ ∫(c·OB)² = 1).

Dimensions listed in ``constrained_dimension_indices_left`` (the gap
coordinates of sorted fermions) contribute ψ/√2 — they only cover the
ordered half-space (wavefunctions.py:48,68).

TPU-first notes: ψ and log_pdf share one fused forward; conditional B²
sampling is exact inverse-CDF on the table grid (ops/sampling.py) rather
than per-sample rejection while-loops (bsplines_jax.py:144-169).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import random

from waveflow_tpu.ops import (
    get_tables, make_boundary_projector, make_evaluator, make_poly_evaluator,
    sample_squared_amplitude,
)
from waveflow_tpu.ops.poly_eval import sample_squared_amplitude_poly

LOG_TOL = 1e-7  # wavefunctions.py:34


def Waveflow(transformation, sp_transformation, spline_degree, n_internal_knots,
             constraints_dict_left={0: 0, 2: 0}, constraints_dict_right={0: 0},
             constrained_dimension_indices_left=(),
             set_nn_output_grad_to_zero=True, n_spline_base_mesh_points=2000,
             eval_backend='poly', sampling_backend='table'):

    constrained_left = jnp.asarray(constrained_dimension_indices_left,
                                   dtype=jnp.int32)

    def init_fun(rng, input_dim):
        rng, transformation_rng = random.split(rng)

        transform_params, direct_fun, partial_inverse_fun = transformation(
            transformation_rng, input_dim)

        tabs = get_tables('B', spline_degree, n_internal_knots,
                          n_mesh=n_spline_base_mesh_points)
        ev_b = make_evaluator(tabs)                 # plain B basis (constraints)
        ev_ob = make_evaluator(tabs, use_ob=True)   # orthonormal basis (sampling)
        # hot-path amplitude backend: 'poly' evaluates the OB basis from
        # exact local polynomials (gather-free, one MXU matmul + Horner,
        # exact derivatives through autodiff — 100-500x more accurate than
        # the lerp tables on the OB basis, whose S^{-1/2} change matrix
        # amplifies table interpolation error; see ops/poly_eval.py).
        # Sampling and the inverse always use the table evaluator.
        use_poly = eval_backend.startswith('poly')
        jet = 'pallas' if eval_backend == 'poly_pallas' else 'xla'
        fwd_ob = (make_poly_evaluator(tabs, use_ob=True, jet_backend=jet)
                  if use_poly else ev_ob)
        ob_to_b = jnp.asarray(tabs.ob_to_b)
        project = make_boundary_projector(
            ev_b, constraints_dict_left, constraints_dict_right,
            normalization='l2')

        sp_params_init, sp_apply = sp_transformation(
            transformation_rng, input_dim, ev_b.n_bases,
            set_nn_output_grad_to_zero=set_nn_output_grad_to_zero)

        def ob_coeffs(sp_params, u):
            """Conditional OB coefficients c with unit L2 norm: (B, D, n_b).

            HIGHEST precision: this matmul sets the normalization of ψ;
            TPU default f32 matmuls run as bf16 passes (~8e-3 rel. error)
            which would leak into energies via the Laplacian."""
            w = project(sp_apply(sp_params, u))
            c = jnp.matmul(w, ob_to_b, precision=jax.lax.Precision.HIGHEST)
            return c / jnp.sqrt(jnp.sum(c ** 2, axis=-1, keepdims=True))

        def _forward(params, inputs):
            if inputs.ndim == 1:
                inputs = inputs[None]
            transform_params, sp_params = params
            u, log_det = direct_fun(transform_params, inputs)
            c = ob_coeffs(sp_params, u)
            u_c = jnp.clip(u, 0.0, 1.0)
            if use_poly:
                # fused basis jet (see bijections/imade.py): one matmul,
                # exact derivatives through the custom-JVP chain
                amps = (c * fwd_ob.basis_jet(u_c)[..., 0, :]).sum(-1)
            else:
                amps = fwd_ob(c, u_c)             # (B, D) per-dim amplitudes
            return amps, log_det

        def log_pdf(params, inputs, return_sample=False):
            if inputs.ndim == 1:
                inputs = inputs[None]
            transform_params, sp_params = params
            u, log_det = direct_fun(transform_params, inputs)
            c = ob_coeffs(sp_params, u)
            u_c = jnp.clip(u, 0.0, 1.0)
            if use_poly:
                probs = (c * fwd_ob.basis_jet(u_c)[..., 0, :]).sum(-1) ** 2
            else:
                probs = fwd_ob(c, u_c) ** 2
            if constrained_left.size:
                probs = probs.at[:, constrained_left].set(
                    probs[:, constrained_left] / 2)
            log_probs = jnp.log(probs + LOG_TOL).sum(-1)
            if return_sample:
                return log_probs + log_det, u
            return log_probs + log_det

        def psi(params, inputs):
            amps, log_det = _forward(params, inputs)
            if constrained_left.size:
                amps = amps.at[:, constrained_left].set(
                    amps[:, constrained_left] / jnp.sqrt(2.0))
            return jnp.prod(amps, axis=-1) * jnp.exp(0.5 * log_det)

        def sample(rng, params, num_samples=1):
            transform_params, sp_params = params
            outputs = jnp.zeros((num_samples, input_dim))
            for i_col in range(input_dim):
                c = ob_coeffs(sp_params, outputs)
                rng, split_rng = random.split(rng)
                u = random.uniform(split_rng, (num_samples,))
                if sampling_backend == 'poly' and use_poly:
                    # exact inverse-CDF under the POLYNOMIAL density — the
                    # same density psi/log_pdf/E_L evaluate (closes the
                    # ~3.3e-3 table-vs-poly ancestral-density mismatch,
                    # ops/poly_eval.py::sample_squared_amplitude_poly)
                    col = sample_squared_amplitude_poly(
                        fwd_ob, c[:, i_col], u)
                else:
                    col = sample_squared_amplitude(ev_ob, c[:, i_col], u)
                outputs = outputs.at[:, i_col].set(col)
            return partial_inverse_fun(transform_params, outputs)[0]

        return (transform_params, sp_params_init), psi, log_pdf, sample

    return init_fun

"""Batched monotone spline inversion (fixed-shape, jit/TPU friendly).

Replaces the reference's per-sample `lax.while_loop` bisection
(helpers.py:150-166 driving isplines_jax.py:153-156).  Two variants:

* ``method='exact'`` (default): the runtime spline is, by construction, the
  *linearly interpolated table* (ops/spline_eval.py), i.e. piecewise linear
  in x over the mesh.  Its inverse is therefore closed-form: evaluate the
  spline at every mesh node with one (batch, n_bases) @ (n_bases, n_mesh)
  matmul (MXU), locate the bracketing cell with a batched binary search,
  and solve the in-cell linear equation.  Exact to float rounding — tighter
  than any tolerance contract — with sequential depth ~log2(n_mesh) instead
  of 30+ dependent evaluator calls.

* ``method='bisect'``: fixed-iteration bisection + Newton polish against
  the evaluator — batch-uniform trip count (no data-dependent shapes).
  n_bisect=30 reaches ~1e-9 bracket width, far past the reference's
  reverse_fun_tol=1e-6 contract (vqmc.py:130, made.py:57).  Kept as an
  evaluator-only fallback and as a cross-check oracle for the exact path.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from waveflow_tpu.ops.spline_eval import SplineEvaluator


def exact_table_inverse(evaluator: SplineEvaluator,
                        coeffs: jnp.ndarray,
                        y: jnp.ndarray) -> jnp.ndarray:
    """Exact inverse of the monotone table-interpolated spline (dense form).

    coeffs: (..., n_bases) per-sample weights; y: (...,) targets.
    Returns x in [0,1] with evaluator(coeffs, x) == y up to float rounding.
    Materializes the (..., n_mesh) node values — fastest at small batch
    (one matmul + one fused compare), HBM-bound at large batch; see
    exact_node_bisect_inverse for the large-batch form.
    """
    g = evaluator.density_on_mesh(coeffs)                  # (..., P) nondecr.
    P = g.shape[-1]
    # branchless cell location: one fused compare+reduce over the row block
    # instead of a per-row binary-search while loop (see ops/sampling.py)
    j = jnp.sum(g <= y[..., None], axis=-1)
    j = jnp.clip(j - 1, 0, P - 2)
    g_l = jnp.take_along_axis(g, j[..., None], axis=-1)[..., 0]
    g_r = jnp.take_along_axis(g, (j + 1)[..., None], axis=-1)[..., 0]
    slope = g_r - g_l
    s = jnp.clip((y - g_l) / jnp.where(jnp.abs(slope) < 1e-20, 1.0, slope),
                 0.0, 1.0)
    return (j + s) / (P - 1)


def exact_node_bisect_inverse(evaluator: SplineEvaluator,
                              coeffs: jnp.ndarray,
                              y: jnp.ndarray) -> jnp.ndarray:
    """Exact inverse via bisection on the mesh-NODE index.

    Same result as exact_table_inverse (both locate the bracketing cell of
    the piecewise-linear table and solve the in-cell linear equation) but
    without materializing (batch, n_mesh) node values: ceil(log2 n_cells)
    rounds of one (batch, n_bases) row-gather+dot each.  ~80x less HBM
    traffic per walker at the default 2000-point mesh — the winning form
    once the walker batch is large enough to be bandwidth-bound (the dense
    form wins at small batch where the step is launch-bound).
    """
    P = evaluator.n_mesh
    n_cells = P - 1
    lo = jnp.zeros(y.shape, dtype=jnp.int32)
    hi = jnp.full(y.shape, n_cells, dtype=jnp.int32)
    # invariant: g[lo] <= y < g[hi] up to end-clamping; unrolled so XLA
    # fuses each round's gather+dot+select into one kernel
    n_rounds = int(math.ceil(math.log2(max(n_cells, 2))))
    for _ in range(n_rounds):
        mid = (lo + hi) >> 1
        g_mid = evaluator.at_nodes(coeffs, mid)
        gt = g_mid > y
        hi = jnp.where(gt & (mid > lo), mid, hi)
        lo = jnp.where(gt | (mid == lo), lo, mid)
    j = lo
    g_l = evaluator.at_nodes(coeffs, j)
    g_r = evaluator.at_nodes(coeffs, j + 1)
    slope = g_r - g_l
    s = jnp.clip((y - g_l) / jnp.where(jnp.abs(slope) < 1e-20, 1.0, slope),
                 0.0, 1.0)
    return (j + s) / n_cells


def bisection_inverse(evaluator: SplineEvaluator,
                      coeffs: jnp.ndarray,
                      y: jnp.ndarray,
                      n_bisect: int = 30,
                      n_newton: int = 2) -> jnp.ndarray:
    """Fixed-iteration bisection + Newton polish (evaluator-only fallback)."""

    def bisect_body(_, state):
        lo, hi = state
        mid = 0.5 * (lo + hi)
        fmid = evaluator(coeffs, mid)
        gt = fmid > y
        return jnp.where(gt, lo, mid), jnp.where(gt, mid, hi)

    lo = jnp.zeros_like(y)
    hi = jnp.ones_like(y)
    lo, hi = jax.lax.fori_loop(0, n_bisect, bisect_body, (lo, hi))
    x = 0.5 * (lo + hi)

    for _ in range(n_newton):
        fx = evaluator(coeffs, x)
        dfx = evaluator(coeffs, x, d=1)
        step = (fx - y) / jnp.maximum(dfx, 1e-12)
        x = jnp.clip(x - step, lo, hi)
    return x


# above this many (batch x n_mesh) elements the dense form's HBM traffic
# dominates and the node-bisection form wins (measured crossover on v5e
# between batch 4k and 16k at the default 2000-point mesh)
DENSE_INVERSE_MAX_ELEMENTS = 2 ** 23


def batched_monotone_inverse(evaluator: SplineEvaluator,
                             coeffs: jnp.ndarray,
                             y: jnp.ndarray,
                             n_bisect: int = 30,
                             n_newton: int = 2,
                             method: str = 'exact') -> jnp.ndarray:
    """Solve f(x) = y for x in [0,1], f monotone increasing per sample.

    coeffs: (..., n_bases) spline weights per sample; y: (...,) targets.
    Returns x: (...,).  method='exact' picks between the two exact forms
    by problem size at trace time (shapes are static under jit): dense
    matmul+compare at small batch (launch-bound regime), node bisection at
    large batch (bandwidth-bound regime).
    """
    if method == 'exact':
        n_elements = math.prod(y.shape) * evaluator.n_mesh
        if n_elements > DENSE_INVERSE_MAX_ELEMENTS:
            return exact_node_bisect_inverse(evaluator, coeffs, y)
        return exact_table_inverse(evaluator, coeffs, y)
    if method == 'exact_dense':
        return exact_table_inverse(evaluator, coeffs, y)
    if method == 'exact_bisect':
        return exact_node_bisect_inverse(evaluator, coeffs, y)
    return bisection_inverse(evaluator, coeffs, y,
                             n_bisect=n_bisect, n_newton=n_newton)

"""Batched monotone spline inversion (fixed-iteration, jit/TPU friendly).

Replaces the reference's per-sample `lax.while_loop` bisection
(helpers.py:150-166 driving isplines_jax.py:153-156): a *fixed* number of
bisection steps — batch-uniform trip count, so the whole batch stays one
fused XLA loop with no data-dependent shapes — followed by optional Newton
polish using the analytic derivative table.  n_bisect=30 reaches ~1e-9
bracket width, far past the reference's reverse_fun_tol=1e-6 contract
(vqmc.py:130, made.py:57).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from waveflow_tpu.ops.spline_eval import SplineEvaluator


def batched_monotone_inverse(evaluator: SplineEvaluator,
                             coeffs: jnp.ndarray,
                             y: jnp.ndarray,
                             n_bisect: int = 30,
                             n_newton: int = 2) -> jnp.ndarray:
    """Solve f(x) = y for x in [0,1], f monotone increasing per sample.

    coeffs: (..., n_bases) spline weights per sample; y: (...,) targets.
    Returns x: (...,).
    """

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

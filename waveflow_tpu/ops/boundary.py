"""Boundary-condition projection and edge-bias removal for spline weights.

Vectorized re-expression of the reference's per-weight loops
(isplines_jax.py:158-202, msplines_jax.py:156-192, bsplines_jax.py:173-199):
because the constraint dictionaries are static configuration, the projection
unrolls at trace time into a handful of dot products with precomputed
boundary basis values — no data-dependent control flow, fully batched over
(batch, n_bases) weight matrices.

Semantics (per constraint (n, v), applied in dict order):
  left:  w[n]      = (v - Σ_{j<n} w[j]      · T_j^{(n)}(0)) / T_n^{(n)}(0)
  right: w[-1-n]   = (v - Σ_{j<n} w[-1-j]   · T_{-1-j}^{(n)}(1)) / T_{-1-n}^{(n)}(1)
  I-spline right n=0 special case: requires v == 1 and zeroes the last
  weight (isplines_jax.py:174-179) — all I bases saturate at 1, so the value
  constraint is carried by the final sum-normalization.
Followed by sum-normalization (M/I) or L2-normalization (B).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from waveflow_tpu.ops.spline_eval import SplineEvaluator


def make_boundary_projector(evaluator: SplineEvaluator,
                            constraints_left: dict[int, float],
                            constraints_right: dict[int, float],
                            normalization: str = 'sum',
                            ispline_right_convention: bool = False):
    """Build a batched weights -> weights projection closure.

    Args:
      evaluator: supplies boundary basis values per derivative order.
      constraints_left/right: {derivative_order: value}, static.
      normalization: 'sum' (M/I splines) or 'l2' (B splines).
      ispline_right_convention: apply the I-spline n=0 right-edge special
        case (isplines_jax.py:174-179).
    """
    left = np.asarray(evaluator.left, dtype=np.float64)    # (nd, n_bases)
    right = np.asarray(evaluator.right, dtype=np.float64)
    n_bases = left.shape[1]

    # Precompute the static pieces of each constraint step.
    left_steps = []
    for n, v in constraints_left.items():
        # coefficients hitting w[j] for j < n, and the pivot value
        coeff = np.zeros(n_bases, dtype=np.float64)
        coeff[:n] = left[n, :n]
        pivot = float(left[n, n])
        if pivot == 0.0:
            raise ValueError(f"left constraint order {n}: pivot basis value is 0")
        left_steps.append((int(n), float(v), coeff, pivot))

    right_steps = []
    for n, v in constraints_right.items():
        if ispline_right_convention and n == 0:
            if v != 1.0:
                raise ValueError(
                    "I-spline right-edge value constraint must be 1.0 "
                    "(isplines_jax.py:178)")
            right_steps.append(('zero_last', None, None, None))
            continue
        coeff = np.zeros(n_bases, dtype=np.float64)
        for j in range(n):
            coeff[n_bases - 1 - j] = right[n, n_bases - 1 - j]
        pivot = float(right[n, n_bases - 1 - n])
        if pivot == 0.0:
            raise ValueError(f"right constraint order {n}: pivot basis value is 0")
        right_steps.append((int(n), float(v), coeff, pivot))

    def _apply_steps(w: np.ndarray) -> np.ndarray:
        """The constraint chain on one weight row (NumPy f64, init-time)."""
        w = w.copy()
        for n, v, coeff, pivot in left_steps:
            w[n] = (v - np.dot(w, coeff)) / pivot
        for step in right_steps:
            if step[0] == 'zero_last':
                w[-1] = 0.0
                continue
            n, v, coeff, pivot = step
            w[n_bases - 1 - n] = (v - np.dot(w, coeff)) / pivot
        return w

    # Each step is affine in w and the chain composes to  w -> w @ A.T + b.
    # Folding it into ONE precomputed matmul at init (probed in float64 on
    # the identity basis) collapses the per-constraint set/dot op chain:
    # the projection sits inside every conditioner call, so its ops are
    # replicated through forward, backward, AND the Laplacian's two HVP
    # instantiations of the flow — on v5e the fused VMC window is op-count
    # bound, not FLOP bound, and this is the densest op cluster.
    b_vec = _apply_steps(np.zeros(n_bases))
    A_mat = np.stack([_apply_steps(e) for e in np.eye(n_bases)]) - b_vec
    A_j = jnp.asarray(A_mat.astype(np.float32))             # (n_bases, n_bases)
    b_j = jnp.asarray(b_vec.astype(np.float32))
    affine_b = bool(np.any(b_vec != 0.0))

    def project(weights: jnp.ndarray) -> jnp.ndarray:
        """weights: (..., n_bases) -> constrained + renormalized weights."""
        w = jnp.matmul(weights, A_j, precision=jax.lax.Precision.HIGHEST)
        if affine_b:
            w = w + b_j
        if normalization == 'sum':
            return w / jnp.sum(w, axis=-1, keepdims=True)
        elif normalization == 'l2':
            return w / jnp.sqrt(jnp.sum(w ** 2, axis=-1, keepdims=True))
        return w

    return project


def make_bias_remover(n_bases: int, degree: int, kind: str):
    """Edge-weight de-biasing as a static multiplier vector + sum-normalize.

    M-spline variant scales the first/last k weights by (1..k)/k
    (msplines_jax.py:186-192); the I-spline variant is offset by one,
    leaving the very first/last weights untouched (isplines_jax.py:196-202).
    """
    mult = np.ones(n_bases, dtype=np.float32)
    k = degree
    if kind == 'M':
        for i in range(k):
            mult[i] *= (i + 1) / k
            mult[n_bases - 1 - i] *= (i + 1) / k
    elif kind == 'I':
        for i in range(k):
            mult[i + 1] *= (i + 1) / k
            mult[n_bases - 2 - i] *= (i + 1) / k
    else:
        raise ValueError(f"no bias-removal convention for kind {kind!r}")
    mult_j = jnp.asarray(mult)

    def remove_bias(weights: jnp.ndarray) -> jnp.ndarray:
        w = weights * mult_j
        return w / jnp.sum(w, axis=-1, keepdims=True)

    return remove_bias

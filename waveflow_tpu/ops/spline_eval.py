"""Device-side spline evaluation: fused table-interp + coefficient dot.

The runtime numerics mirror the reference's cached-basis linear interpolation
(isplines_jax.py:45-56, bsplines_jax.py:19-30, msplines_jax.py:30-41) but are
fully vectorized: instead of a Python-unrolled sum of per-basis scalar table
gathers, one batched row-gather of the table produces a (batch, n_bases)
basis matrix that is lerped and contracted with the per-sample coefficient
vectors in a single fused XLA op chain (VPU-friendly; see ops/pallas_spline.py
for the Pallas variant of the hot path).

Derivatives in x chain through separately cached derivative tables exactly as
the reference does with custom JVPs (isplines_jax.py:60-66): the tangent of
the order-d evaluation is the order-(d+1) evaluation.  This keeps second and
third derivatives (needed by the VMC Laplacian) *consistent with the analytic
spline derivatives* rather than differentiating the piecewise-linear interp.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from waveflow_tpu.ops.spline_tables import N_DERIVATIVES, SplineTables


def _lerp_gather(table: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Interpolate table rows at positions x in [0,1].

    table: (n_mesh, n_bases); x: (...,) -> (..., n_bases)
    """
    n_cells = table.shape[0] - 1
    pos = x * n_cells
    idx = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_cells - 1)
    frac = pos - idx
    y_l = jnp.take(table, idx, axis=0)          # (..., n_bases)
    y_r = jnp.take(table, idx + 1, axis=0)
    return y_l + (y_r - y_l) * frac[..., None]


def _lerp_cell_gather(cell_table: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Interpolate with ONE gather from a precomputed (value, delta) table.

    cell_table: (n_cells, 2*n_bases) rows of [T_j | T_{j+1}-T_j]; the single
    gather halves the dominant op class of the jitted VMC step (each
    evaluator call — and its jvp/transpose instantiations in the Laplacian —
    previously issued two row gathers).  x: (...,) -> (..., n_bases).
    """
    n_cells = cell_table.shape[0]
    n_bases = cell_table.shape[1] // 2
    pos = x * n_cells
    idx = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_cells - 1)
    frac = pos - idx
    row = jnp.take(cell_table, idx, axis=0)     # (..., 2*n_bases)
    return row[..., :n_bases] + row[..., n_bases:] * frac[..., None]


class SplineEvaluator:
    """Batched evaluator for one spline table family.

    Exposes:
      basis(x, d):        (..., n_bases) interpolated basis (derivative d)
      __call__(c, x, d):  fused sum_i c_i T_i^{(d)}(x) with the JVP chain
      left/right:         basis values at x=0 / x=1 per derivative order
    """

    def __init__(self, tables: np.ndarray):
        # tables: (n_derivatives, n_mesh, n_bases) float32
        self.tables = jnp.asarray(tables)
        self.n_derivatives = tables.shape[0]
        self.n_mesh = tables.shape[1]
        self.n_bases = tables.shape[2]
        self.left = jnp.asarray(tables[:, 0, :])    # (nd, n_bases)
        self.right = jnp.asarray(tables[:, -1, :])
        # (nd, n_cells, 2*n_bases) rows of [value | delta] for the
        # single-gather interpolation path
        cells = np.concatenate(
            [tables[:, :-1, :], tables[:, 1:, :] - tables[:, :-1, :]], axis=-1)
        self.cell_tables = jnp.asarray(cells)
        # (nd-1, n_cells, 4*n_bases) rows of [T_d|ΔT_d|T_{d+1}|ΔT_{d+1}]:
        # one gather yields value AND first derivative together — the pair
        # path halves the gather count of the (eval, eval d=1) sequence in
        # IMADE.direct_fun, and the saving compounds through the Laplacian's
        # nested JVPs (each jvp instantiation re-issues the gathers)
        pair_cells = np.concatenate([cells[:-1], cells[1:]], axis=-1)
        self.pair_cell_tables = jnp.asarray(pair_cells)
        self._fns = self._build_jvp_chain()
        self._pair_fns = self._build_pair_chain()

    def _build_jvp_chain(self):
        """One custom-jvp function per derivative order, chained d -> d+1.

        Mirrors I_cached.defjvp (isplines_jax.py:60-66).  At the top order the
        x-tangent term is zero (the reference would silently clamp to the last
        table there; we document the truncation instead — order-3 tangents are
        never consumed by the Laplacian path).
        """
        cell_tables = self.cell_tables
        n_deriv = self.n_derivatives
        fns: list = [None] * n_deriv

        def make(d):
            def raw_eval(coeffs, x):
                basis = _lerp_cell_gather(cell_tables[d], x)
                return jnp.sum(basis * coeffs, axis=-1)

            f = jax.custom_jvp(raw_eval)

            def f_jvp(primals, tangents):
                coeffs, x = primals
                t_coeffs, t_x = tangents
                primal_out = raw_eval(coeffs, x)
                tangent_out = raw_eval(t_coeffs, x)
                if d + 1 < n_deriv:
                    tangent_out = tangent_out + fns[d + 1](coeffs, x) * t_x
                return primal_out, tangent_out

            f.defjvp(f_jvp)
            return f

        for d in reversed(range(n_deriv)):
            fns[d] = make(d)
        return fns

    def _build_pair_chain(self):
        """Fused (value, derivative) evaluation with one gather per order.

        pair(d) returns (Σc T^{(d)}, Σc T^{(d+1)}) from a single row gather
        of the stacked pair table.  Its JVP chains to pair(d+1) for the
        x-tangent terms (same truncation rule at the top order as the
        scalar chain).
        """
        pair_tables = self.pair_cell_tables
        n_bases = self.n_bases
        n_pairs = int(pair_tables.shape[0])
        fns: list = [None] * max(n_pairs, 1)

        def make(d):
            def raw_eval(coeffs, x):
                table = pair_tables[d]
                n_cells = table.shape[0]
                pos = x * n_cells
                idx = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_cells - 1)
                frac = (pos - idx)[..., None]
                row = jnp.take(table, idx, axis=0)   # (..., 4*n_bases)
                v = row[..., :n_bases] + row[..., n_bases:2 * n_bases] * frac
                dv = row[..., 2 * n_bases:3 * n_bases] \
                    + row[..., 3 * n_bases:] * frac
                return (jnp.sum(v * coeffs, axis=-1),
                        jnp.sum(dv * coeffs, axis=-1))

            f = jax.custom_jvp(raw_eval)

            def f_jvp(primals, tangents):
                coeffs, x = primals
                t_coeffs, t_x = tangents
                primal_out = raw_eval(coeffs, x)
                tc_v, tc_dv = raw_eval(t_coeffs, x)
                if d + 1 < n_pairs:
                    w_d1, w_d2 = fns[d + 1](coeffs, x)
                    tangent_out = (tc_v + w_d1 * t_x, tc_dv + w_d2 * t_x)
                else:
                    # top order: x-tangent of the derivative component is
                    # truncated (order n_derivatives is not tabulated); the
                    # value component still chains through primal_out[1]
                    tangent_out = (tc_v + primal_out[1] * t_x, tc_dv)
                return primal_out, tangent_out

            f.defjvp(f_jvp)
            return f

        for d in reversed(range(n_pairs)):
            fns[d] = make(d)
        return fns

    def pair(self, coeffs: jnp.ndarray, x: jnp.ndarray, d: int = 0):
        """(Σ_i c_i T_i^{(d)}(x), Σ_i c_i T_i^{(d+1)}(x)) in one gather."""
        return self._pair_fns[d](coeffs, x)

    def basis(self, x: jnp.ndarray, d: int = 0) -> jnp.ndarray:
        """Interpolated basis matrix T^{(d)} at x: (..., n_bases)."""
        return _lerp_gather(self.tables[d], x)

    def __call__(self, coeffs: jnp.ndarray, x: jnp.ndarray, d: int = 0) -> jnp.ndarray:
        """sum_i coeffs[..., i] * T_i^{(d)}(x[...]) with derivative chaining.

        coeffs: (..., n_bases), x: (...,) -> (...,)
        """
        return self._fns[d](coeffs, x)

    def at_nodes(self, coeffs: jnp.ndarray, idx: jnp.ndarray,
                 d: int = 0) -> jnp.ndarray:
        """Exact table values at mesh-node indices: sum_i c_i T_i^{(d)}[idx].

        One row gather + dot — the building block of the node-bisection
        inverse (ops/inverse.py), which replaces the (batch, n_mesh) dense
        materialization that dominates HBM traffic at large walker counts.
        coeffs: (..., n_bases), idx: (...,) int -> (...,)
        """
        rows = jnp.take(self.tables[d], idx, axis=0)    # (..., n_bases)
        return jnp.sum(rows * coeffs, axis=-1)

    def density_on_mesh(self, coeffs: jnp.ndarray) -> jnp.ndarray:
        """Evaluate sum_i c_i T_i at *all* mesh points: (..., n_mesh).

        A single (batch, n_bases) @ (n_bases, n_mesh) matmul (MXU) — used by
        the inverse-CDF samplers (ops/sampling.py) and the exact table
        inverse (ops/inverse.py).  Precision pinned to HIGHEST: sampling and
        inversion correctness must not depend on the global matmul-precision
        flag (default f32 matmuls take bf16 MXU passes, ~8e-3 rel error)."""
        return jnp.matmul(coeffs, self.tables[0].T,
                          precision=jax.lax.Precision.HIGHEST)


def make_evaluator(tables: SplineTables, use_ob: bool = False) -> SplineEvaluator:
    """Build an evaluator from a table set; use_ob selects the orthonormalized
    B-basis tables (bsplines_jax.py:137 evaluates against OB)."""
    arr = tables.ob_tables if use_ob else tables.tables
    return SplineEvaluator(arr)

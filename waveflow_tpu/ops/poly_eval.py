"""Gather-free exact spline evaluation via local piecewise polynomials.

The round-3 roofline (results/roofline_r3.json) capped the production VMC
windows at ~13% of the HBM roofline: every spline evaluation — and every
jvp instantiation the Laplacian's nested forward-mode passes create — issued
a random ~400-900 B row gather from the cached basis tables in HBM
(ops/spline_eval.py).  This module removes the tables from the hot path
entirely.

Key observation: the knot vectors are *uniform* (spline_tables.make_knots),
so between consecutive breakpoints t_m = m/(n_knots-1) every basis function
T_j is a single polynomial of degree <= spline order.  At init we extract
those local polynomials exactly (float64 Vandermonde interpolation at
Chebyshev nodes, verified against the exact recursions of
spline_tables.{m,i,b}_basis_with_derivs to ~1e-9); at run time

    f(x) = sum_j c_j T_j(x)
         = Horner( onehot(cell(x)) . reshape( c @ A ), s(x) )

is ONE small MXU matmul (batch, n_bases) @ (n_bases, n_cells*(deg+2)), a
VPU one-hot cell select (n_cells ~ 20-30 compares), and a Horner chain in
the local coordinate s = x*n_cells - cell.  No gathers, no HBM-resident
tables, and — because Horner is plain polynomial arithmetic — *exact*
derivatives of every order through ordinary autodiff: the custom-JVP
derivative-table chain of the table path (and its truncation at order 3)
is unnecessary here.  This is also an accuracy upgrade: the table path
carries O(mesh^-2) linear-interpolation error (~1e-7 in values, ~1e-4 in
second derivatives at mesh 2000); the polynomial path is exact to f32
rounding.

Reference counterpart: the Python-unrolled per-basis scalar table gathers of
isplines_jax.py:45-56 / bsplines_jax.py:19-38 / msplines_jax.py:30-49 — the
same math, three designs removed.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from waveflow_tpu.ops.spline_tables import (
    BSplineTables, SplineTables, b_basis_with_derivs, i_basis_with_derivs,
    m_basis_with_derivs, make_knots,
)

_EXACT_BASIS = {
    'M': m_basis_with_derivs,
    'I': i_basis_with_derivs,
    'B': b_basis_with_derivs,
}
# total end-knot multiplicity per family (spline_tables.build_*_tables)
_MULTIPLICITY = {'M': lambda k: k, 'I': lambda k: k + 1, 'B': lambda k: k + 1}


def _chebyshev_nodes(n: int) -> np.ndarray:
    """Chebyshev nodes of the first kind on (0, 1) — strictly interior, so
    the half-open breakpoint convention of the recursions never bites."""
    k = np.arange(n)
    return 0.5 - 0.5 * np.cos((2 * k + 1) * np.pi / (2 * n))


def build_local_polynomials(kind: str, degree: int, n_internal_knots: int,
                            basis_values_fn=None) -> np.ndarray:
    """(n_bases, n_cells, ncoef) float64 local polynomial coefficients.

    Cell m covers [m/n_cells, (m+1)/n_cells]; coefficients are in the local
    coordinate s = x*n_cells - m in [0, 1]:  T_j(x) = sum_k A[j,m,k] s^k.

    ``basis_values_fn(x) -> (n_bases, P)`` overrides the exact-recursion
    sampler (used for the orthonormalized B basis, which is a fixed linear
    combination of the raw B basis).
    """
    if basis_values_fn is None:
        t = make_knots(n_internal_knots, _MULTIPLICITY[kind](degree))
        exact = _EXACT_BASIS[kind]

        def basis_values_fn(x):
            return exact(np.asarray(x), t, degree, n_derivatives=1)[0]

    n_cells = n_internal_knots - 1
    ncoef = degree + 2          # covers every family: M deg k-1, B deg k,
    #                             I deg k+1 (integral of an order-k+1 M)
    nodes = _chebyshev_nodes(ncoef)                       # (ncoef,) in (0,1)
    # Vandermonde in the local coordinate (shared across cells)
    V = nodes[:, None] ** np.arange(ncoef)[None, :]       # (ncoef, ncoef)
    h = 1.0 / n_cells
    xs = (np.arange(n_cells)[:, None] + nodes[None, :]) * h   # (n_cells, ncoef)
    vals = basis_values_fn(xs.reshape(-1))                # (n_bases, n_cells*ncoef)
    n_bases = vals.shape[0]
    vals = vals.reshape(n_bases, n_cells, ncoef)
    # solve V a = vals for each (basis, cell): a = V^-1 vals
    A = np.linalg.solve(V, vals.transpose(1, 2, 0))       # (n_cells, ncoef, n_bases)
    A = np.ascontiguousarray(A.transpose(2, 0, 1))        # (n_bases, n_cells, ncoef)

    # verification: the fit must reproduce the exact recursion at off-node
    # interior points, proving each basis IS a single degree<=ncoef-1
    # polynomial per cell (i.e. the breakpoints really are the knots)
    rng = np.random.default_rng(0)
    s_chk = rng.uniform(0.05, 0.95, size=7)
    x_chk = (np.arange(n_cells)[:, None] + s_chk[None, :]) * h
    exact_chk = basis_values_fn(x_chk.reshape(-1)).reshape(n_bases, n_cells, -1)
    powers = s_chk[:, None] ** np.arange(ncoef)[None, :]  # (7, ncoef)
    poly_chk = np.einsum('jmk,sk->jms', A, powers)
    scale = max(1.0, np.abs(exact_chk).max())
    err = np.abs(poly_chk - exact_chk).max() / scale
    if err > 1e-8:
        raise AssertionError(
            f"local-polynomial extraction failed for {kind} degree {degree} "
            f"({n_internal_knots} knots): relative residual {err:.2e} — the "
            "basis is not piecewise-polynomial on the assumed cells")
    return A


class PolySplineEvaluator:
    """Gather-free batched evaluator: one MXU matmul + Horner per call.

    Drop-in for the hot-path subset of ops.spline_eval.SplineEvaluator:
      __call__(coeffs, x, d)        sum_j c_j T_j^{(d)}(x)
      value_and_derivative(c, x)    (f, f') in one matmul (IMADE forward)
    Derivatives through jax.grad/jvp are the exact spline derivatives —
    no derivative tables, no custom JVPs.
    """

    N_JET = 4   # basis_jet orders 0..3 (all the Laplacian chain consumes)

    def __init__(self, A: np.ndarray, jet_backend: str = 'xla'):
        # A: (n_bases, n_cells, ncoef) float64 from build_local_polynomials.
        # jet_backend 'pallas' fuses the one-hot W construction into the
        # basis-jet matmul in VMEM (ops/pallas_jet.py) — W never touches
        # HBM; 'xla' is the portable default
        self.jet_backend = jet_backend
        self.n_bases, self.n_cells, self.ncoef = A.shape
        # matmul layout: (n_bases, n_cells*ncoef) f32
        self.A = jnp.asarray(A.reshape(self.n_bases, -1), dtype=jnp.float32)
        # A_jet: (n_cells*ncoef, N_JET*n_bases) for the basis-jet matmul
        #   basis_jet(x) = W(x) @ A_jet,  W = onehot(cell) ⊗ s-powers —
        # column (d, j) holds the coefficients of T_j^{(d)} so ONE matmul
        # yields the exact basis matrix at derivative orders 0..3 at once.
        nd = min(self.N_JET, self.ncoef)
        # s^k term of T_j^{(d)} on cell m is A[j, m, k+d] * (k+d)!/k! * n^d
        A_jet = np.zeros((self.n_cells, self.ncoef, self.N_JET, self.n_bases))
        for d in range(nd):
            scale = float(self.n_cells) ** d
            for k in range(self.ncoef - d):
                fall = 1.0
                for j in range(d):
                    fall *= (k + d - j)
                A_jet[:, k, d, :] = (A[:, :, k + d] * (fall * scale)).T
        self.A_jet = jnp.asarray(
            A_jet.reshape(self.n_cells * self.ncoef, -1), dtype=jnp.float32)
        self._basis_jet_fn = self._build_basis_jet()

    def _build_basis_jet(self):
        """basis_jet(x) -> (..., N_JET, n_bases): the EXACT basis matrix
        T_j^{(d)}(x) for d = 0..3, from ONE (rows, n_cells*ncoef) @
        (n_cells*ncoef, 4*n_bases) MXU matmul.

        This is the fused-basis formulation for the Laplacian path: with a
        custom JVP whose x-tangent is the (d+1)-order slice of the SAME
        output, nested forward-mode derivatives and parameter cotangents
        all reuse one matmul — no per-tangent re-projection through A (the
        +16% h_fn regression of the per-instantiation form), no per-order
        table gathers (the reference/table design).  The top tabulated
        order's x-tangent is truncated, exactly like the table chain's
        (isplines_jax.py:60-66) — orders consumed by the VMC Laplacian
        stop at 3.  Out-of-domain x extends linearly from the boundary
        cell (see _local).
        """
        n_cells, ncoef, n_b = self.n_cells, self.ncoef, self.n_bases
        NJ = self.N_JET
        A_jet = self.A_jet

        if self.jet_backend == 'pallas':
            from waveflow_tpu.ops.pallas_jet import make_pallas_basis_jet
            core = make_pallas_basis_jet(np.asarray(self.A_jet), n_cells,
                                         ncoef, NJ, n_b)
        elif self.jet_backend == 'xla':
            def core(x):
                """Clamped in-domain jet: W = onehot(cell) ⊗ s-powers, one
                (rows, n_cells·ncoef) @ (n_cells·ncoef, 4·n_bases) matmul.
                XLA materializes W in HBM (it is a matmul operand) — the
                'pallas' backend fuses its construction into the matmul."""
                pos = x * n_cells
                idx = jax.lax.stop_gradient(
                    jnp.clip(jnp.floor(pos), 0, n_cells - 1))
                s = jnp.clip(pos - idx, 0.0, 1.0)
                cell_ids = jax.lax.broadcasted_iota(
                    jnp.int32, x.shape + (n_cells,), x.ndim)
                onehot = (cell_ids == idx[..., None].astype(jnp.int32)
                          ).astype(x.dtype)
                pows = [jnp.ones_like(s)]
                for _ in range(ncoef - 1):
                    pows.append(pows[-1] * s)
                powers = jnp.stack(pows, axis=-1)            # (..., ncoef)
                W = (onehot[..., :, None] * powers[..., None, :]
                     ).reshape(x.shape + (n_cells * ncoef,))
                B = jnp.matmul(W, A_jet,
                               precision=jax.lax.Precision.HIGHEST)
                return B.reshape(x.shape + (NJ, n_b))
        else:
            raise ValueError(f"unknown jet_backend {self.jet_backend!r}")

        def raw(x):
            B = core(x)
            pos = x * n_cells
            idx = jax.lax.stop_gradient(
                jnp.clip(jnp.floor(pos), 0, n_cells - 1))
            s_full = pos - idx
            ds = (s_full - jnp.clip(s_full, 0.0, 1.0)) / n_cells  # overhang
            # linear extension outside the domain (ds == 0 inside)
            ext = jnp.concatenate(
                [B[..., 1:, :], jnp.zeros_like(B[..., :1, :])], axis=-2)
            return B + ext * ds[..., None, None]

        f = jax.custom_jvp(raw)

        @f.defjvp
        def f_jvp(primals, tangents):
            (x,), (t_x,) = primals, tangents
            # call f (NOT raw): nested jvps then re-apply this rule and the
            # primal matmul is CSE'd, instead of differentiating the W
            # construction + matmul a second time per nesting level
            B = f(x)
            shift = jnp.concatenate(
                [B[..., 1:, :], jnp.zeros_like(B[..., :1, :])], axis=-2)
            return B, shift * t_x[..., None, None]

        return f

    def basis_jet(self, x: jnp.ndarray) -> jnp.ndarray:
        """Exact interpolated basis at orders 0..3: (..., 4, n_bases)."""
        return self._basis_jet_fn(x)

    def _local(self, coeffs: jnp.ndarray, x: jnp.ndarray):
        """Per-sample local poly coeffs (..., ncoef), clamped coordinate
        s_c in [0,1], and overhang ds = s - s_c (nonzero only outside the
        domain: there the evaluation extends LINEARLY from the boundary —
        finite like the table path's lerp extrapolation, instead of the
        degree-(ncoef-1) polynomial blow-up; ψ consumers feed out-of-sector
        coordinates here, e.g. unsorted fermions before the parity sort).

        HIGHEST precision on the contraction: it sets ψ and its Laplacian;
        TPU default f32 matmuls take bf16 MXU passes (~8e-3 rel error).
        """
        P = jnp.matmul(coeffs, self.A,
                       precision=jax.lax.Precision.HIGHEST)
        P = P.reshape(P.shape[:-1] + (self.n_cells, self.ncoef))
        pos = x * self.n_cells
        idx = jax.lax.stop_gradient(
            jnp.clip(jnp.floor(pos), 0, self.n_cells - 1))
        s = pos - idx
        s_c = jnp.clip(s, 0.0, 1.0)
        cell_ids = jax.lax.broadcasted_iota(
            jnp.int32, x.shape + (self.n_cells,), x.ndim)
        sel = cell_ids == idx[..., None].astype(jnp.int32)
        local = jnp.sum(jnp.where(sel[..., None], P, 0.0), axis=-2)
        return local, s_c, s - s_c

    def _horner(self, local: jnp.ndarray, s: jnp.ndarray, d: int):
        """d-th s-derivative of the local polynomial at s (s units —
        multiply by n_cells**d for x units)."""
        if d >= self.ncoef:
            return jnp.zeros_like(s)
        fall = np.ones(self.ncoef - d)
        for i in range(self.ncoef - d):
            f = 1.0
            for j in range(d):
                f *= (i + d - j)
            fall[i] = f
        v = local[..., -1] * fall[-1]
        for k in range(self.ncoef - d - 2, -1, -1):
            v = v * s + local[..., k + d] * fall[k]
        return v

    def __call__(self, coeffs: jnp.ndarray, x: jnp.ndarray,
                 d: int = 0) -> jnp.ndarray:
        """sum_j coeffs[..., j] T_j^{(d)}(x): coeffs (..., n_bases), x (...,)."""
        if d >= self.ncoef:
            return jnp.zeros_like(x)
        local, s_c, ds = self._local(coeffs, x)
        v = self._horner(local, s_c, d) + self._horner(local, s_c, d + 1) * ds
        return v * float(self.n_cells) ** d

    def value_and_derivative(self, coeffs: jnp.ndarray, x: jnp.ndarray):
        """(f, df/dx) from one matmul + a triple-Horner chain — the IMADE
        forward's replacement for SplineEvaluator.pair."""
        local, s_c, ds = self._local(coeffs, x)
        # jet Horner: value, first and second s-derivatives in one sweep
        v = local[..., -1]
        dv = jnp.zeros_like(v)
        d2v = jnp.zeros_like(v)
        for k in range(self.ncoef - 2, -1, -1):
            d2v = d2v * s_c + 2.0 * dv
            dv = dv * s_c + v
            v = v * s_c + local[..., k]
        return v + dv * ds, (dv + d2v * ds) * self.n_cells

    # pair-compatible alias (same contract as SplineEvaluator.pair at d=0)
    def pair(self, coeffs: jnp.ndarray, x: jnp.ndarray, d: int = 0):
        if d == 0:
            return self.value_and_derivative(coeffs, x)
        return self(coeffs, x, d), self(coeffs, x, d + 1)


def sample_squared_amplitude_poly(ev: PolySplineEvaluator,
                                  coeffs: jnp.ndarray,
                                  u: jnp.ndarray,
                                  n_bisect: int = 12,
                                  n_newton: int = 3) -> jnp.ndarray:
    """EXACT inverse-CDF sample of p(x) ∝ (w·T(x))² under the *polynomial*
    density — the same density the poly backend's ψ/log_pdf/E_L evaluate.

    The table sampler (ops/sampling.py::sample_squared_amplitude) draws
    from the piecewise-LINEAR table interpolant, whose OB amplitudes carry
    ~3.3e-3 relative error vs the exact basis — so under
    eval_backend='poly' ancestral training samples a slightly different
    density than the one it differentiates (the round-4 advisor note;
    DESIGN.md records the accepted mismatch).  This sampler closes it:

      1. local polynomials per cell: l = c @ A  (one MXU matmul,
         (B, n_cells, ncoef));
      2. exact cell masses  m_cell = h ∫₀¹ p(s)² ds = h · lᵀ H l with
         H[k1,k2] = 1/(k1+k2+1) (the Hilbert-type moment matrix) — no
         mesh, no quadrature error;
      3. cell locate by prefix-sum CDF; in-cell inversion of the exact
         antiderivative F(s) = h Σ_m (l*l)_m s^{m+1}/(m+1) (monotone,
         F' = h·p² ≥ 0) by bracketing bisection + Newton polish.

    Agrees with the table sampler to O(table error) and with the poly
    density exactly (up to f32 and the n_bisect+n_newton inversion,
    which exceeds f32 resolution away from nodes).
    """
    from waveflow_tpu.ops.sampling import _locate_in_masses

    K = ev.ncoef
    M = ev.n_cells
    h = 1.0 / M
    # (B, M, K) local polynomials at HIGHEST precision (sets the density)
    P = jnp.matmul(coeffs, ev.A, precision=jax.lax.Precision.HIGHEST)
    P = P.reshape(P.shape[:-1] + (M, K))
    # Hilbert-type moment matrix for ∫₀¹ s^{k1+k2} ds
    H = jnp.asarray(1.0 / (np.arange(K)[:, None] + np.arange(K)[None, :]
                           + 1.0), dtype=P.dtype)
    masses = h * jnp.einsum('...mk,kl,...ml->...m', P, H, P,
                            precision=jax.lax.Precision.HIGHEST)
    masses = jnp.maximum(masses, 0.0)
    j, q = _locate_in_masses(masses, u)
    l = jnp.take_along_axis(P, j[..., None, None],
                            axis=-2)[..., 0, :]          # (B, K)
    # squared-polynomial coefficients (l*l)_m = Σ_{k1+k2=m} l_k1 l_k2
    sq = [jnp.zeros_like(l[..., 0])] * (2 * K - 1)
    for k1 in range(K):
        for k2 in range(K):
            m = k1 + k2
            sq[m] = sq[m] + l[..., k1] * l[..., k2]

    def F(s):
        """h ∫₀^s p(t)² dt — Horner on the antiderivative."""
        v = sq[2 * K - 2] / (2 * K - 1)
        for m in range(2 * K - 3, -1, -1):
            v = v * s + sq[m] / (m + 1)
        return h * v * s

    def dF(s):
        v = sq[2 * K - 2]
        for m in range(2 * K - 3, -1, -1):
            v = v * s + sq[m]
        return h * v

    lo = jnp.zeros_like(q)
    hi = jnp.ones_like(q)
    for _ in range(n_bisect):
        mid = 0.5 * (lo + hi)
        gt = F(mid) > q
        lo = jnp.where(gt, lo, mid)
        hi = jnp.where(gt, mid, hi)
    s = 0.5 * (lo + hi)
    for _ in range(n_newton):
        s = jnp.clip(s - (F(s) - q) / jnp.maximum(dF(s), 1e-14), lo, hi)
    return (j + s) * h


_POLY_CACHE: dict = {}


def make_poly_evaluator(tables: SplineTables,
                        use_ob: bool = False,
                        jet_backend: str = 'xla') -> PolySplineEvaluator:
    """Polynomial evaluator consistent with a SplineTables set.

    ``use_ob`` builds the orthonormalized B basis OB = b_to_ob @ B using the
    SAME basis-change matrix as the table set, so coefficients produced via
    tables.ob_to_b evaluate identically (to f32) against either backend.
    ``jet_backend``: 'xla' or 'pallas' (fused W+matmul kernel,
    ops/pallas_jet.py).
    """
    key = (tables.kind, tables.degree, tables.n_internal_knots,
           tables.n_mesh if use_ob else None, use_ob, jet_backend)
    if key in _POLY_CACHE:
        return _POLY_CACHE[key]
    if use_ob:
        if not isinstance(tables, BSplineTables):
            raise ValueError("use_ob requires B-spline tables")
        t = make_knots(tables.n_internal_knots, tables.degree + 1)
        b_to_ob = np.asarray(tables.b_to_ob, dtype=np.float64)

        def ob_values(x):
            b = b_basis_with_derivs(np.asarray(x), t, tables.degree,
                                    n_derivatives=1)[0]
            return b_to_ob @ b

        A = build_local_polynomials('B', tables.degree,
                                    tables.n_internal_knots,
                                    basis_values_fn=ob_values)
    else:
        A = build_local_polynomials(tables.kind, tables.degree,
                                    tables.n_internal_knots)
    if A.shape[0] != tables.n_bases:
        raise AssertionError(
            f"polynomial basis count {A.shape[0]} != table basis count "
            f"{tables.n_bases} for {tables.kind}")
    ev = PolySplineEvaluator(A, jet_backend=jet_backend)
    _POLY_CACHE[key] = ev
    return ev

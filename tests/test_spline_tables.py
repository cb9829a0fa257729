"""Table-builder validation against independent scalar recursions.

The scalar oracles below implement the textbook Curry-Schoenberg M-spline,
Ramsay I-spline, and Cox-de Boor B-spline recursions (the same math the
reference ports in splines_np.py:42-137) directly from the definitions, with
no vectorization — slow but obviously correct.  The vectorized builders in
waveflow_tpu.ops.spline_tables must agree to near machine precision.
"""

import numpy as np
import pytest

from waveflow_tpu.ops import spline_tables as st


# --- scalar oracles ---------------------------------------------------------

def m_scalar(x, k, i, t, nd=0):
    if k == 1:
        lo, hi = t[i], t[i + 1]
        if hi <= lo:
            return 0.0
        # closed right end on the final nonempty interval
        last = max(j for j in range(len(t) - 1) if t[j + 1] > t[j])
        inside = (lo <= x < hi) or (i == last and lo <= x <= hi)
        if not inside:
            return 0.0
        return 1.0 / (hi - lo) if nd == 0 else 0.0
    if t[i + k] <= t[i]:
        return 0.0
    c = k / ((k - 1) * (t[i + k] - t[i]))
    term = (x - t[i]) * m_scalar(x, k - 1, i, t, nd) \
        + (t[i + k] - x) * m_scalar(x, k - 1, i + 1, t, nd)
    if nd > 0:
        term += nd * (m_scalar(x, k - 1, i, t, nd - 1)
                      - m_scalar(x, k - 1, i + 1, t, nd - 1))
    return c * term


def b_scalar(x, k, i, t, nd=0):
    if nd > 0:
        acc = 0.0
        if t[i + k] > t[i]:
            acc += b_scalar(x, k - 1, i, t, nd - 1) / (t[i + k] - t[i])
        if t[i + k + 1] > t[i + 1]:
            acc -= b_scalar(x, k - 1, i + 1, t, nd - 1) / (t[i + k + 1] - t[i + 1])
        return k * acc
    if k == 0:
        lo, hi = t[i], t[i + 1]
        if hi <= lo:
            return 0.0
        last = max(j for j in range(len(t) - 1) if t[j + 1] > t[j])
        inside = (lo <= x < hi) or (i == last and lo <= x <= hi)
        return 1.0 if inside else 0.0
    acc = 0.0
    if t[i + k] > t[i]:
        acc += (x - t[i]) / (t[i + k] - t[i]) * b_scalar(x, k - 1, i, t)
    if t[i + k + 1] > t[i + 1]:
        acc += (t[i + k + 1] - x) / (t[i + k + 1] - t[i + 1]) * b_scalar(x, k - 1, i + 1, t)
    return acc


def i_scalar(x, k, i, t, nd=0):
    """I_i(x) = sum over in-support m >= i of (t[m+k+1]-t[m]) M_{m,k+1}(x)/(k+1)."""
    n_m = len(t) - k - 1
    total = 0.0
    for m in range(i, n_m):
        total += (t[m + k + 1] - t[m]) * m_scalar(x, k + 1, m, t, nd) / (k + 1)
    if nd == 0:
        total = min(max(total, 0.0), 1.0)
    return total


# --- tests ------------------------------------------------------------------

MESHPTS = np.linspace(0, 1, 57)


@pytest.mark.parametrize("degree,n_knots", [(3, 6), (5, 8)])
def test_m_table_matches_scalar(degree, n_knots):
    tabs = st.build_mspline_tables(degree, n_knots, n_mesh=57)
    t = tabs.knots
    for nd in range(3):
        for i in range(tabs.n_bases):
            expect = np.array([m_scalar(x, degree, i, t, nd) for x in MESHPTS])
            got = tabs.tables[nd, :, i]
            np.testing.assert_allclose(got, expect, atol=5e-3 * 10 ** nd,
                                       rtol=1e-4)


@pytest.mark.parametrize("degree,n_knots", [(3, 6), (5, 8)])
def test_b_table_matches_scalar(degree, n_knots):
    tabs = st.build_bspline_tables(degree, n_knots, n_mesh=57)
    t = tabs.knots
    for nd in range(3):
        for i in range(tabs.n_bases):
            expect = np.array([b_scalar(x, degree, i, t, nd) for x in MESHPTS])
            got = tabs.tables[nd, :, i]
            np.testing.assert_allclose(got, expect, atol=5e-3 * 10 ** nd,
                                       rtol=1e-4)


@pytest.mark.parametrize("degree,n_knots", [(3, 6), (5, 8)])
def test_i_table_matches_scalar(degree, n_knots):
    tabs = st.build_ispline_tables(degree, n_knots, n_mesh=57)
    t = tabs.knots
    for nd in range(3):
        for i in range(tabs.n_bases):
            expect = np.array([i_scalar(x, degree, i, t, nd) for x in MESHPTS])
            got = tabs.tables[nd, :, i]
            np.testing.assert_allclose(got, expect, atol=5e-3 * 10 ** nd,
                                       rtol=1e-4)


def test_m_partition_integrates_to_one():
    # each M basis integrates to 1 over [0,1]
    tabs = st.build_mspline_tables(4, 10, n_mesh=2001)
    vals = tabs.tables[0]  # (P, n_bases)
    integrals = np.trapezoid(vals, dx=1 / 2000, axis=0)
    np.testing.assert_allclose(integrals, 1.0, atol=2e-3)


def test_i_monotone_and_saturating():
    tabs = st.build_ispline_tables(5, 12, n_mesh=1001)
    vals = tabs.tables[0]
    assert (np.diff(vals, axis=0) >= -1e-6).all()
    # basis 0 is identically 1 under full left-end knot multiplicity (the
    # reference shares this convention, isplines_jax.py:31-42 with j=k at 0);
    # all others start at 0
    assert vals[0, 1:].max() <= 1e-9
    # all bases saturate to 1 at x=1 except the final one, which is
    # identically 0 by convention (splines_np.py:85: i == len(t)-(k+1) -> 0)
    np.testing.assert_allclose(vals[-1, :-1], 1.0, atol=1e-6)
    assert np.abs(vals[:, -1]).max() == 0.0


def test_b_partition_of_unity():
    tabs = st.build_bspline_tables(5, 12, n_mesh=501)
    np.testing.assert_allclose(tabs.tables[0].sum(-1), 1.0, atol=1e-6)


def test_ob_orthonormal_and_consistent():
    tabs = st.build_bspline_tables(6, 23, n_mesh=2001)
    ob = tabs.ob_tables[0]  # (P, n_bases)
    from waveflow_tpu.ops.ortho import trapezoid_weights
    w = trapezoid_weights(ob.shape[0])
    gram = (ob.T * w[None, :]) @ ob
    np.testing.assert_allclose(gram, np.eye(tabs.n_bases), atol=5e-4)
    # (w @ ob_to_b) · OB == w · B identically
    rng = np.random.default_rng(0)
    wts = rng.standard_normal(tabs.n_bases).astype(np.float32)
    lhs = (wts @ tabs.ob_to_b) @ tabs.ob_tables[0].T
    rhs = wts @ tabs.tables[0].T
    np.testing.assert_allclose(lhs, rhs, atol=1e-3)
    # change matrices are mutual inverses
    np.testing.assert_allclose(tabs.b_to_ob @ tabs.ob_to_b,
                               np.eye(tabs.n_bases), atol=1e-4)


def test_derivative_tables_consistent_with_numeric_gradient():
    tabs = st.build_ispline_tables(5, 12, n_mesh=4001)
    h = 1 / 4000
    for nd in range(3):
        numeric = np.gradient(tabs.tables[nd], h, axis=0)
        analytic = tabs.tables[nd + 1]
        # compare away from knot break rows
        interior = slice(20, -20)
        err = np.abs(numeric[interior] - analytic[interior]).max()
        scale = np.abs(analytic[interior]).max() + 1.0
        assert err / scale < 2e-2, f"deriv order {nd + 1} mismatch: {err}"

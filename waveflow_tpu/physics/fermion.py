"""Fermionic coordinate handling: sort + parity antisymmetrization.

Reference: utils/coordinates.py.  The reference counts sorting inversions
with a *host-side Python heapsort per row* (coordinates.py:6-51) — a
device-sync per evaluation.  Here the inversion count is a single O(n²)
vectorized pairwise comparison on device, which for the few-electron systems
involved (n <= ~8) is far cheaper than any clever algorithm and never leaves
the accelerator.
"""

from __future__ import annotations

import jax.numpy as jnp


def inversion_count(x: jnp.ndarray) -> jnp.ndarray:
    """Number of inversions needed to sort each row ascending.

    x: (batch, n) -> (batch,) int32.  Pairs (i, j) with i < j and
    x_i > x_j.
    """
    n = x.shape[-1]
    gt = x[..., :, None] > x[..., None, :]        # (B, n, n)
    upper = jnp.triu(jnp.ones((n, n), dtype=bool), k=1)
    return jnp.where(upper, gt, False).sum((-1, -2)).astype(jnp.int32)


def parity(x: jnp.ndarray) -> jnp.ndarray:
    """(-1)^inversions per row: (batch,) float32."""
    return jnp.where(inversion_count(x) % 2 == 0, 1.0, -1.0)


def sort_and_parity(x: jnp.ndarray):
    """Sorted coordinates and the sign factor of the sorting permutation."""
    return jnp.sort(x, axis=-1), parity(x)


def antisymmetrize(psi_fn):
    """Wrap ψ defined on the sorted sector into the full antisymmetric ψ:
    ψ_A(x) = sign(sort-permutation) ψ(sort(x))  (cf. helpers.py:55-58)."""

    def psi_a(params, x):
        xs, sgn = sort_and_parity(x)
        return sgn * psi_fn(params, xs)

    return psi_a


def abs2rel(coords: jnp.ndarray) -> jnp.ndarray:
    """Sorted absolute -> gap coordinates (coordinates.py:53-64)."""
    return jnp.diff(coords, prepend=0, axis=-1)


def rel2abs(rel: jnp.ndarray) -> jnp.ndarray:
    """Gap -> absolute coordinates (coordinates.py:66-78)."""
    return jnp.cumsum(rel, axis=-1)

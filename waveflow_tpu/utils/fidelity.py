"""Wavefunction fidelity: discrete L2 overlap of a trained ψ with an exact
diagonalization ground state.

Energies are stationary in ψ at the variational minimum, so energy
agreement alone can mask wavefunction errors; the overlap |⟨ψ_VMC|ψ_ED⟩|
is the stricter check.  No reference counterpart (tests/test_waveflow.py
renders ψ visually but never compares to an oracle).

All overlaps are evaluated on the ED grid in the *sorted sector* — the
domain where both the flow ansatz and the antisymmetric-basis ED live —
with the sector multiplicity (n! images of each ordered point) folded
into the normalization, matching physics/exact.py's conventions
(2 Σ ψ² h² = 1 for pairs, 6 Σ ψ² h³ = 1 for triples).
"""

from __future__ import annotations

import numpy as np


def _overlap(psi_vmc: np.ndarray, psi_ed: np.ndarray, cell: float,
             multiplicity: float) -> float:
    pv = psi_vmc / np.sqrt(multiplicity * (psi_vmc ** 2).sum() * cell)
    pe = psi_ed / np.sqrt(multiplicity * (psi_ed ** 2).sum() * cell)
    return float(abs(multiplicity * (pv * pe).sum() * cell))


def _batched_eval(psi, params, coords: np.ndarray, block: int) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    eval_jit = jax.jit(psi)
    out = []
    pad = (-len(coords)) % block
    padded = np.concatenate([coords, np.repeat(coords[-1:], pad, axis=0)]) \
        if pad else coords
    for i in range(0, len(padded), block):
        out.append(np.asarray(eval_jit(
            params, jnp.asarray(padded[i:i + block], jnp.float32))))
    return np.concatenate(out)[:len(coords)]


def fidelity_2p(psi, params, psi_pairs: np.ndarray, x: np.ndarray,
                block: int = 65536) -> float:
    """|⟨ψ_VMC|ψ_ED⟩| for two 1D fermions; psi_pairs/x from
    physics.exact.exact_ground_state_2p.  ψ is evaluated on the sorted
    pairs (x_i < x_j), where sort+parity antisymmetrization is +1."""
    n, h = len(x), x[1] - x[0]
    i, j = np.triu_indices(n, k=1)
    coords = np.stack([x[i], x[j]], -1)
    vals = _batched_eval(psi, params, coords, block)
    return _overlap(vals, psi_pairs, h * h, 2.0)


def fidelity_3p(psi, params, psi_triples: np.ndarray, x: np.ndarray,
                block: int = 65536) -> float:
    """|⟨ψ_VMC|ψ_ED⟩| for three 1D fermions; psi_triples/x from
    physics.exact.exact_ground_state_3p (ordered-triple basis i<j<k)."""
    n, h = len(x), x[1] - x[0]
    i, j, k = np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                          indexing='ij')
    mask = (i < j) & (j < k)
    coords = np.stack([x[i[mask]], x[j[mask]], x[k[mask]]], -1)
    vals = _batched_eval(psi, params, coords, block)
    return _overlap(vals, psi_triples, h ** 3, 6.0)


def fidelity_2d_2e(psi, params, psi_pairs: np.ndarray, sites: np.ndarray,
                   x: np.ndarray, block: int = 65536) -> float:
    """|⟨ψ_VMC|ψ_ED⟩| for two fermions in the 2D box; psi_pairs/sites/x
    from physics.exact.exact_ground_state_2d_2e (antisymmetric site-pair
    basis, a < b in site rank, normalized 2 Σ ψ² h⁴ = 1).

    The paired2d ansatz is defined on the x-sorted sector, so each ED pair
    is evaluated with its electrons ordered by x and the exchange sign
    applied when that order disagrees with the site-pair order.  (For the
    lexicographic site layout exact_ground_state_2d_2e produces — x the
    major axis — site rank a < b already implies x_a ≤ x_b, so the swap
    branch is a no-op there; it is kept so the function is correct for
    any orthonormal pair basis/ordering.)  Equal-x pairs lie on the
    ansatz's nodal surface (ψ_VMC ≈ 0 there while ψ_ED need not vanish) —
    that sector restriction is *measured* by this fidelity, not hidden.

    psi_pairs may be (m,) — a single ED state — or (m, k): an orthonormal
    basis of a (near-)degenerate ground subspace (from
    exact_ground_state_2d_2e(..., n_states=k)), in which case the
    *subspace* fidelity √(Σᵢ ⟨ψ|eᵢ⟩²) is returned.  2D He needs this: its
    square-box x↔y symmetry makes the lowest antisymmetric level exactly
    doubly degenerate, so overlap with one arbitrary eigsh vector is
    meaningless."""
    n = len(x)
    h = x[1] - x[0]
    N = n * n
    a, b = np.triu_indices(N, k=1)
    r1, r2 = sites[a], sites[b]                       # (m, 2) each
    swap = r1[:, 0] > r2[:, 0]                        # x-order disagrees
    lo = np.where(swap[:, None], r2, r1)
    hi = np.where(swap[:, None], r1, r2)
    coords = np.concatenate([lo, hi], axis=1)         # interleaved (x1,y1,x2,y2)
    sign = np.where(swap, -1.0, 1.0)
    vals = sign * _batched_eval(psi, params, coords, block)
    psi_pairs = np.asarray(psi_pairs)
    if psi_pairs.ndim == 1:
        return _overlap(vals, psi_pairs, h ** 4, 2.0)
    return float(np.sqrt(sum(
        _overlap(vals, psi_pairs[:, i], h ** 4, 2.0) ** 2
        for i in range(psi_pairs.shape[1]))))


def fidelity_2d_1e(psi, params, psi_grid: np.ndarray, x: np.ndarray,
                   block: int = 65536) -> float:
    """|⟨ψ_VMC|ψ_ED⟩| for one electron in the 2D box; psi_grid/x from
    physics.exact.exact_ground_state_2d_1e."""
    h = x[1] - x[0]
    xx, yy = np.meshgrid(x, x, indexing='ij')
    coords = np.stack([xx, yy], -1).reshape(-1, 2)
    vals = _batched_eval(psi, params, coords, block)
    return _overlap(vals, psi_grid.ravel(), h * h, 1.0)

"""Hamiltonians, potentials, and per-walker Laplacians.

Reference: utils/physics.py:28-93.  The soft-Coulomb potential
1/sqrt(1 + r²) regularizes the 1D Coulomb singularity; Hψ = -½∇²ψ + Vψ.

TPU-first Laplacian: instead of materializing the full Hessian and tracing
it (physics.py:50-52 — O(n²) memory and wasted off-diagonal work), we
compute Σ_i ∂²ψ/∂x_i² with forward-over-reverse Hessian-vector products
along the n coordinate directions, vmapped over directions and walkers.
Second derivatives of the spline tables flow through the custom-JVP
derivative chain (ops/spline_eval.py), exactly as in the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def laplacian(fn):
    """Per-sample Laplacian of a scalar field fn(params, x_batch)->(batch,).

    Returns lap(params, x) with x (batch, n) -> (batch,) = Σ_i ∂²fn/∂x_i².

    Forward-over-forward: ∂²f/∂x_i² = jvp(jvp(f, e_i), e_i), vmapped over
    the n coordinate directions and over walkers.  Pure forward mode — no
    transpose pass, so the compiled graph has no scatter-adds and roughly
    half the kernel count of jvp-of-grad (the fused VMC window is
    launch-bound on v5e, so kernel count is the cost).  For the few-electron
    systems here (n ≤ 2-4 coordinates) the O(n) forward passes are cheaper
    than one reverse pass; `laplacian_hvp` keeps the O(1)-backward variant
    for larger n.  Spline second derivatives chain through the cached
    derivative tables via the custom-JVP chain (ops/spline_eval.py),
    exactly as in the reference (isplines_jax.py:60-66).
    """

    lap_and_val = laplacian_and_value(fn)
    return lambda params, x: lap_and_val(params, x)[0]


def laplacian_and_value(fn):
    """(lap, value) in one pass: the Laplacian's inner jvp already computes
    the primal, so the Hamiltonian's potential term V·ψ can reuse it
    instead of a fourth ψ forward (XLA DCEs the value when unused)."""

    def single(params, x):
        f = lambda xx: fn(params, xx[None])[0]

        def d2(e_i):
            df = lambda xx: jax.jvp(f, (xx,), (e_i,))
            (val, _), (_, dd) = jax.jvp(df, (x,), (e_i,))
            return val, dd

        eye = jnp.eye(x.shape[0], dtype=x.dtype)
        vals, dds = jax.vmap(d2)(eye)
        return dds.sum(), vals[0]

    return jax.vmap(single, in_axes=(None, 0))


def laplacian_and_value_batched(fn):
    """Batch-level forward-over-forward Laplacian: identical math to
    ``laplacian_and_value`` but the nested jvps run on the FULL batch with
    broadcast coordinate directions (a static Python loop over the n
    coordinates) instead of a per-sample vmap.

    Why it exists: under the per-sample vmap, every primitive inside ψ —
    including a Pallas basis-jet kernel (ops/pallas_jet.py) — is traced at
    batch 1 and then lifted by vmap's batching rules; pallas_call's rule
    turns the walker axis into extra sequential grid steps of tiny blocks,
    destroying the kernel's tiling.  At batch level the kernel sees the
    whole (B, n) array directly.  For XLA-only backends the two forms
    compile to the same fused HLO (the vmap is resolved at trace time);
    the eval-site count is identical.  The repeated primal `fn(x)` across
    the n direction loops is CSE'd by XLA (pure function of (params, x)).
    """

    def lap(params, x):
        f = lambda xx: fn(params, xx)
        n = x.shape[-1]
        total = jnp.zeros(x.shape[:-1], dtype=x.dtype)
        val = None
        for i in range(n):
            e = jnp.zeros_like(x).at[..., i].set(1.0)
            df = lambda xx: jax.jvp(f, (xx,), (e,))
            (val, _), (_, dd) = jax.jvp(df, (x,), (e,))
            total = total + dd
        return total, val

    return lap


def laplacian_hvp(fn):
    """Hessian-diagonal via forward-over-reverse HVPs (one backward pass
    computes all n coordinate gradients; better for large n)."""

    def single(params, x):
        f = lambda xx: fn(params, xx[None])[0]

        def hvp_diag(e_i):
            _, hv = jax.jvp(lambda xx: jax.grad(f)(xx), (x,), (e_i,))
            return jnp.vdot(e_i, hv)

        eye = jnp.eye(x.shape[0], dtype=x.dtype)
        return jax.vmap(hvp_diag)(eye).sum()

    return jax.vmap(single, in_axes=(None, 0))


def laplacian_dense_hessian(fn):
    """Reference-style full-Hessian trace (physics.py:50-52) — kept for
    cross-checking the HVP path in tests.  Same contract as ``laplacian``:
    fn takes (params, (batch, n)) and returns (batch,)."""

    def single(params, x):
        f = lambda xx: fn(params, xx[None])[0]
        return jnp.trace(jax.hessian(f)(x))

    return jax.vmap(single, in_axes=(None, 0))


def laplacian_numerical(fn, eps=0.1, n_dims=2):
    """Central finite-difference Laplacian (physics.py:36-46)."""

    def _lap(params, x):
        diffs = 0.0
        for i in range(n_dims):
            e = jax.nn.one_hot(i, x.shape[-1], dtype=x.dtype)
            diffs = diffs + (fn(params, x + e * eps) + fn(params, x - e * eps)
                             - 2 * fn(params, x))
        return diffs / eps ** 2

    return _lap


def get_potential(protons, n_space_dimensions=1, interactions=True):
    """Soft-Coulomb proton-electron attraction + electron-electron repulsion
    (physics.py:60-76): V = -Σ 1/√(1+|r_pe|²) + Σ 1/√(1+|r_ee|²).

    x: (batch, n_el * n_space_dimensions) flattened electron coordinates,
    protons: (n_protons, n_space_dimensions).  For n_space_dimensions > 1
    the softened distances use the Euclidean norm — the reference only
    handles 1D despite its 2D catalogue entries (physics.py:62 carries the
    TODO "Only works for 1D"); this generalization makes those entries
    usable.

    ``interactions=False`` drops the electron-electron term: with an empty
    proton list this gives free fermions in the box, whose exact ground
    energy is analytic (physics/exact.py::exact_free_fermion_energy) — the
    oracle used to validate antisymmetric n>2 wavefunctions, which have no
    grid-ED reference."""
    protons = jnp.asarray(protons)

    def potential(x):
        b = x.shape[0]
        xe = x.reshape(b, -1, n_space_dimensions)       # (B, n_el, D)
        v = jnp.zeros((b,), dtype=x.dtype)
        if protons.size:
            pr = protons.reshape(1, 1, -1, n_space_dimensions)
            pe_r2 = ((xe[:, :, None, :] - pr) ** 2).sum(-1)  # (B, n_el, n_p)
            v = v - (1.0 / jnp.sqrt(1.0 + pe_r2)).sum((-1, -2))
        n = xe.shape[1]
        if interactions and n > 1:
            diff = xe[:, :, None, :] - xe[:, None, :, :]     # (B, n, n, D)
            ee_r2 = (diff ** 2).sum(-1)
            iu = jnp.tril(jnp.ones((n, n), dtype=bool), k=-1)
            v = v + jnp.where(iu[None], 1.0 / jnp.sqrt(1.0 + ee_r2), 0.0
                              ).sum((-1, -2))
        return v

    return potential


def construct_hamiltonian_function(fn, protons=((0.0, 0.0),),
                                   n_space_dimensions=2, eps=0.0,
                                   laplacian_mode='fwd', interactions=True):
    """Build h(params, x) = -½∇²ψ + Vψ : (batch, n) -> (batch, 1)
    (physics.py:79-93).  laplacian_mode: 'fwd' (forward-over-forward,
    default — fewest kernels for few-electron systems), 'fwd_batched'
    (same math at batch level — REQUIRED for the Pallas basis-jet
    backend, see laplacian_and_value_batched), 'hvp' (forward-over-
    reverse, O(1) backward passes for large n), or 'dense'
    (reference-style full-Hessian trace, physics.py:50-52).
    ``interactions=False`` drops electron-electron repulsion (free-fermion
    oracle systems, see get_potential)."""
    v_fn = get_potential(protons, n_space_dimensions=n_space_dimensions,
                         interactions=interactions)
    if eps > 0.0:
        lap_fn = laplacian_numerical(fn, eps=eps)
    elif laplacian_mode == 'dense':
        lap_fn = laplacian_dense_hessian(fn)
    elif laplacian_mode == 'hvp':
        lap_fn = laplacian_hvp(fn)
    else:
        if laplacian_mode == 'fwd_batched':
            lap_and_val = laplacian_and_value_batched(fn)
        else:
            lap_and_val = laplacian_and_value(fn)

        def h_fused(params, x):
            lap, psi_val = lap_and_val(params, x)
            return (-0.5 * lap + v_fn(x) * psi_val)[:, None]

        return h_fused

    def h(params, x):
        lap = lap_fn(params, x)
        if eps > 0.0:
            lap = jnp.reshape(lap, (x.shape[0],))
        return (-0.5 * lap + v_fn(x) * fn(params, x))[:, None]

    return h

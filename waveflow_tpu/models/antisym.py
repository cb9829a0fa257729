"""Permutation-equivariant (fully antisymmetrized) square-flow ansatz.

The sorted-sector family (Waveflow with 'mean'/'first'/'paired2d'
coordinate maps) imposes antisymmetry by restricting ψ to an ordered
sector with a Dirichlet zero on the sort-coordinate coincidence surface.
In 1D that surface {x_i = x_j} is exactly the fermionic nodal set, so the
restriction is lossless; in 2D it is NOT — the exact nodal set of two
same-spin fermions need not contain the x-coincidence plane {x_a = x_b},
and the measured variational floor of any x-sorted ansatz sits 0.144%
(He-2d-2e) / 0.035% (H2-2d-2e) above the true ground energy
(results/sector_bound.json, physics.exact.exact_ground_state_2d_2e
(x_sector=True)).

This module removes the restriction by *explicit antisymmetrization over
electron permutations*:

    ψ_A(r_1, …, r_n) = (1/√n!) Σ_P sign(P) φ(r_{P(1)}, …, r_{P(n)})

where φ is any smooth (non-antisymmetric) flow wavefunction — here a
Waveflow square-flow over the 'independent' per-coordinate box map, whose
nodal surface is unconstrained.  ψ_A is exactly antisymmetric under
electron exchange (property-tested), and its nodal set is *learned*, not
forced: ψ_A can be nonzero at x_a = x_b (y_a ≠ y_b), which is precisely
what breaks the x-sector floor.

Cost: n! φ-evaluations per ψ_A evaluation, batched into ONE model call on
the permuted batch (a (n!·B, D) forward — MXU-friendly, no Python loop
over permutations at trace time beyond building the static index table).
For the few-electron systems here (n ≤ 3) this is a 2–6× constant.
|ψ_A|² is unnormalized; training and evaluation use the Metropolis /
MALA persistent-walker drivers (vmc/metropolis.py, vmc/mala.py), which
only need log|ψ_A|² up to a constant, and the frozen-params evaluation
protocol (vmc/evaluate.py) is likewise normalization-free.

The reference has no counterpart: its 2D catalogue entries
(utils/physics.py:24-25) were never runnable (1D-only potential,
physics.py:62 TODO), and its antisymmetrization is sort+parity only
(utils/coordinates.py).
"""

from __future__ import annotations

from itertools import permutations

import jax.numpy as jnp
import numpy as np
from jax import random

# guard for log|ψ_A|²: additive in ψ² (so ~(1e-13)² in ψ) — deep below any
# walker the samplers visit, but keeps log_pdf finite exactly on the node
LOG_PDF_EPS = 1e-26


def electron_permutation_table(n_el: int):
    """(perms (n!, n_el) int32, signs (n!,) float32) — static tables."""
    perms, signs = [], []
    for p in permutations(range(n_el)):
        perms.append(p)
        # parity via inversion count of the permutation
        inv = sum(1 for i in range(n_el) for j in range(i + 1, n_el)
                  if p[i] > p[j])
        signs.append(-1.0 if inv % 2 else 1.0)
    return (np.asarray(perms, dtype=np.int32),
            np.asarray(signs, dtype=np.float32))


def antisymmetrize_model(init_fun, n_el: int, n_space_dimension: int):
    """Wrap a flow-model ``init_fun`` into its antisymmetrized version.

    init_fun(rng, input_dim) must return (params, psi, log_pdf, sample)
    with psi: (params, (B, n_el·D)) -> (B,)  — e.g. models.waveflow with
    the 'independent' coordinate map.  Returns an init_fun with the same
    contract where

      psi_A     = (1/√n!) Σ_P sign(P) φ(Px)       (exactly antisymmetric)
      log_pdf_A = log(ψ_A² + eps)                  (unnormalized)
      sample_A  = draw from |φ|² then apply a uniformly random electron
                  permutation — an exchange-symmetric warm-start proposal
                  for the Metropolis/MALA drivers (NOT exact draws from
                  |ψ_A|²; exactness is restored by the drivers' chains).
    """
    perms_np, signs_np = electron_permutation_table(n_el)
    n_perm = len(signs_np)
    norm = 1.0 / np.sqrt(float(n_perm))

    def init(rng, input_dim):
        assert input_dim == n_el * n_space_dimension
        params, phi, _phi_log_pdf, phi_sample = init_fun(rng, input_dim)
        perms = jnp.asarray(perms_np)
        signs = jnp.asarray(signs_np)

        def psi_a(params, x):
            if x.ndim == 1:
                x = x[None]
            b = x.shape[0]
            xe = x.reshape(b, n_el, n_space_dimension)
            # permuted copies: (B, n!, n_el, D) -> one batched model call
            xp = xe[:, perms, :]
            vals = phi(params, xp.reshape(b * n_perm, input_dim))
            vals = vals.reshape(b, n_perm)
            return (vals * signs).sum(-1) * norm

        def log_pdf_a(params, x):
            return jnp.log(psi_a(params, x) ** 2 + LOG_PDF_EPS)

        def sample_a(rng, params, num_samples=1):
            rng_x, rng_p = random.split(rng)
            x = phi_sample(rng_x, params, num_samples)
            xe = x.reshape(num_samples, n_el, n_space_dimension)
            idx = random.randint(rng_p, (num_samples,), 0, n_perm)
            xe = jnp.take_along_axis(xe, perms[idx][:, :, None], axis=1)
            return xe.reshape(num_samples, input_dim)

        return params, psi_a, log_pdf_a, sample_a

    return init


def get_antisym_waveflow_model(n_el: int, n_space_dimension: int,
                               box_size: float = 1.0, **waveflow_kwargs):
    """Antisymmetrized Waveflow: φ = square-flow over the 'independent'
    per-coordinate box map (no sorted-gap structure, no coincidence
    Dirichlet constraint), ψ_A = signed sum over electron permutations.

    ``waveflow_kwargs`` pass through to models.factory.get_waveflow_model
    (spline degrees/knots, n_flow_layers, eval_backend, ...).
    """
    from waveflow_tpu.models.factory import get_waveflow_model
    input_dim = n_el * n_space_dimension
    base = get_waveflow_model(input_dim, box_size=box_size,
                              xu_coord_type='independent', **waveflow_kwargs)
    return antisymmetrize_model(base, n_el, n_space_dimension)

"""Evaluation artifacts written alongside VMC checkpoints.

Parity with helpers.create_checkpoint_wavefunc (helpers.py:33-89): the
antisymmetrized ψ on a 2D grid, one-electron density slices (random anchor
and on-proton), and walker sample clouds — all saved as .npy for the
offline figure pipeline (utils/figures.py).  Unlike the reference, the
inversion-count/parity factor is computed on device (physics/fermion.py)
instead of per-row host Python.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from waveflow_tpu.physics.fermion import sort_and_parity


def eval_psi_antisymmetrized(psi, params, coords: jnp.ndarray) -> np.ndarray:
    """ψ_A(x) = sign(sort) ψ(sorted x) for arbitrary (unsorted) coords."""
    xs, sgn = sort_and_parity(coords)
    return np.asarray(sgn * psi(params, xs))


def save_wavefunction_artifacts(save_dir: str, psi, sample, params, epoch: int,
                                box_length: float, n_particle: int,
                                protons, rng, ngrid: int = 100,
                                nsample: int = 250,
                                n_space_dimension: int = 1) -> None:
    """Write ψ-grid, density-slice, and sample-cloud artifacts for one epoch.

    Sort+parity antisymmetrization applies to identical 1D fermions only;
    for n_space_dimension > 1 (single-electron systems) ψ is evaluated
    directly and the 2D grid is the (x, y) plane of the one electron."""
    base = Path(save_dir) / 'outputs'
    wf_dir = base / 'wavefunctions_2d'
    de_dir = base / 'density_1e'
    sp_dir = base / 'sample_points'
    for d in (wf_dir, de_dir, sp_dir):
        d.mkdir(parents=True, exist_ok=True)

    line = np.linspace(-box_length, box_length, ngrid)
    if n_space_dimension == 1:
        eval_fn = lambda c: eval_psi_antisymmetrized(psi, params, c)
    else:
        eval_fn = lambda c: np.asarray(psi(params, c))

    if (n_particle == 2 and n_space_dimension == 1) or \
            (n_particle == 1 and n_space_dimension == 2):
        # 2D wavefunction grid: two 1D fermions with sort+parity
        # (helpers.py:52-59), or one electron over its (x, y) plane
        # (2D multi-electron inputs are 2·n_el-dimensional — no 2D grid)
        X, Y = np.meshgrid(line, line)
        coords = jnp.asarray(np.stack([X, Y], -1).reshape(-1, 2),
                             dtype=jnp.float32)
        np.save(wf_dir / f'values_epoch{epoch}.npy', eval_fn(coords))

    # one-electron density slice anchored at a random sample (63-73)
    anchor = np.asarray(sample(rng, params, 1))
    x = np.repeat(anchor, ngrid, axis=0)
    x[:, 0] = line
    z = eval_fn(jnp.asarray(x, jnp.float32))
    np.save(de_dir / f'random_values_epoch{epoch}.npy', z)
    np.save(de_dir / f'random_coord_epoch{epoch}.npy', x)

    # on-proton slice (75-84); protonless box systems have no anchor to slice
    if np.asarray(protons).size:
        # anchor EVERY particle at the full first-proton row — filling all
        # columns with protons[0,0] would pin the y coordinate of a 2D
        # system at the proton's x value (ADVICE r2, off-origin protons)
        row = np.asarray(protons, dtype=np.float32)[0].ravel()
        x = np.tile(row, (ngrid, x.shape[1] // row.size))
        x[:, 0] = line
        z = eval_fn(jnp.asarray(x))
        np.save(de_dir / f'onproton_values_epoch{epoch}.npy', z)
        np.save(de_dir / f'onproton_coord_epoch{epoch}.npy', x)

    # walker sample cloud (87-89)
    pts = np.asarray(sample(rng, params, nsample))
    np.save(sp_dir / f'values_epoch{epoch}.npy', pts)

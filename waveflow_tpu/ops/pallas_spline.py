"""Pallas TPU kernel for the hot spline evaluation path.

The op: y[n] = Σ_i coeffs[n, i] · lerp(table[:, i], x[n]) — a per-row table
interpolation contracted with per-row coefficients.  The XLA fallback
(ops/spline_eval.py) expresses the row lookup as a dynamic gather; on TPU a
gather serializes through scalar units.  This kernel instead builds the
*lerp weight matrix* W[n, p] (nonzero only at the two mesh columns bracketing
x[n], holding 1-frac / frac) with pure VPU iota-compares and contracts it
with the table on the MXU:

    y = rowsum( (W @ table) ∘ coeffs )

Per row-block of 256 walkers that is a (256, n_mesh) @ (n_mesh, n_bases)
matmul — a few MFLOP, far below MXU speed-of-light, but crucially gather-free
and fully pipelined.  The table (n_mesh × n_bases ≈ 2000×32 ≈ 256 KB f32)
stays resident in VMEM across the whole grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _spline_eval_kernel(x_ref, coeffs_ref, table_ref, out_ref):
    # x: (B, 1), coeffs: (B, n_bases), table: (n_mesh, n_bases), out: (B, 1)
    # (1-D f32 arrays hit Mosaic/XLA layout-tiling mismatches, so the row
    # coordinate vectors travel as (B, 1) column blocks.)
    table = table_ref[:]
    n_mesh = table.shape[0]
    n_cells = n_mesh - 1
    x = x_ref[:, 0]
    B = x.shape[0]

    pos = x * n_cells
    idx_f = jnp.clip(jnp.floor(pos), 0, n_cells - 1)
    frac = pos - idx_f
    idx = idx_f.astype(jnp.int32)

    col = jax.lax.broadcasted_iota(jnp.int32, (B, n_mesh), 1)
    idx_b = idx[:, None]
    frac_b = frac[:, None]
    w = jnp.where(col == idx_b, 1.0 - frac_b, 0.0) \
        + jnp.where(col == idx_b + 1, frac_b, 0.0)

    # HIGHEST precision: the default TPU f32 matmul decomposes to bf16
    # passes and costs ~8e-3 relative error in the interpolation weights —
    # unacceptable for energies.  The matmul is tiny, so full precision is
    # free in wall-clock.
    basis = jnp.dot(w, table, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    out_ref[:, 0] = jnp.sum(basis * coeffs_ref[:], axis=-1)


@functools.partial(jax.jit, static_argnames=("block_rows",))
def spline_eval_pallas(table: jnp.ndarray, coeffs: jnp.ndarray,
                       x: jnp.ndarray, block_rows: int = 256) -> jnp.ndarray:
    """y[n] = Σ_i coeffs[n,i] · lerp(table[:,i], x[n]) via the MXU.

    table: (n_mesh, n_bases); coeffs: (N, n_bases); x: (N,) in [0,1].
    N must not be huge relative to VMEM: the kernel blocks rows at
    ``block_rows`` so VMEM holds block_rows × n_mesh lerp weights (~2 MB
    for 256 × 2000 f32) plus the table.
    """
    N = x.shape[0]
    pad = (-N) % block_rows
    if pad:
        x = jnp.pad(x, (0, pad))
        coeffs = jnp.pad(coeffs, ((0, pad), (0, 0)))
    n_blocks = x.shape[0] // block_rows
    x2 = x.reshape(-1, 1)

    out = pl.pallas_call(
        _spline_eval_kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_rows, coeffs.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(table.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0], 1), jnp.float32),
    )(x2.astype(jnp.float32), coeffs.astype(jnp.float32),
      table.astype(jnp.float32))
    return out.reshape(-1)[:N]


def onehot_matmul_eval(table: jnp.ndarray, coeffs: jnp.ndarray,
                       x: jnp.ndarray) -> jnp.ndarray:
    """Pure-XLA version of the same gather-free formulation (for A/B
    benchmarking against the Pallas kernel and the take-based path)."""
    n_mesh = table.shape[0]
    n_cells = n_mesh - 1
    pos = x * n_cells
    idx = jnp.clip(jnp.floor(pos), 0, n_cells - 1)
    frac = pos - idx
    col = jax.lax.broadcasted_iota(jnp.float32, x.shape + (n_mesh,),
                                   x.ndim)
    w = jnp.where(col == idx[..., None], 1.0 - frac[..., None], 0.0) \
        + jnp.where(col == idx[..., None] + 1.0, frac[..., None], 0.0)
    basis = jnp.matmul(w, table, precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(basis * coeffs, axis=-1)

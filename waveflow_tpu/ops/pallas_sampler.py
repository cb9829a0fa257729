"""Fused Pallas inverse-CDF sampler for squared-spline conditionals.

The XLA path (ops/sampling.py::sample_squared_amplitude) materializes the
per-walker density on the full mesh — a (batch, n_mesh) f32 array — plus
its cell masses and CDF in HBM, then re-reads them for the locate and the
in-cell solve.  XLA's cost analysis puts the fused VMC window at ~9% of
the HBM roofline at batch ≥ 16k with the sampler chain dominating the
bytes (results/roofline.json).  This kernel fuses the WHOLE chain —

    ψ(mesh) = coeffs @ T          (MXU)
    cell masses m_j = h(ψ_l² + ψ_l Δ + Δ²/3)
    inclusive prefix-sum CDF      (lane-wise Hillis–Steele, log₂ passes)
    cell locate (compare+count) + residual mass
    monotone in-cell cubic solve  (bisection + Newton, unrolled)

— into one pallas_call whose only HBM traffic is coeffs in (batch × n_b)
and samples out (batch).  The (batch, n_mesh) intermediates live and die
in VMEM, one row-block at a time.

Numerics are identical to the XLA path by construction (same table, same
closed-form masses, same 12+3 bracket/Newton schedule); the basis matmul
is f32 on the MXU with preferred_element_type=f32 (Mosaic's exact-f32
lowering), A/B-checked against the HIGHEST-precision XLA path in
tests/test_pallas_sampler.py.

Reference counterpart: the per-sample rejection `lax.while_loop`
(bsplines_jax.py:144-169) — two designs removed from this.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from waveflow_tpu.ops.spline_eval import SplineEvaluator

BLOCK_ROWS = 256        # walkers per grid step; each (256, 2048) f32 live
                        # array is 2 MB — the kernel keeps ~6 alive (psi,
                        # shifted, delta, masses, cdf, masks), and 512-row
                        # blocks were measured 120 KB over the 16 MB VMEM
                        # scoped limit on v5e
N_BISECT = 12
N_NEWTON = 3


def _lane_prefix_sum(x: jnp.ndarray, width: int) -> jnp.ndarray:
    """Inclusive prefix sum along the lane (last) axis via Hillis–Steele:
    log2(width) shifted adds, all VPU, no HBM traffic."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    shift = 1
    while shift < width:
        rolled = pltpu.roll(x, shift, axis=1)       # lane j <- x[j - shift]
        x = x + jnp.where(lane >= shift, rolled, 0.0)
        shift *= 2
    return x


def _sampler_kernel(u_ref, coeffs_ref, table_ref, out_ref, *,
                    n_cells: int, m_pad: int, kind: str = 'squared'):
    h = 1.0 / n_cells
    # density values at all mesh points:
    # (R, n_b_pad) @ (n_b_pad, m_pad) — MXU, f32
    psi = jax.lax.dot_general(
        coeffs_ref[:], table_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (R, m_pad)
    lane = jax.lax.broadcasted_iota(jnp.int32, psi.shape, 1)
    cell_mask = lane < n_cells
    if kind == 'linear':
        psi = jnp.maximum(psi, 0.0)                  # M-spline density
    p_l = psi
    p_r = pltpu.roll(psi, m_pad - 1, axis=1)         # lane j <- ψ[j + 1]
    delta = p_r - p_l
    if kind == 'squared':
        masses = h * (p_l * p_l + p_l * delta + delta * delta / 3.0)
    else:
        masses = h * (p_l + 0.5 * delta)             # trapezoid
    masses = jnp.where(cell_mask, masses, 0.0)

    cdf = _lane_prefix_sum(masses, m_pad)            # inclusive, (R, m_pad)
    total = cdf[:, n_cells - 1:n_cells]              # (R, 1)
    target = u_ref[:] * total                        # (R, 1)

    # locate: j = #{cells whose inclusive cdf <= target}, clipped
    j = jnp.sum((cdf <= target) & cell_mask, axis=1, keepdims=True)
    j = jnp.clip(j, 0, n_cells - 1).astype(jnp.int32)
    # residual mass inside cell j: q = target - cdf[j-1] (0 when j == 0)
    sel_prev = lane == (j - 1)
    cdf_prev = jnp.sum(jnp.where(sel_prev, cdf, 0.0), axis=1, keepdims=True)
    q = target - cdf_prev
    sel = lane == j
    a = jnp.sum(jnp.where(sel, p_l, 0.0), axis=1, keepdims=True)
    d = jnp.sum(jnp.where(sel, delta, 0.0), axis=1, keepdims=True)

    if kind == 'squared':
        # monotone in-cell cubic  m(s) = h(a²s + a d s² + d² s³/3)
        def mass(s):
            return h * (a * a * s + a * d * s * s + d * d * s ** 3 / 3.0)

        def dmass(s):
            v = a + d * s
            return h * v * v

        lo = jnp.zeros_like(q)
        hi = jnp.ones_like(q)
        for _ in range(N_BISECT):
            mid = 0.5 * (lo + hi)
            gt = mass(mid) > q
            lo = jnp.where(gt, lo, mid)
            hi = jnp.where(gt, mid, hi)
        s = 0.5 * (lo + hi)
        for _ in range(N_NEWTON):
            s = jnp.clip(s - (mass(s) - q) / jnp.maximum(dmass(s), 1e-14),
                         lo, hi)
    else:
        # closed-form quadratic solve, identical to sampling.py's XLA path:
        # h(a s + d s²/2) = q
        qn = q / h
        disc = jnp.sqrt(jnp.maximum(a * a + 2.0 * d * qn, 0.0))
        s_quad = (disc - a) / jnp.where(jnp.abs(d) < 1e-12, 1.0, d)
        s_lin = qn / jnp.maximum(a, 1e-12)
        s = jnp.clip(jnp.where(jnp.abs(d) < 1e-12, s_lin, s_quad), 0.0, 1.0)
    out_ref[:] = (j.astype(jnp.float32) + s) * h


@functools.lru_cache(maxsize=32)
def _build_call(n_bases: int, n_mesh: int, block_rows: int,
                interpret: bool = False, kind: str = 'squared'):
    n_cells = n_mesh - 1
    n_b_pad = -(-n_bases // 8) * 8
    m_pad = -(-n_mesh // 128) * 128

    kernel = functools.partial(_sampler_kernel, n_cells=n_cells, m_pad=m_pad,
                               kind=kind)

    def call(u2, coeffs_p, table_p):
        B = u2.shape[0]
        grid = (B // block_rows,)
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((block_rows, n_b_pad), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_b_pad, m_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((block_rows, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, 1), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * B * n_b_pad * m_pad
                + B * m_pad * (2 * int(math.log2(m_pad)) + 30),
                bytes_accessed=B * (n_b_pad + 2) * 4,
                transcendentals=0),
            interpret=interpret,
        )(u2, coeffs_p, table_p)

    return call, n_b_pad, m_pad


def _padded_table(evaluator: SplineEvaluator, n_b_pad: int, m_pad: int):
    """(n_b_pad, m_pad) transposed d=0 table: zero rows beyond n_bases,
    mesh columns beyond n_mesh replicate the last point (their cells are
    masked out in-kernel).  Cached on the evaluator when built eagerly;
    under a jit trace the tables are tracers, so the padding is expressed
    in jnp ops (constant-folded by XLA) and not cached."""
    cached = getattr(evaluator, '_pallas_tableT', None)
    if cached is not None and cached.shape == (n_b_pad, m_pad):
        return cached
    t = evaluator.tables[0]                          # (n_mesh, n_bases)
    n_mesh, n_b = t.shape
    tt = jnp.pad(t.T.astype(jnp.float32),
                 ((0, n_b_pad - n_b), (0, 0)))
    tt = jnp.concatenate(
        [tt, jnp.tile(tt[:, -1:], (1, m_pad - n_mesh))], axis=1)
    if not isinstance(tt, jax.core.Tracer):
        evaluator._pallas_tableT = tt
    return tt


def pallas_sample_squared_amplitude(evaluator: SplineEvaluator,
                                    coeffs: jnp.ndarray,
                                    u: jnp.ndarray,
                                    block_rows: int = BLOCK_ROWS,
                                    interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.sampling.sample_squared_amplitude on TPU.

    coeffs: (B, n_bases) per-walker conditional OB coefficients;
    u: (B,) uniforms.  Returns (B,) exact inverse-CDF samples of
    p(x) ∝ (coeffs·T(x))² for the table-interpolated ψ.
    ``interpret=True`` runs the kernel in the Pallas interpreter (CPU
    tests; tests/conftest.py forces a CPU mesh)."""
    return _pallas_sample(evaluator, coeffs, u, block_rows, interpret,
                          'squared')


def pallas_sample_linear_density(evaluator: SplineEvaluator,
                                 coeffs: jnp.ndarray,
                                 u: jnp.ndarray,
                                 block_rows: int = BLOCK_ROWS,
                                 interpret: bool = False) -> jnp.ndarray:
    """Drop-in for ops.sampling.sample_linear_density on TPU: inverse-CDF
    of the piecewise-linear density d(x) = w·T(x) (M-spline priors), same
    fused-kernel structure with the closed-form quadratic cell solve."""
    return _pallas_sample(evaluator, coeffs, u, block_rows, interpret,
                          'linear')


def _pallas_sample(evaluator, coeffs, u, block_rows, interpret, kind):
    B = coeffs.shape[0]
    R = min(block_rows, max(8, 1 << (B - 1).bit_length()))
    call, n_b_pad, m_pad = _build_call(evaluator.n_bases, evaluator.n_mesh,
                                       R, interpret, kind)
    table_p = _padded_table(evaluator, n_b_pad, m_pad)

    pad_b = (-B) % R
    coeffs_p = jnp.pad(coeffs.astype(jnp.float32),
                       ((0, pad_b), (0, n_b_pad - coeffs.shape[1])))
    u2 = jnp.pad(u.astype(jnp.float32)[:, None], ((0, pad_b), (0, 0)))
    out = call(u2, coeffs_p, table_p)
    return out[:B, 0]

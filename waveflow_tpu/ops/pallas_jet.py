"""Fused Pallas basis-jet kernel: one-hot W construction + MXU matmul in
VMEM (VERDICT r4 weak #2/#3 — the post-poly bottleneck).

The XLA poly backend (ops/poly_eval.py) computes

    basis_jet(x) = W(x) @ A_jet,   W = onehot(cell(x)) ⊗ (1, s, ..., s^{d+1})

where W is (rows, n_cells·ncoef) — e.g. 176 f32 lanes per evaluation site.
XLA materializes W as a matmul operand, so at batch 65k the intermediate
is tens of MB of HBM traffic per call while the useful output is 4·n_bases
(~96) lanes/row: most of the bytes the poly windows move are W.  This
kernel never lets W leave VMEM: each (TILE_R, K) W block is built with VPU
compares + 8 masked power passes in on-chip scratch and immediately
contracted on the MXU against the VMEM-resident A_jet (~90 KB), writing
only the (TILE_R, 4·n_bases) result.  HBM traffic per row drops from
(1 + K + N) to (1 + N) f32 — ~2.4× fewer bytes at the production shapes.

Numerics: identical contraction at HIGHEST precision (the repo pins f32
matmuls away from the bf16 MXU default, CLAUDE.md); the kernel is A/B'd
against the XLA path to f32 rounding in tests/test_pallas_jet.py.

The kernel evaluates the *clamped* in-domain jet; the linear
out-of-domain extension and the self-referential custom JVP stay in
ops/poly_eval.py, shared by both backends.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_R = 256          # evaluation sites per grid step (2 f32 sublane tiles)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def make_pallas_basis_jet(A_jet: np.ndarray, n_cells: int, ncoef: int,
                          n_jet: int, n_bases: int):
    """Build apply(x) -> (..., n_jet, n_bases) from A_jet
    (n_cells*ncoef, n_jet*n_bases) — the same matrix poly_eval contracts
    against, fused with the W construction.

    Falls back to interpreter mode off-TPU so CPU tests exercise the same
    kernel code path.
    """
    K = n_cells * ncoef
    N = n_jet * n_bases
    K_pad = _round_up(K, 128)
    N_pad = _round_up(N, 128)
    A_pad = np.zeros((K_pad, N_pad), dtype=np.float32)
    A_pad[:K, :N] = np.asarray(A_jet, dtype=np.float32)
    A_dev = jnp.asarray(A_pad)
    interpret = jax.default_backend() != 'tpu'

    def kernel(x_ref, a_ref, o_ref):
        x = x_ref[:, 0]                                   # (TILE_R,)
        pos = x * n_cells
        idx = jnp.clip(jnp.floor(pos), 0, n_cells - 1)
        s = jnp.clip(pos - idx, 0.0, 1.0)
        col = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, K_pad), 1)
        col_cell = col // ncoef
        col_k = col - col_cell * ncoef
        # W row = s^k at column cell*ncoef+k, 0 elsewhere: ncoef masked
        # VPU passes build the power pattern without pow/exp
        acc = jnp.zeros((TILE_R, K_pad), dtype=x.dtype)
        pw = jnp.ones_like(s)
        for k in range(ncoef):
            acc = jnp.where(col_k == k, pw[:, None], acc)
            pw = pw * s
        W = jnp.where(col_cell == idx.astype(jnp.int32)[:, None], acc, 0.0)
        o_ref[:, :] = jnp.dot(W, a_ref[:, :],
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)

    @functools.partial(jax.jit, static_argnames=())
    def _call(xf):
        R_pad = xf.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(R_pad // TILE_R,),
            in_specs=[
                pl.BlockSpec((TILE_R, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K_pad, N_pad), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_R, N_pad), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R_pad, N_pad), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=2 * R_pad * K_pad * N_pad,
                bytes_accessed=R_pad * 4 * (1 + N_pad) + K_pad * N_pad * 4,
                transcendentals=0),
            interpret=interpret,
        )(xf, A_dev)

    def apply(x):
        shape = x.shape
        R = 1
        for d in shape:
            R *= int(d)
        R_pad = _round_up(max(R, 1), TILE_R)
        xf = jnp.ravel(x)
        if R_pad != R:
            xf = jnp.pad(xf, (0, R_pad - R))
        out = _call(xf[:, None])
        return out[:R, :N].reshape(shape + (n_jet, n_bases))

    return apply

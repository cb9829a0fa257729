"""Box <-> unit-hypercube autoregressive coordinate transform.

Maps sorted electron coordinates in [-L, L] to gap coordinates in [0,1]^n
(reference: made.py:108-204).  Two variants:

  * 'first': first coordinate anchored absolutely, subsequent dims are gaps
    scaled by the space remaining to the right wall (made.py:118-154).
  * 'mean': n-1 consecutive gaps scaled by shrinking free space, plus a
    mean-position channel (made.py:156-197).  The reference's reverse is
    hard-coded for 2 dimensions (TODO at made.py:188); here the inverse is
    derived in closed form for any n:

      forward:  s_0 = 2L, u_i = g_i / s_i, s_{i+1} = s_i - g_i  (gaps g)
                u_{n-1} = (x_0 + L) / (2L - w),  w = sum g_i
      inverse:  g_i = 2L u_i prod_{j<i} (1 - u_j)
                x_0 = u_{n-1} (2L - w) - L,  x_{i+1} = x_i + g_i

    which reduces exactly to the reference formula at n=2.

All paths are vectorized with cumulative sums/products — no per-dimension
Python loops in the fast (direct) direction.
"""

from __future__ import annotations

import jax.numpy as jnp

TOL = 1e-7  # num_tollerance, made.py:118


def BoxTransformLayer(box_side=1.0, xu_coord_type='mean'):

    def init_fun(rng, input_dim, **kwargs):
        L = box_side

        # ---- 'first' variant (made.py:118-154) --------------------------
        def direct_first(params, x, **kwargs):
            prev = x[:, :-1]
            out0 = (x[:, 0] + L) / (2 * L)
            rest = (x[:, 1:] - prev) / (L - prev + TOL)
            outputs = jnp.concatenate([out0[:, None], rest], axis=1)
            log_det = -jnp.log(2 * L) - jnp.log(L - prev + TOL).sum(-1)
            return outputs, log_det

        def inverse_first(params, u, **kwargs):
            x0 = (u[:, 0] - 0.5) * 2 * L
            cols = [x0]
            for i in range(1, u.shape[-1]):
                prev = cols[-1]
                cols.append(u[:, i] * (L - prev) + prev)
            return jnp.stack(cols, axis=1), 0

        # ---- 'mean' variant (made.py:156-197, generalized inverse) ------
        def direct_mean(params, x, **kwargs):
            n = x.shape[-1]
            gaps = x[:, 1:] - x[:, :-1]                       # (B, n-1)
            consumed = jnp.concatenate(
                [jnp.zeros_like(gaps[:, :1]), jnp.cumsum(gaps[:, :-1], axis=-1)],
                axis=-1)
            space_left = 2 * L - consumed                     # s_i
            u_gaps = gaps / (space_left + TOL)
            w = x[:, -1] - x[:, 0]
            u_last = (x[:, 0] + L) / (2 * L - w + TOL)
            outputs = jnp.concatenate([u_gaps, u_last[:, None]], axis=1)
            log_det = (-jnp.log(space_left + TOL).sum(-1)
                       - jnp.log(2 * L - w + TOL))
            return outputs, log_det

        def inverse_mean(params, u, **kwargs):
            n = u.shape[-1]
            one_minus = 1.0 - u[:, :-1]
            prods = jnp.concatenate(
                [jnp.ones_like(one_minus[:, :1]),
                 jnp.cumprod(one_minus[:, :-1], axis=-1)], axis=-1)
            gaps = 2 * L * u[:, :-1] * prods                   # g_i
            w = gaps.sum(-1)
            x0 = u[:, -1] * (2 * L - w) - L
            xs = x0[:, None] + jnp.concatenate(
                [jnp.zeros_like(x0[:, None]), jnp.cumsum(gaps, axis=-1)], axis=-1)
            return xs, 0

        # ---- 'independent' variant (new; no reference counterpart) ------
        # Per-dimension affine map with no ordering structure, for
        # distinguishable coordinates: a single electron in n>1 space
        # dimensions, or bosonic/unsorted coordinates.  The 'first'/'mean'
        # variants parameterize the sorted sector of identical 1D fermions;
        # the reference has no transform for its own 2D catalogue entries.
        def direct_independent(params, x, **kwargs):
            outputs = (x + L) / (2 * L)
            log_det = jnp.full(x.shape[:-1], -x.shape[-1] * jnp.log(2 * L))
            return outputs, log_det

        def inverse_independent(params, u, **kwargs):
            return u * (2 * L) - L, 0

        # ---- 'paired2d' variant (new; no reference counterpart) ----------
        # n_el identical fermions in TWO space dimensions, interleaved
        # layout (x1, y1, x2, y2, ...), antisymmetrized on the sector
        # SORTED BY THE x COORDINATE: the x's go through the 'mean'
        # sorted-gap map (so the gap dims carry the zero boundary at
        # x-coincidence, where the antisymmetrized ψ must vanish), the y's
        # through the independent affine map.  Output layout
        # u = [u_x-gaps..., u_x-mean, u_y...]; the x-gap dims are the
        # model's constrained dimensions (models/factory.py).  This is a
        # genuine variational ansatz for 2D fermions — its nodal surface
        # CONTAINS the hyperplane x_i = x_j, a restriction the exact state
        # need not share — validated against the 2D-2e ED oracle
        # (physics/exact.py::exact_ground_state_2d_2e).
        def direct_paired2d(params, x, **kwargs):
            xs = x[:, 0::2]
            ys = x[:, 1::2]
            u_x, ld_x = direct_mean(params, xs)
            u_y = (ys + L) / (2 * L)
            ld_y = -ys.shape[-1] * jnp.log(2 * L)
            return jnp.concatenate([u_x, u_y], axis=1), ld_x + ld_y

        def inverse_paired2d(params, u, **kwargs):
            n_el = u.shape[-1] // 2
            xs, _ = inverse_mean(params, u[:, :n_el])
            ys = u[:, n_el:] * (2 * L) - L
            out = jnp.zeros(u.shape, u.dtype)
            out = out.at[:, 0::2].set(xs)
            out = out.at[:, 1::2].set(ys)
            return out, 0

        if xu_coord_type == 'mean':
            return (), direct_mean, inverse_mean
        if xu_coord_type == 'independent':
            return (), direct_independent, inverse_independent
        if xu_coord_type == 'paired2d':
            return (), direct_paired2d, inverse_paired2d
        return (), direct_first, inverse_first

    return init_fun

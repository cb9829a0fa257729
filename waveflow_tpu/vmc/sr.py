"""Stochastic reconfiguration (SR / natural-gradient) VMC updates.

Named by the BASELINE.json north star ("stochastic-reconfiguration/ADAM
updates") and absent from the reference (which only has ADAM-family
updates).  SR preconditions the energy gradient with the inverse of the
quantum geometric tensor

    S_kl = E[O_k O_l] - E[O_k] E[O_l],      O_k = ∂_k log|ψ|,

i.e. natural gradient in the |ψ|² distribution geometry.  TPU-first
implementation: S is never materialized — matrix-free CG where each
S·v product costs one jvp + one vjp of log|ψ| over the walker batch
(pytree-native, works at any parameter count), fused into the same
scan-window machinery as the ADAM path.

Gradient estimator: the same batch-adaptive-clipped centered score weights
as estimators.make_loss_fn('clipped_score') (median ± 5×mean|E_L−median|):
g = 2 E[(E_L^clip − Ē) O].
Under a walker-sharded mesh pass ``pmean_axis``: every batch expectation
(g, Ō, and each CG matrix-vector product) is pmean-reduced, so all devices
run an identical CG on the global-batch geometry.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from waveflow_tpu.vmc.estimators import PSI_EPS, _safe_psi


def _norm_cap(delta_tree, learning_rate, max_update_norm):
    """Trust-region scaling: shrink δ so ‖lr·δ‖₂ ≤ max_update_norm (the
    FermiNet/SPRING-style norm constraint — natural-gradient solves are
    exact in a quadratic model that is only trusted locally; without the
    cap a single ill-conditioned batch can throw the parameters out of the
    basin, cf. the r3 sr_study divergences at +7571)."""
    if max_update_norm is None:
        return delta_tree
    sq = sum(jnp.vdot(l, l).real
             for l in jax.tree_util.tree_leaves(delta_tree))
    scale = jnp.minimum(
        1.0, max_update_norm / (learning_rate * jnp.sqrt(sq) + 1e-30))
    # a non-finite solve (near-node walkers blow up the score matrix at
    # init) zeroes the step instead of poisoning the parameters — the
    # batch is skipped, not the run
    scale = jnp.where(jnp.isfinite(scale), scale, 0.0)
    return jax.tree_util.tree_map(
        lambda l: scale * jnp.where(jnp.isfinite(l), l, 0.0), delta_tree)


def make_sr_train_step(psi, h_fn, learning_rate: float,
                       damping: float = 1e-3, cg_iters: int = 20,
                       clip_scale: float = 5.0, pmean_axis=None,
                       max_update_norm: float | None = None):
    """step(params, opt_state, batch, baseline) -> (params, opt_state, loss)
    with opt_state = () — same contract as estimators.make_train_step, so
    the fused-window scan and the trainer work unchanged.

    Note: the batch-adaptive score-ROW clip of the SPRING path does not
    exist here — matrix-free CG never materializes per-sample score rows,
    and the damped CG solve (finite maxiter) is itself a regularizer that
    tolerates cold-start batches the exact Cholesky solve cannot.  While
    SPRING's row clip is active (its warmup window) the two paths therefore
    compute different updates on batches containing near-node walkers; they
    agree at exact CG convergence once the clip is off (tested in
    tests/test_vmc.py::test_minsr_update_matches_cg_sr)."""

    def _pmean(x):
        return jax.lax.pmean(x, pmean_axis) if pmean_axis is not None else x

    def log_abs_psi(params, batch):
        return jnp.log(jnp.abs(psi(params, batch)) + PSI_EPS)

    def step(params, opt_state, batch, baseline):
        B = batch.shape[0]
        psi_val = psi(params, batch)
        energies = h_fn(params, batch)[:, 0]
        e_loc = energies / _safe_psi(psi_val)

        # batch-adaptive clip over the global walker population
        e_stat = (jax.lax.all_gather(e_loc, pmean_axis, tiled=True)
                  if pmean_axis is not None else e_loc)
        center = jnp.median(e_stat)
        mad = jnp.mean(jnp.abs(e_stat - center))
        e_c = jnp.clip(e_loc, center - clip_scale * mad,
                       center + clip_scale * mad)
        e_mean = _pmean(jnp.mean(e_c))
        w = e_c - e_mean                        # centered clipped energies

        _, vjp_fn = jax.vjp(lambda p: log_abs_psi(p, batch), params)

        def batch_mean_vjp(cotangent):
            out = vjp_fn(cotangent / B)[0]
            return jax.tree_util.tree_map(_pmean, out)

        g = batch_mean_vjp(2.0 * w)             # 2 E[(E_L - Ē) O]
        o_bar = batch_mean_vjp(jnp.ones(B))     # E[O]

        def s_mv(v):
            # (O·v) per sample via one jvp, then E[O (O·v)] via one vjp
            _, ov = jax.jvp(lambda p: log_abs_psi(p, batch), (params,), (v,))
            first = batch_mean_vjp(ov)
            obar_dot_v = sum(
                jnp.vdot(a, b) for a, b in zip(
                    jax.tree_util.tree_leaves(o_bar),
                    jax.tree_util.tree_leaves(v)))
            return jax.tree_util.tree_map(
                lambda f, ob, vv: f - ob * obar_dot_v + damping * vv,
                first, o_bar, v)

        delta, _ = jax.scipy.sparse.linalg.cg(s_mv, g, maxiter=cg_iters)
        delta = _norm_cap(delta, learning_rate, max_update_norm)
        params = jax.tree_util.tree_map(
            lambda p, d: p - learning_rate * d, params, delta)
        return params, opt_state, e_mean

    return step


def make_spring_train_step(psi, h_fn, learning_rate: float,
                           damping: float = 1e-3, momentum: float = 0.99,
                           clip_scale: float = 5.0, pmean_axis=None,
                           max_update_norm: float | None = None,
                           score_row_clip: float | None = 10.0,
                           score_row_clip_warmup: int | None = 1000):
    """min-SR / SPRING natural-gradient step (TPU-first SR).

    The CG formulation above pays ~2·cg_iters serial jvp/vjp passes through
    the flow per update — a long dependency chain of small kernels.  For
    batch ≤ parameter count the same preconditioned update has a closed
    form in SAMPLE space (min-SR, Chen & Heyl 2023; SPRING momentum
    variant, Goldshlager/Abrahamsen/Lin 2024):

        δ = Ō^T (Ō Ō^T + B·λ I)^{-1} ζ + μ δ_prev,
        ζ = 2(E_L^clip − Ē) − Ō (μ δ_prev),

    with Ō the (B, P) CENTERED per-sample score matrix O_k = ∂_k log|ψ|.
    That is two MXU matmuls + one (B, B) Cholesky solve — no serial CG.

    μ = 0 recovers plain min-SR — mathematically the same update as the CG
    path at exact convergence *when the score-row clip is inactive*
    (score_row_clip=None, or past the warmup; tested in tests/test_vmc.py).
    While active, the clip regularizes the sample-space geometry in a way
    the matrix-free CG path (which never materializes score rows) does not.

    score_row_clip / score_row_clip_warmup: near-node walkers carry
    ‖O_i‖ ~ 1/|ψ| up to ~1e8 at a RANDOM INIT, sending the Gram condition
    number past f32's Cholesky — every cold-start batch is pathological and
    the run never leaves NaN.  Rows with norm > score_row_clip×median are
    shrunk onto that ball, but only for the first score_row_clip_warmup
    steps: the pathology is transient, and keeping the clip on forever was
    measured to cost ~4e-4 in converged flagship energy (round-3 verdict:
    −1.81520 clipped-forever vs −1.81566 unclipped-after-warmup band).
    warmup=None keeps it always on; score_row_clip=None disables entirely.
    After warmup the finite-guard in _norm_cap still zeroes (skips) any
    non-finite solve, and the ``skipped`` counter in opt_state surfaces
    how often that happened (a persistently stalled optimizer is visible,
    not silent).

    opt_state = {'delta': flat previous update, 'step': int32 update count,
    'skipped': int32 count of zeroed non-finite solves, 'fallbacks': int32
    count of steps that needed the jittered-damping Cholesky retry};
    signature matches make_train_step so the fused windows and the MCMC
    windows accept it via train_step=...

    Under a walker-sharded mesh (``pmean_axis``): every device needs the
    GLOBAL (B, B) Gram matrix and solves it replicated, but the
    (B_global, P) score matrix is never materialized — the Gram is
    assembled from column-chunked all_gathers (peak extra memory
    B_global × 4096 floats) and the projection Ō^T x is a psum of local
    contributions.  The (B, B) Gram itself is the irreducible memory
    cost of sample-space SR: past B ≈ 8-16k the Gram (0.25-1 GB) and its
    O(B³) Cholesky dominate and matrix-free CG-SR is the right tool —
    see RESULTS.md "SPRING at scale".
    """
    from jax.flatten_util import ravel_pytree

    def step(params, opt_state, batch, baseline):
        flat0, unravel = ravel_pytree(params)

        def log_abs_psi_flat(flat, x):
            return jnp.log(jnp.abs(psi(unravel(flat), x[None]))[0] + PSI_EPS)

        psi_val = psi(params, batch)
        energies = h_fn(params, batch)[:, 0]
        e_loc = energies / _safe_psi(psi_val)
        e_stat = (jax.lax.all_gather(e_loc, pmean_axis, tiled=True)
                  if pmean_axis is not None else e_loc)
        center = jnp.median(e_stat)
        mad = jnp.mean(jnp.abs(e_stat - center))
        e_c = jnp.clip(e_loc, center - clip_scale * mad,
                       center + clip_scale * mad)

        O = jax.vmap(jax.grad(log_abs_psi_flat), in_axes=(None, 0))(
            flat0, batch)                                    # (B_local, P)
        eps_local = 2.0 * e_c
        def _row_cap(row_norm_global, row_norm_local):
            cap = score_row_clip * jnp.median(row_norm_global)
            if score_row_clip_warmup is not None:
                active = opt_state['step'] < score_row_clip_warmup
                cap = jnp.where(active, cap, jnp.inf)
            return jnp.minimum(1.0, cap / (row_norm_local + 1e-30))

        e_mean_pre = jnp.mean(jnp.clip(e_stat, center - clip_scale * mad,
                                       center + clip_scale * mad))
        prev = momentum * opt_state['delta']                 # (P,)

        if pmean_axis is None:
            eps = eps_local
            B = O.shape[0]
            if score_row_clip is not None:
                # batch-adaptive score-row clip (transient, see docstring)
                rn = jnp.linalg.norm(O, axis=1)
                O = O * _row_cap(rn, rn)[:, None]
            O = O - O.mean(0, keepdims=True)
            eps = eps - eps.mean()
            zeta = eps - O @ prev
            gram0 = jnp.dot(O, O.T,
                            precision=jax.lax.Precision.HIGHEST)  # (B, B)
            delta_of = lambda x: O.T @ x                     # (P,)
        else:
            # Memory-lean sharded path (r3 weak #5): the (B_global, P)
            # score matrix is NEVER materialized.  The Gram matrix is
            # assembled from column-chunked all_gathers (peak extra memory
            # B_global x chunk instead of B_global x P — at 16k x 26k f32
            # that is ~130 MB instead of 1.7 GB per device), and the
            # update projection O^T x is a psum of local contributions.
            # Only O(B_global) vectors and the (B, B) Gram itself (the
            # irreducible cost of sample-space SR) cross the local shard.
            eps = jax.lax.all_gather(eps_local, pmean_axis, tiled=True)
            B = eps.shape[0]
            B_l = O.shape[0]
            if score_row_clip is not None:
                rn_local = jnp.linalg.norm(O, axis=1)
                rn = jax.lax.all_gather(rn_local, pmean_axis, tiled=True)
                O = O * _row_cap(rn, rn_local)[:, None]
            O = O - jax.lax.pmean(O.mean(0, keepdims=True), pmean_axis)
            eps = eps - eps.mean()
            zeta = eps - jax.lax.all_gather(O @ prev, pmean_axis,
                                            tiled=True)
            P = O.shape[1]
            chunk = min(P, 4096)
            pad = (-P) % chunk
            O_pad = jnp.pad(O, ((0, 0), (0, pad)))

            def gram_chunk(acc, i):
                cols = jax.lax.dynamic_slice(
                    O_pad, (0, i * chunk), (B_l, chunk))
                g = jax.lax.all_gather(cols, pmean_axis, tiled=True)
                return acc + jnp.dot(
                    g, g.T, precision=jax.lax.Precision.HIGHEST), None

            gram0, _ = jax.lax.scan(
                gram_chunk, jnp.zeros((B, B)),
                jnp.arange((P + pad) // chunk))

            def delta_of(x):
                shard = jax.lax.axis_index(pmean_axis)
                x_local = jax.lax.dynamic_slice(x, (shard * B_l,), (B_l,))
                return jax.lax.psum(O.T @ x_local, pmean_axis)

        e_mean = e_mean_pre
        eye = jnp.eye(B)

        # f32 Cholesky fails on a well-conditioned-looking PSD system
        # surprisingly often once cond(gram) nears 1e8 (measured: ~50% of
        # steps on a 64-walker toy).  Retry ladder: 10x then 100x damping —
        # a conservative natural-gradient step instead of a silently zeroed
        # one.  lax.cond keeps the fallbacks off the critical path.
        def solve_at(mult):
            g = gram0 + (mult * B * damping) * eye
            return jax.scipy.linalg.solve(g, zeta, assume_a='pos')

        x = solve_at(1.0)
        fell_back = ~jnp.isfinite(x).all()
        x = jax.lax.cond(fell_back, lambda: solve_at(10.0), lambda: x)
        x = jax.lax.cond(jnp.isfinite(x).all(), lambda: x,
                         lambda: solve_at(100.0))
        delta = delta_of(x) + prev                           # (P,)
        # the capped δ is both applied AND stored: the momentum recursion
        # must not carry an uncapped explosion into the next step
        finite = jnp.isfinite(delta).all()
        # a non-finite solve zeroes the step (batch skipped, run continues)
        # even when no trust region is configured
        delta = jnp.where(finite, delta, jnp.zeros_like(delta))
        delta = _norm_cap(delta, learning_rate, max_update_norm)
        new_flat = flat0 - learning_rate * delta
        new_state = {
            'delta': delta,
            'step': opt_state['step'] + 1,
            'skipped': opt_state['skipped']
            + jnp.where(finite, 0, 1).astype(jnp.int32),
            'fallbacks': opt_state['fallbacks']
            + jnp.where(fell_back, 1, 0).astype(jnp.int32),
        }
        return unravel(new_flat), new_state, e_mean

    def init_state(params):
        flat0, _ = ravel_pytree(params)
        return {'delta': jnp.zeros_like(flat0),
                'step': jnp.zeros((), jnp.int32),
                'skipped': jnp.zeros((), jnp.int32),
                'fallbacks': jnp.zeros((), jnp.int32)}

    step.init_state = init_state
    return step


def make_sr_train_window(psi, h_fn, sample_fn, learning_rate: float,
                         batch_size: int, window: int,
                         damping: float = 1e-3, cg_iters: int = 20,
                         pmean_axis=None,
                         max_update_norm: float | None = None):
    """Fused `window`-epoch SR loop (same shape as make_train_window)."""
    step = make_sr_train_step(psi, h_fn, learning_rate, damping=damping,
                              cg_iters=cg_iters, pmean_axis=pmean_axis,
                              max_update_norm=max_update_norm)

    def run_window(params, opt_state, rng, baseline):
        def body(carry, _):
            params, opt_state, rng = carry
            rng, k = jax.random.split(rng)
            batch = sample_fn(k, params, batch_size)
            params, opt_state, loss = step(params, opt_state, batch, baseline)
            return (params, opt_state, rng), loss

        (params, opt_state, rng), losses = jax.lax.scan(
            body, (params, opt_state, rng), None, length=window)
        return params, opt_state, rng, losses.mean(), losses

    return run_window

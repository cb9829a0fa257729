"""Fixed-parameter energy evaluation with blocked MC error bars.

Every energy the reference reports is a statistic of the *training-loss
trace* (per-epoch batch means of E_L, vqmc.py:118-119) — SURVEY §6 flags
this as a caveat, and round-2 review flagged that this repo inherited it.
This module is the clean protocol (VERDICT r2 item 4): freeze the trained
parameters, run long Metropolis chains on |ψ_A|², and report

    ⟨E_L⟩ ± stderr       from block means (blocking over sweeps absorbs
                          the chain's autocorrelation),
    median(E_L),          robust location, and
    clipped ⟨E_L⟩,        median ± 5×mean|·−median| window per block,

all independent of any training-time estimator choices.  Everything runs
as one jitted lax.scan over blocks (fixed shapes, two device dispatches:
warmup + measurement).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from waveflow_tpu.vmc.estimators import _safe_psi
from waveflow_tpu.vmc.metropolis import (make_metropolis_sampler,
                                         sector_projection)


class EnergyEvaluation(NamedTuple):
    e_mean: float            # blocked ⟨E_L⟩ (raw)
    e_stderr: float          # stderr of block means
    e_median: float          # median of per-block medians
    e_clipped: float         # blocked clipped mean (median ± 5×meanAD)
    e_clipped_stderr: float
    accept_rate: float       # MEAN accept rate over measurement blocks
    n_samples: int           # total E_L evaluations entering the estimate
    block_means: np.ndarray  # (n_blocks,)
    # block-doubling validation of the error bar: stderr recomputed after
    # merging adjacent blocks 2x / 4x.  If sweeps_per_block decorrelates
    # blocks these agree with e_stderr (up to the ~1/sqrt(2 n_blocks)
    # sampling noise of a variance estimate); a stderr that GROWS under
    # doubling means residual autocorrelation and an underestimated bar.
    e_stderr_2x: float = float('nan')
    e_stderr_4x: float = float('nan')
    # multi-scale clip ladder (opt-in, clip_ladder=True): blocked clipped
    # means at clip_scale × (1, 2, 4, 8) and their 1/scale → 0 linear
    # extrapolation.  Rationale: for heavy-tailed E_L (big-ansatz nodal
    # surfaces) the raw mean converges too slowly to respect the
    # variational bound at feasible sample sizes, while any single clip
    # scale carries an O(1/scale) winsorization bias; the ladder measures
    # the bias slope and removes it at far lower variance than the raw
    # mean (RESULTS.md round-5 big-ansatz note).
    clip_ladder_scales: tuple = ()
    clip_ladder_means: tuple = ()
    clip_ladder_stderrs: tuple = ()
    e_clip_extrapolated: float = float('nan')
    e_clip_extrapolated_stderr: float = float('nan')


def evaluate_energy(psi, h_fn, log_pdf, params, box_length: float,
                    positions, rng,
                    n_blocks: int = 64, sweeps_per_block: int = 25,
                    n_warmup_sweeps: int = 250, step_size: float = 0.4,
                    sort_fermions: bool | str = True,
                    clip_scale: float = 5.0,
                    clip_ladder: bool = False) -> EnergyEvaluation:
    """Blocked Metropolis estimate of ⟨E_L⟩ at FROZEN params.

    positions: (B, D) initial walkers — exact ancestral draws start the
    chain in stationarity (warmup then only decorrelates the step-size
    adaptation, which is frozen before measurement).  Returns raw,
    median, and clipped estimators with blocked error bars.

    sort_fermions: True/'1d' (coordinate sort — identical 1D fermions),
    'paired2d' (sort (x, y) pairs by x — the 2D multi-electron sector),
    or False (no quotient).
    """
    proposal_map = sector_projection(sort_fermions)
    init_fn, step_fn, _ = make_metropolis_sampler(
        log_pdf, bounds=(-box_length, box_length), proposal_map=proposal_map)

    def local_energy(params, x):
        return (h_fn(params, x)[:, 0] / _safe_psi(psi(params, x)))

    @jax.jit
    def warmup(state, rng):
        def body(st, k):
            return step_fn(params, st, k), None
        keys = jax.random.split(rng, n_warmup_sweeps)
        state, _ = jax.lax.scan(body, state, keys)
        return state

    @jax.jit
    def measure(state, rng):
        # adaptation frozen: the recorded chain uses a fixed kernel
        frozen_step = lambda st, k: step_fn(params, st, k)._replace(
            step_size=st.step_size)

        ladder = (1.0, 2.0, 4.0, 8.0) if clip_ladder else ()

        def block(st, k):
            def body(s, kk):
                return frozen_step(s, kk), None
            st, _ = jax.lax.scan(body, st,
                                 jax.random.split(k, sweeps_per_block))
            e = local_energy(params, st.positions)
            center = jnp.median(e)
            mad = jnp.mean(jnp.abs(e - center))
            e_c = jnp.clip(e, center - clip_scale * mad,
                           center + clip_scale * mad)
            lad = jnp.stack([
                jnp.clip(e, center - clip_scale * m * mad,
                         center + clip_scale * m * mad).mean()
                for m in ladder]) if ladder else jnp.zeros((0,))
            return st, (e.mean(), center, e_c.mean(), st.accept_rate, lad)

        keys = jax.random.split(rng, n_blocks)
        state, (means, medians, cmeans, rates, lads) = jax.lax.scan(
            block, state, keys)
        return state, means, medians, cmeans, rates, lads

    state = init_fn(params, jnp.asarray(positions), step_size=step_size)
    rng_w, rng_m = jax.random.split(rng)
    state = warmup(state, rng_w)
    state, means, medians, cmeans, rates, lads = measure(state, rng_m)

    means = np.asarray(means)
    cmeans = np.asarray(cmeans)
    B = int(np.asarray(positions).shape[0])

    ladder_kw = {}
    if clip_ladder:
        lads = np.asarray(lads)                        # (n_blocks, n_scales)
        scales = clip_scale * np.asarray((1.0, 2.0, 4.0, 8.0))
        l_means = lads.mean(0)
        l_errs = lads.std(0, ddof=1) / np.sqrt(n_blocks)
        # weighted linear fit of mean(scale) vs 1/scale; intercept = the
        # scale → ∞ (unclipped) limit with the winsorization bias removed
        x = 1.0 / scales
        w = 1.0 / np.maximum(l_errs, 1e-12) ** 2
        sw, sx, sy = w.sum(), (w * x).sum(), (w * l_means).sum()
        sxx, sxy = (w * x * x).sum(), (w * x * l_means).sum()
        det = sw * sxx - sx * sx
        intercept = (sxx * sy - sx * sxy) / det
        var_int = sxx / det
        ladder_kw = dict(
            clip_ladder_scales=tuple(float(s) for s in scales),
            clip_ladder_means=tuple(round(float(v), 6) for v in l_means),
            clip_ladder_stderrs=tuple(round(float(v), 7) for v in l_errs),
            e_clip_extrapolated=float(intercept),
            e_clip_extrapolated_stderr=float(np.sqrt(var_int)))

    def _doubled_stderr(m: np.ndarray, factor: int) -> float:
        k = (len(m) // factor) * factor
        if k < 2 * factor:
            return float('nan')
        merged = m[:k].reshape(-1, factor).mean(axis=1)
        return float(merged.std(ddof=1) / np.sqrt(len(merged)))

    return EnergyEvaluation(
        e_mean=float(means.mean()),
        e_stderr=float(means.std(ddof=1) / np.sqrt(n_blocks)),
        e_median=float(np.median(np.asarray(medians))),
        e_clipped=float(cmeans.mean()),
        e_clipped_stderr=float(cmeans.std(ddof=1) / np.sqrt(n_blocks)),
        accept_rate=float(np.asarray(rates).mean()),
        n_samples=n_blocks * B,
        block_means=means,
        e_stderr_2x=_doubled_stderr(means, 2),
        e_stderr_4x=_doubled_stderr(means, 4),
        **ladder_kw)


def evaluate_trainer(trainer, n_blocks: int = 64, sweeps_per_block: int = 25,
                     n_warmup_sweeps: int = 250, batch_size: int | None = None,
                     seed: int = 7, clip_ladder: bool = False
                     ) -> EnergyEvaluation:
    """Convenience wrapper: frozen-params evaluation of a (possibly
    checkpoint-restored) VMCTrainer, warm-started from exact ancestral
    draws."""
    c = trainer.config
    B = batch_size or max(4096, c.batch_size)
    rng = jax.random.PRNGKey(seed)
    rng, k = jax.random.split(rng)
    positions = trainer.sample_jit(k, trainer.params, B)
    # use the trainer's RESOLVED coordinate map, not a re-derivation from
    # (n_particle, n_space_dimension): a multi-electron run explicitly
    # configured with xu_coord_type='independent' trains unsorted, and
    # sorted-sector proposals would bias its frozen-params energy
    xu = getattr(trainer, 'xu_coord_type', None)
    if xu is None:  # older pickled trainers: fall back to the derivation
        if int(trainer.n_particle) <= 1 or c.n_space_dimension > 2:
            xu = 'independent'
        elif c.n_space_dimension == 2:
            xu = 'paired2d'
        else:
            xu = c.xu_coord_type
    if int(trainer.n_particle) <= 1 or xu == 'independent':
        sort_fermions = False
    elif xu == 'paired2d':
        sort_fermions = 'paired2d'
    else:
        sort_fermions = True
    return evaluate_energy(
        trainer.psi, trainer.h_fn, trainer.log_pdf, trainer.params,
        c.box_length, positions, rng, n_blocks=n_blocks,
        sweeps_per_block=sweeps_per_block,
        n_warmup_sweeps=n_warmup_sweeps, sort_fermions=sort_fermions,
        clip_ladder=clip_ladder)

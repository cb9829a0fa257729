"""VMC training driver for the Waveflow square-flow ansatz.

Reference: vqmc.py:19-139 (ModelTrainer).  Differences by design:
  * optax adam instead of jax.example_libraries.optimizers (SURVEY §7);
  * checkpoint carries params + optimizer state + epoch + rng so resume is
    exact (the reference restarts the epoch counter, vqmc.py:91 bug —
    fixed, not copied);
  * sampling and training are fully jitted with static batch size; the
    epoch loop stays on host but dispatches exactly two device calls;
  * optional walker-sharded data parallelism over a device mesh (see
    waveflow_tpu.parallel) — a capability the reference lacks.
"""

from __future__ import annotations

import json
import pickle
import time
from dataclasses import dataclass, field
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from waveflow_tpu.models.factory import get_waveflow_model
from waveflow_tpu.physics import construct_hamiltonian_function, system_catalogue
from waveflow_tpu.vmc.estimators import make_train_step, make_train_window


@dataclass
class VMCConfig:
    system_name: str = 'He'
    n_space_dimension: int = 1
    box_length: float = 10.0
    learning_rate: float = 1e-4
    num_epochs: int = 200_000
    batch_size: int = 128
    log_every: int = 2000
    window: int = 100                      # baseline running-average window
    xu_coord_type: str = 'mean'
    spline_degree: int = 6
    num_knots: int = 23
    n_flow_layers: int = 3
    i_spline_reg: float = 0.05
    i_spline_reverse_fun_tol: float = 1e-6
    n_spline_base_mesh_points: int = 2000
    # spline forward backend on the hot ψ/Laplacian path: 'poly' (gather-free
    # exact local-polynomial evaluation, ops/poly_eval.py — the adopted
    # TPU path), 'poly_pallas' (same math with the one-hot W construction
    # fused into the basis-jet matmul in VMEM, ops/pallas_jet.py — W never
    # touches HBM), or 'table' (cached-table lerp + custom-JVP derivative
    # chain, the reference's numerics)
    eval_backend: str = 'poly'
    # ancestral sampling density: 'table' (exact inverse-CDF of the
    # piecewise-linear table interpolant — the measured production path,
    # Pallas-accelerated) or 'poly' (exact inverse-CDF of the POLYNOMIAL
    # density the poly backend's ψ/log_pdf/E_L evaluate — closes the
    # ~3.3e-3 train-time density mismatch recorded in DESIGN.md; only
    # meaningful with a poly eval_backend)
    sampling_backend: str = 'table'
    # per-walker Laplacian formulation (physics/hamiltonian.py):
    # 'fwd_batched' (default — identical math to 'fwd' run at batch level;
    # the r5 roofline measured it faster at EVERY window×batch cell:
    # ancestral +2.6..10%, Metropolis +6.8..17.6%, new peaks 2.05M/4.18M
    # walkers/s, results/roofline_r5.json) or 'fwd' (per-sample vmap of
    # nested forward jvps, the r1-r4 formulation)
    laplacian_mode: str = 'fwd_batched'
    seed: int = 2
    save_dir: str | None = None
    save_artifacts: bool = False      # psi grids / density slices / clouds
    # 'highest' keeps every f32 matmul exact on TPU (defaults decompose to
    # bf16 MXU passes, ~8e-3 rel. error, which pollutes Laplacians); the
    # model is tiny so the cost is negligible
    matmul_precision: str = 'highest'
    # global-norm gradient clip; heavy-tailed local energies occasionally
    # produce huge score-function gradients (the reference's policy-grad
    # variant clips elementwise at ±10, vqmc.py:187). None disables.
    grad_clip: float | None = 10.0
    # gradient estimator: 'clipped_score' (median±MAD-clipped score-only
    # gradient, the modern standard — stable over 100k+ epochs) or
    # 'reference' (the reference's fused custom-JVP estimator;
    # energy_clip optionally applies a fixed ±clip there)
    estimator: str = 'clipped_score'
    energy_clip: float | None = None
    # deviation statistic for the batch-adaptive clip window:
    # 'mean_abs' (default) = median ± 5×mean|E_L−median| (FermiNet-style;
    # NOT the conventional MAD); 'median_abs' = true median absolute
    # deviation (tighter on heavy tails).  A/B'd in RESULTS.md.
    clip_stat: str = 'mean_abs'
    # walker source: 'ancestral' (exact inverse-CDF draws from |ψ|², the
    # reference's only mode) or 'metropolis' (warm-started MCMC walkers
    # persisted across epochs with collective step-size adaptation — the
    # north-star VMC loop, BASELINE.json)
    sampler: str = 'ancestral'
    # Metropolis sweeps between parameter updates.  The sweeps×batch study
    # (results/mcmc_scale.json) found sweeps=1 quality-equal to sweeps=10
    # on the FLAGSHIP at 10k and 100k epochs at ~4× the throughput — but
    # the round-4 gates on other systems recorded a concrete failure mode
    # for sweeps=1: H2_wide at 20k trains 4.4e-3 worse under sweeps=1 than
    # sweeps=3 (frozen-params eval −1.49791±5e-4 vs −1.50231±8e-5,
    # results/round4_quality.json), so 3 stays the default; drop to 1 only
    # on systems where it has been gated (the He-1d flagship).
    mcmc_sweeps: int = 3
    mcmc_step_size: float = 0.5      # initial proposal scale (adapts)
    mcmc_target_accept: float = 0.5
    # periodic exact-ancestral walker refresh for the MCMC samplers, in
    # epochs (rounded to the fused-window grid).  Persistent random-walk
    # walkers can stay trapped in a nodal pocket for the whole run: the r4
    # sweeps gate measured Metropolis-trained Li at 20k landing at
    # −3.34/−3.24 vs ancestral-trained −3.3759, with raw-E_L tails exposing
    # unvisited nodal regions (results/round4_quality.json).  Replacing the
    # walker population with fresh exact ancestral draws from |ψ|² is
    # unbiased (they ARE the target distribution), so a periodic refresh
    # restores global coverage at zero bias; the adapted step size is kept.
    # 'auto' (default): one refresh per window for systems with >= 3
    # electrons (the measured failure class — the He flagship is
    # refresh-neutral and keeps its bit-reproducible no-refresh windows),
    # disabled otherwise and for ansatz='antisym' (no exact sampler to
    # refresh from).  An int sets the cadence in epochs; None disables.
    mcmc_refresh_every: int | None | str = 'auto'
    # parameter update: 'adam' (optax, the reference's family), 'sr'
    # (stochastic reconfiguration / natural gradient via matrix-free CG,
    # vmc/sr.py — the north-star's named second optimizer), or 'spring'
    # (min-SR/SPRING: the same natural-gradient update solved in sample
    # space — two MXU matmuls + one (B,B) Cholesky instead of serial CG —
    # with momentum on the previous update)
    optimizer: str = 'adam'
    sr_damping: float = 1e-3
    sr_cg_iters: int = 20
    # 0.9 + lr 0.05 was the best SPRING setting in the r3 study
    # (results/sr_study.json); the headline run uses it
    spring_momentum: float = 0.9
    # batch-adaptive score-row clip for SPRING cold starts: rows with
    # ||O_i|| > clip x median are shrunk, but ONLY for the first
    # `warmup` updates — keeping it on forever was measured to cost
    # ~4e-4 in converged flagship energy (round-3 verdict / RESULTS.md).
    # clip=None disables; warmup=None keeps it always on.
    score_row_clip: float | None = 10.0
    score_row_clip_warmup: int | None = 1000
    # trust region for the natural-gradient updates: cap ||lr*delta||_2.
    # Without it a single ill-conditioned batch throws the parameters out
    # of the basin (r3 sr_study: uncapped SPRING diverged to +7571 on the
    # 31-knot ansatz); None disables.
    sr_max_update_norm: float | None = 0.3
    # antisymmetrization strategy for multi-electron systems:
    #   'sorted'  — sorted-sector square-flow (1D: exact nodal surface;
    #               2D: 'paired2d' x-sorted sector, whose nodal set is
    #               FORCED to contain {x_a = x_b} — a measured 0.144%
    #               He-2d-2e floor, results/sector_bound.json)
    #   'antisym' — explicit signed sum over electron permutations of an
    #               unconstrained 'independent'-map square-flow φ
    #               (models/antisym.py): the nodal set is learned, which
    #               is the only way below the sector floor.  n!·B φ-evals
    #               per batch; |ψ_A|² is unnormalized so this requires
    #               sampler='metropolis' or 'mala'.
    ansatz: str = 'sorted'
    # electron-electron repulsion on/off; False + a protonless 'box*' system
    # gives free fermions with an analytic exact energy (physics/exact.py)
    interactions: bool = True
    # shard the walker batch over the device mesh:
    #   False   — single-device (1-chip runs are unaffected anyway: a
    #             1-device mesh is the identity sharding)
    #   True    — 1-D walker mesh over all visible devices
    #   'hosts' — 2-D host×chip mesh (parallel/mesh.py::make_host_chip_mesh)
    #             for multi-process runs: walkers sharded over BOTH axes,
    #             reductions ride ICI inside a host before crossing DCN.
    #             Requires jax.distributed to be initialized — either by
    #             the launcher or via the coordinator_address /
    #             num_processes / process_id fields below.  All processes
    #             must construct the trainer with identical configs.
    data_parallel: bool | str = False
    # multi-host runtime bootstrap (parallel/mesh.py::distributed_init);
    # leave None when the launcher already initialized jax.distributed or
    # for single-process runs
    coordinator_address: str | None = None
    num_processes: int | None = None
    process_id: int | None = None
    # on-disk XLA executable cache: restarts / multi-seed studies skip the
    # minutes-long remote recompile of the fused window (None disables)
    compilation_cache_dir: str | None = "~/.cache/waveflow_tpu/xla"
    # on a non-finite loss window, restore the last good state and continue
    # with a fresh RNG stream (the reference's only recovery is manual
    # crash-restart from pickle, SURVEY §5)
    divergence_recovery: bool = True

    def resolved_save_dir(self) -> str:
        if self.save_dir is not None:
            return self.save_dir
        return (f"./results/{self.system_name}_{self.n_space_dimension}d"
                f"_L{self.box_length:g}box")


class VMCTrainer:
    """Builds the model + Hamiltonian and runs the sample/update loop."""

    def __init__(self, config: VMCConfig | None = None, **overrides):
        if config is None:
            config = VMCConfig(**overrides)
        self.config = config
        c = config
        if c.num_processes or c.coordinator_address:
            # must run before any other JAX device interaction
            from waveflow_tpu.parallel import distributed_init
            distributed_init(coordinator_address=c.coordinator_address,
                             num_processes=c.num_processes,
                             process_id=c.process_id)
        if c.matmul_precision:
            jax.config.update("jax_default_matmul_precision",
                              c.matmul_precision)
        if c.compilation_cache_dir:
            from waveflow_tpu.utils import enable_persistent_compilation_cache
            enable_persistent_compilation_cache(c.compilation_cache_dir)
        self.protons, self.n_particle = system_catalogue[
            c.n_space_dimension][c.system_name]

        # model input dimension = flattened coordinate count.  For
        # n_space_dimension > 1 the sorted-gap ('mean'/'first') coordinate
        # types are meaningless — they parameterize the ordered sector of
        # identical 1D fermions — so single-electron systems switch to the
        # 'independent' per-dimension box map, and multi-electron 2D
        # systems to the 'paired2d' sorted-by-x sector (antisymmetrized on
        # x-ordering with ψ = 0 at x-coincidence — a variational ansatz
        # whose nodal set CONTAINS {x_i = x_j}; validated against the 2D-2e
        # ED oracle, physics/exact.py).  The reference's 2D catalogue
        # entries were never runnable at all (physics.py:62 TODO).
        self.input_dim = int(self.n_particle) * c.n_space_dimension
        use_antisym = c.ansatz == 'antisym' and self.n_particle > 1
        if c.ansatz not in ('sorted', 'antisym'):
            raise ValueError(f"unknown ansatz {c.ansatz!r}")
        if use_antisym and c.sampler == 'ancestral':
            raise ValueError(
                "ansatz='antisym' has no exact ancestral sampler (|ψ_A|² is "
                "unnormalized) — use sampler='metropolis' or 'mala'")
        xu_coord_type = c.xu_coord_type
        if use_antisym:
            # explicit antisymmetrization over an unconstrained
            # per-coordinate map: valid in any number of space dimensions
            xu_coord_type = 'independent'
        elif c.n_space_dimension == 2 and self.n_particle > 1:
            xu_coord_type = 'paired2d'
        elif c.n_space_dimension > 2 and self.n_particle > 1:
            raise NotImplementedError(
                "sorted-sector multi-electron systems are supported in 1D "
                "(coordinate sort) and 2D (paired2d x-sorted sector); for "
                "n_space_dimension > 2 use ansatz='antisym'")
        elif c.n_space_dimension > 1:
            xu_coord_type = 'independent'
        # the RESOLVED coordinate map (may differ from config.xu_coord_type);
        # consumers deriving the fermionic sector (vmc/evaluate.py) must use
        # this, not re-derive from (n_particle, n_space_dimension)
        self.xu_coord_type = xu_coord_type
        self.ansatz = 'antisym' if use_antisym else 'sorted'

        model_kw = dict(
            base_spline_degree=c.spline_degree, i_spline_degree=c.spline_degree,
            n_prior_internal_knots=c.num_knots, n_i_internal_knots=c.num_knots,
            i_spline_reg=c.i_spline_reg,
            i_spline_reverse_fun_tol=c.i_spline_reverse_fun_tol,
            n_flow_layers=c.n_flow_layers, box_size=c.box_length,
            n_spline_base_mesh_points=c.n_spline_base_mesh_points,
            eval_backend=c.eval_backend,
            sampling_backend=c.sampling_backend)
        if use_antisym:
            from waveflow_tpu.models.antisym import get_antisym_waveflow_model
            init_fun = get_antisym_waveflow_model(
                int(self.n_particle), c.n_space_dimension, **model_kw)
        else:
            init_fun = get_waveflow_model(
                self.input_dim, xu_coord_type=xu_coord_type, **model_kw)

        rng = jax.random.PRNGKey(c.seed)
        self.init_rng, self.rng = jax.random.split(rng)
        params, psi, log_pdf, sample = init_fun(self.init_rng, self.input_dim)
        self.params = params
        self.psi = psi
        self.log_pdf = log_pdf
        self._sample = sample
        lap_mode = c.laplacian_mode
        if c.eval_backend == 'poly_pallas' and lap_mode == 'fwd':
            lap_mode = 'fwd_batched'
        self.h_fn = construct_hamiltonian_function(
            psi, protons=self.protons,
            n_space_dimensions=c.n_space_dimension, eps=0.0,
            laplacian_mode=lap_mode,
            interactions=c.interactions)

        self.sample_jit = jax.jit(sample, static_argnums=(2,))
        if c.optimizer == 'sr':
            from waveflow_tpu.vmc.sr import (make_sr_train_step,
                                             make_sr_train_window)
            self.optimizer = None
            self.opt_state = ()
            self.step_jit = jax.jit(make_sr_train_step(
                psi, self.h_fn, c.learning_rate, damping=c.sr_damping,
                cg_iters=c.sr_cg_iters,
                max_update_norm=c.sr_max_update_norm))
            self.window_jit = jax.jit(make_sr_train_window(
                psi, self.h_fn, sample, c.learning_rate, c.batch_size,
                c.window, damping=c.sr_damping, cg_iters=c.sr_cg_iters,
                max_update_norm=c.sr_max_update_norm))
        elif c.optimizer == 'spring':
            from waveflow_tpu.vmc.estimators import make_window_from_step
            from waveflow_tpu.vmc.sr import make_spring_train_step
            spring_step = make_spring_train_step(
                psi, self.h_fn, c.learning_rate, damping=c.sr_damping,
                momentum=c.spring_momentum,
                max_update_norm=c.sr_max_update_norm,
                score_row_clip=c.score_row_clip,
                score_row_clip_warmup=c.score_row_clip_warmup)
            self.optimizer = None
            self.opt_state = spring_step.init_state(params)
            self.step_jit = jax.jit(spring_step)
            self.window_jit = jax.jit(make_window_from_step(
                spring_step, sample, c.batch_size, c.window))
        elif c.optimizer == 'adam':
            if c.grad_clip is not None:
                self.optimizer = optax.chain(
                    optax.clip_by_global_norm(c.grad_clip),
                    optax.adam(c.learning_rate))
            else:
                self.optimizer = optax.adam(c.learning_rate)
            # flatten the update into one vector: one fused elementwise
            # kernel instead of ~2 per parameter leaf — the fused window is
            # launch-bound at small batch, and this alone is worth ~8%
            # walkers/s at batch 256 (mathematically identical updates)
            self.optimizer = optax.flatten(self.optimizer)
            self.opt_state = self.optimizer.init(params)
            self.step_jit = jax.jit(
                make_train_step(psi, self.h_fn, self.optimizer,
                                estimator=c.estimator,
                                energy_clip=c.energy_clip,
                                clip_stat=c.clip_stat))
            self.window_jit = jax.jit(make_train_window(
                psi, self.h_fn, sample, self.optimizer, c.batch_size,
                c.window, estimator=c.estimator, energy_clip=c.energy_clip,
                clip_stat=c.clip_stat))
        else:
            raise ValueError(f"unknown optimizer {c.optimizer!r}")
        self.mesh = None
        self.walker_axis = None
        if c.data_parallel:
            from waveflow_tpu.parallel import (make_host_chip_mesh,
                                               make_sharded_spring_window,
                                               make_sharded_sr_window,
                                               make_sharded_train_window,
                                               make_walker_mesh)
            from waveflow_tpu.parallel.mesh import WALKER_AXIS
            if c.data_parallel == 'hosts':
                # 2-D host×chip mesh: walkers sharded over both axes, the
                # named-axis collectives reduce over ("hosts", "chips") so
                # XLA lowers the inner reduction onto ICI before the DCN
                # hop (SURVEY §5 two-level reduction)
                self.mesh = make_host_chip_mesh()
                self.walker_axis = ("hosts", "chips")
            else:
                self.mesh = make_walker_mesh()
                self.walker_axis = WALKER_AXIS
            if c.optimizer == 'sr':
                # natural gradient over the mesh: every CG matvec on the
                # quantum geometric tensor is pmean-reduced (vmc/sr.py)
                self.sharded_window_jit = make_sharded_sr_window(
                    psi, self.h_fn, sample, c.learning_rate, c.batch_size,
                    c.window, self.mesh, axis_name=self.walker_axis,
                    damping=c.sr_damping, cg_iters=c.sr_cg_iters,
                    max_update_norm=c.sr_max_update_norm)
            elif c.optimizer == 'spring':
                self.sharded_window_jit = make_sharded_spring_window(
                    psi, self.h_fn, sample, c.learning_rate, c.batch_size,
                    c.window, self.mesh, axis_name=self.walker_axis,
                    damping=c.sr_damping,
                    momentum=c.spring_momentum,
                    max_update_norm=c.sr_max_update_norm,
                    score_row_clip=c.score_row_clip,
                    score_row_clip_warmup=c.score_row_clip_warmup)
            else:
                self.sharded_window_jit = make_sharded_train_window(
                    psi, self.h_fn, sample, self.optimizer, c.batch_size,
                    c.window, self.mesh, axis_name=self.walker_axis,
                    estimator=c.estimator)

        self.mcmc_state = None
        if c.sampler in ('metropolis', 'mala'):
            # identical 1D fermions live on the coordinate-sorted sector,
            # paired2d fermions on the x-sorted-pairs sector; the
            # 'independent' coordinate map (single-electron systems, any
            # n_space_dimension) has no quotient, so proposals need no sort
            sort_fermions = ('paired2d' if xu_coord_type == 'paired2d'
                             else xu_coord_type != 'independent')
            # SR pairs with the MCMC windows by passing its update as the
            # window's train_step (same step contract, vmc/sr.py)
            mcmc_train_step = None
            if c.optimizer in ('sr', 'spring'):
                from waveflow_tpu.vmc.sr import (make_spring_train_step,
                                                 make_sr_train_step)
                axis = self.walker_axis
                if c.optimizer == 'sr':
                    mcmc_train_step = make_sr_train_step(
                        psi, self.h_fn, c.learning_rate,
                        damping=c.sr_damping, cg_iters=c.sr_cg_iters,
                        pmean_axis=axis,
                        max_update_norm=c.sr_max_update_norm)
                else:
                    mcmc_train_step = make_spring_train_step(
                        psi, self.h_fn, c.learning_rate,
                        damping=c.sr_damping, momentum=c.spring_momentum,
                        pmean_axis=axis,
                        max_update_norm=c.sr_max_update_norm,
                        score_row_clip=c.score_row_clip,
                        score_row_clip_warmup=c.score_row_clip_warmup)
            if self.mesh is not None:
                from waveflow_tpu.parallel import (make_sharded_mala_window,
                                                   make_sharded_mcmc_window)
                make_sharded = (make_sharded_mala_window if c.sampler == 'mala'
                                else make_sharded_mcmc_window)
                self.mcmc_init, self.mcmc_window_jit = make_sharded(
                    psi, self.h_fn, log_pdf, self.optimizer, c.window,
                    c.box_length, self.mesh, n_sweeps=c.mcmc_sweeps,
                    target_accept=c.mcmc_target_accept,
                    axis_name=self.walker_axis,
                    estimator=c.estimator, sort_fermions=sort_fermions,
                    train_step=mcmc_train_step)
            elif c.sampler == 'mala':
                from waveflow_tpu.vmc.mala import make_mala_train_window
                self.mcmc_init, mcmc_window = make_mala_train_window(
                    psi, self.h_fn, log_pdf, self.optimizer, c.window,
                    c.box_length, n_sweeps=c.mcmc_sweeps,
                    target_accept=c.mcmc_target_accept,
                    estimator=c.estimator, energy_clip=c.energy_clip,
                    sort_fermions=sort_fermions,
                    train_step=mcmc_train_step)
                self.mcmc_window_jit = jax.jit(mcmc_window)
            else:
                from waveflow_tpu.vmc.metropolis import make_mcmc_train_window
                self.mcmc_init, mcmc_window = make_mcmc_train_window(
                    psi, self.h_fn, log_pdf, self.optimizer, c.window,
                    c.box_length, n_sweeps=c.mcmc_sweeps,
                    target_accept=c.mcmc_target_accept,
                    estimator=c.estimator, energy_clip=c.energy_clip,
                    sort_proposals=sort_fermions,
                    train_step=mcmc_train_step)
                self.mcmc_window_jit = jax.jit(mcmc_window)
        elif c.sampler != 'ancestral':
            raise ValueError(f"unknown sampler {c.sampler!r}")

        self.epoch = 0
        self.losses: list = []
        self.walker_keys = None   # per-device PRNG keys in data_parallel mode

    def _init_mcmc_state(self, step_size: float | None = None):
        """Warm-start Metropolis walkers with one exact ancestral draw.
        ``step_size`` overrides the config initial scale (walker refresh
        keeps the adapted proposal scale).  In multi-process mode every
        process draws the identical full batch (same deterministic rng
        stream) and the state fields are placed as global sharded arrays."""
        self.rng, k = jax.random.split(self.rng)
        positions = self.sample_jit(k, self.params, self.config.batch_size)
        state = self.mcmc_init(
            self.params, positions,
            step_size=(self.config.mcmc_step_size if step_size is None
                       else step_size))
        if self.mesh is not None and jax.process_count() > 1:
            state = self._globalize_mcmc(state)
        return state

    # ---- multi-host state placement ---------------------------------------
    # The reference has no distributed code at all (SURVEY §2); these place
    # walker state as global jax.Arrays over the host×chip mesh so the
    # production trainer itself — not a hand-rolled window — drives
    # multi-process runs (VERDICT r4 item 5).

    def _walker_spec(self):
        from jax.sharding import PartitionSpec as P
        return P(self.walker_axis)

    def _from_global_host(self, full, spec):
        """Host array (identical on all processes) -> global sharded array.
        Exact regardless of device ordering: each addressable device gets
        the slice the sharding assigns it."""
        from jax.sharding import NamedSharding
        full = np.asarray(full)
        sh = NamedSharding(self.mesh, spec)
        idx = sh.addressable_devices_indices_map(full.shape)
        arrs = [jax.device_put(full[i], d) for d, i in idx.items()]
        return jax.make_array_from_single_device_arrays(full.shape, sh, arrs)

    def _from_local(self, local, spec):
        """This process's shard data -> global sharded array."""
        from jax.sharding import NamedSharding
        return jax.make_array_from_process_local_data(
            NamedSharding(self.mesh, spec), np.asarray(local))

    @staticmethod
    def _local_shards(arr):
        """Process-local shard data, device-major, as one ndarray."""
        shards = sorted(arr.addressable_shards, key=lambda s: s.index)
        return np.concatenate([np.asarray(s.data) for s in shards])

    def _mcmc_field_sharded(self, n_fields):
        """Which MCMC-state fields are walker-sharded: MetropolisState
        (positions, log_prob, step, rate) / MALAState (positions, log_prob,
        grad, step, rate) — the trailing two scalars are replicated."""
        return [i < n_fields - 2 for i in range(n_fields)]

    def _globalize_mcmc(self, state):
        fields = list(state)
        spec = self._walker_spec()
        out = [self._from_global_host(np.asarray(x), spec) if sharded
               else jnp.asarray(x)
               for x, sharded in zip(fields, self._mcmc_field_sharded(
                   len(fields)))]
        return type(state)(*out)

    # ---- checkpointing ----------------------------------------------------

    def save_checkpoint(self, save_dir: str):
        path = Path(save_dir)
        path.mkdir(parents=True, exist_ok=True)
        multihost = jax.process_count() > 1
        if self.config.save_artifacts and not multihost:
            from waveflow_tpu.vmc.artifacts import save_wavefunction_artifacts
            self.rng, art_rng = jax.random.split(self.rng)
            save_wavefunction_artifacts(
                save_dir, self.psi, self.sample_jit, self.params, self.epoch,
                self.config.box_length, int(self.n_particle), self.protons,
                art_rng, n_space_dimension=self.config.n_space_dimension)
        if multihost:
            # walker state is sharded across processes: each process writes
            # its own shard file (device-major local data, bitwise-exact
            # resume); host 0 writes the replicated blob + loss trace below
            blob = {}
            if self.walker_keys is not None:
                blob['walker_keys'] = self._local_shards(self.walker_keys)
            if self.mcmc_state is not None:
                fields = list(self.mcmc_state)
                blob['mcmc_state'] = [
                    self._local_shards(x) if sharded else np.asarray(x)
                    for x, sharded in zip(fields, self._mcmc_field_sharded(
                        len(fields)))]
            with open(path / f'checkpoints.shard{jax.process_index()}',
                      'wb') as f:
                pickle.dump(blob, f)
        if multihost and jax.process_index() != 0:
            return
        with open(path / 'checkpoints', 'wb') as f:
            pickle.dump({
                'params': jax.device_get(self.params),
                'opt_state': jax.device_get(self.opt_state),
                'epoch': self.epoch,
                'rng': jax.device_get(self.rng),
                # full sampler state so resume is exact in every mode:
                # per-device keys (data_parallel) and warm MCMC walkers.
                # Multi-host runs keep these in the per-process shard files
                'walker_keys': (jax.device_get(self.walker_keys)
                                if self.walker_keys is not None
                                and not multihost else None),
                'mcmc_state': (jax.device_get(self.mcmc_state)
                               if self.mcmc_state is not None
                               and not multihost else None),
            }, f)
        # loss.npy IS the per-epoch ⟨E_L⟩ trace — the reference writes the
        # same data twice as loss.npy + energies.npy (vqmc.py:118-119,
        # helpers.py:42-43); the duplicate doubled artifact bytes on
        # 100k-epoch runs and is dropped (VERDICT r4 weak #6)
        np.save(path / 'loss.npy', np.asarray(self.losses))

    def load_checkpoint(self, save_dir: str) -> bool:
        path = Path(save_dir) / 'checkpoints'
        if not path.exists():
            return False
        with open(path, 'rb') as f:
            state = pickle.load(f)
        self.params = jax.device_put(state['params'])
        restored_opt = state['opt_state']
        if self.optimizer is not None:
            # checkpoints written before the optax.flatten change carry a
            # per-leaf opt_state whose pytree structure no longer matches
            # the flattened optimizer (ADVICE r2); re-init rather than crash
            # at the first update (adam moments restart — params/rng/epoch
            # still resume exactly)
            fresh = self.optimizer.init(self.params)
            same = (jax.tree_util.tree_structure(restored_opt)
                    == jax.tree_util.tree_structure(fresh))
            if same:
                self.opt_state = jax.device_put(restored_opt)
            else:
                print("load_checkpoint: optimizer state structure changed "
                      "(pre-flatten checkpoint?) — re-initializing adam "
                      "moments", flush=True)
                self.opt_state = fresh
        elif (isinstance(self.opt_state, dict) and 'delta' in self.opt_state
                and not isinstance(restored_opt, dict)):
            # pre-round-4 SPRING checkpoints carried the flat delta alone;
            # migrate into the counter-carrying state (step := epoch so the
            # transient row-clip warmup doesn't re-trigger on resume).
            # Guard (ADVICE r4): the migration only applies to a flat
            # parameter-sized vector — anything else (e.g. an adam
            # checkpoint loaded into a SPRING-configured trainer) is an
            # optimizer mismatch and must fail loudly, not with a cryptic
            # asarray error downstream
            n_params = sum(int(np.asarray(p).size)
                           for p in jax.tree_util.tree_leaves(self.params))
            flat_ok = False
            try:
                arr = np.asarray(restored_opt)
                flat_ok = arr.ndim == 1 and arr.size == n_params
            except Exception:
                flat_ok = False
            if not flat_ok:
                raise ValueError(
                    "checkpoint optimizer state does not match the "
                    "configured 'spring' optimizer (expected a flat delta "
                    f"vector of size {n_params}, got "
                    f"{type(restored_opt).__name__}) — was this checkpoint "
                    "written with a different optimizer (e.g. adam)?")
            self.opt_state = {
                'delta': jax.device_put(jnp.asarray(restored_opt)),
                'step': jnp.asarray(state['epoch'], jnp.int32),
                'skipped': jnp.zeros((), jnp.int32),
                'fallbacks': jnp.zeros((), jnp.int32)}
        elif isinstance(self.opt_state, dict) and isinstance(restored_opt, dict):
            # dict-state checkpoints: fill any counters added since
            merged = {k: jax.device_put(v) for k, v in restored_opt.items()}
            for k, v in self.opt_state.items():
                merged.setdefault(k, v)
            self.opt_state = merged
        else:
            self.opt_state = jax.device_put(restored_opt)
        self.epoch = state['epoch']
        self.rng = jax.device_put(state['rng'])
        if state.get('walker_keys') is not None:
            self.walker_keys = jax.device_put(state['walker_keys'])
        if state.get('mcmc_state') is not None:
            fields = [jax.device_put(x) for x in state['mcmc_state']]
            if len(fields) == 5:
                from waveflow_tpu.vmc.mala import MALAState
                self.mcmc_state = MALAState(*fields)
            else:
                from waveflow_tpu.vmc.metropolis import MetropolisState
                self.mcmc_state = MetropolisState(*fields)
        shard_path = Path(save_dir) / f'checkpoints.shard{jax.process_index()}'
        if jax.process_count() > 1 and shard_path.exists():
            # per-process walker shards (written by save_checkpoint in
            # multi-host mode) -> global sharded arrays, bitwise-exact
            with open(shard_path, 'rb') as f:
                blob = pickle.load(f)
            spec = self._walker_spec()
            if blob.get('walker_keys') is not None:
                self.walker_keys = self._from_local(blob['walker_keys'], spec)
            if blob.get('mcmc_state') is not None:
                fields = blob['mcmc_state']
                leaves = [self._from_local(x, spec) if sharded
                          else jnp.asarray(x)
                          for x, sharded in zip(fields,
                                                self._mcmc_field_sharded(
                                                    len(fields)))]
                if len(fields) == 5:
                    from waveflow_tpu.vmc.mala import MALAState
                    self.mcmc_state = MALAState(*leaves)
                else:
                    from waveflow_tpu.vmc.metropolis import MetropolisState
                    self.mcmc_state = MetropolisState(*leaves)
        loss_path = Path(save_dir) / 'loss.npy'
        if loss_path.exists():
            self.losses = np.load(loss_path).tolist()
        return True

    # ---- training ---------------------------------------------------------

    def train(self, num_epochs: int | None = None, restart: bool = False,
              callback=None, verbose: bool = True):
        c = self.config
        num_epochs = num_epochs if num_epochs is not None else c.num_epochs
        save_dir = c.resolved_save_dir()

        if restart:
            self.load_checkpoint(save_dir)

        Path(save_dir).mkdir(parents=True, exist_ok=True)
        with open(Path(save_dir) / 'system_info.json', 'w') as f:
            json.dump({
                'system_name': c.system_name,
                'box_length': c.box_length,
                'n_particle': int(self.n_particle),
                'n_space_dimension': c.n_space_dimension,
                'window': c.window,
                'batch_size': c.batch_size,
            }, f, indent=4)

        baseline = jnp.zeros(())
        start = self.epoch
        t0 = time.time()

        if callback is None and num_epochs >= c.window:
            # fast path: fused on-device windows (one dispatch per
            # c.window epochs — see make_train_window)
            n_windows, rem = divmod(num_epochs, c.window)
            # checkpoint cadence aligned to the window grid so traces and
            # checkpoints land on comparable epochs regardless of log_every
            log_stride = max(1, round(c.log_every / c.window))
            use_mcmc = c.sampler in ('metropolis', 'mala')
            if use_mcmc and self.mcmc_state is None:
                self.mcmc_state = self._init_mcmc_state()
            refresh_stride = None
            refresh_every = c.mcmc_refresh_every
            if refresh_every == 'auto':
                # Li gate (round5_quality.json li_metro_refresh rows):
                # refresh-per-window brings Metropolis-trained Li from
                # −3.24 to −3.3745 vs ancestral −3.3759; ≥3-electron
                # systems get it by default, the flagship stays bitwise
                refresh_every = (c.window if use_mcmc
                                 and self.ansatz == 'sorted'
                                 and int(self.n_particle) >= 3 else None)
            if use_mcmc and refresh_every:
                if self.ansatz == 'antisym':
                    raise ValueError(
                        "mcmc_refresh_every requires an exact ancestral "
                        "sampler (ansatz='sorted'); the antisym ansatz has "
                        "none")
                refresh_stride = max(1, round(refresh_every / c.window))
            multihost = jax.process_count() > 1
            if self.mesh is not None:
                n_dev = self.mesh.devices.size
                if self.walker_keys is None:
                    # advance the host stream so checkpoints after this
                    # point never replay the stream that seeded the keys;
                    # identical split on every process, placed as a global
                    # array sharded over the walker mesh
                    self.rng, sub = jax.random.split(self.rng)
                    self.walker_keys = self._from_global_host(
                        np.asarray(jax.random.split(sub, n_dev)),
                        self._walker_spec())
            good_state = None
            for w in range(n_windows):
                if refresh_stride and w and w % refresh_stride == 0:
                    # fresh exact draws from |ψ|² (unbiased), adapted step
                    # size carried over; host-side so the fused window's
                    # compiled executable is untouched (cache-friendly)
                    self.mcmc_state = self._init_mcmc_state(
                        step_size=float(jnp.ravel(
                            jnp.asarray(self.mcmc_state.step_size))[0]))
                if c.divergence_recovery and (w % 10 == 0):
                    # sharded walker state is not host-fetchable in
                    # multi-host mode; snapshot the replicated leaves and
                    # re-draw walkers on restore
                    good_state = jax.device_get(
                        (self.params, self.opt_state,
                         None if multihost else self.mcmc_state))
                if use_mcmc and self.mesh is not None:
                    (self.params, self.opt_state, self.walker_keys, baseline,
                     losses, self.mcmc_state) = self.mcmc_window_jit(
                        self.params, self.opt_state, self.walker_keys,
                        baseline, self.mcmc_state)
                elif use_mcmc:
                    (self.params, self.opt_state, self.rng, baseline,
                     losses, self.mcmc_state) = self.mcmc_window_jit(
                        self.params, self.opt_state, self.rng, baseline,
                        self.mcmc_state)
                elif self.mesh is not None:
                    (self.params, self.opt_state, self.walker_keys, baseline,
                     losses) = self.sharded_window_jit(
                        self.params, self.opt_state, self.walker_keys,
                        baseline)
                else:
                    (self.params, self.opt_state, self.rng, baseline,
                     losses) = self.window_jit(self.params, self.opt_state,
                                               self.rng, baseline)
                if c.divergence_recovery and not bool(
                        jnp.isfinite(losses).all()):
                    # restore last good snapshot, fresh stream, reset baseline
                    if verbose:
                        print(f"window {w}: non-finite losses — restoring "
                              "last good state", flush=True)
                    if good_state is not None:
                        params_g, opt_g, mcmc_g = good_state
                        self.params = jax.device_put(params_g)
                        self.opt_state = jax.device_put(opt_g)
                        if mcmc_g is not None:
                            self.mcmc_state = jax.device_put(mcmc_g)
                        elif use_mcmc:
                            self.mcmc_state = self._init_mcmc_state()
                    self.rng = jax.random.fold_in(self.rng, w)
                    if self.mesh is not None:
                        self.rng, sub = jax.random.split(self.rng)
                        self.walker_keys = self._from_global_host(
                            np.asarray(jax.random.split(sub, n_dev)),
                            self._walker_spec())
                    baseline = jnp.zeros(())
                    continue
                self.losses.extend(np.asarray(losses).tolist())
                self.epoch = start + (w + 1) * c.window
                if (w + 1) % log_stride == 0 or w == n_windows - 1:
                    self.save_checkpoint(save_dir)
                    if verbose:
                        rate = (self.epoch - start) / (time.time() - t0)
                        print(f"epoch {self.epoch} | loss "
                              f"{self.losses[-1]:.3f} | {rate:.1f} steps/s",
                              flush=True)
            num_epochs = rem
            # remainder epochs (not a whole window) fall through to the
            # per-epoch loop below, which always draws exact ancestral
            # walkers — valid for either sampler (exact draws from |ψ|²)

        for epoch in range(self.epoch + 1, self.epoch + num_epochs + 1):
            self.epoch = epoch
            self.rng, split_rng = jax.random.split(self.rng)
            batch = self.sample_jit(split_rng, self.params, c.batch_size)
            self.params, self.opt_state, loss_val = self.step_jit(
                self.params, self.opt_state, batch, baseline)
            self.losses.append(float(loss_val))
            if epoch % c.window == 0:
                baseline = jnp.asarray(
                    np.mean(self.losses[-c.window:]), dtype=jnp.float32)
            if epoch % c.log_every == 0:
                self.save_checkpoint(save_dir)
                if verbose:
                    rate = (epoch - start) / (time.time() - t0)
                    print(f"epoch {epoch} | loss {loss_val:.3f} | "
                          f"{rate:.1f} steps/s", flush=True)
            if callback is not None:
                callback(self, epoch, loss_val)
        self.save_checkpoint(save_dir)
        return self.losses

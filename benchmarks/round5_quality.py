"""Round-5 quality studies (VERDICT r4 items 1, 2, 4, 7), one resumable
driver.  Stages (each keyed in results/round5_quality.json; finished keys
skip on rerun):

  antisym  — the permutation-equivariant 2D two-electron ansatz
      (models/antisym.py): He/H2 2D trained with Metropolis walkers on
      |ψ_A|², ψ_A = (φ(r1,r2) − φ(r2,r1))/√2 with φ an unconstrained
      'independent'-map square-flow.  Done-criterion (VERDICT r4 item 1):
      frozen-params He-2d-2e eval statistically BELOW the x-sector
      Dirichlet floor −1.25879 (results/sector_bound.json, Richardson
      32→40), moving toward the exact −1.26061; subspace fidelity
      against the doubly degenerate ED ground level reported.

  li_refresh — Metropolis-trained Li with periodic exact-ancestral walker
      refresh (mcmc_refresh_every): the r4 failure (−3.34/−3.24 vs
      ancestral −3.3759, walkers trapped in nodal pockets) re-run with
      the fix.  Done: within ~1e-3 of the ancestral-trained −3.3759
      under the frozen-params protocol (VERDICT r4 item 2).

  box4   — the n=4 sorted-sector gate (VERDICT r4 item 7): box4 free
      fermions (analytic oracle 30π²/(2(2L)²)) + interacting 'Be'
      (variational, no ED oracle exists at n=4).

  ng_scale — natural gradient at scale (VERDICT r4 item 4): adam vs
      matrix-free CG-SR vs SPRING at batch 16384 and 65536 on the
      flagship, equal wall-clock budget, frozen-params eval + epochs/s.
      SPRING at 65536 is recorded as infeasible by construction: the
      (B,B) Gram alone is 17 GB f32, past v5e HBM — the measured
      crossover evidence sr.py:170-175 asserts.

Run on the chip:  python benchmarks/round5_quality.py [--only PREFIX]
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

OUT = REPO / 'results' / 'round5_quality.json'
ORACLE_2D = REPO / 'results' / 'oracle_2d_2e.json'

# grid-converged sector floor / exact targets (sector_bound.json,
# oracle_2d_2e.json; Richardson n32->n40)
HE2D_X_SECTOR_FLOOR = -1.25879
HE2D_EXACT = -1.26061
H2_2D_EXACT = -1.18652


def _save(out):
    OUT.write_text(json.dumps(out, indent=2))


def _trace_median(losses, frac=0.2):
    tail = np.asarray(losses)[int(len(losses) * (1 - frac)):]
    return float(np.median(tail))


def run_vmc(key, out, epochs, eval_blocks=64, eval_batch=None, decay=None,
            need_trainer=False, **cfg_kw):
    """Train + frozen-params evaluate one config; record everything.
    Returns (row, trainer) — trainer is None for finished rows unless
    ``need_trainer`` (then it is rebuilt and checkpoint-restored)."""
    from waveflow_tpu.vmc import VMCConfig, VMCTrainer, evaluate_trainer
    cfg = VMCConfig(save_dir=str(REPO / 'results' / f'r5_{key}'),
                    log_every=10 ** 9, **cfg_kw)
    if key in out:
        if not need_trainer:
            return out[key], None
        t = VMCTrainer(cfg)
        assert t.load_checkpoint(cfg.resolved_save_dir())
        return out[key], t
    t0 = time.time()
    t = VMCTrainer(cfg)
    losses = t.train(num_epochs=epochs, verbose=False)
    if decay:
        decay_epochs, decay_lr = decay
        cfg2 = VMCConfig(**{**cfg.__dict__, 'learning_rate': decay_lr})
        t2 = VMCTrainer(cfg2)
        assert t2.load_checkpoint(cfg.resolved_save_dir())
        losses = t2.train(num_epochs=decay_epochs, verbose=False)
        t = t2
    wall = time.time() - t0
    ev = evaluate_trainer(t, n_blocks=eval_blocks, sweeps_per_block=25,
                          n_warmup_sweeps=250, batch_size=eval_batch)
    row = {
        'trace_median': round(_trace_median(losses), 6),
        'eval_mean': round(ev.e_mean, 6),
        'eval_stderr': round(ev.e_stderr, 7),
        'eval_clipped': round(ev.e_clipped, 6),
        'eval_clipped_stderr': round(ev.e_clipped_stderr, 7),
        'eval_stderr_2x': round(ev.e_stderr_2x, 7),
        'eval_stderr_4x': round(ev.e_stderr_4x, 7),
        'accept_rate': round(ev.accept_rate, 3),
        'epochs_per_sec': round(len(losses) / wall, 1),
        'wall_s': round(wall, 1),
    }
    if isinstance(t.opt_state, dict) and 'skipped' in t.opt_state:
        row['spring_skipped'] = int(t.opt_state['skipped'])
    out[key] = row
    _save(out)
    print(key, json.dumps(row), flush=True)
    return row, t


def _ed_2d2e(name, n_states):
    """Cached n_grid=40 2D-2e ED state(s) for fidelity (CPU, ~3 min)."""
    from waveflow_tpu.physics.exact import exact_ground_state_2d_2e
    cache = REPO / 'results' / f'ed40_{name}_2d2e.npz'
    if cache.exists():
        d = np.load(cache)
        return d['evals'], d['psi'], d['sites'], d['x']
    protons = {'He': [[0.0, 0.0], [0.0, 0.0]],
               'H2': [[-0.9, 0.0], [0.9, 0.0]]}[name]
    res = exact_ground_state_2d_2e(np.asarray(protons), 5.0, n_grid=40,
                                   n_states=n_states)
    if n_states == 1:
        evals, psi, sites, x = np.array([res[0]]), res[1][:, None], res[2], res[3]
    else:
        evals, psi, sites, x = res
    np.savez_compressed(cache, evals=evals, psi=psi, sites=sites, x=x)
    return evals, psi, sites, x


def stage_antisym(out):
    from waveflow_tpu.utils.fidelity import fidelity_2d_2e
    base = dict(n_space_dimension=2, box_length=5.0, batch_size=256,
                window=100, seed=2, ansatz='antisym', sampler='metropolis',
                learning_rate=3e-4, eval_batch=4096)
    jobs = [
        ('he2d2e_antisym', dict(system_name='He'), 'He', 2,
         HE2D_EXACT, HE2D_X_SECTOR_FLOOR),
        ('he2d2e_antisym_big', dict(system_name='He', num_knots=31,
                                    n_flow_layers=4), 'He', 2,
         HE2D_EXACT, HE2D_X_SECTOR_FLOOR),
        ('h2_2d2e_antisym', dict(system_name='H2'), 'H2', 1,
         H2_2D_EXACT, None),
    ]
    for key, extra, sysname, n_states, exact, floor in jobs:
        if key in out and 'fidelity_ed40' in out[key]:
            continue
        row, trainer = run_vmc(key, out, 40_000, decay=(20_000, 3e-5),
                               need_trainer=True, **base, **extra)
        row['exact_richardson'] = exact
        row['deviation_eval'] = round(row['eval_clipped'] - exact, 6)
        if floor is not None:
            row['x_sector_floor'] = floor
            row['below_floor'] = bool(row['eval_clipped'] < floor)
            row['below_floor_sigma'] = round(
                (floor - row['eval_clipped']) / row['eval_clipped_stderr'], 2)
        t0 = time.time()
        evals, psi_ed, sites, x = _ed_2d2e(sysname, n_states)
        if n_states == 1:
            fid = fidelity_2d_2e(trainer.psi, trainer.params,
                                 psi_ed[:, 0], sites, x)
        else:
            fid = fidelity_2d_2e(trainer.psi, trainer.params,
                                 psi_ed, sites, x)
        row['fidelity_ed40'] = round(float(fid), 6)
        row['fidelity_wall_s'] = round(time.time() - t0, 1)
        out[key] = row
        _save(out)
        print(key, 'fidelity', row['fidelity_ed40'], flush=True)


def stage_li_refresh(out):
    li = dict(system_name='Li', box_length=10.0, batch_size=256, window=100,
              seed=2, sampler='metropolis', learning_rate=3e-4)
    for sweeps, every, tag in ((3, 1000, '1k'), (1, 1000, '1k'),
                               (3, 100, '100'), (1, 100, '100')):
        key = f'li_metro_refresh{tag}_s{sweeps}'
        row, _ = run_vmc(key, out, 20_000, mcmc_sweeps=sweeps,
                         mcmc_refresh_every=every, **li)
        row['ancestral_ref'] = -3.3759     # r4 ancestral-trained Li eval
        row['r4_norefresh'] = {3: -3.24, 1: -3.34}[sweeps]
        out[key] = row
        _save(out)


def stage_box4(out):
    from waveflow_tpu.physics.exact import exact_free_fermion_energy
    box = dict(box_length=5.0, batch_size=256, window=100, seed=2,
               learning_rate=3e-4)
    row, _ = run_vmc('box4_free', out, 40_000, system_name='box4',
                     interactions=False, **box)
    exact = exact_free_fermion_energy(4, 5.0)
    row['exact_analytic'] = round(exact, 6)
    row['deviation_eval'] = round(row['eval_clipped'] - exact, 6)
    out['box4_free'] = row
    _save(out)
    # capacity row: the r4 big-ansatz recipe applied at n=4
    row_b, _ = run_vmc('box4_free_big', out, 40_000, system_name='box4',
                       interactions=False, num_knots=31, n_flow_layers=4,
                       **box)
    row_b['exact_analytic'] = round(exact, 6)
    row_b['deviation_eval'] = round(row_b['eval_clipped'] - exact, 6)
    out['box4_free_big'] = row_b
    _save(out)
    # interacting n=4: variational only (no ED oracle at n=4 — C(n,4)
    # blows up); judged by being finite, stable, and above no bound
    run_vmc('be4_interacting', out, 40_000, system_name='Be',
            box_length=10.0, batch_size=256, window=100, seed=2,
            learning_rate=3e-4)


def stage_antisym2d_free(out):
    """2D free-fermion antisym gates: the analytic level-filling oracle
    (exact_free_fermion_energy_2d) judges the antisym ansatz beyond n=2
    in 2D, where pair-basis grid ED is intractable — box3-2d is the
    first 3-electron 2D configuration (6-term antisymmetrization over a
    6-dimensional flow)."""
    from waveflow_tpu.physics.exact import exact_free_fermion_energy_2d
    base = dict(n_space_dimension=2, box_length=5.0, batch_size=256,
                window=100, seed=2, ansatz='antisym', sampler='metropolis',
                interactions=False, learning_rate=3e-4, eval_batch=4096)
    for name, n_el in (('box2', 2), ('box3', 3)):
        key = f'{name}_2d_antisym'
        row, _ = run_vmc(key, out, 40_000, decay=(20_000, 3e-5),
                         system_name=name, **base)
        exact = exact_free_fermion_energy_2d(n_el, 5.0)
        row['exact_analytic'] = round(exact, 6)
        row['deviation_eval'] = round(row['eval_clipped'] - exact, 6)
        row['deviation_mean'] = round(row['eval_mean'] - exact, 6)
        out[key] = row
        _save(out)


def _timed_train(trainer, budget_s, window):
    """Train whole windows until the wall budget is spent (post-compile).
    Returns (epochs_done, measure_wall_s)."""
    trainer.train(num_epochs=window, verbose=False)      # compile + warm
    done = 0
    t0 = time.time()
    while time.time() - t0 < budget_s:
        trainer.train(num_epochs=window, verbose=False)
        done += window
    return done, time.time() - t0


def stage_ng_scale(out):
    """adam / CG-SR / SPRING at batch 16k & 65k: equal-wall-clock quality +
    throughput on the flagship (VERDICT r4 item 4)."""
    from waveflow_tpu.vmc import VMCConfig, VMCTrainer, evaluate_trainer
    BUDGET_S = 180.0
    grid = [
        ('adam_16k', dict(optimizer='adam', learning_rate=1e-4), 16384),
        ('sr_16k', dict(optimizer='sr', learning_rate=0.05,
                        sr_cg_iters=20), 16384),
        ('spring_16k', dict(optimizer='spring', learning_rate=0.05,
                            spring_momentum=0.9), 16384),
        ('adam_65k', dict(optimizer='adam', learning_rate=1e-4), 65536),
        ('sr_65k', dict(optimizer='sr', learning_rate=0.05,
                        sr_cg_iters=20), 65536),
    ]
    for name, opt_kw, batch in grid:
        key = f'ng_{name}'
        if key in out:
            continue
        cfg = VMCConfig(system_name='He', box_length=10.0, batch_size=batch,
                        window=20, seed=2, log_every=10 ** 9,
                        save_dir=f'/tmp/r5_ng_{name}',
                        sr_max_update_norm=0.3, **opt_kw)
        t0 = time.time()
        trainer = VMCTrainer(cfg)
        try:
            epochs, measure_wall = _timed_train(trainer, BUDGET_S, cfg.window)
        except Exception as e:          # noqa: BLE001 — record OOM etc.
            out[key] = {'batch': batch, 'failed': repr(e)[:300]}
            _save(out)
            print(key, 'FAILED', repr(e)[:120], flush=True)
            continue
        ev = evaluate_trainer(trainer, n_blocks=64, sweeps_per_block=25,
                              n_warmup_sweeps=250, batch_size=4096)
        out[key] = {
            'batch': batch,
            'epochs_in_budget': epochs,
            'budget_s': BUDGET_S,
            'epochs_per_sec': round(epochs / measure_wall, 2),
            'walkers_per_sec': round(epochs * batch / measure_wall, 1),
            'eval_clipped': round(ev.e_clipped, 6),
            'eval_clipped_stderr': round(ev.e_clipped_stderr, 7),
            'eval_mean': round(ev.e_mean, 6),
            'trace_median': round(_trace_median(trainer.losses), 6),
            'total_wall_s': round(time.time() - t0, 1),
        }
        _save(out)
        print(key, json.dumps(out[key]), flush=True)
    # SPRING at 65k: infeasible by construction on one v5e — record why
    out.setdefault('ng_spring_65k', {
        'batch': 65536,
        'infeasible': 'dense (B,B) SPRING Gram at B=65536 is 17.2 GB f32 '
                      '(65536^2 * 4) before the Cholesky workspace — past '
                      'the 16 GB v5e HBM; matrix-free CG-SR is the natural-'
                      'gradient path at this batch (sr.py)'})
    _save(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--only', default=None,
                    help='run only stages whose name starts with this')
    args = ap.parse_args()
    out = json.loads(OUT.read_text()) if OUT.exists() else {}
    stages = {'antisym': stage_antisym, 'li_refresh': stage_li_refresh,
              'box4': stage_box4, 'ng_scale': stage_ng_scale,
              'antisym2d_free': stage_antisym2d_free}
    for name, fn in stages.items():
        if args.only and not name.startswith(args.only):
            continue
        print(f"=== stage {name} ===", flush=True)
        fn(out)


if __name__ == '__main__':
    main()

"""Round-4 quality studies (VERDICT r3 items 2-5), one resumable driver.

Stages (each keyed in results/round4_quality.json; finished keys skip):

  spring30k / spring100k — the SPRING flagship with the TRANSIENT score-row
      clip (clip off after 1k updates) + jittered-damping Cholesky retry:
      done-criterion is a frozen-params energy in the adam converged band
      (<= -1.8157) with zero skipped solves from cold start.
  spring4k — one SPRING window at batch 4096: the (B,B)-solve cost row and
      the all-gather memory numbers for the scaling discussion.
  li_*    — the Li (3-fermion) outlier: the box2 recipe (lr 3e-4 + decay,
      bigger ansatz, SPRING) applied to the weakest catalogue row
      (+0.0051 at 40k, fidelity 0.998).  Frozen-params eval re-reports.
  he2d2e_* — the He-2d-2e push: the same toolkit on the 2D frontier, to be
      read against the x-sector ED floor (results/sector_bound.json:
      sector cost 0.00182 Ha = 0.144%, grid-converged).
  sweeps_* — the mcmc_sweeps=1-vs-3 quality gate on the NON-flagship
      systems the r3 study did not cover (Li, H2_wide), deciding the
      default flip.

Run on the chip:  python benchmarks/round4_quality.py [--only PREFIX]
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

OUT = REPO / 'results' / 'round4_quality.json'


def _save(out):
    OUT.write_text(json.dumps(out, indent=2))


def _trace_median(losses, frac=0.2):
    tail = np.asarray(losses)[int(len(losses) * (1 - frac)):]
    return float(np.median(tail))


def run_vmc(key, out, epochs, eval_blocks=64, decay=None, **cfg_kw):
    """Train + frozen-params evaluate one config; record everything."""
    from waveflow_tpu.vmc import VMCConfig, VMCTrainer, evaluate_trainer
    if key in out:
        return out[key]
    t0 = time.time()
    cfg = VMCConfig(save_dir=f"/tmp/r4q_{key}", log_every=10 ** 9, **cfg_kw)
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
                          n_warmup_sweeps=250)
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
        row['spring_fallbacks'] = int(t.opt_state['fallbacks'])
    out[key] = row
    _save(out)
    print(key, json.dumps(row), flush=True)
    return row


SPRING = dict(optimizer='spring', learning_rate=0.05, spring_momentum=0.9,
              sr_max_update_norm=0.3)
FLAG = dict(system_name='He', box_length=10.0, batch_size=256, window=100,
            seed=2)


def stage_spring(out):
    run_vmc('spring30k', out, 30_000, **FLAG, **SPRING)
    run_vmc('spring100k', out, 100_000, **FLAG, **SPRING)
    # SPRING at batch 4096: per-step cost of the (4096,4096) solve + the
    # (B,P) score matrix — the scaling row the r3 verdict asked for
    run_vmc('spring4k_2k', out, 2_000, **{**FLAG, 'batch_size': 4096},
            **SPRING)


def stage_li(out):
    li = dict(system_name='Li', box_length=10.0, batch_size=256, window=100,
              seed=2)
    run_vmc('li_lr3e-4_decay', out, 40_000, decay=(20_000, 3e-5),
            learning_rate=3e-4, **li)
    run_vmc('li_big_lr3e-4', out, 40_000, learning_rate=3e-4,
            num_knots=31, n_flow_layers=4, **li)
    run_vmc('li_spring_20k', out, 20_000, **li, **SPRING)
    run_vmc('li_big_spring_20k', out, 20_000, num_knots=31, n_flow_layers=4,
            **li, **SPRING)


def stage_he2d2e(out):
    he = dict(system_name='He', n_space_dimension=2, box_length=5.0,
              batch_size=256, window=100, seed=2)
    run_vmc('he2d2e_lr3e-4_decay', out, 40_000, decay=(20_000, 3e-5),
            learning_rate=3e-4, **he)
    run_vmc('he2d2e_big_lr3e-4_decay', out, 40_000, decay=(20_000, 3e-5),
            learning_rate=3e-4, num_knots=31, n_flow_layers=4, **he)
    run_vmc('he2d2e_spring_20k', out, 20_000, **he, **SPRING)


def stage_sweeps(out):
    # sweeps=1 vs 3 under the frozen-params protocol on systems the r3
    # study didn't cover (the flagship was already quality-equal).
    # Ordered cheap-first: the 1D gates land even if the slower 2D pair
    # (frozen-params eval in 2D takes ~10 min per run) is cut by time.
    for name, L, n_dim in (('H2_wide', 12.0, 1), ('Li', 10.0, 1),
                           ('He', 5.0, 2)):
        base = dict(system_name=name, n_space_dimension=n_dim, box_length=L,
                    batch_size=256, window=100, seed=2,
                    sampler='metropolis', learning_rate=3e-4)
        for sweeps in (1, 3):
            run_vmc(f'sweeps_{name}_s{sweeps}', out, 20_000,
                    mcmc_sweeps=sweeps, **base)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--only', default=None,
                    help='run only stages whose name starts with this')
    args = ap.parse_args()
    out = json.loads(OUT.read_text()) if OUT.exists() else {}
    stages = {'spring': stage_spring, 'li': stage_li,
              'he2d2e': stage_he2d2e, 'sweeps': stage_sweeps}
    for name, fn in stages.items():
        if args.only and not name.startswith(args.only):
            continue
        print(f"=== stage {name} ===", flush=True)
        fn(out)


if __name__ == '__main__':
    main()

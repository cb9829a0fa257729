"""Explain the box2 / Laplacian_interactive_particles catalogue outliers
(VERDICT r2 item 8): both sat ~+0.018 above their oracles at 40k epochs
while box3 hit +0.0001 at the same budget.

Prime suspect from the sweep config itself: box3 ran at lr 3e-4 while the
two outliers used the 1e-4 default (benchmarks/catalogue_sweep.py:45-46) —
an under-training artifact, not an ansatz/estimator problem.  This study
isolates the factors: learning rate, budget, lr decay, ansatz capacity,
and the clip statistic.  Writes results/outlier_study.json.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

OUT = REPO / 'results' / 'outlier_study.json'

SYSTEMS = {
    'box2': dict(interactions=False),
    'Laplacian_interactive_particles': dict(interactions=True),
}
VARIANTS = {
    'base_lr1e-4_40k': dict(learning_rate=1e-4, epochs=40_000),
    'lr3e-4_40k': dict(learning_rate=3e-4, epochs=40_000),
    'lr3e-4_80k': dict(learning_rate=3e-4, epochs=80_000),
    'decay_40k+20k@3e-5': dict(learning_rate=3e-4, epochs=40_000,
                               decay_epochs=20_000, decay_lr=3e-5),
    'big_31k4l_lr3e-4_40k': dict(learning_rate=3e-4, epochs=40_000,
                                 num_knots=31, n_flow_layers=4),
    'median_abs_lr3e-4_40k': dict(learning_rate=3e-4, epochs=40_000,
                                  clip_stat='median_abs'),
}


def oracle(name):
    from waveflow_tpu.physics import (exact_free_fermion_energy,
                                      exact_ground_state_2p)
    if name == 'box2':
        return exact_free_fermion_energy(2, 5.0)
    return exact_ground_state_2p(np.zeros((0, 1)), 5.0, n_grid=160)[0]


def main():
    from waveflow_tpu.vmc import VMCConfig, VMCTrainer
    out = json.loads(OUT.read_text()) if OUT.exists() else {}
    for sysname, skw in SYSTEMS.items():
        exact = oracle(sysname)
        for vname, vkw in VARIANTS.items():
            key = f"{sysname}__{vname}"
            if key in out:
                continue
            t0 = time.time()
            save = f"/tmp/outlier_{key.replace('+','_')}"
            cfg = VMCConfig(system_name=sysname, box_length=5.0,
                            batch_size=256, window=100, log_every=100_000,
                            seed=2, save_dir=save,
                            learning_rate=vkw['learning_rate'],
                            num_knots=vkw.get('num_knots', 23),
                            n_flow_layers=vkw.get('n_flow_layers', 3),
                            clip_stat=vkw.get('clip_stat', 'mean_abs'),
                            **skw)
            t = VMCTrainer(cfg)
            t.train(num_epochs=vkw['epochs'], verbose=False)
            if 'decay_epochs' in vkw:
                cfg2 = VMCConfig(**{**cfg.__dict__,
                                    'learning_rate': vkw['decay_lr']})
                t2 = VMCTrainer(cfg2)
                t2.load_checkpoint(save)
                t2.train(num_epochs=vkw['decay_epochs'], verbose=False)
                t = t2
            losses = np.asarray(t.losses)
            med = float(np.median(losses[-len(losses) // 5:]))
            out[key] = {'vmc_median': round(med, 5),
                        'exact': round(exact, 5),
                        'deviation': round(med - exact, 5),
                        'wall_s': round(time.time() - t0, 1)}
            print(key, json.dumps(out[key]), flush=True)
            OUT.write_text(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()

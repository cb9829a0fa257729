"""Re-report the flagship energies with the trace-independent protocol
(VERDICT r2 item 4): load each trained checkpoint, run the frozen-params
blocked-Metropolis evaluation (waveflow_tpu/vmc/evaluate.py), and record
⟨E_L⟩ ± stderr / median / clipped mean next to the ED oracle.

Writes results/final_energies.json.  Run on the chip.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

# r4: fresh re-report file — poly backend + grid-converged oracles
# (results/final_energies.json keeps the r3 provenance: table backend,
# raw-grid oracle values)
OUT = REPO / 'results' / 'final_energies_r4.json'

# (save_dir, system, model hyperparams) — the trained runs to re-report.
# he1d_score_seed* are the flagship 4-seed clipped-score runs;
# he1d_seed2/7 are the reference-estimator reruns, kept deliberately: the
# frozen-params protocol *exposes* what their training traces understate
# (seed2's params are NaN; seed7's true model energy is -1.507, far off
# the -1.763 its own trace median suggests).
RUNS = [
    ('results/he1d_score_seed2', 'He', dict()),
    ('results/he1d_score_seed7', 'He', dict()),
    ('results/he1d_score_seed13', 'He', dict()),
    ('results/he1d_score_seed42', 'He', dict()),
    ('results/he1d_seed2', 'He', dict()),
    ('results/he1d_seed7', 'He', dict()),
    ('results/he1d_metropolis', 'He', dict()),
    ('results/he1d_metropolis_seed7', 'He', dict()),
    ('results/he1d_metropolis_seed13', 'He', dict()),
    ('results/he1d_metropolis_seed42', 'He', dict()),
    ('results/he1d_big', 'He', dict(num_knots=31, n_flow_layers=4)),
    ('results/h2_1d_seed7', 'H2', dict()),
    ('results/h2_1d_seed13', 'H2', dict()),
    ('results/li_1d', 'Li', dict()),
    # round-4 additions (checkpoints preserved from the r4 quality runs)
    ('results/r4_spring30k', 'He', dict()),
    ('results/r4_spring100k', 'He', dict()),
    # trainer batch size is irrelevant to the frozen-params eval
    ('results/r4_spring4k_2k', 'He', dict()),
    ('results/r4_li_lr3e-4_decay', 'Li', dict()),
    ('results/r4_li_big_lr3e-4', 'Li', dict(num_knots=31, n_flow_layers=4)),
]
# grid-converged (h^2 Richardson) oracles — the raw fixed-grid ED values
# (-1.8170 / -1.7136) over-bind by O(h^2); results/oracle_convergence.json
EXACT = {'He': -1.81604, 'H2': -1.71311, 'Li': -3.37751}


def main():
    from waveflow_tpu.physics import (richardson_ground_energy_1d,
                                      system_catalogue)
    from waveflow_tpu.vmc import VMCConfig, VMCTrainer, evaluate_trainer

    out = json.loads(OUT.read_text()) if OUT.exists() else {}
    for save_dir, system, mkw in RUNS:
        if save_dir in out:
            continue
        full = REPO / save_dir
        if not (full / 'checkpoints').exists():
            print(f"skip {save_dir}: no checkpoint", flush=True)
            continue
        t0 = time.time()
        cfg = VMCConfig(system_name=system, box_length=10.0, batch_size=256,
                        save_dir=str(full), **mkw)
        t = VMCTrainer(cfg)
        assert t.load_checkpoint(str(full))
        ev = evaluate_trainer(t, n_blocks=64, sweeps_per_block=25,
                              n_warmup_sweeps=250, batch_size=4096)
        protons, n_el = system_catalogue[1][system]
        # grid-CONVERGED oracle (r4): raw fixed-grid ED over-binds by
        # O(h^2) — results/oracle_convergence.json
        exact = richardson_ground_energy_1d(np.asarray(protons), n_el, 10.0)
        rec = {
            'system': system,
            'e_mean': round(ev.e_mean, 5),
            'e_stderr': round(ev.e_stderr, 6),
            'e_median': round(ev.e_median, 5),
            'e_clipped': round(ev.e_clipped, 5),
            'e_clipped_stderr': round(ev.e_clipped_stderr, 6),
            'accept_rate': round(ev.accept_rate, 3),
            'n_samples': ev.n_samples,
            'exact_ed': round(exact, 5),
            'deviation_clipped': round(ev.e_clipped - exact, 5),
            'wall_s': round(time.time() - t0, 1),
        }
        out[save_dir] = rec
        print(save_dir, json.dumps(rec), flush=True)
        OUT.write_text(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()

"""Train the catalogue's 2D two-electron entries (VERDICT r2 item 3).

The reference lists He and H2 at n_el=2 in its 2D catalogue
(/root/reference/waveflow/utils/physics.py:24-25) but its potential is
1D-only — they were never runnable.  Here they train on the 'paired2d'
x-sorted sector (electron (x, y) pairs ordered by x; ψ = 0 at
x-coincidence — a variational ansatz whose nodal set contains the
fermionic coincidence set), and are scored two ways against the 2D-2e
sparse-ED oracle (results/oracle_2d_2e.json, Richardson-extrapolated):

  * median of the training-trace tail, and
  * the trace-independent frozen-params blocked-Metropolis protocol
    (vmc/evaluate.py) with paired2d sector proposals.

Writes results/frontier_2d2e.json.  Run on the chip.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

OUT = REPO / 'results' / 'frontier_2d2e.json'
ORACLE = REPO / 'results' / 'oracle_2d_2e.json'

BOX_LENGTH = 5.0
EPOCHS = 60_000

RUNS = {
    'He': dict(learning_rate=3e-4),
    'H2': dict(learning_rate=3e-4),
}


def main():
    from waveflow_tpu.utils import median_energy_estimate
    from waveflow_tpu.vmc import VMCConfig, VMCTrainer, evaluate_trainer

    oracle = json.loads(ORACLE.read_text())
    out = json.loads(OUT.read_text()) if OUT.exists() else {}
    for name, extra in RUNS.items():
        if name in out:
            continue
        exact = oracle[f"{name}_2d_L{BOX_LENGTH:g}"]['richardson_32_40']
        cfg = VMCConfig(system_name=name, n_space_dimension=2,
                        box_length=BOX_LENGTH, batch_size=256,
                        log_every=20_000, window=100, seed=2,
                        save_dir=str(REPO / 'results' / f'{name}_2d2e'),
                        **extra)
        t0 = time.time()
        trainer = VMCTrainer(cfg)
        losses = np.asarray(trainer.train(num_epochs=EPOCHS, verbose=False))
        wall = time.time() - t0
        median, stderr = median_energy_estimate(losses, tail_fraction=0.2)
        ev = evaluate_trainer(trainer, n_blocks=64, sweeps_per_block=25,
                              n_warmup_sweeps=250, batch_size=4096)
        out[name] = {
            'box_length': BOX_LENGTH, 'epochs': EPOCHS,
            'trace_median': round(float(median), 5),
            'eval_clipped': round(ev.e_clipped, 5),
            'eval_clipped_stderr': round(ev.e_clipped_stderr, 6),
            'eval_mean': round(ev.e_mean, 5),
            'eval_stderr': round(ev.e_stderr, 6),
            'accept_rate': round(ev.accept_rate, 3),
            'exact_richardson': round(float(exact), 5),
            'deviation_eval': round(ev.e_clipped - exact, 5),
            'epochs_per_sec': round(EPOCHS / wall, 1),
            'wall_s': round(wall, 1),
        }
        print(name, json.dumps(out[name]), flush=True)
        OUT.write_text(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()

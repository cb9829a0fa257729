"""SR / min-SR(SPRING) vs adam study on He-1d (VERDICT r2 item 5).

Round 2 found CG-SR losing to adam everywhere it was tried (results/
he1d_sr).  This study adds the modern variant — min-SR solved in sample
space with SPRING momentum (vmc/sr.py::make_spring_train_step) — and
compares all three optimizers at SHORT budgets (where natural gradient's
per-step progress should pay) and on the larger 31-knot/4-layer ansatz
(more ill-conditioned), against the He-1d exact energy (grid-converged
−1.81604; the raw n_grid=120 value −1.8170 used in round 3 carries 1e-3
of O(h²) over-binding, results/oracle_convergence.json).

Writes results/sr_study.json.  Run on the chip.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np

OUT = REPO / 'results' / 'sr_study.json'

ANSATZE = {
    'flagship': dict(num_knots=23, n_flow_layers=3),
    'big': dict(num_knots=31, n_flow_layers=4),
}
OPTS = {
    # NOTE: the un-suffixed natural-gradient rows below ran with NO trust
    # region (sr_max_update_norm=None — the pre-r3 behavior) and diverged;
    # the _tr rows cap ||lr·δ||₂ at 0.3 (the FermiNet/SPRING-style norm
    # constraint, now the VMCConfig default).
    'adam_1e-4': dict(optimizer='adam', learning_rate=1e-4),
    'adam_3e-4': dict(optimizer='adam', learning_rate=3e-4),
    'spring_0.02_m0.99': dict(optimizer='spring', learning_rate=0.02,
                              spring_momentum=0.99, sr_max_update_norm=None),
    'spring_0.05_m0.9': dict(optimizer='spring', learning_rate=0.05,
                             spring_momentum=0.9, sr_max_update_norm=None),
    'sr_cg_0.05': dict(optimizer='sr', learning_rate=0.05, sr_cg_iters=20,
                       sr_max_update_norm=None),
    'spring_0.02_m0.99_tr': dict(optimizer='spring', learning_rate=0.02,
                                 spring_momentum=0.99,
                                 sr_max_update_norm=0.3),
    'spring_0.05_m0.9_tr': dict(optimizer='spring', learning_rate=0.05,
                                spring_momentum=0.9,
                                sr_max_update_norm=0.3),
    'spring_0.1_m0.99_tr': dict(optimizer='spring', learning_rate=0.1,
                                spring_momentum=0.99,
                                sr_max_update_norm=0.3),
    'sr_cg_0.05_tr': dict(optimizer='sr', learning_rate=0.05,
                          sr_cg_iters=20, sr_max_update_norm=0.3),
}
BUDGETS = (2_000, 10_000)


def main():
    from waveflow_tpu.vmc import VMCConfig, VMCTrainer
    out = json.loads(OUT.read_text()) if OUT.exists() else {}
    for ansatz, akw in ANSATZE.items():
        for opt, okw in OPTS.items():
            key = f"{ansatz}_{opt}"
            rec = out.get(key, {})
            t = None
            trained = 0
            for budget in BUDGETS:
                bkey = f"median_at_{budget}"
                if bkey in rec:
                    trained = budget
                    continue
                if t is None:
                    cfg = VMCConfig(system_name='He', box_length=10.0,
                                    batch_size=256, log_every=100_000,
                                    window=100, seed=2,
                                    save_dir=f"/tmp/sr_study_{key}",
                                    **akw, **okw)
                    t = VMCTrainer(cfg)
                    if trained:
                        t.load_checkpoint(f"/tmp/sr_study_{key}")
                t0 = time.time()
                n_new = budget - trained
                t.train(num_epochs=n_new, verbose=False)
                trained = budget
                losses = np.asarray(t.losses)
                tail = losses[-max(1, len(losses) // 5):]
                rec[bkey] = float(np.median(tail))
                rec[f"steps_per_sec_at_{budget}"] = round(
                    n_new / max(time.time() - t0, 1e-9), 1)
                out[key] = rec
                print(key, bkey, json.dumps(rec[bkey]), flush=True)
                OUT.write_text(json.dumps(out, indent=2))


if __name__ == '__main__':
    main()

"""He-1d VMC training — the flagship run (cf. examples/run_vqmc.py in the
reference: He, L=12 box there; the data-submission baseline uses L=10,
batch 256).

Usage:
  python examples/run_vqmc.py --system He --box-length 10 --batch-size 256 \
      --num-epochs 100000
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from waveflow_tpu.vmc import VMCConfig, VMCTrainer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--system', default='He')
    p.add_argument('--n-space-dimension', type=int, default=1,
                   help='2 trains systems in the 2D box (single-electron: '
                        'independent coordinate map; multi-electron: '
                        'paired2d x-sorted sector), Euclidean soft-Coulomb')
    p.add_argument('--box-length', type=float, default=10.0)
    p.add_argument('--batch-size', type=int, default=256)
    p.add_argument('--num-epochs', type=int, default=100_000)
    p.add_argument('--learning-rate', type=float, default=1e-4)
    p.add_argument('--spline-degree', type=int, default=6)
    p.add_argument('--num-knots', type=int, default=23)
    p.add_argument('--n-flow-layers', type=int, default=3)
    p.add_argument('--log-every', type=int, default=2000)
    p.add_argument('--save-dir', default=None)
    p.add_argument('--restart', action='store_true')
    p.add_argument('--seed', type=int, default=2)
    p.add_argument('--estimator', default='clipped_score',
                   choices=['clipped_score', 'reference'])
    p.add_argument('--eval-backend', default='poly',
                   choices=['poly', 'poly_pallas', 'table'],
                   help="hot-path spline backend: 'poly' (gather-free "
                        "exact polynomials, the TPU default), "
                        "'poly_pallas' (W-construction fused into the "
                        "basis-jet matmul in VMEM), or 'table' "
                        "(reference-parity cached-table lerp)")
    p.add_argument('--ansatz', default='sorted',
                   choices=['sorted', 'antisym'],
                   help="'antisym' = explicit signed sum over electron "
                        "permutations of an unconstrained square-flow "
                        "(learned nodal surface — required to beat the "
                        "2D x-sorted sector floor; needs --sampler "
                        "metropolis or mala)")
    p.add_argument('--mcmc-refresh-every', type=int, default=-1,
                   help='refresh persistent MCMC walkers with fresh exact '
                        'ancestral draws every N epochs (unbiased; cures '
                        'nodal-pocket trapping on multimodal systems like '
                        'Li). -1 = auto (one refresh per window for >= 3 '
                        'electrons), 0 disables')
    p.add_argument('--sampler', default='ancestral',
                   choices=['ancestral', 'metropolis', 'mala'],
                   help='walker source: exact ancestral draws from |psi|^2, '
                        'warm-started Metropolis MCMC walkers, or MALA '
                        '(gradient-informed Langevin proposals)')
    p.add_argument('--optimizer', default='adam',
                   choices=['adam', 'sr', 'spring'],
                   help="'sr' = stochastic reconfiguration via CG; "
                        "'spring' = min-SR/SPRING (sample-space solve + "
                        "momentum); natural-gradient learning rates are "
                        "typically 1e-2..1e-1")
    p.add_argument('--mcmc-sweeps', type=int, default=3,
                   help='Metropolis/MALA sweeps between parameter updates '
                        '(sweeps=1 measured quality-equal to 10 on the '
                        'flagship at 4x the throughput; see RESULTS.md)')
    p.add_argument('--spring-momentum', type=float, default=0.9,
                   help="momentum for --optimizer spring (SPRING's mu)")
    p.add_argument('--sr-max-update-norm', type=float, default=0.3,
                   help='trust region for sr/spring: cap ||lr*delta||_2 '
                        '(0 disables; uncapped natural gradient can '
                        'diverge, see RESULTS.md SR study)')
    p.add_argument('--no-interactions', action='store_true',
                   help='drop electron-electron repulsion (free-fermion '
                        'oracle systems, e.g. --system box3)')
    p.add_argument('--data-parallel', action='store_true',
                   help='shard the walker batch over all visible devices')
    args = p.parse_args()

    cfg = VMCConfig(system_name=args.system,
                    n_space_dimension=args.n_space_dimension,
                    box_length=args.box_length,
                    batch_size=args.batch_size, num_epochs=args.num_epochs,
                    learning_rate=args.learning_rate,
                    spline_degree=args.spline_degree,
                    num_knots=args.num_knots,
                    n_flow_layers=args.n_flow_layers,
                    log_every=args.log_every, save_dir=args.save_dir,
                    seed=args.seed, estimator=args.estimator,
                    eval_backend=args.eval_backend,
                    sampler=args.sampler, optimizer=args.optimizer,
                    ansatz=args.ansatz,
                    mcmc_refresh_every=('auto' if args.mcmc_refresh_every < 0
                                        else (args.mcmc_refresh_every or None)),
                    mcmc_sweeps=args.mcmc_sweeps,
                    spring_momentum=args.spring_momentum,
                    # <= 0 disables (a negative value would silently FLIP
                    # the update direction through _norm_cap's scale)
                    sr_max_update_norm=(args.sr_max_update_norm
                                        if args.sr_max_update_norm > 0
                                        else None),
                    interactions=not args.no_interactions,
                    data_parallel=args.data_parallel)
    trainer = VMCTrainer(cfg)
    trainer.train(restart=args.restart)


if __name__ == '__main__':
    main()

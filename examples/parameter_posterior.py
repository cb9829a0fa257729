"""Bayesian posterior over FLOW PARAMETERS (BASELINE.json configs[4]).

End-to-end probprog composition: an MFlow density model's parameters θ get
a Gaussian prior, the circles dataset supplies the likelihood through the
flow's own log_pdf kernel, and NUTS (or HMC / SMC with --sampler) samples
p(θ | X) — the "reuse the flow log-prob kernels as a generic probprog
driver" capability.  Reports held-out log-likelihood of the posterior
predictive (Bayesian model average over posterior draws) vs the MLE fit.

Usage:
  python examples/parameter_posterior.py [--sampler nuts|hmc|smc]
      [--n-train 300] [--n-steps 200] [--n-warmup 150] [--sharded]

--sharded distributes the chains (or SMC particles) over ALL visible
devices via parallel/probprog.py: dual-averaging step-size adaptation is
collective (pmean'd acceptance) and SMC resampling is the cross-device
collective — the BASELINE.json "multi-host chains" shape.
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--sampler', default='nuts', choices=['nuts', 'hmc', 'smc'])
    p.add_argument('--n-train', type=int, default=300)
    p.add_argument('--n-test', type=int, default=1000)
    p.add_argument('--n-chains', type=int, default=8)
    p.add_argument('--n-steps', type=int, default=200)
    p.add_argument('--n-warmup', type=int, default=150)
    p.add_argument('--prior-scale', type=float, default=2.0)
    p.add_argument('--step-size', type=float, default=2e-3)
    p.add_argument('--sharded', action='store_true',
                   help='shard chains/particles over all visible devices '
                        '(parallel/probprog.py)')
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_default_matmul_precision", "highest")
    from waveflow_tpu.benchmark import get_dataset
    from waveflow_tpu.benchmark.density import get_benchmark_model
    from waveflow_tpu.vmc.hmc import make_hmc_sampler, make_parameter_posterior

    X = get_dataset('circles', n_samples=args.n_train + args.n_test)
    X_train, X_test = X[:args.n_train], X[args.n_train:]

    # small MFlow so the posterior dimension stays NUTS-friendly
    init_fun = get_benchmark_model('MFlow', spline_reg=0.1, n_flow_layers=1,
                                   spline_degree=3, n_knots=6,
                                   n_mesh_points=800,
                                   prior_spline_degree=3, prior_n_knots=6)
    params0, log_pdf, sample = init_fun(jax.random.PRNGKey(0), 2)

    log_prob, unravel, flat0 = make_parameter_posterior(
        log_pdf, jnp.asarray(X_train), params0,
        prior_scale=args.prior_scale)
    D = flat0.shape[0]
    print(f"posterior dimension: {D} flow parameters", flush=True)

    rng = jax.random.PRNGKey(1)
    chains = flat0[None] + 0.01 * jax.random.normal(rng, (args.n_chains, D))

    t0 = time.time()
    if args.sampler == 'smc':
        from waveflow_tpu.vmc.smc import make_smc_sampler
        log_prior = lambda th: -0.5 * (th ** 2).sum(-1) / args.prior_scale ** 2
        log_like = lambda th: log_prob(th) - log_prior(th)
        particles = flat0[None] + 0.1 * jax.random.normal(
            rng, (128, D))
        if args.sharded:
            from waveflow_tpu.parallel import (make_sharded_smc,
                                               make_walker_mesh)
            init_fn, run_fn = make_sharded_smc(
                log_prior, log_like, make_walker_mesh(), n_temps=30,
                n_mcmc_moves=5, mcmc_step_size=args.step_size)
            state = init_fn(particles)
            state, _ = run_fn(state, jax.random.PRNGKey(2))
        else:
            init_fn, run_fn = make_smc_sampler(
                log_prior, log_like, n_temps=30, n_mcmc_moves=5,
                mcmc_step_size=args.step_size)
            state = init_fn(particles)
            state, _ = jax.jit(run_fn)(state, jax.random.PRNGKey(2))
        draws = np.asarray(state.particles)
    else:
        maker = None
        if args.sampler == 'nuts':
            from waveflow_tpu.vmc.nuts import make_nuts_sampler
            maker, kw = make_nuts_sampler, dict(max_tree_depth=6)
        else:
            maker, kw = make_hmc_sampler, dict(n_leapfrog=16)
        if args.sharded:
            from waveflow_tpu.parallel import (make_sharded_chain_sampler,
                                               make_walker_mesh)
            sh_init, make_run = make_sharded_chain_sampler(
                maker, log_prob, make_walker_mesh(), **kw)
            state = sh_init(chains, step_size=args.step_size)
            state, trace = make_run(args.n_steps, args.n_warmup)(
                state, jax.random.PRNGKey(2))
        else:
            init_fn, _, run_fn = maker(log_prob, **kw)
            state = init_fn(chains, step_size=args.step_size)
            state, trace = run_fn(state, jax.random.PRNGKey(2),
                                  args.n_steps, n_warmup=args.n_warmup)
        keep = np.asarray(trace[args.n_steps // 2:])
        draws = keep.reshape(-1, D)[::max(1, keep.size // D // 64)][:64]
    print(f"{args.sampler} sampling: {time.time()-t0:.1f}s, "
          f"{len(draws)} posterior draws", flush=True)

    # posterior-predictive held-out LL (Bayesian model average)
    lp_j = jax.jit(log_pdf)
    Xt = jnp.asarray(X_test)
    per_draw = np.stack([np.asarray(lp_j(unravel(jnp.asarray(d)), Xt))
                         for d in draws])        # (n_draws, n_test)
    from scipy.special import logsumexp
    bma_ll = float((logsumexp(per_draw, axis=0) - np.log(len(draws))).mean())
    map_ll = float(per_draw.mean(1).max())
    init_ll = float(np.asarray(lp_j(params0, Xt)).mean())
    print(f"held-out LL  init(random): {init_ll:.4f}   "
          f"best single draw: {map_ll:.4f}   posterior BMA: {bma_ll:.4f}",
          flush=True)


if __name__ == '__main__':
    main()

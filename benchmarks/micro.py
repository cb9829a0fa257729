"""Microbenchmark suite: per-kernel steady-state timings on the current
JAX default device.  Not run by the driver (bench.py is the single-line
headline); use this to chase regressions kernel by kernel.

Usage: python benchmarks/micro.py [N]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    jax.config.update("jax_default_matmul_precision", "highest")
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    rng = np.random.default_rng(0)
    rows = []

    from waveflow_tpu.ops import (
        batched_monotone_inverse, build_bspline_tables, build_ispline_tables,
        make_evaluator, sample_linear_density, sample_squared_amplitude,
    )
    from waveflow_tpu.ops.pallas_spline import (
        onehot_matmul_eval, spline_eval_pallas,
    )

    tabs = build_ispline_tables(6, 23, n_mesh=2000)
    ev = make_evaluator(tabs)
    w = jnp.asarray(rng.uniform(0.1, 1, (N, ev.n_bases)).astype(np.float32))
    x = jnp.asarray(rng.uniform(0, 1, N).astype(np.float32))

    rows.append(("spline_eval take-gather", N,
                 timeit(jax.jit(lambda w, x: ev(w, x)), w, x)))
    rows.append(("spline_eval one-hot matmul", N,
                 timeit(jax.jit(lambda w, x: onehot_matmul_eval(
                     ev.tables[0], w, x)), w, x)))
    rows.append(("spline_eval pallas", N,
                 timeit(jax.jit(lambda w, x: spline_eval_pallas(
                     ev.tables[0], w, x)), w, x)))
    rows.append(("spline_eval d=1", N,
                 timeit(jax.jit(lambda w, x: ev(w, x, d=1)), w, x)))

    y = jax.jit(lambda w, x: ev(w, x))(w, x)
    rows.append(("monotone_inverse (30 bisect + 2 newton)", N,
                 timeit(jax.jit(lambda w, y: batched_monotone_inverse(
                     ev, w, y)), w, y)))

    u = jax.random.uniform(jax.random.PRNGKey(0), (N,))
    wm = w / w.sum(-1, keepdims=True)
    rows.append(("inverse_cdf sample (linear density)", N,
                 timeit(jax.jit(lambda w, u: sample_linear_density(ev, w, u)),
                        wm, u)))

    btabs = build_bspline_tables(6, 23, n_mesh=2000)
    evb = make_evaluator(btabs, use_ob=True)
    c = jnp.asarray(rng.normal(size=(N, evb.n_bases)).astype(np.float32))
    c = c / jnp.linalg.norm(c, axis=-1, keepdims=True)
    rows.append(("inverse_cdf sample (B^2 amplitude)", N,
                 timeit(jax.jit(lambda c, u: sample_squared_amplitude(
                     evb, c, u)), c, u)))

    # model-level: psi fwd + laplacian at VMC batch
    from waveflow_tpu.models import get_waveflow_model
    from waveflow_tpu.physics import construct_hamiltonian_function, system_catalogue
    protons, n_p = system_catalogue[1]['He']
    init = get_waveflow_model(n_p, base_spline_degree=6, i_spline_degree=6,
                              n_prior_internal_knots=23, n_i_internal_knots=23,
                              i_spline_reg=0.05, n_flow_layers=3,
                              box_size=10.0)
    params, psi, log_pdf, sample = init(jax.random.PRNGKey(0), n_p)
    h_fn = construct_hamiltonian_function(psi, protons=protons,
                                          n_space_dimensions=1)
    B = 256
    batch = jnp.asarray(np.sort(rng.uniform(-9, 9, (B, n_p)), -1)
                        .astype(np.float32))
    rows.append(("psi forward", B, timeit(jax.jit(psi), params, batch)))
    rows.append(("local-energy H(psi)", B,
                 timeit(jax.jit(h_fn), params, batch)))
    rows.append(("ancestral sample", B,
                 timeit(jax.jit(sample, static_argnums=(2,)),
                        jax.random.PRNGKey(1), params, B)))

    print(f"{'kernel':42s} {'n':>8s} {'us/call':>10s} {'M elem/s':>10s}")
    for name, n, dt in rows:
        print(f"{name:42s} {n:8d} {dt*1e6:10.1f} {n/dt/1e6:10.2f}")


if __name__ == '__main__':
    main()

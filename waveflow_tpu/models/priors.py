"""Prior distributions for flow models (cf. flows/distributions.py:8-64)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import random
from jax.scipy.special import logsumexp
from jax.scipy.stats import multivariate_normal, norm, uniform


def Normal(offset=0.0):
    def init_fun(rng, input_dim):
        def log_pdf(params, inputs):
            return norm.logpdf(inputs + offset).sum(1)

        def sample(rng, params, num_samples=1):
            return random.normal(rng, (num_samples, input_dim))

        return (), log_pdf, sample

    return init_fun


def Uniform():
    def init_fun(rng, input_dim):
        def log_pdf(params, inputs):
            return uniform.logpdf(inputs).sum(1)

        def sample(rng, params, num_samples=1):
            return random.uniform(rng, (num_samples, input_dim))

        return (), log_pdf, sample

    return init_fun


def GMM(means, covariances, weights):
    """Gaussian-mixture prior (role of flows/distributions.py:44-64).

    Vectorized: component log-densities come from one vmap over the K
    components; sampling draws one categorical component index per sample
    and reparameterizes with per-component Cholesky factors gathered by
    index — no per-component full-batch draws, no K-way stacking.
    """
    means_a = jnp.asarray(means)                       # (K, D)
    covs_a = jnp.asarray(covariances)                  # (K, D, D)
    log_w = jnp.log(jnp.asarray(weights, dtype=means_a.dtype))
    log_w = log_w - logsumexp(log_w)                   # normalized mixture
    chols = jnp.linalg.cholesky(covs_a)                # (K, D, D)

    def init_fun(rng, input_dim):
        def log_pdf(params, inputs):
            comp_ll = jax.vmap(
                lambda m, c: multivariate_normal.logpdf(inputs, m, c)
            )(means_a, covs_a)                         # (K, B)
            return logsumexp(log_w[:, None] + comp_ll, axis=0)

        def sample(rng, params, num_samples=1):
            idx_rng, eps_rng = random.split(rng)
            ks = random.categorical(idx_rng, log_w, shape=(num_samples,))
            eps = random.normal(eps_rng, (num_samples, means_a.shape[-1]))
            return means_a[ks] + jnp.einsum('nij,nj->ni', chols[ks], eps)

        return (), log_pdf, sample

    return init_fun

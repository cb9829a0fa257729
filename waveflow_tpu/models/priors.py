"""Prior distributions for flow models (cf. flows/distributions.py:8-64)."""

from __future__ import annotations

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
    def init_fun(rng, input_dim):
        def log_pdf(params, inputs):
            cluster_lls = []
            for log_weight, mean, cov in zip(jnp.log(weights), means, covariances):
                cluster_lls.append(
                    log_weight + multivariate_normal.logpdf(inputs, mean, cov))
            return logsumexp(jnp.vstack(cluster_lls), axis=0)

        def sample(rng, params, num_samples=1):
            cluster_samples = []
            for mean, cov in zip(means, covariances):
                rng, temp_rng = random.split(rng)
                cluster_samples.append(
                    random.multivariate_normal(temp_rng, mean, cov, (num_samples,)))
            samples = jnp.dstack(cluster_samples)
            idx = random.categorical(rng, weights, shape=(num_samples, 1, 1))
            return jnp.squeeze(jnp.take_along_axis(samples, idx, -1))

        return (), log_pdf, sample

    return init_fun

"""Flow model: bijection stack over a fixed prior
(cf. flows/distributions.py:67-112, 198-233)."""

from __future__ import annotations

import jax.numpy as jnp

from waveflow_tpu.models.priors import Normal


def Flow(transformation, prior=Normal(), prior_support=None):
    """init_fun(rng, input_dim) -> (params, log_pdf, sample)."""

    def init_fun(rng, input_dim):
        from jax import random
        transformation_rng, prior_rng = random.split(rng)
        params, direct_fun, inverse_fun = transformation(transformation_rng, input_dim)
        prior_params, prior_log_pdf, prior_sample = prior(prior_rng, input_dim)

        def log_pdf(params, inputs, return_sample=False):
            u, log_det = direct_fun(params, inputs)
            if prior_support is not None:
                u = jnp.clip(u, *prior_support)
            log_probs = prior_log_pdf(prior_params, u)
            if return_sample:
                return log_probs + log_det, u
            return log_probs + log_det

        def sample(rng, params, num_samples=1, return_original_samples=False):
            prior_samples = prior_sample(rng, prior_params, num_samples)
            if return_original_samples:
                return inverse_fun(params, prior_samples)[0], prior_samples
            return inverse_fun(params, prior_samples)[0]

        return params, log_pdf, sample

    return init_fun


# The reference exposes an identical InvFlow variant (distributions.py:198-233)
InvFlow = Flow

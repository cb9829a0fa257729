"""Benchmark evaluation metrics (cf. helpers.py:170-215).

KDE-based KL and squared-Hellinger distances between the model pdf and a
kernel-density estimate of its own samples on a grid, plus round-trip
reconstruction distance through log_pdf(..., return_sample=True).
"""

from __future__ import annotations

import numpy as np


def pdf_grid_eval(log_pdf, params, ngrid: int = 300):
    """Model pdf on the unit-square grid: (ngrid, ngrid) + flat grid.

    Jitted: 90k eager evals through a remote-TPU tunnel would dominate the
    whole benchmark otherwise."""
    import jax
    import jax.numpy as jnp
    x = np.linspace(0.0, 1.0, ngrid)
    xv, yv = np.meshgrid(x, x)
    grid = np.stack([xv.ravel(), yv.ravel()], -1).astype(np.float32)
    lp = np.asarray(jax.jit(log_pdf)(params, jnp.asarray(grid)))
    return lp.reshape(ngrid, ngrid), grid


def kde_metrics(log_pdf, params, model_samples: np.ndarray,
                ngrid: int = 300, bandwidth: float = 0.01):
    """(kde_kl, kde_hellinger²) on the unit-square grid
    (helpers.py:197-204)."""
    from sklearn.neighbors import KernelDensity
    log_pdf_grid, grid = pdf_grid_eval(log_pdf, params, ngrid)
    pdf_grid = np.exp(log_pdf_grid)
    kde = KernelDensity(kernel='gaussian', bandwidth=bandwidth,
                        rtol=0.1).fit(model_samples)
    log_pdf_kde = kde.score_samples(grid).reshape(ngrid, ngrid)
    pdf_kde = np.exp(log_pdf_kde)
    kl = (pdf_grid * (log_pdf_grid - log_pdf_kde)).mean()
    hellinger = ((np.sqrt(pdf_grid) - np.sqrt(pdf_kde)) ** 2).mean()
    return float(kl), float(hellinger)


def held_out_log_likelihood(log_pdf, params, X_test: np.ndarray) -> float:
    """Mean log-likelihood on held-out data — the fit-quality metric the
    KDE self-consistency scores cannot provide (they compare the model
    against a KDE of its *own* samples, so a sharper fitted density is
    penalized by the fixed bandwidth rather than rewarded)."""
    import jax
    import jax.numpy as jnp
    return float(np.asarray(
        jax.jit(log_pdf)(params, jnp.asarray(X_test))).mean())


def kde_bandwidth_sweep(log_pdf, params, model_samples: np.ndarray,
                        bandwidths=(0.005, 0.01, 0.02, 0.05),
                        ngrid: int = 300):
    """kde_metrics at several bandwidths: quantifies how much of the
    KDE-KL/Hellinger score is bandwidth artifact vs model mismatch."""
    return {float(bw): kde_metrics(log_pdf, params, model_samples,
                                   ngrid=ngrid, bandwidth=bw)
            for bw in bandwidths}


def reconstruction_distance(log_pdf, params, model_samples,
                            original_samples) -> float:
    """Mean distance between prior samples and their round-trip
    reconstruction u = T(T^{-1}(u)) (helpers.py:206-208)."""
    import jax
    import jax.numpy as jnp
    _, reconstructed = jax.jit(
        lambda p, x: log_pdf(p, x, return_sample=True))(
            params, jnp.asarray(model_samples))
    return float(np.linalg.norm(
        np.asarray(original_samples) - np.asarray(reconstructed),
        axis=-1).mean())

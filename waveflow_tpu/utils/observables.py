"""Training observables: sliding statistics and blocked energy estimators.

Covers the reference's helpers (uniform_sliding_average/stdev,
helpers.py:125-145) plus a proper clipped/blocked energy estimator the
reference lacks (SURVEY §6 caveat: the committed energies.npy is a raw
heavy-tailed trace, not an outlier-controlled estimate)."""

from __future__ import annotations

import numpy as np


def uniform_sliding_average(data: np.ndarray, window: int) -> np.ndarray:
    """Trailing moving average with edge padding (helpers.py:125-133)."""
    data = np.asarray(data, dtype=float)
    pad = [(0, 0)] * (data.ndim - 1) + [(window - 1, 0)]
    padded = np.pad(data, pad, mode='edge')
    ret = np.cumsum(padded, axis=-1)
    ret[..., window:] = ret[..., window:] - ret[..., :-window]
    return ret[..., window - 1:] / window


def uniform_sliding_stdev(data: np.ndarray, window: int) -> np.ndarray:
    """Trailing moving standard deviation (helpers.py:136-145)."""
    data = np.asarray(data, dtype=float)
    pad = [(0, 0)] * (data.ndim - 1) + [(window - 1, 0)]
    padded = np.pad(data, pad, mode='reflect')
    shape = padded.shape[:-1] + (padded.shape[-1] - window + 1, window)
    strides = padded.strides + (padded.strides[-1],)
    rolling = np.lib.stride_tricks.as_strided(padded, shape=shape,
                                              strides=strides)
    return rolling.std(-1)


def moving_average(running, new, beta):
    """EMA update (helpers.py:120-121)."""
    return running - beta * (running - new)


def clipped_energy_estimate(trace: np.ndarray, clip: float = 100.0,
                            tail_fraction: float = 0.2,
                            block_size: int = 100):
    """Outlier-controlled energy estimate from a local-energy trace.

    Clips to ±clip (the reference's training clip, vqmc.py:184), takes the
    final ``tail_fraction`` of the trace, and reports (mean, stderr) with
    the stderr computed over block means to respect autocorrelation.
    """
    trace = np.asarray(trace, dtype=float).ravel()
    tail = trace[int(len(trace) * (1 - tail_fraction)):]
    tail = np.clip(tail, -clip, clip)
    n_blocks = max(1, len(tail) // block_size)
    blocks = tail[:n_blocks * block_size].reshape(n_blocks, block_size)
    means = blocks.mean(-1)
    return float(means.mean()), float(means.std(ddof=1) / np.sqrt(n_blocks)
                                      if n_blocks > 1 else np.inf)

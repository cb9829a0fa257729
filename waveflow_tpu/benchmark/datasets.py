"""2D density-estimation benchmark datasets (cf. benchmark_tests.py:14-46).

Generated host-side with NumPy and min-max scaled into the unit square with
a margin, exactly the reference's preprocessing.  sklearn is used when
available (reference parity for halfmoon/circles); the gaussian mixtures
are plain NumPy.
"""

from __future__ import annotations

import numpy as np


def _minmax_scale(X: np.ndarray, margin: float) -> np.ndarray:
    lo, hi = X.min(0), X.max(0)
    X01 = (X - lo) / (hi - lo)
    return X01 * (1 - 2 * margin) + margin


def get_dataset(name: str = 'gaussian_mixtures', n_samples: int = 1000,
                margin: float = 0.025, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    if name == 'gaussian_mixtures':
        scale = 4.0
        centers = np.array([[1, 0], [-1, 0], [0, 1], [0, -1],
                            [1. / np.sqrt(2), 1. / np.sqrt(2)],
                            [1. / np.sqrt(2), -1. / np.sqrt(2)],
                            [-1. / np.sqrt(2), 1. / np.sqrt(2)],
                            [-1. / np.sqrt(2), -1. / np.sqrt(2)]]) * scale
        idx = rng.integers(0, len(centers), n_samples)
        X = rng.normal(size=(n_samples, 2)) * 0.5 + centers[idx]
    elif name == 'halfmoon':
        from sklearn.datasets import make_moons
        X, _ = make_moons(n_samples=n_samples, noise=0.05,
                          random_state=seed)
    elif name in ('circles', 'double_circles'):
        from sklearn.datasets import make_circles
        X, _ = make_circles(n_samples=n_samples, noise=0.05, factor=0.5,
                            random_state=seed)
    else:
        raise ValueError(f"unknown dataset {name!r}")
    return _minmax_scale(np.asarray(X, dtype=np.float32), margin)

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
        # reference construction (benchmark_tests.py:18-30): blobs -> fit a
        # 3-component GMM -> draw the training set from the fitted GMM
        from sklearn import mixture
        from sklearn.datasets import make_blobs
        blobs, _ = make_blobs(center_box=(-1, 1), cluster_std=0.1,
                              random_state=3)
        gmm = mixture.GaussianMixture(3, random_state=seed)
        gmm.fit(blobs)
        X, _ = gmm.sample(n_samples)
        X = np.asarray(X)[rng.permutation(n_samples)]
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

"""Host-side figure generation (cf. utils/create_figures.py and
utils/plot_helpers.py — same role: offline reporting from saved artifacts).

All functions take saved arrays / result dirs and write matplotlib figures;
nothing here touches the device path.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _mpl():
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    return plt


def plot_wavefunction_2d(psi_grid: np.ndarray, box_length: float,
                         out_path: str, title: str = ''):
    """Heatmap of ψ(x1, x2) over the box (plot_helpers.py role)."""
    plt = _mpl()
    n = int(np.sqrt(psi_grid.size))
    fig, ax = plt.subplots(figsize=(5, 4))
    vmax = np.abs(psi_grid).max()
    im = ax.imshow(psi_grid.reshape(n, n).T, origin='lower',
                   extent=[-box_length, box_length, -box_length, box_length],
                   cmap='RdBu', vmin=-vmax, vmax=vmax)
    fig.colorbar(im, ax=ax)
    ax.set_xlabel('$x_1$'); ax.set_ylabel('$x_2$')
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def plot_one_electron_density(coords: np.ndarray, values: np.ndarray,
                              out_path: str, title: str = ''):
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(5, 3))
    ax.plot(coords, values ** 2)
    ax.set_xlabel('$x$'); ax.set_ylabel(r'$|\psi|^2$ slice')
    if title:
        ax.set_title(title)
    ax.grid(True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def plot_pdf_grid(pdf_grid: np.ndarray, out_path: str,
                  samples: np.ndarray | None = None):
    """Benchmark density heatmap with optional sample scatter."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(4.5, 4))
    ax.imshow(pdf_grid, origin='lower', extent=[0, 1, 0, 1], cmap='viridis')
    if samples is not None:
        ax.scatter(samples[:, 0], samples[:, 1], s=1, c='w', alpha=0.3)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def plot_energy_trace(losses: np.ndarray, out_path: str, window: int = 100,
                      clip: float = 100.0):
    from waveflow_tpu.utils.observables import uniform_sliding_average
    plt = _mpl()
    losses = np.clip(np.asarray(losses, dtype=float).ravel(), -clip, clip)
    fig, ax = plt.subplots(figsize=(6, 3))
    ax.plot(losses, alpha=0.25, lw=0.5, label='clipped $E_L$')
    if len(losses) > window:
        ax.plot(uniform_sliding_average(losses, window), lw=1.5,
                label=f'window-{window} mean')
    ax.set_xlabel('epoch'); ax.set_ylabel(r'$\langle E_L \rangle$')
    ax.legend(); ax.grid(True)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)


def create_report(result_dirs: list[str], out_path: str):
    """Loss/KL/Hellinger/reconstruction curves across benchmark model dirs
    (create_figures.py:6-90)."""
    plt = _mpl()
    metrics = ['losses', 'kl_divergences', 'hellinger_divergences',
               'reconstruction_distances']
    fig, axes = plt.subplots(1, len(metrics), figsize=(4 * len(metrics), 3))
    for d in result_dirs:
        d = Path(d)
        for ax, m in zip(axes, metrics):
            f = d / f'{m}.txt'
            if f.exists():
                ax.plot(np.loadtxt(f), label=d.name)
                ax.set_title(m.replace('_', ' '))
                ax.grid(True)
    axes[0].legend(fontsize=7)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)

"""Analysis plotting (TICA scatter, apo scatter).

Parity with the reference slm/utils/plot_utils.py:68-194 (matplotlib; kde via
scipy instead of seaborn to keep deps minimal).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _kde_contour(ax, pts: np.ndarray, levels: int = 8, grid: int = 80):
    """KDE landscape contour of the reference ensemble (the reference draws
    this with seaborn kdeplot, plot_utils.py:138-139; here scipy + contour)."""
    from scipy.stats import gaussian_kde

    kde = gaussian_kde(pts.T)
    pad = 0.05 * (pts.max(0) - pts.min(0) + 1e-9)
    xs = np.linspace(pts[:, 0].min() - pad[0], pts[:, 0].max() + pad[0], grid)
    ys = np.linspace(pts[:, 1].min() - pad[1], pts[:, 1].max() + pad[1], grid)
    xx, yy = np.meshgrid(xs, ys)
    zz = kde(np.stack([xx.ravel(), yy.ravel()])).reshape(xx.shape)
    ax.contour(xx, yy, zz, levels=levels, colors="steelblue",
               linewidths=0.8, alpha=0.7)


def scatterplot_2d(d_proj: dict, save_to: str | Path, ref_key: str = "target",
                   n_max_point: int = 1000, pop_ref: bool = False,
                   plot_kde: bool = False):
    """2D TICA scatter of each method against the reference density.

    ``plot_kde`` matches the reference flag (plot_utils.py:77): sample points
    are colored by their own KDE density (plot_utils.py:129) and the
    reference ensemble is drawn as a KDE landscape contour.
    """
    d = dict(d_proj)
    ref = d.get(ref_key)
    if pop_ref:
        d.pop(ref_key, None)
    names = [k for k in d if k != ref_key]
    n = max(len(names), 1)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 4), squeeze=False)
    for ax, name in zip(axes[0], names or [ref_key]):
        if ref is not None:
            r = np.asarray(ref[:n_max_point], dtype=float)
            if plot_kde and len(r) > 2:
                _kde_contour(ax, r)
            else:
                ax.scatter(r[:, 0], r[:, 1], s=4, c="lightgray",
                           label=ref_key)
        v = np.asarray(d[name][:n_max_point], dtype=float)
        if plot_kde and len(v) > 2:
            from scipy.stats import gaussian_kde

            dens = gaussian_kde(v.T)(v.T)
            ax.scatter(v[:, 0], v[:, 1], s=4, c=dens, cmap="viridis",
                       alpha=0.8, label=name)
        else:
            ax.scatter(v[:, 0], v[:, 1], s=4, alpha=0.6, label=name)
        ax.set_xlabel("TIC 1")
        ax.set_ylabel("TIC 2")
        ax.legend(frameon=False, fontsize=8)
    fig.tight_layout()
    Path(save_to).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_to, dpi=150)
    plt.close(fig)


def heatmap(matrix, save_to: str | Path, xlabel: str = "", ylabel: str = "",
            cmap: str = "viridis"):
    """Generic matrix heatmap (e.g. contact maps, pairwise RMSD/TM)."""
    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(np.asarray(matrix), cmap=cmap, aspect="auto")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    fig.tight_layout()
    Path(save_to).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_to, dpi=150)
    plt.close(fig)


def scatterplot_apo(x, y, save_to: str | Path, xlabel: str = "TM pair",
                    ylabel: str = "TM ensemble", regplot: bool = False):
    x = np.asarray(x, dtype=float)
    y = np.asarray(y, dtype=float)
    fig, ax = plt.subplots(figsize=(4.5, 4.5))
    ax.scatter(x, y, s=14, alpha=0.7)
    if regplot and len(x) > 1:
        coef = np.polyfit(x, y, 1)
        xs = np.linspace(x.min(), x.max(), 50)
        ax.plot(xs, np.polyval(coef, xs), "r--", lw=1)
    else:
        lim = [min(x.min(), y.min()), max(x.max(), y.max())]
        ax.plot(lim, lim, "k--", lw=1)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    fig.tight_layout()
    Path(save_to).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(save_to, dpi=150)
    plt.close(fig)

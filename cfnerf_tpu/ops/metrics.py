"""Image / uncertainty metrics.

Parity targets:
  * img2mse / mse2psnr / to8b   /root/reference/run_nerf_helpers.py:15-17
  * AUSE sparsification curves  /root/reference/run_nerf_helpers.py:382-438
  * SSIM — the reference imports skimage's structural_similarity
    (run_nerf_uncertainty_NF.py:21) but never calls it; we provide a
    self-contained JAX implementation so eval scripts can report it.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def img2mse(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((x - y) ** 2)


def mse2psnr(x: jnp.ndarray) -> jnp.ndarray:
    return -10.0 * jnp.log(x) / jnp.log(10.0)


def to8b(x: np.ndarray) -> np.ndarray:
    return (255 * np.clip(x, 0, 1)).astype(np.uint8)


def std_over_k(x: np.ndarray, axis: int = -1) -> np.ndarray:
    """Per-pixel uncertainty std over the K Monte-Carlo draws for MAPS,
    AUSE inputs, and exports, in the reference's exact map convention:
    np.std (ddof=0) scaled by n/(n-1)
    (/root/reference/run_nerf_uncertainty_NF.py:1129-1131, :1166-1168).

    NOTE the reference uses TWO conventions: its training bandwidth is
    torch.std (ddof=1) * n/(n-1) (:1034 — see train/loss.py and
    cli.eval.kde_nll_per_pixel); its logged/exported maps are np.std
    (ddof=0) * n/(n-1).  This helper is the map convention.  K=1 returns
    zeros (a deterministic model has no sample spread)."""
    x = np.asarray(x)
    n = x.shape[axis]
    if n <= 1:
        return np.zeros(x.shape[:axis] + x.shape[axis:][1:], x.dtype)
    return np.std(x, axis=axis) * n / (n - 1)


def sparsification_plot(
    var_vec: np.ndarray,
    err_vec: np.ndarray,
    uncert_type: str = "c",
    err_type: str = "rmse",
) -> Tuple[np.ndarray, np.ndarray]:
    """AUSE sparsification curves (uncertainty-calibration quality).

    For each removal ratio r in [0, 1): the error over the (1-r) fraction of
    pixels kept when removing (a) the highest-error pixels ("oracle" curve)
    and (b) the highest-variance pixels.  The gap between the curves is the
    Area Under the Sparsification Error.  Host-side numpy (eval-only).
    """
    var_vec = np.asarray(var_vec).reshape(-1)
    err_vec = np.asarray(err_vec).reshape(-1)
    ratio_removed = np.linspace(0, 1, 100, endpoint=False)
    n = len(err_vec)

    err_sorted = np.sort(err_vec)
    ause_err = []
    for r in ratio_removed:
        sl = err_sorted[: max(1, int((1 - r) * n))]  # keep >= 1 pixel
        ause_err.append(np.sqrt(sl.mean()) if err_type == "rmse" else sl.mean())
    ause_err = np.array(ause_err)

    std_vec = np.sqrt(var_vec)
    if uncert_type == "c":
        order = np.argsort(-std_vec)  # descending: keep low-variance pixels
    else:
        order = np.argsort(std_vec)
    err_by_var = err_vec[order]
    ause_err_by_var = []
    for r in ratio_removed:
        sl = err_by_var[: max(1, int((1 - r) * n))]
        ause_err_by_var.append(np.sqrt(sl.mean()) if err_type == "rmse" else sl.mean())
    return ause_err, np.array(ause_err_by_var)


def ause(var_vec: np.ndarray, err_vec: np.ndarray, err_type: str = "rmse") -> float:
    """Scalar AUSE: mean gap between variance-ordered and oracle curves."""
    oracle, by_var = sparsification_plot(var_vec, err_vec, "c", err_type)
    return float(np.mean(by_var - oracle))


def _gaussian_kernel(size: int, sigma: float) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def ssim(
    img0: jnp.ndarray,
    img1: jnp.ndarray,
    max_val: float = 1.0,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Structural similarity for (H, W, C) images (Gaussian-windowed)."""
    kernel = _gaussian_kernel(filter_size, filter_sigma)

    def blur(im):
        # separable conv along H then W, per channel
        im = jnp.moveaxis(im, -1, 0)  # (C, H, W)
        im = jax.vmap(
            lambda ch: jax.scipy.signal.convolve2d(
                ch, jnp.outer(kernel, kernel), mode="valid"
            )
        )(im)
        return jnp.moveaxis(im, 0, -1)

    mu0, mu1 = blur(img0), blur(img1)
    # blur(x*x) - mu^2 cancels catastrophically in f32 on flat regions
    # (e.g. white background): tiny negative variances / Cauchy-Schwarz
    # violations push per-window SSIM above 1 (observed 1.026 on a
    # near-perfect view).  Clamp to the mathematically valid region —
    # s00,s11 >= 0 and |s01| <= sqrt(s00*s11) — which guarantees
    # ssim_map <= 1 by AM-GM.
    s00 = jnp.maximum(blur(img0 * img0) - mu0 ** 2, 0.0)
    s11 = jnp.maximum(blur(img1 * img1) - mu1 ** 2, 0.0)
    s01 = blur(img0 * img1) - mu0 * mu1
    s01 = jnp.sign(s01) * jnp.minimum(jnp.abs(s01), jnp.sqrt(s00 * s11))
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    ssim_map = ((2 * mu0 * mu1 + c1) * (2 * s01 + c2)) / (
        (mu0 ** 2 + mu1 ** 2 + c1) * (s00 + s11 + c2)
    )
    return jnp.mean(ssim_map)

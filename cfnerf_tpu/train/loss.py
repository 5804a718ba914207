"""CF-NeRF training losses.

Parity target: the loss block at
/root/reference/run_nerf_uncertainty_NF.py:1026-1054.

  * KDE (Parzen-window) negative log-likelihood of the target pixel under
    the K rendered RGB samples, with Silverman-style bandwidth
    H = std_detached * (0.8/n)^(-1/7) + 1e-5 (:1036) where std is the
    Bessel-corrected sample std scaled by n/(n-1) (:1034);
  * beta1-weighted flow entropy (:1047-1048);
  * optional COLMAP depth MSE on the mean-over-K depth (:1019-1023,
    :1052-1054).  NOTE: the reference loads per-ray reprojection weights
    (:970) but never uses them in the loss — reproduced (unweighted MSE).
"""
from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from cfnerf_tpu.ops.metrics import img2mse

KDE_EPS = 1e-5


def kde_nll(rgbs: jnp.ndarray, target: jnp.ndarray, k_samples: int) -> jnp.ndarray:
    """-log mean_k N(target | rgb_k, H^2), averaged over rays and channels.

    Args:
      rgbs: (R, 3, K) K rendered RGB samples per ray.
      target: (R, 3) ground-truth pixel colors.
    """
    n = k_samples
    # torch.std is Bessel-corrected (ddof=1); the reference then scales by
    # n/(n-1) (run_nerf_uncertainty_NF.py:1034).
    rgb_std = jnp.std(rgbs, axis=-1, ddof=1) * n / (n - 1)  # (R, 3)
    h_sqrt = jax.lax.stop_gradient(rgb_std) * (0.8 / n) ** (-1.0 / 7.0) + KDE_EPS
    h_sqrt = h_sqrt[..., None]  # (R, 3, 1)
    kernel = jnp.exp(-((rgbs - target[..., None]) ** 2) / (2.0 * h_sqrt * h_sqrt))
    norm = (2.0 * math.pi) ** (-1.5) / h_sqrt
    p = (kernel * norm).mean(-1) + KDE_EPS  # (R, 3)
    return -jnp.log(p).mean()


def depth_loss(depth_k: jnp.ndarray, target_depth: jnp.ndarray) -> jnp.ndarray:
    """MSE between the mean-over-K rendered depth and COLMAP sparse depth."""
    return img2mse(depth_k.mean(-1), target_depth)


def total_loss(
    rgbs: jnp.ndarray,
    target: jnp.ndarray,
    loss_entropy: jnp.ndarray,
    *,
    k_samples: int,
    beta1: float = 0.0,
    depth_k: Optional[jnp.ndarray] = None,
    target_depth: Optional[jnp.ndarray] = None,
    depth_lambda: float = 0.0,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Assemble loss = nll + beta1*entropy (+ depth_lambda*depth_mse),
    reproducing run_nerf_uncertainty_NF.py:1047-1054 (beta1=0 drops the
    entropy term entirely, matching the truthiness check at :1047)."""
    loss_nll = kde_nll(rgbs, target, k_samples)
    loss = loss_nll
    metrics = {"loss_nll": loss_nll, "loss_entropy": loss_entropy}
    if beta1:
        loss = loss + beta1 * loss_entropy
    if depth_k is not None and target_depth is not None:
        d = depth_loss(depth_k, target_depth)
        loss = loss + depth_lambda * d
        metrics["depth_loss"] = d
    metrics["loss"] = loss
    return loss, metrics

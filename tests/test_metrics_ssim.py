"""SSIM numeric-validity tests.

The fused f32 pipeline computes variances as blur(x*x) - mu^2, which
cancels catastrophically on flat regions (white background): tiny negative
variances / Cauchy-Schwarz violations pushed per-window SSIM above 1
(observed 1.026 on a near-perfect eval view before the clamp,
ops/metrics.py:ssim).  Pins: (a) SSIM <= 1 always, (b) identical images
score exactly 1, (c) parity with a float64 NumPy implementation of the
same Gaussian-windowed Wang et al. formula.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from cfnerf_tpu.ops.metrics import ssim


def _ssim_f64(img0, img1, max_val=1.0, filter_size=11, filter_sigma=1.5,
              k1=0.01, k2=0.03):
    from scipy.signal import convolve2d

    off = np.arange(filter_size, dtype=np.float64) - (filter_size - 1) / 2
    k = np.exp(-0.5 * (off / filter_sigma) ** 2)
    k /= k.sum()
    win = np.outer(k, k)

    def blur(im):
        return np.stack(
            [convolve2d(im[..., c], win, mode="valid")
             for c in range(im.shape[-1])], -1)

    img0 = img0.astype(np.float64)
    img1 = img1.astype(np.float64)
    mu0, mu1 = blur(img0), blur(img1)
    s00 = blur(img0 * img0) - mu0 ** 2
    s11 = blur(img1 * img1) - mu1 ** 2
    s01 = blur(img0 * img1) - mu0 * mu1
    c1, c2 = (k1 * max_val) ** 2, (k2 * max_val) ** 2
    m = ((2 * mu0 * mu1 + c1) * (2 * s01 + c2)) / (
        (mu0 ** 2 + mu1 ** 2 + c1) * (s00 + s11 + c2))
    return float(m.mean())


def test_ssim_identical_is_one():
    rng = np.random.RandomState(0)
    img = rng.rand(32, 32, 3).astype(np.float32)
    v = float(ssim(jnp.asarray(img), jnp.asarray(img)))
    assert v <= 1.0 + 1e-7
    assert v == pytest.approx(1.0, abs=1e-6)


def test_ssim_flat_background_bounded():
    """A mostly-white pair with a small noisy patch — the shape that
    produced SSIM > 1 before the clamp."""
    rng = np.random.RandomState(1)
    gt = np.ones((64, 64, 3), np.float32)
    pred = gt + rng.randn(64, 64, 3).astype(np.float32) * 1e-4
    gt[24:40, 24:40] = rng.rand(16, 16, 3)
    pred[24:40, 24:40] = gt[24:40, 24:40] + 0.02 * rng.randn(16, 16, 3)
    v = float(ssim(jnp.asarray(pred), jnp.asarray(gt)))
    assert v <= 1.0 + 1e-7, v
    assert v > 0.9


def test_ssim_matches_f64_reference():
    rng = np.random.RandomState(2)
    a = rng.rand(48, 48, 3).astype(np.float32)
    b = np.clip(a + 0.1 * rng.randn(48, 48, 3), 0, 1).astype(np.float32)
    ours = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = _ssim_f64(a, b)
    assert ours == pytest.approx(ref, abs=2e-4)

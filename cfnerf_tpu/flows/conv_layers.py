"""Convolutional flow building blocks (gated convs + PixelCNN-masked conv).

Parity targets: /root/reference/model/flow/layers.py — GatedConv2d /
GatedConvTranspose2d (:16-58) and MaskedConv2d (:132-204).  In the
reference these are DEAD code: their only consumers were the realnvp/glow
conv-flow families whose sources were deleted (only .pyc remnants remain).
They are implemented here so the flow-layer toolbox is complete if a
conv-flow family is ever revived; golden value tests against the
reference's own torch classes live in tests/test_conv_layers.py.

Layout: NHWC (TPU-native).  The golden tests handle the NCHW/OIHW <->
NHWC/HWIO transposition when comparing against torch.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class GatedConv2d(nn.Module):
    """h(x) * sigmoid(g(x)) with two parallel convolutions (GLU gating)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    activation: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = [(self.padding[0],) * 2, (self.padding[1],) * 2]
        conv = lambda name: nn.Conv(
            self.features, self.kernel_size, strides=self.strides,
            padding=pad, kernel_dilation=self.dilation, name=name,
        )
        h = conv("h")(x)
        if self.activation is not None:
            h = self.activation(h)
        return h * jax.nn.sigmoid(conv("g")(x))


class GatedConvTranspose2d(nn.Module):
    """Gated transposed convolution with torch ConvTranspose2d geometry:
    out = (in - 1)*stride - 2*padding + dilation*(k - 1) + output_padding + 1
    (expressed as an input-dilated conv, the TPU-friendly lowering)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    output_padding: Tuple[int, int] = (0, 0)
    dilation: Tuple[int, int] = (1, 1)
    activation: Optional[Callable] = None

    def _tconv(self, x, kernel, bias):
        # torch-semantics transposed conv: dilate the INPUT by the stride,
        # pad by dilation*(k-1) - padding (+ output_padding on the high
        # side), convolve with the spatially-flipped kernel, stride 1
        k_h, k_w = self.kernel_size
        d_h, d_w = self.dilation
        pad = [
            (d_h * (k_h - 1) - self.padding[0],
             d_h * (k_h - 1) - self.padding[0] + self.output_padding[0]),
            (d_w * (k_w - 1) - self.padding[1],
             d_w * (k_w - 1) - self.padding[1] + self.output_padding[1]),
        ]
        out = jax.lax.conv_general_dilated(
            x, kernel[::-1, ::-1],
            window_strides=(1, 1), padding=pad,
            lhs_dilation=self.strides, rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from cfnerf_tpu.utils.init import torch_uniform_init

        in_ch = x.shape[-1]
        shape = (*self.kernel_size, in_ch, self.features)
        fan_in = in_ch * self.kernel_size[0] * self.kernel_size[1]
        init = torch_uniform_init(fan_in)

        def head(name):
            kernel = self.param(f"{name}_kernel", init, shape)
            bias = self.param(f"{name}_bias", init, (self.features,))
            return self._tconv(x, kernel, bias)

        h = head("h")
        if self.activation is not None:
            h = self.activation(h)
        return h * jax.nn.sigmoid(head("g"))


def build_pixelcnn_mask(
    n_in: int, n_out: int, size_kernel: Tuple[int, int] = (3, 3),
    diagonal_zeros: bool = False,
) -> np.ndarray:
    """Autoregressive conv mask (HWIO layout) with PixelCNN spatial
    structure + block-autoregressive channel structure at the center tap:
    all taps above the center row and left of center are zeroed; at the
    center pixel, output channel block i may read input channels < i
    (diagonal_zeros) or <= i, with channels grouped by the n_out/n_in
    (or n_in/n_out) ratio.  Same semantics as the reference's
    MaskedConv2d.build_mask (model/flow/layers.py:163-189)."""
    if not (n_out % n_in == 0 or n_in % n_out == 0):
        raise ValueError(f"channel counts must divide: {n_in} vs {n_out}")
    kh, kw = size_kernel
    ch, cw = (kh - 1) // 2, (kw - 1) // 2
    mask = np.ones((kh, kw, n_in, n_out), np.float32)
    mask[:ch, :, :, :] = 0.0          # rows above the center
    mask[ch, :cw, :, :] = 0.0         # left of center in the center row
    if n_out >= n_in:
        k = n_out // n_in
        for i in range(n_in):
            mask[ch, cw, i + 1:, i * k:(i + 1) * k] = 0.0
            if diagonal_zeros:
                mask[ch, cw, i:i + 1, i * k:(i + 1) * k] = 0.0
    else:
        k = n_in // n_out
        for i in range(n_out):
            mask[ch, cw, (i + 1) * k:, i:i + 1] = 0.0
            if diagonal_zeros:
                mask[ch, cw, i * k:(i + 1) * k, i:i + 1] = 0.0
    return mask


class MaskedConv2d(nn.Module):
    """PixelCNN-style masked convolution for autoregressive conv flows.

    Matches the reference quirk of always padding (1, 1) regardless of
    kernel size (layers.py:192) — 'same' geometry only for 3x3 kernels."""

    features: int
    size_kernel: Tuple[int, int] = (3, 3)
    diagonal_zeros: bool = False
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n_in = x.shape[-1]
        mask = build_pixelcnn_mask(
            n_in, self.features, self.size_kernel, self.diagonal_zeros
        )
        kernel = self.param(
            "kernel",
            nn.initializers.kaiming_normal(),  # ref: init.kaiming_normal
            (*self.size_kernel, n_in, self.features),
        )
        out = jax.lax.conv_general_dilated(
            x, kernel * mask, window_strides=(1, 1),
            padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            out = out + self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
        return out

"""Baseline (non-flow) NeRF model family.

Parity targets (paper baselines; present but not instantiated by the
reference's create_nerf): vanilla NeRF /root/reference/run_nerf_helpers.py:76-163,
MC-dropout NeRF_Dropout :165-226, learned-std NeRF_wild :228-284.
"""
from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cfnerf_tpu.utils.init import TorchDense


def _dropout(h, rate, key):
    """Explicit-key dropout (inverted scaling).  Explicit keys instead of
    flax rng collections so K-draw MC-dropout can thread one key per draw
    through a plain (params, x, rng) apply signature."""
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, h.shape)
    return jnp.where(mask, h / keep, 0.0)


class _Trunk(nn.Module):
    depth: int
    width: int
    input_ch: int
    skips: Tuple[int, ...]
    dropout_rate: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_pts, *, dropout_rng=None):
        h = input_pts
        for i in range(self.depth):
            if self.dropout_rate > 0 and dropout_rng is not None and i % 2 == 0 and i > 0:
                dropout_rng, sub = jax.random.split(dropout_rng)
                h = _dropout(h, self.dropout_rate, sub)
            h = TorchDense(
                self.width, dtype=self.compute_dtype, name=f"pts_linear_{i}",
            )(h)
            h = nn.relu(h)
            if i in self.skips:
                h = jnp.concatenate([input_pts, h], -1)
        return h


class NeRF(nn.Module):
    """Vanilla NeRF: trunk -> (alpha head, feature+views -> rgb head)."""

    depth: int = 8
    width: int = 256
    input_ch: int = 63
    input_ch_views: int = 27
    output_ch: int = 4
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dense = lambda feats, name: TorchDense(
            feats, dtype=self.compute_dtype, name=name,
        )
        input_pts = x[..., : self.input_ch].astype(self.compute_dtype)
        input_views = x[..., self.input_ch :].astype(self.compute_dtype)
        h = _Trunk(self.depth, self.width, self.input_ch, self.skips,
                   compute_dtype=self.compute_dtype, name="trunk")(input_pts)
        if self.use_viewdirs:
            alpha = dense(1, "alpha_linear")(h)
            feature = dense(self.width, "feature_linear")(h)
            hv = jnp.concatenate([feature, input_views], -1)
            hv = nn.relu(dense(self.width // 2, "views_linear")(hv))
            rgb = dense(3, "rgb_linear")(hv)
            out = jnp.concatenate([rgb, alpha], -1)
        else:
            out = dense(self.output_ch, "output_linear")(h)
        return out.astype(jnp.float32)


def load_weights_from_keras(params, weights, *, depth: int = 8):
    """Import an original TF-NeRF (Keras) checkpoint into a use_viewdirs
    NeRF param pytree (parity with NeRF.load_weights_from_keras,
    /root/reference/run_nerf_helpers.py:136-163).

    `weights` is the flat [w0, b0, w1, b1, ...] array list saved by the
    original bmild/nerf release, ordered: D trunk layers, feature_linear,
    views_linear, rgb_linear, alpha_linear.  Keras kernels are (in, out);
    the torch reference transposes them to (out, in) — flax kernels are
    already (in, out), so they load untransposed.  Returns a NEW pytree
    (params is not mutated); shapes are validated against the target."""
    import numpy as np

    # unfreeze() handles FrozenDict pytrees; device_get then tree_maps into
    # fresh mutable containers, so in-place edits below never mutate the
    # caller's pytree
    import flax.core

    params = jax.device_get(flax.core.unfreeze(params))

    def put(module, w, b):
        kern, bias = np.asarray(w, np.float32), np.asarray(b, np.float32)
        tgt_k, tgt_b = module["kernel"], module["bias"]
        if kern.shape != tgt_k.shape:
            raise ValueError(
                f"keras kernel shape {kern.shape} != target {tgt_k.shape}"
            )
        if bias.shape != tgt_b.shape:
            raise ValueError(
                f"keras bias shape {bias.shape} != target {tgt_b.shape}"
            )
        module["kernel"], module["bias"] = kern, bias

    for i in range(depth):
        put(params["trunk"][f"pts_linear_{i}"], weights[2 * i], weights[2 * i + 1])
    put(params["feature_linear"], weights[2 * depth], weights[2 * depth + 1])
    put(params["views_linear"], weights[2 * depth + 2], weights[2 * depth + 3])
    put(params["rgb_linear"], weights[2 * depth + 4], weights[2 * depth + 5])
    put(params["alpha_linear"], weights[2 * depth + 6], weights[2 * depth + 7])
    return jax.tree_util.tree_map(jnp.asarray, params)


class NeRFDropout(nn.Module):
    """MC-dropout uncertainty baseline (dropout 0.2 on alternate trunk
    layers and before each head)."""

    depth: int = 8
    width: int = 256
    input_ch: int = 63
    input_ch_views: int = 27
    output_ch: int = 4
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True
    dropout_rate: float = 0.2
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, rng=None):
        """rng=None -> deterministic (dropout off); an explicit key enables
        one stochastic dropout draw (MC-dropout draws differ by key)."""
        dense = lambda feats, name: TorchDense(
            feats, dtype=self.compute_dtype, name=name,
        )
        k_trunk = k_h = k_hv = None
        if rng is not None:
            k_trunk, k_h, k_hv = jax.random.split(rng, 3)
        input_pts = x[..., : self.input_ch].astype(self.compute_dtype)
        input_views = x[..., self.input_ch :].astype(self.compute_dtype)
        h = _Trunk(self.depth, self.width, self.input_ch, self.skips,
                   dropout_rate=self.dropout_rate,
                   compute_dtype=self.compute_dtype, name="trunk")(
            input_pts, dropout_rng=k_trunk
        )
        if self.use_viewdirs:
            if k_h is not None:
                h = _dropout(h, self.dropout_rate, k_h)
            alpha = dense(1, "alpha_linear")(h)
            feature = dense(self.width, "feature_linear")(h)
            hv = jnp.concatenate([feature, input_views], -1)
            hv = nn.relu(dense(self.width // 2, "views_linear")(hv))
            if k_hv is not None:
                hv = _dropout(hv, self.dropout_rate, k_hv)
            rgb = dense(3, "rgb_linear")(hv)
            out = jnp.concatenate([rgb, alpha], -1)
        else:
            out = dense(self.output_ch, "output_linear")(h)
        return out.astype(jnp.float32)


class NeRFWild(nn.Module):
    """Learned-std baseline: rgb head plus a per-point std head."""

    depth: int = 8
    width: int = 256
    input_ch: int = 63
    input_ch_views: int = 27
    output_ch: int = 5
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dense = lambda feats, name: TorchDense(
            feats, dtype=self.compute_dtype, name=name,
        )
        input_pts = x[..., : self.input_ch].astype(self.compute_dtype)
        input_views = x[..., self.input_ch :].astype(self.compute_dtype)
        h = _Trunk(self.depth, self.width, self.input_ch, self.skips,
                   compute_dtype=self.compute_dtype, name="trunk")(input_pts)
        if self.use_viewdirs:
            alpha = dense(1, "alpha_linear")(h)
            feature = dense(self.width, "feature_linear")(h)
            hv = jnp.concatenate([feature, input_views], -1)
            hv = nn.relu(dense(self.width // 2, "views_linear")(hv))
            rgb = dense(3, "rgb_linear")(hv)
            rgb_std = dense(1, "std_linear")(hv)
            out = jnp.concatenate([rgb, rgb_std, alpha], -1)
        else:
            out = dense(self.output_ch, "output_linear")(h)
        return out.astype(jnp.float32)

"""K-sample adapters for the baseline (non-flow) NeRF model family.

The reference ships three uncertainty baselines that its create_nerf never
instantiates (dead paper baselines, /root/reference/run_nerf_helpers.py:76-284):
vanilla NeRF, MC-dropout NeRF_Dropout, and learned-std NeRF_wild.  This
module makes them runnable end-to-end through the SAME renderer, train step,
and eval pipeline as the flagship flow model by adapting each to the
K-sample contract:

    apply(params, x, is_test=..., rng=...) -> (raw (B, K, 4), extra scalar)

  * nerf          — deterministic: the single prediction broadcast to K
                    identical draws (std over K = 0; trained with MSE).
  * nerf_dropout  — K independent dropout draws per point (MC-dropout:
                    train uses fresh keys, eval uses FIXED keys with the
                    dropout active — the Gal & Ghahramani eval recipe; the
                    std over K is the epistemic uncertainty). Trained with
                    MSE on the mean draw.
  * nerf_wild     — heteroscedastic head: K Gaussian draws mu + std * eps
                    with eps shared across points like the flow model
                    (models.py:234,246) and the mean-sample-last rule in
                    test mode; trained with the same sample-based KDE NLL as
                    the flagship (the aleatoric analogue of the paper's
                    comparison).

The reference defines no losses or eval paths for these models; the
choices above are documented intent, not transcription.
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cfnerf_tpu.models.nerf import NeRF, NeRFDropout, NeRFWild

BASELINE_KINDS = ("nerf", "nerf_dropout", "nerf_wild")


class KSampleBaseline(nn.Module):
    """Adapt a baseline model to the (B, K, 4) raw contract of NeRFFlows."""

    kind: str
    k_samples: int
    net_depth: int = 8
    net_width: int = 256
    input_ch: int = 63
    input_ch_views: int = 27
    skips: Tuple[int, ...] = (4,)
    use_viewdirs: bool = True
    dropout_rate: float = 0.2
    compute_dtype: jnp.dtype = jnp.float32
    test_eps_seed: int = 0

    def setup(self):
        common = dict(
            depth=self.net_depth, width=self.net_width,
            input_ch=self.input_ch, input_ch_views=self.input_ch_views,
            skips=self.skips, use_viewdirs=self.use_viewdirs,
            compute_dtype=self.compute_dtype,
        )
        if self.kind == "nerf":
            self.base = NeRF(**common, name="base")
        elif self.kind == "nerf_dropout":
            self.base = NeRFDropout(
                **common, dropout_rate=self.dropout_rate, name="base"
            )
        elif self.kind == "nerf_wild":
            self.base = NeRFWild(**common, name="base")
        else:
            raise ValueError(
                f"unknown baseline model {self.kind!r}; choose from "
                f"{BASELINE_KINDS} or the default flow model"
            )

    def __call__(
        self,
        x: jnp.ndarray,
        *,
        is_test: bool = False,
        rng: Optional[jax.Array] = None,
        eps=None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B = x.shape[0]
        K = self.k_samples
        zero = jnp.zeros((), jnp.float32)

        if self.kind == "nerf":
            raw = self.base(x)  # (B, 4)
            return jnp.broadcast_to(raw[:, None, :], (B, K, 4)), zero

        if not is_test and rng is None and self.kind != "nerf":
            # same contract as NeRFFlows: a stochastic model trained
            # without a key would silently freeze its dropout masks /
            # eps draws into a fixed ensemble
            raise ValueError(f"training forward of {self.kind} requires an rng key")

        if self.kind == "nerf_dropout":
            # fixed keys in test mode -> deterministic MC-dropout eval
            key = jax.random.PRNGKey(self.test_eps_seed) if is_test else rng
            keys = jax.random.split(key, K)
            draws = [self.base(x, rng=keys[k]) for k in range(K)]
            return jnp.stack(draws, axis=1), zero  # (B, K, 4)

        # nerf_wild: rgb(3) + raw std(1) + density(1)
        out = self.base(x)
        rgb_mu = out[..., :3]
        std = jax.nn.softplus(out[..., 3:4]) + 1e-4  # (B, 1)
        density = out[..., 4:5]
        if eps is not None:
            eps_r = eps
        elif is_test:
            eps_r = jax.random.normal(jax.random.PRNGKey(self.test_eps_seed), (K, 3))
        else:
            eps_r = jax.random.normal(rng, (K, 3))
        if is_test:
            eps_r = eps_r.at[-1].set(0.0)  # mean sample last, like the flows
        rgb_k = rgb_mu[:, None, :] + std[:, None, :] * eps_r[None]  # (B, K, 3)
        raw = jnp.concatenate(
            [rgb_k, jnp.broadcast_to(density[:, None, :], (B, K, 1))], -1
        )
        return raw, zero

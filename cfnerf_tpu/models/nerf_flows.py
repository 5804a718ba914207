"""NeRF_Flows — the CF-NeRF probabilistic radiance field.

Parity target: /root/reference/model/models.py:13-291.

Structure: an 8xW MLP trunk with a skip connection at depth D/2 emits two
conditioning vectors, h_alpha (density head) and h_rgb (view-dependent RGB
head).  Global learnable base-distribution parameters (alpha_mean/std scalar,
rgb_mean/std 3-vector) define N(mu, sigma^2) from which K latent draws are
reparameterized (z0 = mu + sigma * eps, with eps SHARED across all points in
the batch — models.py:234,246) and pushed through two conditional
Triangular-Sylvester flow stacks.  The flow outputs are the pre-activation
density (final activation softplus, applied in compositing) and pre-sigmoid
RGB; their activation log-det corrections are folded into the entropy term
(models.py:261-278).

Entropy loss (models.py:265-286):
    E[log q0(z0)] - E[sum log|det J|]   summed over both flows,
with the base log-density taken elementwise as -0.5*(2 log sigma + eps^2)
(no -0.5 log 2pi constant) and each term .mean()-ed over ALL its elements —
note the rgb base term therefore averages over 3 channels while the log-det
terms average over (B, K); we reproduce those exact normalizations.

Test mode (models.py:192-223): eps comes from fixed buffers drawn once at
init, with the LAST of the K draws replaced by zeros (the mean sample), and
the flows skip log-det computation (flows.py:204-223).

TPU-native design decisions:
  * K rides a broadcast axis end-to-end; the reference tiles h to (B*K, h)
    (models.py:255-256) — we never materialize that;
  * the trunk runs in `compute_dtype` (bf16 on MXU for speed); conditioning
    vectors are cast to f32 before flow amortization, and all flow /
    log-det / entropy math is f32;
  * the n_flows chain is unrolled at trace time and fuses into one XLA
    elementwise pipeline per flow family.

Known reference defects handled here (SURVEY.md section 2):
  * use_viewdirs=False crashes in the reference (self.output_ch never set,
    h_alpha/h_rgb undefined); we implement the intended behavior — both
    conditioning vectors amortized from the trunk output, no view branch;
  * the unused alpha_linear / alpha_std_linear heads (models.py:59-60) are
    not replicated (dead parameters).
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from cfnerf_tpu.flows.amortized import (
    AmortizedGeneralSylvester,
    AmortizedPlanar,
    AmortizedTriangularSylvester,
)
from cfnerf_tpu.flows.sylvester import (
    general_sylvester_step,
    planar_step,
    triangular_sylvester_stack,
)
from cfnerf_tpu.utils.init import TorchDense

Z_ALPHA = 1  # density latent dim
Z_RGB = 3    # rgb latent dim (z_size forced to 3 in the reference, models.py:31)


def make_fused_apply(model, mode: str):
    """Build the fused flow+composite apply for the renderer, or None.

    mode: 'off' | 'on' | 'interpret' (the factory resolves 'auto' to one
    of these).  Returns apply(params, x, z_pts, d_pts, s_per_ray,
    is_test=..., rng=...) -> (rgb_map, depth, acc, loss_entropy), or None
    when the model cannot take the fused path (non-NeRFFlows baselines,
    non-triangular flow families)."""
    if mode == "off":
        return None
    if not isinstance(model, NeRFFlows) or model.type_flows != "triangular":
        if mode in ("on", "interpret"):
            # explicit request on an unsupported family: same policy as
            # trunk_impl / type_flows — never silently ignore an explicit
            # implementation choice (the factory's 'auto' only resolves to
            # 'on' for triangular NeRFFlows, so auto never lands here)
            raise ValueError(
                f"--fused_render={mode} requires the triangular NeRFFlows "
                f"model (got {type(model).__name__} with type_flows="
                f"{getattr(model, 'type_flows', None)!r}); use "
                "--fused_render=off or auto"
            )
        return None
    if mode == "on" and jax.default_backend() != "tpu":
        # fail at build time with a clear message instead of a Mosaic
        # lowering error at first compile (same policy as the flag audit:
        # never let an explicit implementation choice crash opaquely)
        raise ValueError(
            "--fused_render=on requires a TPU backend "
            f"(got {jax.default_backend()!r}); use 'interpret' for CPU "
            "testing or 'auto'/'off'"
        )
    interpret = mode == "interpret"

    def apply_fused(params, x, z_pts, d_pts, s_per_ray, *, is_test, rng):
        return model.apply(
            {"params": params}, x, z_pts, d_pts, s_per_ray,
            is_test=is_test, rng=rng, interpret=interpret,
            method=NeRFFlows.forward_composited,
        )

    return apply_fused


class NeRFFlows(nn.Module):
    net_depth: int = 8
    net_width: int = 256
    input_ch: int = 63
    input_ch_views: int = 27
    skips: Tuple[int, ...] = (4,)
    h_alpha_size: int = 32
    h_rgb_size: int = 64
    n_flows: int = 4
    k_samples: int = 64
    use_viewdirs: bool = True
    type_flows: str = "triangular"
    compute_dtype: jnp.dtype = jnp.float32
    test_eps_seed: int = 0
    # run the triangular flow stack as the fused Pallas TPU kernel
    # (one kernel fwd, one kernel bwd, intermediates in VMEM);
    # 'interpret' runs the same kernel through the Pallas interpreter (CPU)
    flow_impl: str = "xla"  # 'xla' | 'pallas' | 'interpret'
    # run the trunk MLP + heads as fused Pallas kernels (weights resident
    # in VMEM, no per-layer HBM round-trips; ops/pallas/trunk.py).  Params
    # are still created by the flax submodules, so the pytree/checkpoint
    # layout is identical across impls.
    trunk_impl: str = "xla"  # 'xla' | 'pallas' | 'interpret'

    def setup(self):
        dense = lambda feats, name: TorchDense(
            feats, name=name, dtype=self.compute_dtype, param_dtype=jnp.float32,
        )

        self.pts_linears = [
            dense(self.net_width, f"pts_linear_{i}") for i in range(self.net_depth)
        ]
        if self.use_viewdirs:
            self.feature_linear = dense(self.net_width, "feature_linear")
            self.views_linear = dense(self.net_width // 2, "views_linear")
            self.h_alpha_linear = dense(self.h_alpha_size, "h_alpha_linear")
            self.h_rgb_linear = dense(self.h_rgb_size, "h_rgb_linear")
        else:
            # Intended (non-crashing) behavior: both heads from the trunk.
            self.h_alpha_linear = dense(self.h_alpha_size, "h_alpha_linear")
            self.h_rgb_linear = dense(self.h_rgb_size, "h_rgb_linear")

        # Global learnable base-distribution parameters (models.py:44-48).
        self.alpha_mean = self.param("alpha_mean", nn.initializers.zeros, (Z_ALPHA,))
        self.alpha_std = self.param("alpha_std", nn.initializers.ones, (Z_ALPHA,))
        self.rgb_mean = self.param("rgb_mean", nn.initializers.zeros, (Z_RGB,))
        self.rgb_std = self.param("rgb_std", nn.initializers.ones, (Z_RGB,))

        if self.type_flows == "planar":
            self.flows_alpha = AmortizedPlanar(Z_ALPHA, self.n_flows, name="flows_alpha")
            self.flows_rgb = AmortizedPlanar(Z_RGB, self.n_flows, name="flows_rgb")
        elif self.type_flows == "IAF":
            from cfnerf_tpu.flows.iaf import IAFNeRF

            self.flows_alpha = IAFNeRF(Z_ALPHA, self.n_flows, name="flows_alpha")
            self.flows_rgb = IAFNeRF(Z_RGB, self.n_flows, name="flows_rgb")
        elif self.type_flows in ("householder", "orthogonal"):
            # general Sylvester families (the reference's CLI advertises
            # these but silently trains triangular; here they are real —
            # flows.py:89-165 generalized with amortized Q)
            self.flows_alpha = AmortizedGeneralSylvester(
                Z_ALPHA, self.n_flows, q_mode=self.type_flows, name="flows_alpha"
            )
            self.flows_rgb = AmortizedGeneralSylvester(
                Z_RGB, self.n_flows, q_mode=self.type_flows, name="flows_rgb"
            )
        elif self.type_flows in ("triangular", "no_flow"):
            self.flows_alpha = AmortizedTriangularSylvester(
                Z_ALPHA, self.n_flows, name="flows_alpha"
            )
            self.flows_rgb = AmortizedTriangularSylvester(
                Z_RGB, self.n_flows, name="flows_rgb"
            )
        else:
            # realnvp / glow: the reference's CLI lists them but their
            # sources were deleted upstream (only .pyc remnants exist,
            # SURVEY.md section 2) — fail loudly instead of silently
            # training a different flow family.
            raise ValueError(
                f"type_flows={self.type_flows!r} has no implementation "
                "(the reference's realnvp/glow sources were deleted; its "
                "CLI silently trained triangular instead). Supported: "
                "triangular, householder, orthogonal, planar, IAF, no_flow."
            )

    # ------------------------------------------------------------------ #

    def encode(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Trunk MLP + heads (models.py:165-186).

        x: (B, input_ch + input_ch_views) embedded points (+ dirs).
        Returns (h_alpha (B, h_alpha_size), h_rgb (B, h_rgb_size)) in f32.
        """
        if self.trunk_impl != "xla" and not self.is_initializing():
            from cfnerf_tpu.ops.pallas.trunk import pallas_encode, supported

            if not (supported(self.net_depth, self.net_width, self.use_viewdirs)
                    and self.skips == (self.net_depth // 2,)):
                # same policy as the flag audit: never silently ignore an
                # explicit implementation choice
                raise ValueError(
                    f"trunk_impl={self.trunk_impl!r} requires use_viewdirs, "
                    f"width % 128 == 0 (and width//2), and skips == "
                    f"(depth//2,); got width={self.net_width}, "
                    f"skips={self.skips}, use_viewdirs={self.use_viewdirs}. "
                    "Use trunk_impl='xla' for this configuration."
                )
            names = [f"pts_linear_{i}" for i in range(self.net_depth)] + [
                "feature_linear", "views_linear",
                "h_alpha_linear", "h_rgb_linear",
            ]
            trunk_params = {n: self.variables["params"][n] for n in names}
            return pallas_encode(
                trunk_params, x,
                depth=self.net_depth, width=self.net_width,
                input_ch=self.input_ch, views_ch=self.input_ch_views,
                interpret=(self.trunk_impl == "interpret"),
            )

        input_pts = x[..., : self.input_ch].astype(self.compute_dtype)
        input_views = x[..., self.input_ch :].astype(self.compute_dtype)

        # concats are passed as TUPLES to TorchDense, which computes the
        # split matmul on the same kernel (no concat materialization, no
        # MXU padding of the odd 575/539 widths) — math identical
        h = input_pts
        for i, layer in enumerate(self.pts_linears):
            h = nn.relu(layer(h))
            if i in self.skips:
                h = (input_pts, h)

        if self.use_viewdirs:
            if isinstance(h, tuple) or self.is_initializing():
                h_alpha = self.h_alpha_linear(h)
                feature = self.feature_linear(h)
            else:
                # fan-out fusion (utils.init.fanout_concat): one matmul
                # for the two heads sharing the trunk activation h
                from cfnerf_tpu.utils.init import fanout_concat

                kcat, bcat = fanout_concat(
                    self.variables["params"],
                    ["feature_linear", "h_alpha_linear"],
                )
                y = jnp.dot(h, kcat.astype(self.compute_dtype)) + bcat.astype(
                    self.compute_dtype
                )
                feature = y[:, : self.net_width]
                h_alpha = y[:, self.net_width:]
            hv = nn.relu(self.views_linear((feature, input_views)))
            h_rgb = self.h_rgb_linear(hv)
        else:
            h_alpha = self.h_alpha_linear(h)
            h_rgb = self.h_rgb_linear(h)

        return h_alpha.astype(jnp.float32), h_rgb.astype(jnp.float32)

    # ------------------------------------------------------------------ #

    def _test_eps(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fixed eps buffers with the last draw zeroed (= mean sample);
        models.py:50-55,199,205."""
        key = jax.random.PRNGKey(self.test_eps_seed)
        ka, kr = jax.random.split(key)
        eps_a = jax.random.normal(ka, (self.k_samples, Z_ALPHA))
        eps_r = jax.random.normal(kr, (self.k_samples, Z_RGB))
        eps_a = eps_a.at[-1].set(0.0)
        eps_r = eps_r.at[-1].set(0.0)
        return eps_a, eps_r

    def _draw_eps(self, is_test, rng, eps):
        """The shared-K base-draw selection used by BOTH forward paths
        (__call__ and forward_composited): injected eps (test mode still
        zeroes the last draw = mean sample, models.py:199,205), fixed test
        buffers, or fresh shared-K training draws (models.py:234,246)."""
        if eps is not None:
            eps_a, eps_r = eps
            if is_test:
                eps_a = eps_a.at[-1].set(0.0)
                eps_r = eps_r.at[-1].set(0.0)
            return eps_a, eps_r
        if is_test:
            return self._test_eps()
        if rng is None:
            raise ValueError("training forward requires an rng key")
        ka, kr = jax.random.split(rng)
        eps_a = jax.random.normal(ka, (self.k_samples, Z_ALPHA))
        eps_r = jax.random.normal(kr, (self.k_samples, Z_RGB))
        return eps_a, eps_r

    def _base_log_density_mean(self, z0_a, z0_r):
        """Elementwise base log-density means (no -0.5 log 2pi;
        models.py:268,283) on the UNEXPANDED (K, Z) draws — eps is shared
        across points, so this equals the reference's mean over the
        B-expanded tensor.  Shared by both forward paths."""
        base_a = -0.5 * (
            2.0 * jnp.log(self.alpha_std)
            + (z0_a - self.alpha_mean) ** 2 / self.alpha_std ** 2
        )
        base_r = -0.5 * (
            2.0 * jnp.log(self.rgb_std)
            + (z0_r - self.rgb_mean) ** 2 / self.rgb_std ** 2
        )
        return base_a.mean(), base_r.mean()

    def _apply_flows(self, z0, h, which: str, compute_log_det: bool):
        """Push (B, K, Z) latents through the amortized flow stack."""
        if self.type_flows == "no_flow":
            return z0, jnp.zeros(z0.shape[:-1], dtype=z0.dtype)
        amor = self.flows_alpha if which == "alpha" else self.flows_rgb
        if self.type_flows == "IAF":
            return amor(z0, h, compute_log_det)
        if self.type_flows == "planar":
            u, w, b = amor(h)
            z, ldj = z0, jnp.zeros(z0.shape[:-1], dtype=z0.dtype)
            for k in range(self.n_flows):
                z, ld = planar_step(z, u[..., k], w[..., k], b[..., k])
                ldj = ldj + ld
            if not compute_log_det:
                ldj = jnp.zeros_like(ldj)
            return z, ldj
        if self.type_flows in ("householder", "orthogonal"):
            r1, r2, q, b = amor(h)
            z, ldj = z0, jnp.zeros(z0.shape[:-1], dtype=z0.dtype)
            for k in range(self.n_flows):
                z, ld = general_sylvester_step(
                    z, r1[..., k], r2[..., k], q[..., k], b[..., k],
                    compute_log_det=compute_log_det,
                )
                ldj = ldj + ld
            return z, ldj
        r1, r2, b = amor(h)
        if self.flow_impl in ("pallas", "interpret"):
            from cfnerf_tpu.ops.pallas.flow_stack import fused_flow_stack

            return fused_flow_stack(
                z0, r1, r2, b, compute_log_det, self.flow_impl == "interpret"
            )
        return triangular_sylvester_stack(
            z0, r1, r2, b, compute_log_det=compute_log_det
        )

    def __call__(
        self,
        x: jnp.ndarray,
        *,
        is_test: bool = False,
        rng: Optional[jax.Array] = None,
        eps: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Forward pass (models.py:188-291).

        Args:
          x: (B, input_ch [+ input_ch_views]) embedded inputs.
          is_test: fixed-eps mean-sample mode, no entropy (models.py:192-223).
          rng: PRNG key for the shared-K eps draw (required when not is_test).
          eps: optional ((K, 1), (K, 3)) injected base draws — the
            determinism seam for golden-value parity tests (the reference's
            `pytest=` flag plays the same role for its RNG draws).  In test
            mode the last draw is still replaced by zeros (mean sample),
            mirroring the reference's treatment of its eps buffers
            (models.py:199,205).

        Returns:
          raw: (B, K, 4) — pre-sigmoid RGB (3) then pre-softplus density (1).
          loss_entropy: scalar (0.0 in test mode).
        """
        h_alpha, h_rgb = self.encode(x)
        B = h_alpha.shape[0]
        K = self.k_samples

        eps_a, eps_r = self._draw_eps(is_test, rng, eps)

        # Reparameterized base draws, broadcast over points: (B, K, Z).
        alpha0 = eps_a[None] * self.alpha_std + self.alpha_mean
        rgb0 = eps_r[None] * self.rgb_std + self.rgb_mean
        alpha0 = jnp.broadcast_to(alpha0, (B, K, Z_ALPHA))
        rgb0 = jnp.broadcast_to(rgb0, (B, K, Z_RGB))

        compute_ld = not is_test
        z_alpha, ldj_alpha = self._apply_flows(alpha0, h_alpha, "alpha", compute_ld)
        z_rgb, ldj_rgb = self._apply_flows(rgb0, h_rgb, "rgb", compute_ld)

        raw = jnp.concatenate([z_rgb, z_alpha], -1)  # (B, K, 4)

        if is_test:
            return raw, jnp.zeros((), dtype=raw.dtype)

        # Final-activation log-det corrections (models.py:261-278):
        #   density softplus:  log d softplus/dz = log sigmoid(z) = z - softplus(z)
        #   rgb sigmoid:       log d sigmoid/dz  = z - 2 softplus(z)
        ldj_alpha = ldj_alpha + (z_alpha - jax.nn.softplus(z_alpha)).sum(-1)
        ldj_rgb = ldj_rgb + (z_rgb - 2.0 * jax.nn.softplus(z_rgb)).sum(-1)

        z0_a = eps_a * self.alpha_std + self.alpha_mean  # (K, Z_ALPHA)
        z0_r = eps_r * self.rgb_std + self.rgb_mean
        base_a_mean, base_r_mean = self._base_log_density_mean(z0_a, z0_r)

        loss_entropy = (
            base_a_mean - ldj_alpha.mean() + base_r_mean - ldj_rgb.mean()
        )
        return raw, loss_entropy

    def forward_composited(
        self,
        x: jnp.ndarray,
        z_pts: jnp.ndarray,
        d_pts: jnp.ndarray,
        s_per_ray: int,
        *,
        is_test: bool = False,
        rng: Optional[jax.Array] = None,
        eps: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
        interpret: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Fused render forward: flows + K-sample composite in ONE Pallas
        kernel (ops/pallas/render_core.py), so the (B, K, 4) raw tensor
        never exists in HBM.  Math identical to __call__ followed by
        ops.compositing.raw2outputs (parity pinned by
        tests/test_render_core.py); triangular flows only.

        Args:
          x: (B, input_ch [+ views]) embedded inputs, B = R * s_per_ray,
             sample index minor.
          z_pts: (B,) per-point sample depth (z_vals flattened).
          d_pts: (B,) per-point interval * |rays_d| (LAST_DIST applied).

        Returns (rgb_map (R, 3, K), depth (R, K), acc (R, K),
                 loss_entropy scalar — 0 in test mode)."""
        if self.type_flows != "triangular":
            raise ValueError(
                "forward_composited requires type_flows='triangular' "
                f"(got {self.type_flows!r})"
            )
        from cfnerf_tpu.ops.pallas.render_core import fused_flow_composite

        h_alpha, h_rgb = self.encode(x)
        B = h_alpha.shape[0]
        K = self.k_samples

        eps_a, eps_r = self._draw_eps(is_test, rng, eps)

        # Shared-K base draws, NOT expanded over points (models.py:234,246
        # semantics; the kernel broadcasts in VMEM).
        z0_a = eps_a * self.alpha_std + self.alpha_mean  # (K, 1)
        z0_r = eps_r * self.rgb_std + self.rgb_mean      # (K, 3)

        r1_a, r2_a, b_a = self.flows_alpha(h_alpha)
        r1_r, r2_r, b_r = self.flows_rgb(h_rgb)

        rgb_map, depth, acc, ldj_ray = fused_flow_composite(
            z0_a, r1_a, r2_a, b_a, z0_r, r1_r, r2_r, b_r,
            z_pts, d_pts, s_per_ray, not is_test, interpret,
        )

        if is_test:
            return rgb_map, depth, acc, jnp.zeros((), jnp.float32)

        # Entropy (models.py:265-286): same normalizations as __call__ —
        # base terms elementwise-mean over (K, Z); ldj terms mean over
        # (B, K) (the kernel returns per-ray sums over K and s).
        base_a_mean, base_r_mean = self._base_log_density_mean(z0_a, z0_r)
        denom = B * K
        loss_entropy = (
            base_a_mean - ldj_ray[0].sum() / denom
            + base_r_mean - ldj_ray[1].sum() / denom
        )
        return rgb_map, depth, acc, loss_entropy

    # ---------------- latent-space diagnostics (models.py:69-163) ------ #

    def sample(self, x: jnp.ndarray) -> jnp.ndarray:
        """Density-only K draws through the alpha flow (models.py:69-96)."""
        h_alpha, _ = self.encode(x)
        B = h_alpha.shape[0]
        eps_a, _ = self._test_eps()
        alpha0 = jnp.broadcast_to(
            eps_a[None] * self.alpha_std + self.alpha_mean, (B, self.k_samples, Z_ALPHA)
        )
        z_alpha, _ = self._apply_flows(alpha0, h_alpha, "alpha", False)
        return z_alpha

    def interpolation(self, x: jnp.ndarray) -> jnp.ndarray:
        """Latent walks z1 -> mean -> z2 through both flows
        (models.py:98-163): 10 steps z1->mean then 11 steps mean->z2."""
        h_alpha, h_rgb = self.encode(x)
        B = h_alpha.shape[0]
        key = jax.random.PRNGKey(self.test_eps_seed + 1)
        ka, kr = jax.random.split(key)
        eps_a = jax.random.normal(ka, (2, Z_ALPHA))
        eps_r = jax.random.normal(kr, (2, Z_RGB))

        def walk(eps, mean, std, zdim):
            z_ends = eps * std + mean  # (2, Z)
            mean_b = jnp.broadcast_to(mean, (zdim,))
            betas1 = jnp.arange(10) / 10.0
            betas2 = jnp.arange(11) / 10.0
            seg1 = (1 - betas1)[:, None] * z_ends[0] + betas1[:, None] * mean_b
            seg2 = (1 - betas2)[:, None] * mean_b + betas2[:, None] * z_ends[1]
            return jnp.concatenate([seg1, seg2], 0)  # (21, Z)

        walk_a = jnp.broadcast_to(walk(eps_a, self.alpha_mean, self.alpha_std, Z_ALPHA)[None], (B, 21, Z_ALPHA))
        walk_r = jnp.broadcast_to(walk(eps_r, self.rgb_mean, self.rgb_std, Z_RGB)[None], (B, 21, Z_RGB))
        z_a, _ = self._apply_flows(walk_a, h_alpha, "alpha", False)
        z_r, _ = self._apply_flows(walk_r, h_rgb, "rgb", False)
        return jnp.concatenate([z_r, z_a], -1)  # (B, 21, 4)

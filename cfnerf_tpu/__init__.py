"""cfnerf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) re-implementation of the
capabilities of CF-NeRF (Conditional-Flow NeRF, ECCV 2022, arXiv 2203.10192;
reference implementation: poetrywanderer/CF-NeRF).

CF-NeRF learns a *distribution over radiance fields*: a NeRF MLP trunk emits
conditioning vectors for two conditional Triangular-Sylvester normalizing
flows (density + RGB), K Monte-Carlo radiance draws per 3D point are pushed
through the flows, volume-rendered per ray, and trained with a
kernel-density-estimate negative log-likelihood plus a flow-entropy
regularizer.  Outputs per ray: K RGB samples (mean image + per-pixel std =
uncertainty), disparity, depth.

Architecture here is TPU-first, not a port:
  * the whole train step is one jit-compiled function — no host chunk loops;
  * K is a broadcast axis (the reference materializes (B*N*K, h) tensors);
  * rays are sharded over a `jax.sharding.Mesh` (data parallel over ICI),
    replacing the reference's single-process `nn.DataParallel`;
  * flows / compositing run in f32, the MLP trunk optionally in bf16 on MXU.
"""

__version__ = "0.1.0"

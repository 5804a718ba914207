import jax.numpy as jnp
import numpy as np

from cfnerf_tpu.ops.compositing import raw2outputs


def reference_composite(raw, z_vals, rays_d, white_bkgd=False):
    """Independent numpy implementation of the CF-NeRF compositing math
    (softplus alpha, last dist 1e1, K trailing axis)."""
    softplus = lambda x: np.log1p(np.exp(-np.abs(x))) + np.maximum(x, 0)
    sigmoid = lambda x: 1 / (1 + np.exp(-x))
    dists = np.diff(z_vals, axis=-1)
    dists = np.concatenate([dists, np.full_like(dists[..., :1], 1e1)], -1)
    dists = dists * np.linalg.norm(rays_d, axis=-1, keepdims=True)
    rgb = sigmoid(raw[..., :3])
    alpha = 1 - np.exp(-softplus(raw[..., 3]) * dists[..., None])
    ones = np.ones_like(alpha[:, :1, :])
    trans = np.cumprod(np.concatenate([ones, 1 - alpha + 1e-10], 1), 1)[:, :-1, :]
    weights = alpha * trans
    rgb_map = (weights[..., None] * rgb).sum(1)  # (R, K, 3)
    rgb_map = np.swapaxes(rgb_map, -1, -2)
    depth = (weights * z_vals[..., None]).sum(1)
    acc = weights.sum(1)
    disp = 1.0 / np.maximum(2e-10, depth / (acc + 1e-10) + 1e-10)
    if white_bkgd:
        rgb_map = rgb_map + (1 - acc[:, None, :])
    return rgb_map, disp, acc, weights, depth


def test_matches_independent_math():
    rng = np.random.RandomState(0)
    R, S, K = 5, 16, 4
    raw = rng.randn(R, S, K, 4).astype(np.float32)
    z_vals = np.sort(rng.rand(R, S).astype(np.float32), -1)
    rays_d = rng.randn(R, 3).astype(np.float32)
    got = raw2outputs(jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d))
    want = reference_composite(raw, z_vals, rays_d)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), w, rtol=2e-4, atol=2e-5)


def test_opaque_first_sample_dominates():
    R, S, K = 2, 8, 3
    raw = np.zeros((R, S, K, 4), np.float32)
    raw[..., 3] = -50.0  # ~zero density
    raw[:, 0, :, 3] = 50.0  # very dense first sample
    raw[:, 0, :, :3] = 3.0  # sigmoid(3) ~ 0.9526
    z_vals = np.tile(np.linspace(0.0, 1.0, S, dtype=np.float32), (R, 1))
    rays_d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (R, 1))
    rgb, disp, acc, w, depth = raw2outputs(
        jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d)
    )
    # first sample absorbs (dist = 1/7): alpha = 1-exp(-50/7) ~ 0.99921
    a0 = 1 - np.exp(-50.0 * (1.0 / 7.0))
    np.testing.assert_allclose(np.asarray(w)[:, 0, :], a0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rgb), 1 / (1 + np.exp(-3.0)) * a0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(depth), 0.0, atol=1e-6)  # z[0] = 0


def test_white_background():
    R, S, K = 2, 4, 2
    raw = np.full((R, S, K, 4), -50.0, np.float32)  # empty space
    z_vals = np.tile(np.linspace(1.0, 2.0, S, dtype=np.float32), (R, 1))
    rays_d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (R, 1))
    rgb, *_ = raw2outputs(
        jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(rays_d), white_bkgd=True
    )
    np.testing.assert_allclose(np.asarray(rgb), 1.0, atol=1e-4)


def test_shapes():
    R, S, K = 3, 128, 32
    raw = jnp.zeros((R, S, K, 4))
    z = jnp.broadcast_to(jnp.linspace(0, 1, S), (R, S))
    d = jnp.ones((R, 3))
    rgb, disp, acc, w, depth = raw2outputs(raw, z, d)
    assert rgb.shape == (R, 3, K)
    assert disp.shape == (R, K) and depth.shape == (R, K) and acc.shape == (R, K)
    assert w.shape == (R, S, K)


def test_composite_weights_grad_finite_at_saturated_alpha():
    """alpha == 1.0 exactly (exp underflow at high density) must yield
    finite gradients — a division-based VJP NaN'd here (round-2 regression
    caught by the e2e test)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cfnerf_tpu.ops.compositing import composite_weights

    alpha = jnp.asarray(np.r_[0.2, 1.0, 0.5, 1.0].astype(np.float32)).reshape(1, 4, 1)
    g = jnp.ones((1, 4, 1))
    grad = jax.grad(lambda a: (composite_weights(a) * g).sum())(alpha)
    assert np.isfinite(np.asarray(grad)).all()

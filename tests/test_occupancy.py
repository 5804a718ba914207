"""Occupancy-grid eval acceleration (ops/occupancy.py).

No reference counterpart (the reference renders every ray with the dense
hardcoded 96+32 schedule, run_nerf_uncertainty_NF.py:510-516); these tests
pin the new capability's semantics instead of golden parity:
  * bake/lookup geometry (conservative dilation included),
  * placement concentrates samples where the grid says surfaces are,
  * a constant grid degrades EXACTLY to the uniform z schedule — so the
    accelerated renderer is a strict generalization of the dense one,
  * the wrapper drops into render_image / lax.map with static shapes.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfnerf_tpu.models.nerf_flows import NeRFFlows
from cfnerf_tpu.ops.occupancy import (
    ProposalMLP,
    aabb_from_rays,
    bake_density_grid,
    distill_proposal,
    grid_lookup,
    make_density_fn,
    make_occ_render_rays,
    make_placed_render_rays,
    make_proposal_sigma_fn,
    occ_z_vals,
    place_from_sigma,
)
from cfnerf_tpu.ops.sampling import sample_z_vals
from cfnerf_tpu.render.renderer import RenderConfig, make_render_rays


def _rays(R=16, seed=0):
    rng = np.random.RandomState(seed)
    ro = jnp.asarray(rng.randn(R, 3) * 0.1, jnp.float32)
    rd = jnp.asarray(
        np.concatenate([rng.randn(R, 2) * 0.05, np.ones((R, 1))], -1), jnp.float32
    )
    return ro, rd


def test_aabb_contains_segment_endpoints():
    ro, rd = _rays()
    near, far = jnp.full((16, 1), 0.5), jnp.full((16, 1), 4.0)
    lo, hi = aabb_from_rays(ro, rd, near, far, pad=0.05)
    p0 = ro + rd * near
    p1 = ro + rd * far
    pts = jnp.concatenate([p0, p1], 0)
    assert bool(jnp.all(pts >= lo)) and bool(jnp.all(pts <= hi))
    # padding is strict
    assert bool(jnp.all(lo < pts.min(0))) and bool(jnp.all(hi > pts.max(0)))


def test_bake_lookup_sphere_and_dilation():
    lo = jnp.array([-1.0, -1.0, -1.0])
    hi = jnp.array([1.0, 1.0, 1.0])

    def density(pts):  # sigma = 5 inside a r=0.5 sphere
        return jnp.where(jnp.linalg.norm(pts, axis=-1) < 0.5, 5.0, 0.0)

    g0 = bake_density_grid(density, lo, hi, resolution=32, chunk=4096, dilate=0)
    g1 = bake_density_grid(density, lo, hi, resolution=32, chunk=4096, dilate=1)
    assert g0.shape == (32, 32, 32)
    inside = jnp.array([[0.0, 0.0, 0.0], [0.3, 0.2, -0.1]])
    outside = jnp.array([[0.9, 0.9, 0.9], [-0.8, 0.0, 0.0]])
    assert bool(jnp.all(grid_lookup(g0, lo, hi, inside) > 1.0))
    assert bool(jnp.all(grid_lookup(g0, lo, hi, outside) == 0.0))
    # dilation only grows occupancy, by about one cell at the boundary
    assert float((g1 > 0).mean()) > float((g0 > 0).mean())
    # one cell past the last occupied center (cell size 2/32 = 0.0625):
    # undilated cell is empty, one 3x3x3 dilation pass reaches it
    just_out = jnp.array([[0.53, 0.0, 0.0]])
    assert float(grid_lookup(g0, lo, hi, just_out)[0]) == 0.0
    assert float(grid_lookup(g1, lo, hi, just_out)[0]) > 1.0
    # out-of-bounds clamps instead of wrapping
    way_out = jnp.array([[5.0, 5.0, 5.0], [-5.0, 0.0, 0.0]])
    assert np.isfinite(np.asarray(grid_lookup(g1, lo, hi, way_out))).all()


def test_occ_z_vals_concentrates_in_occupied_slab():
    R, N = 32, 16
    ro = jnp.zeros((R, 3)).at[:, 0].set(jnp.linspace(-0.3, 0.3, R))
    rd = jnp.zeros((R, 3)).at[:, 2].set(1.0)  # straight +z rays
    near, far = jnp.full((R, 1), 0.0), jnp.full((R, 1), 4.0)
    lo = jnp.array([-1.0, -1.0, 0.0])
    hi = jnp.array([1.0, 1.0, 4.0])
    grid = jnp.zeros((64, 64, 64))
    # occupied slab z in [2.0, 2.5) -> cells 32..39 of the z axis
    grid = grid.at[:, :, 32:40].set(10.0)

    z = occ_z_vals(grid, lo, hi, ro, rd, near, far, N, n_candidates=128, floor=0.01)
    assert z.shape == (R, N)
    assert bool(jnp.all(z[:, 1:] >= z[:, :-1]))  # sorted
    assert bool(jnp.all(z >= 0.0)) and bool(jnp.all(z <= 4.0))
    frac_in = float(((z > 1.9) & (z < 2.6)).mean())
    assert frac_in > 0.8, frac_in

    # empty grid -> the uniform floor places samples across [near, far]
    z_u = occ_z_vals(
        jnp.zeros((64, 64, 64)), lo, hi, ro, rd, near, far, N,
        n_candidates=128, floor=0.01,
    )
    np.testing.assert_allclose(
        np.asarray(z_u), np.broadcast_to(np.linspace(0.0, 4.0, N), (R, N)),
        atol=1e-4,
    )


def test_empty_grid_degrades_to_uniform_schedule():
    """With an empty grid only the uniform floor carries pdf mass, so
    inverse-CDF placement IS the uniform schedule — the accelerated renderer
    strictly generalizes the dense one.  (A CONSTANT positive grid is not
    uniform: transmittance decays along the ray, front-loading the weights —
    that behavior is pinned in test_occ_z_vals_concentrates...)"""
    R, N, K = 8, 16, 4
    model = NeRFFlows(
        net_depth=2, net_width=16, input_ch=63, input_ch_views=27,
        skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=K,
        use_viewdirs=True, type_flows="triangular",
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 90)), is_test=True
    )["params"]

    def model_apply(p, xx, *, is_test, rng):
        return model.apply({"params": p}, xx, is_test=is_test, rng=rng)

    rc = RenderConfig(n_samples=N, perturb=False, use_viewdirs=True, uniform=True)
    base = make_render_rays(model_apply, rc)

    ro, rd = _rays(R)
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    near, far = jnp.full((R, 1), 0.5), jnp.full((R, 1), 4.0)

    lo, hi = aabb_from_rays(ro, rd, near, far)
    grid = jnp.zeros((16, 16, 16))  # empty: placement mass = uniform floor
    # sanity: constant weights -> exactly the uniform z schedule
    z = occ_z_vals(grid, lo, hi, ro, rd, near, far, N, n_candidates=64, floor=0.01)
    z_ref = jnp.broadcast_to(
        sample_z_vals(near, far, N, uniform=True), (R, N)
    )
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), atol=1e-4)

    occ = make_occ_render_rays(base, grid, lo, hi, N, n_candidates=64, floor=0.01)
    out_occ = occ(params, ro, rd, vd, near, far, None, is_test=True)
    out_ref = base(params, ro, rd, vd, near, far, None, is_test=True)
    for key in ("rgb_map", "depth_map", "acc_map"):
        np.testing.assert_allclose(
            np.asarray(out_occ[key]), np.asarray(out_ref[key]),
            atol=2e-3, err_msg=key,
        )


def test_proposal_distills_slab_and_places_like_grid():
    """The proposal MLP distilled from an analytic slab density must place
    samples in the slab like the grid proxy does — the two backends of the
    same placement op (the proposal is the TPU one: matmuls, no gathers)."""
    lo = jnp.array([-1.0, -1.0, 0.0])
    hi = jnp.array([1.0, 1.0, 4.0])

    def density(pts):  # slab z in [2.0, 2.5)
        z = pts[..., 2]
        return jnp.where((z >= 2.0) & (z < 2.5), 10.0, 0.0)

    prop, pparams, dloss = distill_proposal(
        density, lo, hi, jax.random.PRNGKey(0),
        n_points=1 << 15, batch=1 << 11, epochs=4,
    )
    assert dloss < 0.2, dloss  # log1p targets are 0 / log(11) ~ 2.4
    sigma_fn = make_proposal_sigma_fn(prop, pparams, lo, hi)

    R, N = 32, 16
    ro = jnp.zeros((R, 3)).at[:, 0].set(jnp.linspace(-0.3, 0.3, R))
    rd = jnp.zeros((R, 3)).at[:, 2].set(1.0)
    near, far = jnp.full((R, 1), 0.0), jnp.full((R, 1), 4.0)
    z = place_from_sigma(sigma_fn, ro, rd, near, far, N, n_candidates=128)
    assert bool(jnp.all(z[:, 1:] >= z[:, :-1]))
    frac_in = float(((z > 1.8) & (z < 2.7)).mean())
    assert frac_in > 0.7, frac_in


def test_placed_render_rays_matches_occ_wrapper():
    """make_placed_render_rays with a grid-lookup sigma_fn is exactly the
    make_occ_render_rays path — one placement op, two proxies."""
    R, N, K = 8, 16, 4
    model = NeRFFlows(
        net_depth=2, net_width=16, input_ch=63, input_ch_views=27,
        skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=K,
        use_viewdirs=True, type_flows="triangular",
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 90)), is_test=True
    )["params"]

    def model_apply(p, xx, *, is_test, rng):
        return model.apply({"params": p}, xx, is_test=is_test, rng=rng)

    rc = RenderConfig(n_samples=N, perturb=False, use_viewdirs=True)
    base = make_render_rays(model_apply, rc)
    ro, rd = _rays(R)
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    near, far = jnp.full((R, 1), 0.5), jnp.full((R, 1), 4.0)
    lo, hi = aabb_from_rays(ro, rd, near, far)
    grid = jnp.asarray(
        np.exp(np.random.RandomState(3).randn(16, 16, 16)), jnp.float32
    )

    occ = make_occ_render_rays(base, grid, lo, hi, N, n_candidates=64)
    placed = make_placed_render_rays(
        base, lambda pts: grid_lookup(grid, lo, hi, pts), N, n_candidates=64
    )
    out_a = occ(params, ro, rd, vd, near, far, None, is_test=True)
    out_b = placed(params, ro, rd, vd, near, far, None, is_test=True)
    for key in ("rgb_map", "depth_map"):
        np.testing.assert_allclose(
            np.asarray(out_a[key]), np.asarray(out_b[key]), atol=1e-6
        )


def test_density_fn_and_wrapper_in_lax_map():
    """make_density_fn bakes from a real model; the wrapped renderer runs
    under lax.map tiles (the render_image execution shape)."""
    K = 4
    model = NeRFFlows(
        net_depth=2, net_width=16, input_ch=63, input_ch_views=27,
        skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=K,
        use_viewdirs=True, type_flows="triangular",
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((2, 90)), is_test=True
    )["params"]
    rc = RenderConfig(n_samples=8, perturb=False, use_viewdirs=True)

    density_fn = make_density_fn(model, params, rc)
    sig = density_fn(jnp.asarray(np.random.RandomState(0).randn(32, 3), jnp.float32))
    assert sig.shape == (32,)
    assert np.isfinite(np.asarray(sig)).all() and bool(jnp.all(sig >= 0.0))

    lo = jnp.array([-2.0, -2.0, -2.0])
    hi = jnp.array([2.0, 2.0, 2.0])
    grid = bake_density_grid(density_fn, lo, hi, resolution=8, chunk=256, dilate=1)

    def model_apply(p, xx, *, is_test, rng):
        return model.apply({"params": p}, xx, is_test=is_test, rng=rng)

    base = make_render_rays(model_apply, rc)
    occ = make_occ_render_rays(base, grid, lo, hi, 8, n_candidates=32)

    ro, rd = _rays(R=8)
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    near, far = jnp.full((8, 1), 0.5), jnp.full((8, 1), 3.0)
    tiles = tuple(
        x.reshape(2, 4, *x.shape[1:]) for x in (ro, rd, vd, near, far)
    )
    out = jax.lax.map(
        lambda t: occ(params, *t, None, is_test=True), tiles
    )
    assert out["rgb_map"].shape == (2, 4, 3, K)
    assert np.isfinite(np.asarray(out["rgb_map"])).all()

    # train-mode path (stratified placement draws) stays finite too
    out_tr = occ(params, ro, rd, vd, near, far, jax.random.PRNGKey(3), is_test=False)
    assert np.isfinite(np.asarray(out_tr["rgb_map"])).all()


def test_serving_candidates_resolution():
    """EVAL_r17/EVAL_r23 (round 5): serving defaults to C=32 via
    --occ_eval_candidates, independent of the train-side --occ_candidates;
    0 falls back to the train-side flag; legacy args objects without the
    attribute fall back too."""
    from types import SimpleNamespace

    from cfnerf_tpu.ops.occupancy import serving_candidates
    from cfnerf_tpu.utils.config import parse_args

    args = parse_args(["--datadir", "x", "--expname", "e"])
    assert args.occ_candidates == 128        # train-side default
    assert serving_candidates(args) == 32    # serving default (EVAL_r17/r23)

    args = parse_args(["--datadir", "x", "--expname", "e",
                       "--occ_eval_candidates", "96"])
    assert serving_candidates(args) == 96

    args = parse_args(["--datadir", "x", "--expname", "e",
                       "--occ_eval_candidates", "0",
                       "--occ_candidates", "192"])
    assert serving_candidates(args) == 192   # explicit fallback

    legacy = SimpleNamespace(occ_candidates=128)
    assert serving_candidates(legacy) == 128

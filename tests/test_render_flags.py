"""Renderer flag-combination smoke matrix.

Every RenderConfig surface the CLI can reach must produce finite,
correctly-shaped outputs in BOTH train and test mode — including the
use_viewdirs=False path (which CRASHES in the reference:
run_nerf_uncertainty_NF.py:322-325 never sets embeddirs_fn and
models.py:64 reads an unset output_ch; implemented here as intended).
"""
import itertools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfnerf_tpu.models.nerf_flows import NeRFFlows
from cfnerf_tpu.render.renderer import RenderConfig, make_render_rays

R, S, K = 8, 16, 4


def _run(use_viewdirs, lindisp, uniform, white_bkgd, n_importance, is_test):
    in_views = 27 if use_viewdirs else 0
    model = NeRFFlows(
        net_depth=2, net_width=16, input_ch=63, input_ch_views=in_views,
        skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=K,
        use_viewdirs=use_viewdirs, type_flows="triangular",
    )
    rc = RenderConfig(
        n_samples=S, n_importance=n_importance, perturb=True,
        lindisp=lindisp, use_viewdirs=use_viewdirs, white_bkgd=white_bkgd,
        uniform=uniform, multires=10, multires_views=4,
    )
    x = jnp.zeros((2, 63 + in_views))
    # raw params even with n_importance > 0: no fine apply is passed, so the
    # renderer runs the shared-net hierarchical path (--N_importance_eval
    # semantics); pair params are reserved for a real coarse/fine net pair.
    params = model.init(jax.random.PRNGKey(0), x, is_test=True)["params"]

    def model_apply(p, xx, *, is_test, rng):
        return model.apply({"params": p}, xx, is_test=is_test, rng=rng)

    rr = make_render_rays(model_apply, rc)
    rng = np.random.RandomState(0)
    ro = jnp.asarray(rng.randn(R, 3), jnp.float32)
    rd = jnp.asarray(
        np.concatenate([rng.randn(R, 2) * 0.05, -np.ones((R, 1))], -1), jnp.float32
    )
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True) if use_viewdirs else None
    out = rr(params, ro, rd, vd, jnp.full((R, 1), 0.5), jnp.full((R, 1), 4.0),
             None if is_test else jax.random.PRNGKey(1), is_test=is_test)
    return out


@pytest.mark.parametrize(
    "use_viewdirs,lindisp,uniform,white_bkgd,n_importance",
    [
        combo
        for combo in itertools.product(
            (True, False), (False, True), (False, True), (False, True), (0, 4)
        )
        # keep the matrix affordable: vary one dim off-default at a time,
        # plus the all-default and one all-on combo
        if sum((combo[0] is False, combo[1], combo[2], combo[3], combo[4] > 0)) <= 1
    ] + [(False, True, True, True, 4)],
)
@pytest.mark.parametrize("is_test", [False, True])
def test_render_flag_combo(use_viewdirs, lindisp, uniform, white_bkgd,
                           n_importance, is_test):
    out = _run(use_viewdirs, lindisp, uniform, white_bkgd, n_importance, is_test)
    S_total = S + n_importance
    assert out["rgb_map"].shape == (R, 3, K)
    assert out["disp_map"].shape == (R, K)
    assert out["depth_map"].shape == (R, K)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), f"non-finite {k}"
    if not is_test:
        assert out["weights"].shape == (R, S_total, K)
    if n_importance > 0:
        assert out["rgb0"].shape == (R, 3, K)

"""Fused Pallas trunk kernel vs the flax (XLA) encode path.

Forward values and ALL parameter gradients must match (interpret mode on
CPU; both paths run the same bf16 matmul precision so tolerances are bf16-
scale).  Input cotangents are zero by design (inputs are data).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfnerf_tpu.models.nerf_flows import NeRFFlows
from cfnerf_tpu.ops.pallas.trunk import pallas_encode, supported

DEPTH, WIDTH = 4, 256
IN_CH, V_CH = 63, 27
HA, HR = 64, 64


def _model(trunk_impl="xla"):
    return NeRFFlows(
        net_depth=DEPTH, net_width=WIDTH, input_ch=IN_CH, input_ch_views=V_CH,
        skips=(DEPTH // 2,), h_alpha_size=HA, h_rgb_size=HR, n_flows=2,
        k_samples=4, use_viewdirs=True, type_flows="triangular",
        compute_dtype=jnp.bfloat16,
    )


@pytest.fixture(scope="module")
def setup():
    model = _model()
    x = jnp.asarray(np.random.RandomState(0).randn(96, IN_CH + V_CH), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:2], is_test=True)["params"]
    return model, params, x


def _trunk_subtree(params):
    keys = [f"pts_linear_{i}" for i in range(DEPTH)] + [
        "feature_linear", "views_linear", "h_alpha_linear", "h_rgb_linear",
    ]
    return {k: params[k] for k in keys}


def test_supported():
    assert supported(8, 512, True)
    assert not supported(8, 512, False)
    assert not supported(8, 300, True)
    # depth=2 has no skip+1 slot (skip+1 == depth) — packing would KeyError
    assert not supported(2, 256, True)


def test_forward_matches_flax(setup):
    model, params, x = setup
    ha_ref, hr_ref = model.apply({"params": params}, x, method=model.encode)
    ha, hr = pallas_encode(
        _trunk_subtree(params), x, depth=DEPTH, width=WIDTH,
        input_ch=IN_CH, views_ch=V_CH, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(ha), np.asarray(ha_ref),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(hr), np.asarray(hr_ref),
                               rtol=2e-2, atol=2e-2)


def test_grads_match_f32_truth(setup):
    """Parameter gradients vs the FULL-f32 flax encode.  Measured: the
    kernel (f32 accumulators, one bf16 rounding per dot) tracks f32 truth
    tighter than the bf16 flax path itself (whose layer-0 kernel grad sits
    at ~6% relative RMS from f32); bound both at bf16 noise scale."""
    _, params, x = setup
    model32 = _model().clone(compute_dtype=jnp.float32)

    def loss_f32(p):
        ha, hr = model32.apply({"params": p}, x, method=model32.encode)
        return (jnp.sin(ha * 0.3)).sum() + (hr ** 2).sum() * 0.1

    def loss_pallas(p):
        ha, hr = pallas_encode(
            _trunk_subtree(p), x, depth=DEPTH, width=WIDTH,
            input_ch=IN_CH, views_ch=V_CH, interpret=True,
        )
        return (jnp.sin(ha * 0.3)).sum() + (hr ** 2).sum() * 0.1

    def loss_bf16(p):
        ha, hr = model32.clone(compute_dtype=jnp.bfloat16).apply(
            {"params": p}, x, method=model32.encode
        )
        return (jnp.sin(ha * 0.3)).sum() + (hr ** 2).sum() * 0.1

    g_ref = jax.grad(loss_f32)(params)
    g_b16 = jax.grad(loss_bf16)(params)
    g_pal = jax.grad(loss_pallas)(params)
    for key in _trunk_subtree(params):
        for leaf in ("kernel", "bias"):
            a = np.asarray(g_ref[key][leaf]).ravel()
            rms = np.sqrt(np.mean(a ** 2)) + 1e-12
            err_pal = np.sqrt(np.mean((np.asarray(g_pal[key][leaf]).ravel() - a) ** 2)) / rms
            err_b16 = np.sqrt(np.mean((np.asarray(g_b16[key][leaf]).ravel() - a) ** 2)) / rms
            # the kernel's bf16 noise must be no worse than the existing
            # bf16 flax path's (deep layers amplify rounding; layer-0
            # kernel sits ~6-8% from f32 truth for BOTH)
            assert err_pal < max(1.5 * err_b16, 0.02), (
                f"{key}/{leaf}: pallas relRMS {err_pal:.4f} vs bf16-flax {err_b16:.4f}"
            )
            b = np.asarray(g_pal[key][leaf]).ravel()
            cos = np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12)
            assert cos > 0.995, f"grad direction mismatch at {key}/{leaf}: {cos:.5f}"


def test_row_padding(setup):
    """B not a multiple of the tile size pads and slices correctly."""
    model, params, x = setup
    x_odd = x[:77]
    ha_ref, hr_ref = model.apply({"params": params}, x_odd, method=model.encode)
    ha, hr = pallas_encode(
        _trunk_subtree(params), x_odd, depth=DEPTH, width=WIDTH,
        input_ch=IN_CH, views_ch=V_CH, interpret=True,
    )
    assert ha.shape == (77, HA) and hr.shape == (77, HR)
    np.testing.assert_allclose(np.asarray(ha), np.asarray(ha_ref),
                               rtol=2e-2, atol=2e-2)


def test_unsupported_config_raises():
    """An explicit trunk_impl choice must never silently fall back to XLA
    (same policy as the flag audit)."""
    model = NeRFFlows(
        net_depth=4, net_width=300, input_ch=IN_CH, input_ch_views=V_CH,
        skips=(2,), h_alpha_size=HA, h_rgb_size=HR, n_flows=2, k_samples=4,
        use_viewdirs=True, type_flows="triangular", trunk_impl="interpret",
    )
    x = jnp.zeros((4, IN_CH + V_CH))
    params = model.init(jax.random.PRNGKey(0), x, is_test=True)["params"]
    with pytest.raises(ValueError, match="trunk_impl"):
        model.apply({"params": params}, x, method=model.encode)

"""Baseline model family (--model nerf / nerf_dropout / nerf_wild).

The reference ships these as dead code (run_nerf_helpers.py:76-284, never
instantiated); here they run end-to-end through the shared K-sample
pipeline.  Checks: forwards, uncertainty semantics (dropout draws differ,
eval is deterministic; wild std scales draws), one train step per family,
and the factory dispatch from the --model flag.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfnerf_tpu.models.baseline_adapter import KSampleBaseline


def _mk(kind, K=4):
    model = KSampleBaseline(
        kind=kind, k_samples=K, net_depth=2, net_width=16,
        input_ch=63, input_ch_views=27, skips=(1,),
    )
    x = jnp.zeros((3, 90))
    params = model.init(jax.random.PRNGKey(0), x, is_test=True)["params"]
    return model, params


def test_nerf_k_identical_draws():
    model, params = _mk("nerf")
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 90))
    raw, extra = model.apply({"params": params}, x, is_test=False,
                             rng=jax.random.PRNGKey(2))
    assert raw.shape == (5, 4, 4)
    np.testing.assert_allclose(np.asarray(raw.std(axis=1)), 0.0, atol=1e-7)


def test_dropout_draws_differ_and_eval_deterministic():
    model, params = _mk("nerf_dropout")
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 90))
    raw, _ = model.apply({"params": params}, x, is_test=False,
                         rng=jax.random.PRNGKey(2))
    assert float(raw.std(axis=1).mean()) > 0  # epistemic spread over K
    # MC-dropout eval: dropout ACTIVE but with fixed keys -> deterministic
    t1, _ = model.apply({"params": params}, x, is_test=True)
    t2, _ = model.apply({"params": params}, x, is_test=True)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t2))
    assert float(t1.std(axis=1).mean()) > 0


def test_wild_std_scales_spread_and_mean_sample_last():
    model, params = _mk("nerf_wild")
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 90))
    raw, _ = model.apply({"params": params}, x, is_test=True)
    assert raw.shape == (5, 4, 4)
    # last draw is the mean sample: rgb equals the mu head exactly for every
    # choice of the other eps rows
    eps = jax.random.normal(jax.random.PRNGKey(9), (4, 3)) * 10.0
    raw2, _ = model.apply({"params": params}, x, is_test=True, eps=eps)
    np.testing.assert_allclose(
        np.asarray(raw[:, -1, :3]), np.asarray(raw2[:, -1, :3]), atol=1e-6
    )


@pytest.mark.parametrize("kind", ["nerf", "nerf_dropout", "nerf_wild"])
def test_baseline_train_step(kind):
    from cfnerf_tpu.models.factory import loss_mode_for_model
    from cfnerf_tpu.render.renderer import RenderConfig
    from cfnerf_tpu.train.step import TrainConfig, make_train_step

    model, params = _mk(kind)
    rc = RenderConfig(n_samples=8, perturb=True, use_viewdirs=True)
    tc = TrainConfig(H=4, W=4, focal=5.0, ndc=False, near=0.5, far=2.0,
                     k_samples=4, beta1=0.0, loss_mode=loss_mode_for_model(kind))
    step, tx = make_train_step(model, rc, tc)
    opt_state = tx.init(params)
    R = 8
    batch = {
        "rays_o": jnp.zeros((R, 3)),
        "rays_d": jnp.concatenate([jnp.full((R, 2), 0.1), -jnp.ones((R, 1))], -1),
        "target": jnp.full((R, 3), 0.5),
    }
    p2, _, metrics = step(params, opt_state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    moved = jax.tree_util.tree_map(lambda a, c: float(jnp.abs(a - c).max()), params, p2)
    assert max(jax.tree_util.tree_leaves(moved)) > 0


def test_factory_dispatch():
    from types import SimpleNamespace

    from cfnerf_tpu.models.baseline_adapter import KSampleBaseline as KSB
    from cfnerf_tpu.models.factory import build_model
    from cfnerf_tpu.models.nerf_flows import NeRFFlows

    base = dict(
        multires=10, multires_views=4, i_embed=0, use_viewdirs=True,
        netdepth=2, netwidth=16, netdepth_fine=2, netwidth_fine=16,
        h_alpha_size=8, h_rgb_size=8, n_flows=2, K_samples=4,
        type_flows="triangular", N_importance=0, N_samples=8,
        perturb=1.0, white_bkgd=False, raw_noise_std=0.0,
    )
    m, _, _ = build_model(SimpleNamespace(**base, model=None))
    assert isinstance(m, NeRFFlows)
    m, _, _ = build_model(SimpleNamespace(**base, model="nerf_dropout"))
    assert isinstance(m, KSB) and m.kind == "nerf_dropout"


def test_hierarchical_mse_mode_trains_coarse():
    """--model nerf + N_importance: the coarse loss must be MSE (a KDE NLL
    on identical K draws has zero gradient — the coarse net would never
    train and importance sampling would stay random)."""
    from cfnerf_tpu.render.renderer import RenderConfig
    from cfnerf_tpu.train.step import TrainConfig, make_train_step

    coarse, params_c = _mk("nerf")
    fine, params_f = _mk("nerf")
    rc = RenderConfig(n_samples=8, n_importance=4, perturb=True,
                      use_viewdirs=True)
    tc = TrainConfig(H=4, W=4, focal=5.0, ndc=False, near=0.5, far=2.0,
                     k_samples=4, beta1=0.0, loss_mode="mse")
    step, tx = make_train_step(coarse, rc, tc, model_fine=fine)
    params = {"coarse": params_c, "fine": params_f}
    opt_state = tx.init(params)
    R = 8
    batch = {
        "rays_o": jnp.zeros((R, 3)),
        "rays_d": jnp.concatenate([jnp.full((R, 2), 0.1), -jnp.ones((R, 1))], -1),
        "target": jnp.full((R, 3), 0.5),
    }
    p2, _, metrics = step(params, opt_state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    moved_coarse = max(
        jax.tree_util.tree_leaves(jax.tree_util.tree_map(
            lambda a, c: float(jnp.abs(a - c).max()), params["coarse"], p2["coarse"]
        ))
    )
    assert moved_coarse > 0, "coarse network received no gradient"


def test_std_over_k_conventions():
    """Map convention = np.std (ddof=0) * n/(n-1) exactly as the reference
    logs/exports (run_nerf_uncertainty_NF.py:1129-1131, :1166-1168); K=1
    yields zeros, not NaN."""
    from cfnerf_tpu.ops.metrics import std_over_k

    rng = np.random.RandomState(0)
    x = rng.rand(5, 3, 8).astype(np.float32)
    n = x.shape[-1]
    ref = np.std(x, -1) * n / (n - 1)  # the reference's exact expression
    np.testing.assert_allclose(std_over_k(x), ref, rtol=1e-6)
    one = std_over_k(rng.rand(5, 3, 1).astype(np.float32))
    assert one.shape == (5, 3) and np.all(one == 0.0)


def test_stochastic_baselines_require_rng_in_train():
    """Same contract as NeRFFlows: training a stochastic baseline without a
    key must raise, not silently freeze the dropout masks / eps draws."""
    x = jnp.zeros((3, 90))
    for kind in ("nerf_dropout", "nerf_wild"):
        model, params = _mk(kind)
        with pytest.raises(ValueError, match="rng"):
            model.apply({"params": params}, x, is_test=False)
    # the deterministic baseline needs no key
    model, params = _mk("nerf")
    model.apply({"params": params}, x, is_test=False)

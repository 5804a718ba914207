import jax
import jax.numpy as jnp
import numpy as np

from cfnerf_tpu.models.nerf_flows import NeRFFlows


def _model(**kw):
    defaults = dict(
        net_depth=4, net_width=32, input_ch=63, input_ch_views=27,
        skips=(2,), h_alpha_size=8, h_rgb_size=8, n_flows=4, k_samples=8,
        use_viewdirs=True,
    )
    defaults.update(kw)
    return NeRFFlows(**defaults)


def _embedded(B=6):
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randn(B, 63 + 27).astype(np.float32))


def test_train_forward_shapes_and_entropy():
    model = _model()
    x = _embedded()
    params = model.init(jax.random.PRNGKey(0), x, is_test=True)
    raw, ent = model.apply(params, x, is_test=False, rng=jax.random.PRNGKey(1))
    assert raw.shape == (6, 8, 4)
    assert ent.shape == ()
    assert np.isfinite(np.asarray(raw)).all()
    assert np.isfinite(float(ent))


def test_test_mode_deterministic_and_entropy_zero():
    model = _model()
    x = _embedded()
    params = model.init(jax.random.PRNGKey(0), x, is_test=True)
    raw1, ent1 = model.apply(params, x, is_test=True)
    raw2, ent2 = model.apply(params, x, is_test=True)
    np.testing.assert_allclose(np.asarray(raw1), np.asarray(raw2))
    assert float(ent1) == 0.0 and float(ent2) == 0.0


def test_train_eps_shared_across_points_changes_with_rng():
    model = _model(type_flows="no_flow")
    x = _embedded()
    params = model.init(jax.random.PRNGKey(0), x, is_test=True)
    raw_a, _ = model.apply(params, x, is_test=False, rng=jax.random.PRNGKey(1))
    raw_b, _ = model.apply(params, x, is_test=False, rng=jax.random.PRNGKey(2))
    # with no_flow, raw = eps*std + mean broadcast over points: identical
    # across the batch axis (shared-K eps, models.py:234,246)...
    np.testing.assert_allclose(np.asarray(raw_a[0]), np.asarray(raw_a[3]), atol=1e-6)
    # ...but different for different rng keys
    assert np.abs(np.asarray(raw_a) - np.asarray(raw_b)).max() > 1e-3


def test_test_mode_last_sample_is_mean():
    # with no_flow, the last K draw must equal the base mean (eps zeroed)
    model = _model(type_flows="no_flow")
    x = _embedded()
    params = model.init(jax.random.PRNGKey(0), x, is_test=True)
    raw, _ = model.apply(params, x, is_test=True)
    # init: rgb_mean = zeros, alpha_mean = zeros
    np.testing.assert_allclose(np.asarray(raw[:, -1, :]), 0.0, atol=1e-6)


def test_entropy_decreases_when_std_shrinks():
    """Narrower base distribution -> lower entropy term (sanity of sign)."""
    model = _model(type_flows="no_flow")
    x = _embedded()
    params = model.init(jax.random.PRNGKey(0), x, is_test=True)

    def set_std(p, v):
        p = jax.tree_util.tree_map(lambda a: a, p)  # copy
        p["params"]["alpha_std"] = jnp.full_like(p["params"]["alpha_std"], v)
        p["params"]["rgb_std"] = jnp.full_like(p["params"]["rgb_std"], v)
        return p

    _, ent_wide = model.apply(set_std(params, 1.0), x, is_test=False, rng=jax.random.PRNGKey(1))
    _, ent_narrow = model.apply(set_std(params, 0.1), x, is_test=False, rng=jax.random.PRNGKey(1))
    # entropy term = E[log q0] - E[log det]; shrinking sigma raises log q0
    assert float(ent_narrow) > float(ent_wide)


def test_no_viewdirs_mode_runs():
    model = _model(use_viewdirs=False, input_ch_views=0)
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(5, 63).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, is_test=True)
    raw, ent = model.apply(params, x, is_test=False, rng=jax.random.PRNGKey(1))
    assert raw.shape == (5, 8, 4)


def test_diagnostics_sample_and_interpolation():
    model = _model()
    x = _embedded()
    params = model.init(jax.random.PRNGKey(0), x, is_test=True)
    s = model.apply(params, x, method=model.sample)
    assert s.shape == (6, 8, 1)
    interp = model.apply(params, x, method=model.interpolation)
    assert interp.shape == (6, 21, 4)

import jax
import jax.numpy as jnp
import numpy as np

from cfnerf_tpu.flows.iaf import IAFNeRF, IAFStep, input_mask, output_mask
from cfnerf_tpu.models.nerf_flows import NeRFFlows


def test_made_masks_autoregressive():
    Z, H = 3, 16
    mi = input_mask(Z, H)    # (Z, H)
    mo = output_mask(Z, H)   # (H, Z)
    # composed dependency: out o on input i iff any hidden j connects both
    dep = (mi @ mo) > 0  # (Z, Z): dep[i, o] = output o depends on input i
    for o in range(Z):
        for i in range(Z):
            if i >= o:  # strictly autoregressive: o depends only on i < o
                assert not dep[i, o], f"output {o} illegally depends on input {i}"
    # and lower-triangular deps exist for o > 0
    assert dep[0, 1] and dep[0, 2] and dep[1, 2]


def test_iaf_logdet_matches_autodiff():
    Z, H = 3, 16
    step = IAFStep(Z, H)
    rng = np.random.RandomState(0)
    ctx = jnp.asarray(rng.randn(1, H).astype(np.float32))
    z0 = jnp.asarray(rng.randn(Z).astype(np.float32))
    params = step.init(jax.random.PRNGKey(0), z0[None, None, :], ctx)

    def f(zvec):
        z, _ = step.apply(params, zvec[None, None, :], ctx)
        return z[0, 0]

    _, ld = step.apply(params, z0[None, None, :], ctx)
    jac = jax.jacfwd(f)(z0)
    _, want = jnp.linalg.slogdet(jac)
    np.testing.assert_allclose(float(ld[0, 0]), float(want), atol=1e-4)


def test_iaf_stack_shapes():
    Z, F = 3, 4
    flow = IAFNeRF(Z, F, h_size=16)
    rng = np.random.RandomState(1)
    z0 = jnp.asarray(rng.randn(5, 7, Z).astype(np.float32))
    ctx = jnp.asarray(rng.randn(5, 11).astype(np.float32))  # any ctx width
    params = flow.init(jax.random.PRNGKey(0), z0, ctx)
    z, ldj = flow.apply(params, z0, ctx)
    assert z.shape == (5, 7, Z) and ldj.shape == (5, 7)
    assert np.isfinite(np.asarray(ldj)).all()
    z2, ldj2 = flow.apply(params, z0, ctx, False)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z2))
    np.testing.assert_allclose(np.asarray(ldj2), 0.0)


def test_nerf_flows_iaf_family():
    model = NeRFFlows(
        net_depth=2, net_width=32, input_ch=63, input_ch_views=27,
        skips=(1,), h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=4,
        type_flows="IAF",
    )
    x = jnp.asarray(np.random.RandomState(2).randn(6, 90).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, is_test=True)
    raw, ent = model.apply(params, x, is_test=False, rng=jax.random.PRNGKey(1))
    assert raw.shape == (6, 4, 4)
    assert np.isfinite(float(ent))

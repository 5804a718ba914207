import jax
import jax.numpy as jnp
import numpy as np

from cfnerf_tpu.ops.sampling import (
    cf_nerf_t_vals,
    sample_pdf,
    sample_z_vals,
    stratified_perturb,
)


def test_cf_nerf_schedule_128():
    t = np.asarray(cf_nerf_t_vals(128))
    assert t.shape == (128,)
    # 96 points uniformly in [0, 0.5), then 32 in [0.5, 1]
    np.testing.assert_allclose(t[:96], np.linspace(0, 0.5, 97)[:-1], atol=1e-7)
    np.testing.assert_allclose(t[96:], np.linspace(0.5, 1.0, 32), atol=1e-7)
    assert t[0] == 0.0 and t[-1] == 1.0


def test_z_vals_linear_and_lindisp():
    near, far = jnp.array([[2.0]]), jnp.array([[6.0]])
    z = sample_z_vals(near, far, 128)
    assert z.shape == (1, 128)
    np.testing.assert_allclose(float(z[0, 0]), 2.0, atol=1e-6)
    np.testing.assert_allclose(float(z[0, -1]), 6.0, atol=1e-6)
    zl = sample_z_vals(near, far, 128, lindisp=True)
    np.testing.assert_allclose(float(zl[0, 0]), 2.0, atol=1e-5)
    np.testing.assert_allclose(float(zl[0, -1]), 6.0, atol=1e-5)
    # lindisp midpoint (t=0.5 at index 96): 1/(0.5/2 + 0.5/6) = 3
    np.testing.assert_allclose(float(zl[0, 96]), 3.0, atol=1e-5)


def test_stratified_within_bins():
    z = sample_z_vals(jnp.array([[0.0]]), jnp.array([[1.0]]), 128)
    z = jnp.broadcast_to(z, (16, 128))
    zp = stratified_perturb(z, jax.random.PRNGKey(0))
    assert zp.shape == z.shape
    z_np, zp_np = np.asarray(z), np.asarray(zp)
    mids = 0.5 * (z_np[:, 1:] + z_np[:, :-1])
    upper = np.concatenate([mids, z_np[:, -1:]], -1)
    lower = np.concatenate([z_np[:, :1], mids], -1)
    assert (zp_np >= lower - 1e-7).all() and (zp_np <= upper + 1e-7).all()
    # monotone along ray
    assert (np.diff(zp_np, axis=-1) > -1e-7).all()


def test_sample_pdf_deterministic_uniform():
    bins = jnp.linspace(0.0, 1.0, 9)[None].repeat(4, 0)  # (4, 9)
    weights = jnp.ones((4, 8))
    s = sample_pdf(bins, weights, 16, det=True)
    assert s.shape == (4, 16)
    s_np = np.asarray(s)
    assert (np.diff(s_np, axis=-1) >= -1e-6).all()
    np.testing.assert_allclose(s_np[:, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(s_np[:, -1], 1.0, atol=1e-5)


def test_sample_pdf_concentrates_mass():
    # all the mass in bin 3 of 8 -> samples land in [3/8, 4/8]
    bins = jnp.linspace(0.0, 1.0, 9)[None].repeat(2, 0)
    weights = jnp.zeros((2, 8)).at[:, 3].set(100.0)
    s = np.asarray(sample_pdf(bins, weights, 32, jax.random.PRNGKey(1)))
    frac_inside = ((s >= 3 / 8 - 1e-3) & (s <= 4 / 8 + 1e-3)).mean()
    assert frac_inside > 0.95

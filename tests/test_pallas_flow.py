"""Fused Pallas flow-stack kernel vs the XLA reference implementation:
forward outputs AND custom-VJP gradients must match (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cfnerf_tpu.flows.sylvester import triangular_sylvester_stack
from cfnerf_tpu.ops.pallas.flow_stack import fused_flow_stack


def _inputs(B=16, K=8, Z=3, F=4, seed=0):
    rng = np.random.RandomState(seed)
    triu = np.triu(np.ones((Z, Z), np.float32), 1)
    eye = np.eye(Z, dtype=np.float32)
    full = rng.randn(B, Z, Z, F).astype(np.float32)
    d1 = np.tanh(rng.randn(B, Z, F)).astype(np.float32)
    d2 = np.tanh(rng.randn(B, Z, F)).astype(np.float32)
    r1 = full * triu[None, :, :, None] + eye[None, :, :, None] * d1[:, :, None, :]
    r2 = (np.swapaxes(full, 1, 2) * triu[None, :, :, None]
          + eye[None, :, :, None] * d2[:, :, None, :])
    b = rng.randn(B, Z, F).astype(np.float32)
    z0 = rng.randn(B, K, Z).astype(np.float32)
    return map(jnp.asarray, (z0, r1, r2, b))


@pytest.mark.parametrize("Z", [1, 3])
def test_forward_matches_xla(Z):
    z0, r1, r2, b = _inputs(Z=Z)
    z_ref, ldj_ref = triangular_sylvester_stack(z0, r1, r2, b)
    z_pal, ldj_pal = fused_flow_stack(z0, r1, r2, b, True, True)
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj_pal), np.asarray(ldj_ref), rtol=1e-5, atol=1e-5)


def test_forward_no_logdet():
    z0, r1, r2, b = _inputs()
    z_pal, ldj = fused_flow_stack(z0, r1, r2, b, False, True)
    z_ref, _ = triangular_sylvester_stack(z0, r1, r2, b, compute_log_det=False)
    np.testing.assert_allclose(np.asarray(z_pal), np.asarray(z_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ldj), 0.0)


@pytest.mark.parametrize("Z", [1, 3])
def test_gradients_match_xla(Z):
    z0, r1, r2, b = _inputs(Z=Z, seed=1)

    def loss_xla(z0, r1, r2, b):
        z, ldj = triangular_sylvester_stack(z0, r1, r2, b)
        return (jnp.sin(z) * z).sum() + 0.7 * (ldj ** 2).sum()

    def loss_pal(z0, r1, r2, b):
        z, ldj = fused_flow_stack(z0, r1, r2, b, True, True)
        return (jnp.sin(z) * z).sum() + 0.7 * (ldj ** 2).sum()

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(z0, r1, r2, b)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(z0, r1, r2, b)
    for name, gr, gp in zip(("z0", "r1", "r2", "b"), g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), rtol=1e-4, atol=1e-4,
            err_msg=f"grad mismatch for {name}",
        )
    # the XLA grads zero out strictly-lower entries only because the inputs
    # construction masks them; the kernel's upper-only accumulation must
    # produce zeros there by construction:
    g_r1 = np.asarray(g_pal[1])
    for i in range(Z):
        for j in range(i):
            np.testing.assert_allclose(g_r1[:, i, j, :], 0.0)


def test_values_and_grads_vs_loss_pipeline():
    """Full chain: flow stack -> softplus correction -> entropy-ish reduction."""
    z0, r1, r2, b = _inputs(B=8, K=4, Z=3, F=2, seed=2)

    def pipeline(stack_fn, r1, r2, b):
        z, ldj = stack_fn(z0, r1, r2, b)
        ldj = ldj + (z - 2 * jax.nn.softplus(z)).sum(-1)
        return -(ldj.mean())

    f_ref = lambda r1, r2, b: pipeline(
        lambda *a: triangular_sylvester_stack(*a), r1, r2, b)
    f_pal = lambda r1, r2, b: pipeline(
        lambda z0_, r1_, r2_, b_: fused_flow_stack(z0_, r1_, r2_, b_, True, True),
        r1, r2, b)

    np.testing.assert_allclose(float(f_pal(r1, r2, b)), float(f_ref(r1, r2, b)), rtol=1e-5)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(r1, r2, b)
    g_pal = jax.grad(f_pal, argnums=(0, 1, 2))(r1, r2, b)
    for gr, gp in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gr), rtol=1e-4, atol=1e-5)

import jax
import jax.numpy as jnp
import numpy as np

from cfnerf_tpu.flows.amortized import AmortizedTriangularSylvester
from cfnerf_tpu.flows.sylvester import (
    planar_step,
    triangular_sylvester_step,
    triangular_sylvester_stack,
)


def _random_triangular(rng, B, Z):
    full = rng.randn(B, Z, Z).astype(np.float32)
    triu = np.triu(np.ones((Z, Z), np.float32), 1)
    diag1 = np.tanh(rng.randn(B, Z)).astype(np.float32)
    diag2 = np.tanh(rng.randn(B, Z)).astype(np.float32)
    r1 = full * triu + np.eye(Z, dtype=np.float32) * diag1[:, :, None]
    r2 = np.swapaxes(full, 1, 2) * triu + np.eye(Z, dtype=np.float32) * diag2[:, :, None]
    b = rng.randn(B, Z).astype(np.float32)
    return jnp.asarray(r1), jnp.asarray(r2), jnp.asarray(b)


def _autodiff_logdet(step_fn, z0):
    """log|det dz'/dz| via jacfwd for a single (Z,) point."""
    jac = jax.jacfwd(step_fn)(z0)
    sign, logdet = jnp.linalg.slogdet(jac)
    return logdet


def test_logdet_matches_autodiff():
    rng = np.random.RandomState(0)
    for Z in (1, 3):
        for flip in (False, True):
            r1, r2, b = _random_triangular(rng, 1, Z)
            z0 = jnp.asarray(rng.randn(Z).astype(np.float32))

            def step(zvec):
                z, _ = triangular_sylvester_step(
                    zvec[None, None, :], r1, r2, b, flip=flip
                )
                return z[0, 0]

            _, ld = triangular_sylvester_step(z0[None, None, :], r1, r2, b, flip=flip)
            want = _autodiff_logdet(step, z0)
            np.testing.assert_allclose(float(ld[0, 0]), float(want), atol=1e-4)


def test_stack_logdet_accumulates():
    rng = np.random.RandomState(1)
    Z, F, B, K = 3, 4, 2, 5
    r1s, r2s, bs = [], [], []
    for _ in range(F):
        r1, r2, b = _random_triangular(rng, B, Z)
        r1s.append(r1)
        r2s.append(r2)
        bs.append(b)
    r1 = jnp.stack(r1s, -1)
    r2 = jnp.stack(r2s, -1)
    b = jnp.stack(bs, -1)
    z0 = jnp.asarray(rng.randn(B, K, Z).astype(np.float32))

    z, ldj = triangular_sylvester_stack(z0, r1, r2, b)
    assert z.shape == (B, K, Z) and ldj.shape == (B, K)

    # compare one (b, k) element against the chained single-point autodiff
    bi, ki = 1, 3

    def chain(zvec):
        zz = zvec[None, None, :]
        for k in range(F):
            zz, _ = triangular_sylvester_step(
                zz, r1[bi : bi + 1, ..., k], r2[bi : bi + 1, ..., k],
                b[bi : bi + 1, :, k], flip=(k % 2 == 1),
            )
        return zz[0, 0]

    want = _autodiff_logdet(chain, z0[bi, ki])
    np.testing.assert_allclose(float(ldj[bi, ki]), float(want), atol=1e-3)


def test_no_logdet_shortpath_same_output():
    rng = np.random.RandomState(2)
    Z, F, B, K = 3, 4, 3, 4
    r1 = jnp.stack([_random_triangular(rng, B, Z)[0] for _ in range(F)], -1)
    r2 = jnp.stack([_random_triangular(rng, B, Z)[1] for _ in range(F)], -1)
    b = jnp.stack([_random_triangular(rng, B, Z)[2] for _ in range(F)], -1)
    z0 = jnp.asarray(rng.randn(B, K, Z).astype(np.float32))
    z_a, ld_a = triangular_sylvester_stack(z0, r1, r2, b, compute_log_det=True)
    z_b, ld_b = triangular_sylvester_stack(z0, r1, r2, b, compute_log_det=False)
    np.testing.assert_allclose(np.asarray(z_a), np.asarray(z_b), atol=1e-6)
    np.testing.assert_allclose(np.asarray(ld_b), 0.0)


def test_planar_logdet_matches_autodiff():
    rng = np.random.RandomState(3)
    Z = 3
    u = jnp.asarray(rng.randn(1, Z).astype(np.float32))
    w = jnp.asarray(rng.randn(1, Z).astype(np.float32))
    b = jnp.asarray(rng.randn(1).astype(np.float32))
    z0 = jnp.asarray(rng.randn(Z).astype(np.float32))

    def step(zvec):
        z, _ = planar_step(zvec[None, None, :], u, w, b)
        return z[0, 0]

    _, ld = planar_step(z0[None, None, :], u, w, b)
    want = _autodiff_logdet(step, z0)
    np.testing.assert_allclose(float(ld[0, 0]), float(want), atol=1e-4)


def test_amortized_shapes_and_triangularity():
    Z, F, B, h = 3, 4, 7, 16
    mod = AmortizedTriangularSylvester(Z, F)
    h_in = jnp.asarray(np.random.RandomState(4).randn(B, h).astype(np.float32))
    params = mod.init(jax.random.PRNGKey(0), h_in)
    r1, r2, b = mod.apply(params, h_in)
    assert r1.shape == (B, Z, Z, F) and r2.shape == (B, Z, Z, F) and b.shape == (B, Z, F)
    r1_np = np.asarray(r1)
    r2_np = np.asarray(r2)
    # strictly-lower entries must be zero; diagonals tanh-bounded
    for f in range(F):
        for m in (r1_np[..., f], r2_np[..., f]):
            assert np.allclose(np.tril(m, -1), 0.0)
            d = np.diagonal(m, axis1=1, axis2=2)
            assert (np.abs(d) <= 1.0).all()


def test_invertibility_numerically():
    """|diag(r1)*diag(r2)| < 1 guarantees 1 + tanh' * d1*d2 > 0 — the flow is
    invertible; check the transform is injective on random draws."""
    rng = np.random.RandomState(5)
    Z = 3
    r1, r2, b = _random_triangular(rng, 1, Z)
    z1 = jnp.asarray(rng.randn(1, 64, Z).astype(np.float32))
    z2 = z1 + 1e-3
    o1, _ = triangular_sylvester_step(z1, r1, r2, b, flip=False)
    o2, _ = triangular_sylvester_step(z2, r1, r2, b, flip=False)
    assert (np.abs(np.asarray(o1 - o2)) > 1e-6).any()

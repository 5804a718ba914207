"""General Sylvester flow families (householder / orthogonal Q).

The reference's CLI advertises these type_flows values but silently builds
triangular (run_nerf_uncertainty_NF.py:614-616, models.py:66-67); here they
are real flows.  Checks: log-det vs autodiff Jacobian determinants,
orthogonality of the amortized Q, full-model forward + one train step, and
loud rejection of the deleted realnvp/glow families.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cfnerf_tpu.flows.sylvester import (
    general_sylvester_step,
    householder_q,
    orthogonalize_q,
)


def test_householder_q_orthogonal():
    v = jax.random.normal(jax.random.PRNGKey(0), (7, 3))
    q = householder_q(v)
    eye = jnp.einsum("bij,bkj->bik", q, q)
    np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(3), (7, 3, 3)),
                               atol=1e-5)


def test_orthogonalize_q_orthogonal():
    m = jax.random.normal(jax.random.PRNGKey(1), (7, 3, 3))
    q = orthogonalize_q(m)
    eye = jnp.einsum("bij,bkj->bik", q, q)
    np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(3), (7, 3, 3)),
                               atol=1e-4)


def test_orthogonalize_q_rank_deficient_stays_orthogonal():
    """The Bjoerck-iteration recipe left |Q^T Q - I| ~ 0.9 on near-rank-
    deficient amortized inputs (silently corrupting the general-Sylvester
    log-det); the Householder-product construction must stay exactly
    orthogonal for ANY input, including zero rows."""
    v = jax.random.normal(jax.random.PRNGKey(3), (4, 3))
    rank1 = v[:, :, None] * v[:, None, :]  # rank-1 matrices
    zero_row = rank1.at[:, 1, :].set(0.0)
    for m in (rank1, zero_row, jnp.zeros((4, 3, 3))):
        q = orthogonalize_q(m)
        eye = jnp.einsum("bij,bkj->bik", q, q)
        np.testing.assert_allclose(
            np.asarray(eye), np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5
        )


def test_householder_q_zero_vector_is_identity():
    q = householder_q(jnp.zeros((2, 3)))
    np.testing.assert_allclose(np.asarray(q), np.broadcast_to(np.eye(3), (2, 3, 3)))


@pytest.mark.parametrize("z_size", [1, 3])
def test_general_sylvester_logdet_vs_autodiff(z_size):
    rng = np.random.RandomState(2)
    B = 5
    triu = np.triu(np.ones((z_size, z_size), np.float32), k=1)
    r1 = rng.randn(B, z_size, z_size).astype(np.float32) * triu
    r2 = rng.randn(B, z_size, z_size).astype(np.float32) * triu
    idx = np.arange(z_size)
    r1[:, idx, idx] = np.tanh(rng.randn(B, z_size))
    r2[:, idx, idx] = np.tanh(rng.randn(B, z_size))
    b = rng.randn(B, z_size).astype(np.float32)
    q = np.linalg.qr(rng.randn(B, z_size, z_size))[0].astype(np.float32)
    z = rng.randn(B, 1, z_size).astype(np.float32)

    _, ld = general_sylvester_step(
        jnp.asarray(z), jnp.asarray(r1), jnp.asarray(r2), jnp.asarray(q),
        jnp.asarray(b),
    )

    def f_single(zv, i):
        out, _ = general_sylvester_step(
            zv[None, None], jnp.asarray(r1[i : i + 1]), jnp.asarray(r2[i : i + 1]),
            jnp.asarray(q[i : i + 1]), jnp.asarray(b[i : i + 1]),
        )
        return out[0, 0]

    for i in range(B):
        J = jax.jacfwd(lambda zv: f_single(zv, i))(jnp.asarray(z[i, 0]))
        ld_auto = float(jnp.log(jnp.abs(jnp.linalg.det(J))))
        np.testing.assert_allclose(float(ld[i, 0]), ld_auto, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("family", ["householder", "orthogonal"])
def test_full_model_forward_and_train_step(family):
    from cfnerf_tpu.models.nerf_flows import NeRFFlows
    from cfnerf_tpu.render.renderer import RenderConfig
    from cfnerf_tpu.train.step import TrainConfig, make_train_step

    model = NeRFFlows(
        net_depth=2, net_width=16, input_ch=63, input_ch_views=27, skips=(1,),
        h_alpha_size=8, h_rgb_size=8, n_flows=2, k_samples=4,
        use_viewdirs=True, type_flows=family,
    )
    x = jnp.zeros((3, 90))
    params = model.init(jax.random.PRNGKey(0), x, is_test=True)["params"]
    raw, ent = model.apply({"params": params}, x, is_test=False,
                           rng=jax.random.PRNGKey(1))
    assert raw.shape == (3, 4, 4)
    assert np.isfinite(float(ent))

    rc = RenderConfig(n_samples=8, perturb=True, use_viewdirs=True)
    tc = TrainConfig(H=4, W=4, focal=5.0, ndc=False, near=0.5, far=2.0,
                     k_samples=4, beta1=0.01)
    step, tx = make_train_step(model, rc, tc)
    opt_state = tx.init(params)
    R = 8
    batch = {
        "rays_o": jnp.zeros((R, 3)),
        "rays_d": jnp.concatenate([jnp.full((R, 2), 0.1), -jnp.ones((R, 1))], -1),
        "target": jnp.full((R, 3), 0.5),
    }
    params2, _, metrics = step(params, opt_state, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    moved = jax.tree_util.tree_map(
        lambda a, c: float(jnp.abs(a - c).max()), params, params2
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0


@pytest.mark.parametrize("family", ["realnvp", "glow"])
def test_unimplemented_families_raise(family):
    from cfnerf_tpu.models.nerf_flows import NeRFFlows

    model = NeRFFlows(
        net_depth=2, net_width=16, input_ch=63, input_ch_views=27, skips=(1,),
        n_flows=2, k_samples=4, type_flows=family,
    )
    with pytest.raises(ValueError, match="no implementation"):
        model.init(jax.random.PRNGKey(0), jnp.zeros((2, 90)), is_test=True)

import math

import jax
import jax.numpy as jnp
import numpy as np

from cfnerf_tpu.train.loss import depth_loss, kde_nll, total_loss


def numpy_kde_nll(rgbs, target, n):
    """Independent numpy implementation of the KDE NLL
    (run_nerf_uncertainty_NF.py:1031-1042 semantics)."""
    eps = 1e-5
    std = np.std(rgbs, -1, ddof=1) * n / (n - 1)
    h = std * (0.8 / n) ** (-1.0 / 7.0) + eps
    h = h[..., None]
    k1 = np.exp(-((rgbs - target[..., None]) ** 2) / (2 * h * h))
    k2 = (2 * math.pi) ** (-1.5) / h
    p = (k1 * k2).mean(-1) + eps
    return -np.log(p).mean()


def test_kde_matches_numpy():
    rng = np.random.RandomState(0)
    R, K = 32, 8
    rgbs = rng.rand(R, 3, K).astype(np.float32)
    target = rng.rand(R, 3).astype(np.float32)
    got = float(kde_nll(jnp.asarray(rgbs), jnp.asarray(target), K))
    want = numpy_kde_nll(rgbs, target, K)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_kde_bandwidth_is_detached():
    """The bandwidth uses stop_gradient on the std: the gradient of the NLL
    wrt the samples must not include a bandwidth-widening escape route.
    Verified by comparing against a manual gradient with H held constant."""
    rng = np.random.RandomState(1)
    R, K = 4, 8
    rgbs = jnp.asarray(rng.rand(R, 3, K).astype(np.float32))
    target = jnp.asarray(rng.rand(R, 3).astype(np.float32))

    g = jax.grad(lambda r: kde_nll(r, target, K))(rgbs)

    # manual: fixed H computed outside the graph
    eps = 1e-5
    std = jnp.std(rgbs, -1, ddof=1) * K / (K - 1)
    h = (std * (0.8 / K) ** (-1.0 / 7.0) + eps)[..., None]

    def nll_fixed_h(r):
        k1 = jnp.exp(-((r - target[..., None]) ** 2) / (2 * h * h))
        k2 = (2 * math.pi) ** (-1.5) / h
        p = (k1 * k2).mean(-1) + eps
        return -jnp.log(p).mean()

    g_fixed = jax.grad(nll_fixed_h)(rgbs)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_fixed), rtol=1e-4, atol=1e-6)


def test_perfect_prediction_low_nll():
    R, K = 16, 8
    target = np.random.RandomState(2).rand(R, 3).astype(np.float32)
    rgbs_good = np.repeat(target[..., None], K, -1) + 1e-4 * np.random.RandomState(3).randn(R, 3, K).astype(np.float32)
    rgbs_bad = np.random.RandomState(4).rand(R, 3, K).astype(np.float32)
    nll_good = float(kde_nll(jnp.asarray(rgbs_good), jnp.asarray(target), K))
    nll_bad = float(kde_nll(jnp.asarray(rgbs_bad), jnp.asarray(target), K))
    assert nll_good < nll_bad


def test_depth_loss_mean_over_k():
    depth_k = jnp.asarray([[1.0, 3.0], [2.0, 2.0]])  # means: 2, 2
    target = jnp.asarray([2.0, 4.0])
    assert float(depth_loss(depth_k, target)) == 2.0  # (0 + 4)/2


def test_total_loss_assembly():
    rng = np.random.RandomState(5)
    R, K = 8, 4
    rgbs = jnp.asarray(rng.rand(R, 3, K).astype(np.float32))
    target = jnp.asarray(rng.rand(R, 3).astype(np.float32))
    ent = jnp.asarray(2.0)
    nll = float(kde_nll(rgbs, target, K))

    loss0, m0 = total_loss(rgbs, target, ent, k_samples=K, beta1=0.0)
    np.testing.assert_allclose(float(loss0), nll, rtol=1e-6)

    loss1, m1 = total_loss(rgbs, target, ent, k_samples=K, beta1=0.01)
    np.testing.assert_allclose(float(loss1), nll + 0.01 * 2.0, rtol=1e-6)

    dk = jnp.ones((3, K))
    td = jnp.zeros((3,))
    loss2, m2 = total_loss(
        rgbs, target, ent, k_samples=K, beta1=0.01,
        depth_k=dk, target_depth=td, depth_lambda=0.5,
    )
    np.testing.assert_allclose(float(loss2), nll + 0.02 + 0.5 * 1.0, rtol=1e-6)
    assert "depth_loss" in m2


def test_resume_lr_schedule_offset():
    """A resumed run's fresh opt_state must start at the decayed lr, not
    the initial one (optax silently clamps negative transition_begin — the
    offset is folded into init_value instead)."""
    import numpy as np

    from cfnerf_tpu.train.step import TrainConfig, make_optimizer

    cfg = TrainConfig(H=8, W=8, focal=5.0, ndc=False, near=0.5, far=2.0,
                      k_samples=4, lrate=5e-4, lrate_decay=250,
                      start_step=200_000)
    tx = make_optimizer(cfg)
    # pull the schedule through the optimizer's hyperparams: one update at
    # count 0 on a unit gradient has magnitude ~lr (adam with eps<<1)
    import jax.numpy as jnp
    import optax

    params = {"w": jnp.ones(())}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones(())}, state, params)
    lr_eff = abs(float(updates["w"]))
    want = 5e-4 * 0.1 ** (200_000 / 250_000)
    np.testing.assert_allclose(lr_eff, want, rtol=0.05)
    assert lr_eff < 1.5e-4  # nowhere near the un-decayed 5e-4

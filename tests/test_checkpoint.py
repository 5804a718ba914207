import jax
import jax.numpy as jnp
import numpy as np
import optax

from cfnerf_tpu.train.checkpoint import (
    checkpoint_path,
    find_resume_checkpoint,
    list_checkpoints,
    restore_checkpoint,
    run_dir,
    save_checkpoint,
)


def _params(scale=1.0):
    return {
        "trunk": {"w": jnp.full((4, 4), scale), "b": jnp.zeros((4,))},
        "alpha_std": jnp.ones((1,)) * scale,
    }


def test_save_restore_roundtrip(tmp_path):
    rundir = str(tmp_path / "run")
    params = _params(2.0)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    path = save_checkpoint(rundir, 10000, params, opt_state, ensemble=1)
    assert path.endswith("010000_01")

    fresh = _params(0.0)
    restored, step = restore_checkpoint(path, fresh)
    assert step == 10000
    np.testing.assert_allclose(np.asarray(restored["trunk"]["w"]), 2.0)
    np.testing.assert_allclose(np.asarray(restored["alpha_std"]), 2.0)


def test_filtered_merge_tolerates_drift(tmp_path):
    rundir = str(tmp_path / "run")
    params = _params(3.0)
    tx = optax.adam(1e-3)
    path = save_checkpoint(rundir, 500, params, tx.init(params))

    # fresh model has an extra head and a reshaped trunk
    fresh = {
        "trunk": {"w": jnp.zeros((8, 8)), "b": jnp.zeros((4,))},  # w shape drifted
        "alpha_std": jnp.zeros((1,)),
        "new_head": {"w": jnp.full((2,), 7.0)},
    }
    restored, step = restore_checkpoint(path, fresh)
    np.testing.assert_allclose(np.asarray(restored["trunk"]["w"]), 0.0)  # kept fresh
    np.testing.assert_allclose(np.asarray(restored["trunk"]["b"]), 0.0)  # loaded (same)
    np.testing.assert_allclose(np.asarray(restored["alpha_std"]), 3.0)  # loaded
    np.testing.assert_allclose(np.asarray(restored["new_head"]["w"]), 7.0)  # kept fresh


def test_find_resume_latest_and_index(tmp_path):
    rundir = str(tmp_path / "run")
    params = _params()
    tx = optax.adam(1e-3)
    st = tx.init(params)
    save_checkpoint(rundir, 100, params, st)
    save_checkpoint(rundir, 200, params, st)
    save_checkpoint(rundir, 300, params, st)

    assert find_resume_checkpoint(rundir).endswith("000300_01")
    assert find_resume_checkpoint(rundir, index_step=200).endswith("000200_01")
    assert find_resume_checkpoint(rundir, index_step=999) is None
    assert find_resume_checkpoint(str(tmp_path / "empty")) is None
    assert find_resume_checkpoint(rundir, ft_path="/some/explicit") == "/some/explicit"

    ckpts = list_checkpoints(rundir)
    assert [c[0] for c in ckpts] == [100, 200, 300]


def test_run_dir_layout():
    assert run_dir("./logs", "africa", "triangular", "exp1") == "./logs/africa/triangular/exp1"
    assert checkpoint_path("/x", 50000, 2).endswith("050000_02")

"""Golden pose-math parity vs the reference's load_llff.py.

The pose block (average/recenter/spiral/spherify) is upstream LLFF math
whose outputs must match bit-for-bit for pose parity; the cfnerf_tpu
implementation (cfnerf_tpu/data/poses.py) is restructured + vectorized, so
these tests pin its numerics against the live reference functions.
"""
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo/tests")

pytest.importorskip("torch")  # the harness needs the reference env stubs

from reference_harness import install_reference  # noqa: E402

install_reference()

import load_llff as ref_llff  # noqa: E402  (reference module)

from cfnerf_tpu.data import poses as ours  # noqa: E402


def _random_poses(n=9, seed=0):
    """Plausible c2w (N, 3, 5) poses: orthonormal rotations + offsets + hwf."""
    rng = np.random.RandomState(seed)
    mats = []
    for _ in range(n):
        q, _ = np.linalg.qr(rng.randn(3, 3))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        origin = rng.randn(3) * 2 + np.array([0.0, 0.0, 4.0])
        hwf = np.array([24.0, 32.0, 30.0]).reshape(3, 1)
        mats.append(np.concatenate([q, origin[:, None], hwf], 1))
    return np.stack(mats).astype(np.float64)


def test_average_pose_matches_poses_avg():
    p = _random_poses()
    np.testing.assert_allclose(ours.average_pose(p), ref_llff.poses_avg(p), rtol=1e-12)


def test_recenter_poses_matches():
    p = _random_poses(seed=1)
    np.testing.assert_allclose(
        ours.recenter_poses(p), ref_llff.recenter_poses(p.copy()), rtol=1e-10, atol=1e-12
    )


def test_spiral_path_matches_render_path_spiral():
    p = _random_poses(seed=2)
    c2w = ref_llff.poses_avg(p)
    up = p[:, :3, 1].sum(0)
    up = up / np.linalg.norm(up)
    rads = np.percentile(np.abs(p[:, :3, 3]), 90, 0)
    ref = np.array(
        ref_llff.render_path_spiral(c2w, up, rads, focal=2.5, zdelta=0.3,
                                    zrate=0.5, rots=2, N=30)
    )
    got = np.array(
        ours.spiral_path(c2w, up, rads, focal=2.5, zdelta=0.3, zrate=0.5,
                         rots=2, n_frames=30)
    )
    np.testing.assert_allclose(got, ref, rtol=1e-10, atol=1e-12)


def test_spherify_poses_matches():
    rng = np.random.RandomState(3)
    # inward-facing ring-ish capture (what spherify expects)
    n = 11
    mats = []
    for i in range(n):
        th = 2 * np.pi * i / n + rng.randn() * 0.05
        origin = np.array([3.1 * np.cos(th), 3.1 * np.sin(th), 1.2 + rng.randn() * 0.1])
        bwd = origin / np.linalg.norm(origin)  # looking at the origin
        up = np.array([0.0, 0.0, -1.0])
        x = np.cross(up, bwd); x = x / np.linalg.norm(x)
        y = np.cross(bwd, x)
        hwf = np.array([24.0, 32.0, 30.0]).reshape(3, 1)
        mats.append(np.concatenate([np.stack([x, y, bwd], 1), origin[:, None], hwf], 1))
    p = np.stack(mats)
    bds = np.abs(rng.randn(n, 2)) + np.array([1.0, 6.0])

    ref_reset, ref_ring, ref_bds = ref_llff.spherify_poses(p.copy(), bds.copy())
    got_reset, got_ring, got_bds = ours.spherify_poses(p, bds)
    np.testing.assert_allclose(got_reset, ref_reset, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(got_ring, ref_ring, rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(got_bds, ref_bds, rtol=1e-10)

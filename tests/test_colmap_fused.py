"""COLMAP fused.ply(.vis) IO round-trip + golden parity against the
reference's reader where possible (the reference's read_write_fused_vis.py
needs pyntcloud/pandas which aren't installed; its .vis byte layout is
exercised here by writing with our writer and re-reading)."""
import numpy as np

from cfnerf_tpu.data.colmap_fused import read_fused, write_fused


def _points(n=13, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "xyz": rng.randn(n, 3).astype(np.float32),
        "normal": rng.randn(n, 3).astype(np.float32),
        "color": rng.randint(0, 256, (n, 3), dtype=np.uint8),
        "vis_idx": np.array(
            [rng.randint(0, 40, rng.randint(0, 6)).astype(np.uint32)
             for _ in range(n)],
            object,
        ),
    }


def test_round_trip(tmp_path):
    pts = _points()
    ply, vis = str(tmp_path / "fused.ply"), str(tmp_path / "fused.ply.vis")
    write_fused(pts, ply, vis)
    got = read_fused(ply, vis)
    np.testing.assert_allclose(got["xyz"], pts["xyz"])
    np.testing.assert_allclose(got["normal"], pts["normal"])
    np.testing.assert_array_equal(got["color"], pts["color"])
    np.testing.assert_array_equal(got["vis_count"],
                                  [len(v) for v in pts["vis_idx"]])
    for a, b in zip(got["vis_idx"], pts["vis_idx"]):
        np.testing.assert_array_equal(a, b)


def test_vis_binary_layout(tmp_path):
    """The .vis layout must match COLMAP's WritePointsVisibility: uint64
    count, then per point uint32 count + uint32 indices."""
    import struct

    pts = _points(n=2, seed=1)
    pts["vis_idx"] = np.array([np.array([3, 7], np.uint32),
                               np.array([], np.uint32)], object)
    ply, vis = str(tmp_path / "f.ply"), str(tmp_path / "f.ply.vis")
    write_fused(pts, ply, vis)
    raw = open(vis, "rb").read()
    assert struct.unpack_from("<Q", raw, 0)[0] == 2
    assert struct.unpack_from("<I", raw, 8)[0] == 2
    assert struct.unpack_from("<II", raw, 12) == (3, 7)
    assert struct.unpack_from("<I", raw, 20)[0] == 0
    assert len(raw) == 24


def test_count_mismatch_raises(tmp_path):
    import pytest
    import struct

    pts = _points(n=3)
    ply, vis = str(tmp_path / "f.ply"), str(tmp_path / "f.ply.vis")
    write_fused(pts, ply, vis)
    with open(vis, "r+b") as f:
        f.write(struct.pack("<Q", 99))
    with pytest.raises(ValueError, match="99"):
        read_fused(ply, vis)

import numpy as np

from cfnerf_tpu.data.colmap import (
    Camera,
    Image,
    Point3D,
    qvec2rotmat,
    rotmat2qvec,
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
    read_model,
    write_cameras_binary,
    write_images_binary,
    write_points3d_binary,
)


def test_qvec_rotmat_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(5):
        q = rng.randn(4)
        q = q / np.linalg.norm(q)
        if q[0] < 0:
            q = -q
        R = qvec2rotmat(q)
        # valid rotation
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-10)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-10)
        q2 = rotmat2qvec(R)
        np.testing.assert_allclose(q2, q, atol=1e-8)


def test_identity_quaternion():
    np.testing.assert_allclose(qvec2rotmat(np.array([1.0, 0, 0, 0])), np.eye(3))


def _sample_model():
    cams = {1: Camera(1, "PINHOLE", 640, 480, np.array([500.0, 500.0, 320.0, 240.0]))}
    rng = np.random.RandomState(1)
    images = {}
    for i in (1, 2):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        images[i] = Image(
            i, q, rng.randn(3), 1, f"img_{i}.png",
            rng.rand(3, 2) * 100, np.array([10, -1, 11], dtype=np.int64),
        )
    points = {
        10: Point3D(10, rng.randn(3), np.array([10, 20, 30]), 0.5,
                    np.array([1, 2]), np.array([0, 0])),
        11: Point3D(11, rng.randn(3), np.array([1, 2, 3]), 1.5,
                    np.array([1]), np.array([2])),
    }
    return cams, images, points


def test_binary_roundtrip(tmp_path):
    cams, images, points = _sample_model()
    write_cameras_binary(cams, tmp_path / "cameras.bin")
    write_images_binary(images, tmp_path / "images.bin")
    write_points3d_binary(points, tmp_path / "points3D.bin")

    cams2 = read_cameras_binary(tmp_path / "cameras.bin")
    images2 = read_images_binary(tmp_path / "images.bin")
    points2 = read_points3d_binary(tmp_path / "points3D.bin")

    assert cams2[1].model == "PINHOLE" and cams2[1].width == 640
    np.testing.assert_allclose(cams2[1].params, cams[1].params)
    for i in (1, 2):
        np.testing.assert_allclose(images2[i].qvec, images[i].qvec)
        np.testing.assert_allclose(images2[i].tvec, images[i].tvec)
        np.testing.assert_allclose(images2[i].xys, images[i].xys)
        np.testing.assert_array_equal(images2[i].point3D_ids, images[i].point3D_ids)
        assert images2[i].name == images[i].name
    for p in (10, 11):
        np.testing.assert_allclose(points2[p].xyz, points[p].xyz)
        assert points2[p].error == points[p].error
        np.testing.assert_array_equal(points2[p].image_ids, points[p].image_ids)

    # auto-detection
    c3, i3, p3 = read_model(tmp_path)
    assert set(c3) == {1} and set(i3) == {1, 2} and set(p3) == {10, 11}


def test_dense_array_roundtrip(tmp_path):
    from cfnerf_tpu.data.colmap import read_dense_array, write_dense_array

    rng = np.random.RandomState(3)
    depth = rng.rand(6, 9).astype(np.float32)
    p = tmp_path / "depth.bin"
    write_dense_array(p, depth)
    out = read_dense_array(p)
    np.testing.assert_allclose(out, depth)

    normals = rng.rand(4, 5, 3).astype(np.float32)
    p2 = tmp_path / "normal.bin"
    write_dense_array(p2, normals)
    np.testing.assert_allclose(read_dense_array(p2), normals)

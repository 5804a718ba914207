"""Synthetic dataset fabrication for tests: tiny LLFF and Blender scenes."""
import json
import os

import numpy as np


def make_blender_dataset(root, H=16, W=16, n_train=3, n_val=2, n_test=2):
    import imageio.v2 as imageio

    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    counts = {"train": n_train, "val": n_val, "test": n_test}
    for split, n in counts.items():
        frames = []
        os.makedirs(os.path.join(root, split), exist_ok=True)
        for i in range(n):
            theta = 2 * np.pi * i / max(n, 1)
            c2w = np.eye(4)
            c2w[0, 3] = 4 * np.sin(theta)
            c2w[2, 3] = 4 * np.cos(theta)
            img = (rng.rand(H, W, 4) * 255).astype(np.uint8)
            img[..., 3] = 255
            fname = f"./{split}/r_{i}"
            imageio.imwrite(os.path.join(root, split, f"r_{i}.png"), img)
            frames.append({"file_path": fname, "transform_matrix": c2w.tolist()})
        meta = {"camera_angle_x": 0.6911112070083618, "frames": frames}
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    return root


def make_llff_dataset(root, H=16, W=16, n_images=6):
    """poses_bounds.npy + images/ dir. Poses: small camera ring facing -z."""
    import imageio.v2 as imageio

    imgdir = os.path.join(root, "images")
    os.makedirs(imgdir, exist_ok=True)
    rng = np.random.RandomState(1)
    poses = []
    focal = 20.0
    for i in range(n_images):
        img = (rng.rand(H, W, 3) * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(imgdir, f"img_{i:03d}.png"), img)
        # LLFF raw pose convention: [down, right, back] rows, hwf column
        c2w = np.eye(4)[:3]
        c2w[0, 3] = 0.1 * (i - n_images / 2)
        # convert from [x right, y up, z back] to LLFF's [-y, x, z] rows:
        m = np.concatenate(
            [-c2w[1:2, :], c2w[0:1, :], c2w[2:3, :]], 0
        )  # inverse of the loader's axis fix
        hwf = np.array([[H], [W], [focal]])
        poses.append(np.concatenate([m, hwf], 1))  # (3, 5)
    poses = np.stack(poses)  # (N, 3, 5)
    bds = np.tile(np.array([[1.0, 5.0]]), (n_images, 1))
    poses_bounds = np.concatenate([poses.reshape(n_images, -1), bds], -1)
    np.save(os.path.join(root, "poses_bounds.npy"), poses_bounds)
    return root

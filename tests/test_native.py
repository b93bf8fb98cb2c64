"""Native (C++) COLMAP parsers vs the Python reference parsers."""
import os
import struct

import numpy as np

from gi_gs_tpu import native
from gi_gs_tpu.scene import colmap


def write_points3d(path, n=5, seed=0):
    rng = np.random.RandomState(seed)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            f.write(struct.pack("<Q", i))
            f.write(struct.pack("<ddd", *rng.rand(3)))
            f.write(struct.pack("<BBB", *rng.randint(0, 255, 3)))
            f.write(struct.pack("<d", rng.rand()))
            track = rng.randint(0, 4)
            f.write(struct.pack("<Q", track))
            for _ in range(track):
                f.write(struct.pack("<ii", 0, 0))


def write_images(path, n=3):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            f.write(struct.pack("<i", i + 1))
            f.write(struct.pack("<dddd", 1, 0, 0, 0))
            f.write(struct.pack("<ddd", i, 0, 0))
            f.write(struct.pack("<i", 1))
            f.write(f"frame_{i}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 2))
            f.write(struct.pack("<ddQ", 0, 0, 0) * 2)


def test_points3d_parity(tmp_path):
    p = str(tmp_path / "points3D.bin")
    write_points3d(p)
    nx, nr, ne = native.read_points3d_binary(p)
    px, pr, pe = colmap.read_points3d_binary(p)
    np.testing.assert_allclose(nx, px)
    np.testing.assert_allclose(nr, pr)
    np.testing.assert_allclose(ne, pe)


def test_images_parity(tmp_path):
    p = str(tmp_path / "images.bin")
    write_images(p)
    ni = native.read_images_binary(p)
    pi = colmap.read_images_binary(p)
    assert set(ni) == set(pi)
    for k in ni:
        assert ni[k].name == pi[k].name
        np.testing.assert_allclose(ni[k].qvec, pi[k].qvec)
        np.testing.assert_allclose(ni[k].tvec, pi[k].tvec)
        assert ni[k].camera_id == pi[k].camera_id

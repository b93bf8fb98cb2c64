"""Native (C++) host runtime — JIT-built on first use, mirroring the
reference's JIT plugin pattern (pbr/renderutils/ops.py:23-84) but for the
host-side hot paths (binary scene ingestion). Falls back to pure Python
if no compiler is available.
"""
from __future__ import annotations

import os
import subprocess
import sys
import sysconfig
from typing import Optional

import numpy as np

_mod = None
_tried = False


def _build() -> Optional[object]:
    src = os.path.join(os.path.dirname(__file__), "colmap_io.cc")
    cache = os.path.join(os.path.dirname(__file__), "_build")
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, "gigs_native_io.so")
    if not os.path.exists(so_path) or \
            os.path.getmtime(so_path) < os.path.getmtime(src):
        include = sysconfig.get_paths()["include"]
        cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
               f"-I{include}", src, "-o", so_path]
        subprocess.run(cmd, check=True, capture_output=True)
    if cache not in sys.path:
        sys.path.insert(0, cache)
    import gigs_native_io  # noqa: E402
    return gigs_native_io


def get() -> Optional[object]:
    """The native module, or None if unavailable."""
    global _mod, _tried
    if _mod is None and not _tried:
        _tried = True
        try:
            _mod = _build()
        except Exception as e:  # pragma: no cover
            print(f"[gi_gs_tpu.native] build failed ({e}); "
                  "using Python fallbacks", file=sys.stderr)
    return _mod


def read_points3d_binary(path: str):
    """Fast points3D.bin reader -> (xyz [N,3], rgb [N,3], err [N,1])."""
    mod = get()
    if mod is None:
        from ..scene.colmap import read_points3d_binary as py_reader
        return py_reader(path)
    n, xyz_b, rgb_b, err_b = mod.read_points3d(path)
    xyz = np.frombuffer(xyz_b, np.float64).reshape(n, 3)
    rgb = np.frombuffer(rgb_b, np.float64).reshape(n, 3)
    err = np.frombuffer(err_b, np.float64).reshape(n, 1)
    return xyz, rgb, err


def read_images_binary(path: str):
    """Fast images.bin reader -> dict[id -> Image namedtuple]."""
    from ..scene.colmap import Image
    mod = get()
    if mod is None:
        from ..scene.colmap import read_images_binary as py_reader
        return py_reader(path)
    out = {}
    for rec in mod.read_images(path):
        out[rec["id"]] = Image(rec["id"], np.array(rec["qvec"]),
                               np.array(rec["tvec"]), rec["camera_id"],
                               rec["name"])
    return out

"""Self-contained PLY reader/writer (no plyfile dependency).

Handles binary_little_endian and ascii PLY with float/uchar properties —
enough for point-cloud interchange (`fetchPly/storePly`,
scene/dataset_readers.py:135-167) and Gaussian checkpoints
(`save_ply/load_ply`, scene/gaussian_model.py:397-578).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

_TYPES = {
    "float": np.float32, "float32": np.float32, "double": np.float64,
    "uchar": np.uint8, "uint8": np.uint8, "char": np.int8,
    "short": np.int16, "ushort": np.uint16,
    "int": np.int32, "int32": np.int32, "uint": np.uint32,
}


def read_ply(path: str) -> Dict[str, np.ndarray]:
    """Returns {property_name: [N] array} for the 'vertex' element."""
    with open(path, "rb") as f:
        line = f.readline().strip()
        assert line == b"ply", f"not a PLY file: {path}"
        fmt = None
        n_vertex = 0
        props: List[Tuple[str, np.dtype]] = []
        in_vertex = False
        while True:
            line = f.readline().strip().decode()
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, count = line.split()
                in_vertex = name == "vertex"
                if in_vertex:
                    n_vertex = int(count)
            elif line.startswith("property") and in_vertex:
                parts = line.split()
                props.append((parts[-1], _TYPES[parts[1]]))
            elif line == "end_header":
                break
        if fmt == "binary_little_endian":
            dtype = np.dtype([(n, t) for n, t in props])
            data = np.fromfile(f, dtype=dtype, count=n_vertex)
        elif fmt == "ascii":
            raw = np.loadtxt(f, max_rows=n_vertex)
            data = {n: raw[:, i].astype(t) for i, (n, t) in enumerate(props)}
            return data
        else:
            raise ValueError(f"unsupported PLY format {fmt}")
    return {n: data[n] for n, _ in props}


def write_ply(path: str, names: List[str], arrays: List[np.ndarray],
              dtypes: List[np.dtype] | None = None) -> None:
    """Write a binary_little_endian vertex-element PLY."""
    n = len(arrays[0])
    if dtypes is None:
        dtypes = [a.dtype for a in arrays]
    type_names = {np.dtype(np.float32): "float", np.dtype(np.uint8): "uchar",
                  np.dtype(np.float64): "double", np.dtype(np.int32): "int"}
    with open(path, "wb") as f:
        f.write(b"ply\nformat binary_little_endian 1.0\n")
        f.write(f"element vertex {n}\n".encode())
        for name, dt in zip(names, dtypes):
            f.write(f"property {type_names[np.dtype(dt)]} {name}\n".encode())
        f.write(b"end_header\n")
        rec = np.rec.fromarrays(
            [a.astype(dt) for a, dt in zip(arrays, dtypes)],
            names=",".join(names) if False else names)
        rec.tofile(f)


def store_point_cloud(path: str, xyz: np.ndarray, rgb: np.ndarray) -> None:
    """storePly equivalent: xyz f32, normals zeros, rgb uchar."""
    normals = np.zeros_like(xyz)
    names = ["x", "y", "z", "nx", "ny", "nz", "red", "green", "blue"]
    arrays = [xyz[:, 0], xyz[:, 1], xyz[:, 2],
              normals[:, 0], normals[:, 1], normals[:, 2],
              rgb[:, 0], rgb[:, 1], rgb[:, 2]]
    dtypes = [np.float32] * 6 + [np.uint8] * 3
    write_ply(path, names, arrays, dtypes)


def fetch_point_cloud(path: str):
    """fetchPly equivalent -> (points [N,3] f64, colors [N,3] in [0,1],
    normals [N,3])."""
    v = read_ply(path)
    pts = np.stack([v["x"], v["y"], v["z"]], axis=1)
    colors = np.stack([v["red"], v["green"], v["blue"]], axis=1) / 255.0
    if "nx" in v:
        normals = np.stack([v["nx"], v["ny"], v["nz"]], axis=1)
    else:
        normals = np.zeros_like(pts)
    return pts, colors, normals

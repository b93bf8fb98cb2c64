"""Checkpointing + Gaussian PLY interchange.

* save_state/load_state: whole-TrainState pickle of numpy-ified pytrees —
  the analog of `torch.save({"gaussians": capture(), "cubemap": ...})`
  (train.py:466-490, gaussian_model.py:82-175).
* save_gaussians_ply/load_gaussians_ply: the reference PLY attribute
  schema (x/y/z, f_dc_*, f_rest_*, opacity, normal_*, albedo_*,
  roughness, metallic, scale_*, rot_*; gaussian_model.py:397-465) so
  checkpoints interchange with the reference tooling. Only alive
  Gaussians are exported; loading re-pads to capacity.
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussians import GaussianParams
from ..scene import ply as ply_io


def save_state(path: str, state: Any, extra: dict | None = None) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    host = jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                        state)
    with open(path, "wb") as f:
        pickle.dump({"state": host, "extra": extra or {}}, f)


def load_state(path: str):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    return blob["state"], blob["extra"]


def save_gaussians_ply(path: str, params: GaussianParams) -> None:
    alive = np.asarray(params.alive)
    n = int(alive.sum())
    idx = np.nonzero(alive)[0]

    def get(x):
        return np.asarray(x)[idx]

    xyz = get(params.xyz)
    # [N, K, 3] -> transpose(1, 2).flatten(1) == [N, 3*K] channel-major
    f_dc = get(params.features_dc).transpose(0, 2, 1).reshape(n, -1)
    f_rest = get(params.features_rest).transpose(0, 2, 1).reshape(n, -1)

    cols = [("x", xyz[:, 0]), ("y", xyz[:, 1]), ("z", xyz[:, 2])]
    cols += [(f"f_dc_{i}", f_dc[:, i]) for i in range(f_dc.shape[1])]
    cols += [(f"f_rest_{i}", f_rest[:, i]) for i in range(f_rest.shape[1])]
    cols += [("opacity", get(params.opacity)[:, 0])]
    cols += [(f"normal_{i}", get(params.normal)[:, i]) for i in range(3)]
    cols += [(f"albedo_{i}", get(params.albedo)[:, i]) for i in range(3)]
    cols += [("roughness", get(params.roughness)[:, 0]),
             ("metallic", get(params.metallic)[:, 0])]
    cols += [(f"scale_{i}", get(params.scaling)[:, i]) for i in range(3)]
    cols += [(f"rot_{i}", get(params.rotation)[:, i]) for i in range(4)]

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    names = [c[0] for c in cols]
    arrays = [c[1].astype(np.float32) for c in cols]
    ply_io.write_ply(path, names, arrays, [np.float32] * len(cols))


def load_gaussians_ply(path: str, capacity: int,
                       max_sh_degree: int = 3) -> GaussianParams:
    v = ply_io.read_ply(path)
    n = len(v["x"])
    K = (max_sh_degree + 1) ** 2

    def grab(prefix, count):
        return np.stack([v[f"{prefix}_{i}"] for i in range(count)], axis=1)

    xyz = np.stack([v["x"], v["y"], v["z"]], axis=1)
    f_dc = grab("f_dc", 3).reshape(n, 3, 1).transpose(0, 2, 1)
    n_rest = 3 * (K - 1)
    f_rest = grab("f_rest", n_rest).reshape(n, 3, K - 1).transpose(0, 2, 1)

    def pad(x, fill=0.0):
        return np.concatenate(
            [x, np.full((capacity - n,) + x.shape[1:], fill, np.float32)], 0)

    rot = grab("rot", 4)
    return GaussianParams(
        xyz=jnp.asarray(pad(xyz.astype(np.float32))),
        features_dc=jnp.asarray(pad(f_dc.astype(np.float32))),
        features_rest=jnp.asarray(pad(f_rest.astype(np.float32))),
        opacity=jnp.asarray(pad(v["opacity"][:, None].astype(np.float32))),
        normal=jnp.asarray(pad(grab("normal", 3).astype(np.float32))),
        albedo=jnp.asarray(pad(grab("albedo", 3).astype(np.float32))),
        roughness=jnp.asarray(pad(v["roughness"][:, None].astype(np.float32))),
        metallic=jnp.asarray(pad(v["metallic"][:, None].astype(np.float32))),
        scaling=jnp.asarray(pad(grab("scale", 3).astype(np.float32), fill=-10.0)),
        rotation=jnp.asarray(np.concatenate(
            [rot.astype(np.float32),
             np.tile(np.array([[1, 0, 0, 0]], np.float32), (capacity - n, 1))], 0)),
        alive=jnp.asarray(np.arange(capacity) < n),
        active_sh_degree=max_sh_degree,
        max_sh_degree=max_sh_degree)

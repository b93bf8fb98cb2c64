"""Camera model — jit-friendly pytree replacement for the reference's
`scene/cameras.py` Camera(nn.Module).

The reference stores transposed matrices and multiplies row-vectors on the
left; here we keep plain row-major maths: `p_cam = w2c @ [p, 1]`,
`clip = full_proj @ [p, 1]` — numerically identical to the CUDA
`transformPoint4x3/4x4` helpers (cuda_rasterizer/auxiliary.h:58-77).
"""
from __future__ import annotations

import math
from typing import Optional

import flax.struct
import jax.numpy as jnp
import numpy as np

from ..utils import math_utils


@flax.struct.dataclass
class Camera:
    """All-array camera pytree (static metadata lives alongside in dataset
    records, not in the pytree, so one jitted step serves every camera of a
    given resolution)."""
    w2c: jnp.ndarray        # [4, 4] world -> view
    full_proj: jnp.ndarray  # [4, 4] proj @ w2c (world -> clip)
    cam_pos: jnp.ndarray    # [3] camera centre in world space
    # Scalars as 0-d arrays so cameras of equal resolution share one trace.
    tanfovx: jnp.ndarray
    tanfovy: jnp.ndarray
    fx: jnp.ndarray
    fy: jnp.ndarray
    width: int = flax.struct.field(pytree_node=False)
    height: int = flax.struct.field(pytree_node=False)

    @property
    def c2w(self) -> jnp.ndarray:
        return jnp.linalg.inv(self.w2c)


def make_camera(R: np.ndarray, T: np.ndarray, fovx: float, fovy: float,
                width: int, height: int, znear: float = 0.01,
                zfar: float = 100.0, trans: Optional[np.ndarray] = None,
                scale: float = 1.0) -> Camera:
    """Build a Camera from COLMAP-convention R (cam-to-world rotation) and
    T (world-to-cam translation), like the reference Camera.__init__
    (scene/cameras.py:20-87)."""
    w2c = math_utils.world_to_view(R, T, translate=trans, scale=scale)
    proj = math_utils.projection_matrix(znear, zfar, fovx, fovy)
    full_proj = (proj @ w2c).astype(np.float32)
    cam_pos = np.linalg.inv(w2c)[:3, 3].astype(np.float32)
    tanfovx = math.tan(fovx * 0.5)
    tanfovy = math.tan(fovy * 0.5)
    fx = width / (2.0 * tanfovx)
    fy = height / (2.0 * tanfovy)
    return Camera(
        w2c=jnp.asarray(w2c), full_proj=jnp.asarray(full_proj),
        cam_pos=jnp.asarray(cam_pos),
        tanfovx=jnp.float32(tanfovx), tanfovy=jnp.float32(tanfovy),
        fx=jnp.float32(fx), fy=jnp.float32(fy),
        width=int(width), height=int(height))


def camera_to_json(idx: int, record) -> dict:
    """SIBR-compatible cameras.json entry (ref camera_to_JSON,
    utils/camera_utils.py:89-109); `record` is a dataset CameraRecord."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = record.R.transpose()
    Rt[:3, 3] = record.T
    Rt[3, 3] = 1.0
    W2C = np.linalg.inv(Rt)
    return {
        "id": idx,
        "img_name": record.name,
        "width": record.width,
        "height": record.height,
        "position": W2C[:3, 3].tolist(),
        "rotation": [r.tolist() for r in W2C[:3, :3]],
        "fy": math_utils.fov2focal(record.fovy, record.height),
        "fx": math_utils.fov2focal(record.fovx, record.width),
    }


def canonical_rays(camera: Camera) -> jnp.ndarray:
    """Per-pixel camera-space ray directions (x/fx, y/fy, 1) flattened to
    [H*W, 3] — ref Scene.get_canonical_rays (scene/__init__.py:137-169)
    builds these from pixel centres (u + 0.5, v + 0.5)."""
    H, W = camera.height, camera.width
    u = (jnp.arange(W, dtype=jnp.float32) + 0.5)
    v = (jnp.arange(H, dtype=jnp.float32) + 0.5)
    uu, vv = jnp.meshgrid(u, v)  # [H, W]
    x = (uu - W * 0.5) / camera.fx
    y = (vv - H * 0.5) / camera.fy
    rays = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return rays.reshape(-1, 3)

"""Core math helpers (quaternions, activations, color transforms, schedules).

Functional equivalents of the reference's `utils/general_utils.py`,
`utils/graphics_utils.py` and the sRGB/ACES helpers scattered through
`train.py:54-81` and `pbr/shade.py:14-93` — re-expressed as pure jnp
functions that vectorise over leading axes.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Quaternions / rotations
# ---------------------------------------------------------------------------

def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z) -> 3x3 rotation matrix; batched over leading axes.

    Matches the un-normalised quaternion convention of the reference CUDA
    `computeCov3D` (cuda_rasterizer/forward.cu:127-147): the caller is
    responsible for normalising (the activation does it).
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r0 = jnp.stack(
        [1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - w * z), 2.0 * (x * z + w * y)], axis=-1
    )
    r1 = jnp.stack(
        [2.0 * (x * y + w * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - w * x)], axis=-1
    )
    r2 = jnp.stack(
        [2.0 * (x * z - w * y), 2.0 * (y * z + w * x), 1.0 - 2.0 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([r0, r1, r2], axis=-2)


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalise along `axis` (torch.nn.functional.normalize semantics:
    denominator clamped to eps).

    Implemented as v * rsqrt(max(|v|^2, eps^2)) so the gradient at v == 0
    is exactly 0 instead of NaN (capacity-padded dead Gaussians hold zero
    vectors; a single NaN gradient row would poison the sort keys of the
    next step)."""
    n2 = (v * v).sum(axis=axis, keepdims=True)
    return v * jax.lax.rsqrt(jnp.maximum(n2, eps * eps))


def build_covariance_3d(scaling: jnp.ndarray, rotation_raw: jnp.ndarray,
                        scale_modifier: float = 1.0) -> jnp.ndarray:
    """World-space 3D covariance from activated scale + raw quaternion.

    Returns the six upper-triangular entries (xx, xy, xz, yy, yz, zz),
    matching `computeCov3D` (cuda_rasterizer/forward.cu:127-161) and the
    python `build_covariance_from_scaling_rotation`
    (scene/gaussian_model.py:39-46): Sigma = R diag(s^2) R^T with R from
    the *unnormalised* quaternion (normalisation is part of the rotation
    activation upstream).
    """
    # Scalar-form M = R @ diag(s), Sigma = M M^T (batched tiny-matrix
    # einsums scalarise badly on TPU; this fuses into a few VPU passes).
    w, x, y, z = (rotation_raw[..., 0], rotation_raw[..., 1],
                  rotation_raw[..., 2], rotation_raw[..., 3])
    sx = scaling[..., 0] * scale_modifier
    sy = scaling[..., 1] * scale_modifier
    sz = scaling[..., 2] * scale_modifier
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    m00, m01, m02 = r00 * sx, r01 * sy, r02 * sz
    m10, m11, m12 = r10 * sx, r11 * sy, r12 * sz
    m20, m21, m22 = r20 * sx, r21 * sy, r22 * sz
    return jnp.stack([
        m00 * m00 + m01 * m01 + m02 * m02,
        m00 * m10 + m01 * m11 + m02 * m12,
        m00 * m20 + m01 * m21 + m02 * m22,
        m10 * m10 + m11 * m11 + m12 * m12,
        m10 * m20 + m11 * m21 + m12 * m22,
        m20 * m20 + m21 * m21 + m22 * m22,
    ], axis=-1)


# ---------------------------------------------------------------------------
# Activations
# ---------------------------------------------------------------------------

def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.log(x / (1.0 - x))


# ---------------------------------------------------------------------------
# Learning-rate schedule (ref utils/general_utils.py get_expon_lr_func)
# ---------------------------------------------------------------------------

def expon_lr(step, lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
             max_steps=1_000_000):
    """Log-linear interpolated LR with optional delayed warmup; clamps to 0
    outside [0, inf) and returns 0 when step < 0 or both rates are 0."""
    step = jnp.asarray(step, jnp.float32)
    t = jnp.clip(step / max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0))
    else:
        delay_rate = 1.0
    lr = delay_rate * log_lerp
    return jnp.where(step < 0, 0.0, lr)


# ---------------------------------------------------------------------------
# Camera matrices (numpy, host side — ref utils/graphics_utils.py)
# ---------------------------------------------------------------------------

def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate: np.ndarray | None = None,
                  scale: float = 1.0) -> np.ndarray:
    """W2C matrix (row-vector-on-right convention: p_cam = W2C @ [p; 1]).

    Mirrors `getWorld2View2` (utils/graphics_utils.py:42-58): R is the
    COLMAP cam-to-world rotation, t the world-to-cam translation.
    """
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = C2W[:3, 3]
    if translate is not None:
        cam_center = (cam_center + translate) * scale
    C2W[:3, 3] = cam_center
    return np.linalg.inv(C2W).astype(np.float32)


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """Perspective projection, ref `getProjectionMatrix`
    (utils/graphics_utils.py:62-82)."""
    tan_x = math.tan(fovx / 2)
    tan_y = math.tan(fovy / 2)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_x
    P[1, 1] = 1.0 / tan_y
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


# ---------------------------------------------------------------------------
# Color transforms (ref train.py:54-81, pbr/shade.py:32-93)
# ---------------------------------------------------------------------------

def linear_to_srgb(linear: jnp.ndarray) -> jnp.ndarray:
    """Mip-NeRF-style linear->sRGB (ref train.py:54-68)."""
    eps = jnp.finfo(jnp.float32).eps
    srgb0 = 323.0 / 25.0 * linear
    srgb1 = (211.0 * jnp.maximum(linear, eps) ** (5.0 / 12.0) - 11.0) / 200.0
    return jnp.where(linear <= 0.0031308, srgb0, srgb1)


def srgb_to_linear(srgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of linear_to_srgb (ref train.py:70-81)."""
    linear0 = 25.0 / 323.0 * srgb
    linear1 = ((srgb + 0.055) / 1.055) ** 2.4
    return jnp.where(srgb <= 0.04045, linear0, linear1)


def rgb_to_srgb(f: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IEC sRGB OETF (ref pbr/shade.py:62-65)."""
    return jnp.where(
        f <= 0.0031308, f * 12.92,
        jnp.power(jnp.maximum(f, 0.0031308), 1.0 / 2.4) * 1.055 - 0.055)


def srgb_to_rgb(f: jnp.ndarray) -> jnp.ndarray:
    """Elementwise IEC sRGB EOTF (ref pbr/shade.py:79-82)."""
    return jnp.where(
        f <= 0.04045, f / 12.92,
        jnp.power((jnp.maximum(f, 0.04045) + 0.055) / 1.055, 2.4))


def aces_film(rgb: jnp.ndarray) -> jnp.ndarray:
    """ACES filmic tonemap, clamped to [0, 1] (ref pbr/shade.py:32-43)."""
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    out = (rgb * (a * rgb + b)) / (rgb * (c * rgb + d) + e)
    return jnp.clip(out, 0.0, 1.0)

"""Real spherical harmonics up to degree 3 for view-dependent color.

Functional port of the *behaviour* of the reference SH evaluation
(`utils/sh_utils.py:140-210` and `computeColorFromSH`,
cuda_rasterizer/forward.cu:22-80): given per-Gaussian SH coefficients and
a view direction, produce an RGB color `max(SH(dir) + 0.5, 0)` and the
clamp mask needed by the backward pass.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)


def sh_basis(deg: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the real SH basis values for unit directions.

    Args:
      deg: active degree (0..3); the returned basis always has
        (deg+1)^2 entries.
      dirs: [..., 3] unit directions.

    Returns: [..., (deg+1)^2] basis values with the 3DGS sign conventions.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    out = [SH_C0 * one]
    if deg > 0:
        out += [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if deg > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if deg > 2:
        xx, yy, zz = x * x, y * y, z * z
        xy = x * y
        out += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, axis=-1)


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH colors. sh: [..., K, 3] with K >= (deg+1)^2; dirs [..., 3].

    Returns raw SH value (no +0.5 offset, no clamp) like `eval_sh` in
    utils/sh_utils.py.
    """
    basis = sh_basis(deg, dirs)  # [..., B]
    B = basis.shape[-1]
    return jnp.einsum("...k,...kc->...c", basis, sh[..., :B, :])


def sh_to_rgb(deg: int, sh: jnp.ndarray, means: jnp.ndarray,
              campos: jnp.ndarray) -> jnp.ndarray:
    """Per-Gaussian SH -> clamped RGB as the rasterizer preprocess does
    (forward.cu:22-80): dir = normalize(mean - campos), +0.5 offset,
    clamp at 0 (the clamp is differentiable via max)."""
    d = means - campos
    # NaN-safe at d == 0 (dead capacity slots can sit at the camera).
    n2 = (d * d).sum(-1, keepdims=True)
    d = d * jax.lax.rsqrt(jnp.maximum(n2, 1e-24))
    rgb = eval_sh(deg, sh, d) + 0.5
    return jnp.maximum(rgb, 0.0)


def rgb_to_sh0(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the DC term mapping (utils/sh_utils.py RGB2SH)."""
    return (rgb - 0.5) / SH_C0


def sh0_to_rgb(sh0: jnp.ndarray) -> jnp.ndarray:
    return sh0 * SH_C0 + 0.5

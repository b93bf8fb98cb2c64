"""Per-Gaussian view preprocessing: projection, EWA cov2D, culling, tiling.

Vectorised jnp equivalent of `preprocessCUDA` + `computeCov2D` +
`computeCov3D` (cuda_rasterizer/forward.cu:82-276). Everything here is
plain differentiable jnp — the reference's hand-written backward
(backward.cu:145-401) is exactly the chain rule of these ops, including
its deliberate gradient gates (the +-1.3 tan_fov clamp zeroing, the
sqrt(max(0.1, .)) guard), which jax autodiff reproduces for free.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .config import RasterConfig


class Preprocessed(NamedTuple):
    valid: jnp.ndarray      # [N] bool — survives culling
    means2d: jnp.ndarray    # [N, 2] pixel coords (ndc2Pix convention)
    conic: jnp.ndarray      # [N, 3] inverse cov2D (xx, xy, yy)
    depth: jnp.ndarray      # [N] view-space z
    pos_view: jnp.ndarray   # [N, 3] view-space position
    radius: jnp.ndarray     # [N] int32 screen radius (0 when culled)
    rect_min: jnp.ndarray   # [N, 2] int32 (tx, ty) inclusive
    rect_max: jnp.ndarray   # [N, 2] int32 (tx, ty) exclusive
    tiles_touched: jnp.ndarray  # [N] int32


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """((v + 1) * S - 1) / 2 — auxiliary.h:41-44."""
    return ((v + 1.0) * size - 1.0) * 0.5


def compute_cov2d(p_view: jnp.ndarray, cov3d: jnp.ndarray, w2c: jnp.ndarray,
                  fx, fy, tanfovx, tanfovy, lowpass: float) -> jnp.ndarray:
    """EWA projection of the 3D covariance to screen space.

    cov3d: [N, 6] upper-tri (xx, xy, xz, yy, yz, zz). Returns [N, 3]
    (xx, xy, yy) with the low-pass diagonal added
    (cuda_rasterizer/forward.cu:83-122).
    """
    # NaN safety: gaussians with tz <= near are culled, but their garbage
    # values still flow through the (unselected) backward graph; 0 * inf
    # would poison gradients, so divisions use a guarded tz.
    tz = jnp.where(p_view[:, 2] > 0.01, p_view[:, 2], 1.0)
    limx = 1.3 * tanfovx
    limy = 1.3 * tanfovy
    tx = jnp.clip(p_view[:, 0] / tz, -limx, limx) * tz
    ty = jnp.clip(p_view[:, 1] / tz, -limy, limy) * tz

    # J: 2x3 Jacobian of the perspective projection at (tx, ty, tz).
    zero = jnp.zeros_like(tz)
    J = jnp.stack([
        jnp.stack([fx / tz, zero, -(fx * tx) / (tz * tz)], axis=-1),
        jnp.stack([zero, fy / tz, -(fy * ty) / (tz * tz)], axis=-1),
    ], axis=-2)  # [N, 2, 3]

    W = w2c[:3, :3]  # [3, 3] view rotation
    Vrk = jnp.stack([
        jnp.stack([cov3d[:, 0], cov3d[:, 1], cov3d[:, 2]], axis=-1),
        jnp.stack([cov3d[:, 1], cov3d[:, 3], cov3d[:, 4]], axis=-1),
        jnp.stack([cov3d[:, 2], cov3d[:, 4], cov3d[:, 5]], axis=-1),
    ], axis=-2)  # [N, 3, 3]

    JW = jnp.einsum("nij,jk->nik", J, W)  # [N, 2, 3]
    cov = jnp.einsum("nij,njk,nlk->nil", JW, Vrk, JW)  # [N, 2, 2]
    cxx = cov[:, 0, 0] + lowpass
    cyy = cov[:, 1, 1] + lowpass
    cxy = cov[:, 0, 1]
    return jnp.stack([cxx, cxy, cyy], axis=-1)


def preprocess(means3d: jnp.ndarray, cov3d: jnp.ndarray, w2c: jnp.ndarray,
               full_proj: jnp.ndarray, tanfovx, tanfovy,
               width: int, height: int, cfg: RasterConfig,
               ndc_offset: jnp.ndarray | None = None) -> Preprocessed:
    """Project Gaussians and compute screen-space footprints.

    ndc_offset: optional [N, 2] zeros whose gradient reproduces the
    reference's `screenspace_points` viewspace gradient (NDC units,
    gaussian_renderer/__init__.py:53-60) for densification stats.
    """
    fx = width / (2.0 * tanfovx)
    fy = height / (2.0 * tanfovy)
    ty_tiles, tx_tiles = cfg.grid(height, width)

    ones = jnp.ones((means3d.shape[0], 1), means3d.dtype)
    hom = jnp.concatenate([means3d, ones], axis=1)
    p_view = hom @ w2c[:3].T  # [N, 3]
    p_hom = hom @ full_proj.T  # [N, 4]
    denom = p_hom[:, 3] + 1e-7
    p_w = 1.0 / jnp.where(jnp.abs(denom) > 1e-8, denom, 1.0)
    p_proj = p_hom[:, :3] * p_w[:, None]

    in_front = p_view[:, 2] > cfg.near

    cov = compute_cov2d(p_view, cov3d, w2c, fx, fy, tanfovx, tanfovy, cfg.lowpass)
    det = cov[:, 0] * cov[:, 2] - cov[:, 1] * cov[:, 1]
    det_ok = det != 0.0
    det_inv = 1.0 / jnp.where(det_ok, det, 1.0)
    conic = jnp.stack([cov[:, 2] * det_inv, -cov[:, 1] * det_inv,
                       cov[:, 0] * det_inv], axis=-1)

    mid = 0.5 * (cov[:, 0] + cov[:, 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    # max eigenvalue can be negative for culled garbage rows; clamp keeps
    # forward (and thus backward residuals) NaN-free.
    radius_f = jnp.ceil(3.0 * jnp.sqrt(
        jnp.maximum(jnp.maximum(lambda1, mid - disc), 1e-8)))

    px = ndc2pix(p_proj[:, 0], width)
    py = ndc2pix(p_proj[:, 1], height)
    if ndc_offset is not None:
        # Zero-valued hook: d(px)/d(ndc_offset_x) = W/2 exactly like the
        # CUDA ddelx_dx factor (backward.cu:505-506,616-617).
        px = px + ndc_offset[:, 0] * (0.5 * width)
        py = py + ndc_offset[:, 1] * (0.5 * height)
    means2d = jnp.stack([px, py], axis=-1)

    # getRect (auxiliary.h:46-56), with our tile shape.
    r = radius_f
    rect_min_x = jnp.clip((px - r) / cfg.tile_w, 0, tx_tiles).astype(jnp.int32)
    rect_min_y = jnp.clip((py - r) / cfg.tile_h, 0, ty_tiles).astype(jnp.int32)
    rect_max_x = jnp.clip((px + r + cfg.tile_w - 1) / cfg.tile_w, 0, tx_tiles).astype(jnp.int32)
    rect_max_y = jnp.clip((py + r + cfg.tile_h - 1) / cfg.tile_h, 0, ty_tiles).astype(jnp.int32)

    area = (rect_max_x - rect_min_x) * (rect_max_y - rect_min_y)
    valid = in_front & det_ok & (area > 0)

    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(valid, area, 0).astype(jnp.int32)

    return Preprocessed(
        valid=valid,
        means2d=means2d,
        conic=conic,
        depth=p_view[:, 2],
        pos_view=p_view,
        radius=radius,
        rect_min=jnp.stack([rect_min_x, rect_min_y], axis=-1),
        rect_max=jnp.stack([rect_max_x, rect_max_y], axis=-1),
        tiles_touched=tiles_touched,
    )

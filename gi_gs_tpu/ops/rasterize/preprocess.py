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

import jax
import jax.numpy as jnp

from .config import RasterConfig


class PreFlat(NamedTuple):
    """1-D per-gaussian columns mirroring the stacked Preprocessed fields.

    TPU layout note: [N, 2]/[N, 3] stacks get column-major-ish layouts
    from XLA, and slicing their columns downstream inserts pathological
    T(1,128)->T(8,128) layout-conversion copies (~0.5 ms per column at
    lego scale). Consumers that need per-column access (the binning
    backends, the Pallas table packers) read these 1-D T(1024) views
    instead; XLA CSEs them with the stacked versions for free."""
    px: jnp.ndarray         # [N] mean2d x
    py: jnp.ndarray         # [N] mean2d y
    cxx: jnp.ndarray        # [N] conic xx
    cxy: jnp.ndarray        # [N] conic xy
    cyy: jnp.ndarray        # [N] conic yy
    rmin_x: jnp.ndarray     # [N] int32
    rmin_y: jnp.ndarray     # [N] int32
    rmax_x: jnp.ndarray     # [N] int32
    rmax_y: jnp.ndarray     # [N] int32


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
    opacity: jnp.ndarray    # [N] activated opacity (1.0 when not provided);
                            # consumed by the binning tile-cull only
    flat: PreFlat           # 1-D column views (see PreFlat)


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

    # cov2d = (J W) Vrk (J W)^T with the 2x3 Jacobian J of the perspective
    # projection. Written as fused per-row scalar math (a batch of 3x3
    # matmuls over N rows lowers terribly on TPU — tiny-matrix einsums get
    # scalarised; these ~40 elementwise ops fuse into a few VPU passes).
    j00 = fx / tz
    j02 = -(fx * tx) / (tz * tz)
    j11 = fy / tz
    j12 = -(fy * ty) / (tz * tz)

    W = w2c[:3, :3]
    # Row vectors of T = J @ W (only two rows are nonzero).
    t0x = j00 * W[0, 0] + j02 * W[2, 0]
    t0y = j00 * W[0, 1] + j02 * W[2, 1]
    t0z = j00 * W[0, 2] + j02 * W[2, 2]
    t1x = j11 * W[1, 0] + j12 * W[2, 0]
    t1y = j11 * W[1, 1] + j12 * W[2, 1]
    t1z = j11 * W[1, 2] + j12 * W[2, 2]

    c0, c1, c2, c3, c4, c5 = (cov3d[:, 0], cov3d[:, 1], cov3d[:, 2],
                              cov3d[:, 3], cov3d[:, 4], cov3d[:, 5])
    # u = Vrk @ t_row for each of the two rows (Vrk symmetric).
    u0x = c0 * t0x + c1 * t0y + c2 * t0z
    u0y = c1 * t0x + c3 * t0y + c4 * t0z
    u0z = c2 * t0x + c4 * t0y + c5 * t0z
    u1x = c0 * t1x + c1 * t1y + c2 * t1z
    u1y = c1 * t1x + c3 * t1y + c4 * t1z
    u1z = c2 * t1x + c4 * t1y + c5 * t1z

    cxx = t0x * u0x + t0y * u0y + t0z * u0z + lowpass
    cxy = t0x * u1x + t0y * u1y + t0z * u1z
    cyy = t1x * u1x + t1y * u1y + t1z * u1z + lowpass
    return cxx, cxy, cyy


def preprocess(means3d: jnp.ndarray, cov3d: jnp.ndarray, w2c: jnp.ndarray,
               full_proj: jnp.ndarray, tanfovx, tanfovy,
               width: int, height: int, cfg: RasterConfig,
               ndc_offset: jnp.ndarray | None = None,
               opacity: jnp.ndarray | None = None) -> Preprocessed:
    """Project Gaussians and compute screen-space footprints.

    ndc_offset: optional [N, 2] zeros whose gradient reproduces the
    reference's `screenspace_points` viewspace gradient (NDC units,
    gaussian_renderer/__init__.py:53-60) for densification stats.

    opacity: optional [N] or [N, 1] activated opacity. When given, the
    tile rect uses the *effective* radius r_eff = sigma * sqrt(2 ln(op /
    alpha_min)) instead of the reference's fixed 3 sigma
    (auxiliary.h:46-56): beyond r_eff, alpha < 1/255 at every pixel, so
    the per-pixel pass test (forward.cu:537-541) rejects the splat and
    the composited output is bit-identical — the binning/compositing
    load just shrinks (a lot, for low-opacity splats). The *reported*
    radius stays the reference's ceil(3 sigma) so visibility and
    densification statistics match exactly.
    """
    fx = width / (2.0 * tanfovx)
    fy = height / (2.0 * tanfovy)
    ty_tiles, tx_tiles = cfg.grid(height, width)

    # Point transforms as broadcast scalar math: [N,4]x[4,4] matmuls get
    # padded to 128-wide K on the MXU by XLA (~100x memory blowup).
    x, y, z = means3d[:, 0], means3d[:, 1], means3d[:, 2]

    def xform(M, row):
        return M[row, 0] * x + M[row, 1] * y + M[row, 2] * z + M[row, 3]

    view_z = xform(w2c, 2)
    p_view = jnp.stack([xform(w2c, 0), xform(w2c, 1), view_z], axis=-1)
    hx, hy, hz, hw = (xform(full_proj, 0), xform(full_proj, 1),
                      xform(full_proj, 2), xform(full_proj, 3))
    denom = hw + 1e-7
    p_w = 1.0 / jnp.where(jnp.abs(denom) > 1e-8, denom, 1.0)

    in_front = view_z > cfg.near

    covxx, covxy, covyy = compute_cov2d(p_view, cov3d, w2c, fx, fy,
                                        tanfovx, tanfovy, cfg.lowpass)
    det = covxx * covyy - covxy * covxy
    det_ok = det != 0.0
    det_inv = 1.0 / jnp.where(det_ok, det, 1.0)
    conic_xx = covyy * det_inv
    conic_xy = -covxy * det_inv
    conic_yy = covxx * det_inv
    conic = jnp.stack([conic_xx, conic_xy, conic_yy], axis=-1)

    mid = 0.5 * (covxx + covyy)
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda1 = mid + disc
    # max eigenvalue can be negative for culled garbage rows; clamp keeps
    # forward (and thus backward residuals) NaN-free.
    sigma = jnp.sqrt(jnp.maximum(jnp.maximum(lambda1, mid - disc), 1e-8))
    radius_f = jnp.ceil(3.0 * sigma)

    if opacity is None:
        op = jnp.ones(means3d.shape[0], jnp.float32)
    else:
        op = jax.lax.stop_gradient(jnp.reshape(opacity, (-1,)))
    # Effective cutoff: op * exp(-r^2 / (2 sigma^2)) < alpha_min beyond
    # s * sigma with s = sqrt(2 ln(op / alpha_min)); the reference's 3
    # sigma corresponds to op = 1 (s = 3.33, capped to 3 like CUDA).
    s_cut = jnp.sqrt(2.0 * jnp.log(
        jnp.maximum(op, cfg.alpha_min) / cfg.alpha_min))
    s_cut = jnp.where(op < cfg.alpha_min, 0.0, jnp.minimum(s_cut, 3.0))
    radius_cut = jnp.ceil(s_cut * sigma)

    px = ndc2pix(hx * p_w, width)
    py = ndc2pix(hy * p_w, height)
    if ndc_offset is not None:
        # Zero-valued hook: d(px)/d(ndc_offset_x) = W/2 exactly like the
        # CUDA ddelx_dx factor (backward.cu:505-506,616-617).
        px = px + ndc_offset[:, 0] * (0.5 * width)
        py = py + ndc_offset[:, 1] * (0.5 * height)
    means2d = jnp.stack([px, py], axis=-1)

    # getRect (auxiliary.h:46-56), with our tile shape.
    def rect_cuda(r):
        """The reference formula: (p + r + B - 1) / B truncates the FLOAT
        numerator, so for fractional p the exclusive bound can miss the
        last covered pixel row — slack the 3-sigma radius absorbs. Kept
        verbatim for coverage/visibility parity."""
        rminx = jnp.clip((px - r) / cfg.tile_w, 0, tx_tiles).astype(jnp.int32)
        rminy = jnp.clip((py - r) / cfg.tile_h, 0, ty_tiles).astype(jnp.int32)
        rmaxx = jnp.clip((px + r + cfg.tile_w - 1) / cfg.tile_w, 0,
                         tx_tiles).astype(jnp.int32)
        rmaxy = jnp.clip((py + r + cfg.tile_h - 1) / cfg.tile_h, 0,
                         ty_tiles).astype(jnp.int32)
        return rminx, rminy, rmaxx, rmaxy

    def rect_exact(r):
        """Exact pixel-coverage rect for a tight radius: the last integer
        pixel <= p + r lives in tile floor(floor(p + r) / B)."""
        rminx = jnp.clip((px - r) / cfg.tile_w, 0, tx_tiles).astype(jnp.int32)
        rminy = jnp.clip((py - r) / cfg.tile_h, 0, ty_tiles).astype(jnp.int32)
        rmaxx = jnp.clip(jnp.floor(px + r) // cfg.tile_w + 1, 0,
                         tx_tiles).astype(jnp.int32)
        rmaxy = jnp.clip(jnp.floor(py + r) // cfg.tile_h + 1, 0,
                         ty_tiles).astype(jnp.int32)
        return rminx, rminy, rmaxx, rmaxy

    r3 = rect_cuda(radius_f)
    rc_ = rect_exact(radius_cut)
    # Emission rect = exact(r_eff) INTERSECT cuda(3 sigma): never wider
    # than the reference's coverage (pixels outside its rect must not
    # composite), never misses a pixel that can pass the alpha test.
    rect_min_x = jnp.maximum(rc_[0], r3[0])
    rect_min_y = jnp.maximum(rc_[1], r3[1])
    rect_max_x = jnp.minimum(rc_[2], r3[2])
    rect_max_y = jnp.minimum(rc_[3], r3[3])
    area = (jnp.maximum(rect_max_x - rect_min_x, 0) *
            jnp.maximum(rect_max_y - rect_min_y, 0))
    area_ref = (r3[2] - r3[0]) * (r3[3] - r3[1])

    # Reported radius/visibility use the reference's 3-sigma footprint so
    # densification statistics are unchanged; instance emission uses the
    # tighter opacity-aware rect.
    valid_vis = in_front & det_ok & (area_ref > 0)
    valid = in_front & det_ok & (area > 0)

    radius = jnp.where(valid_vis, radius_f, 0.0).astype(jnp.int32)
    tiles_touched = jnp.where(valid, area, 0).astype(jnp.int32)

    return Preprocessed(
        valid=valid,
        means2d=means2d,
        conic=conic,
        depth=view_z,
        pos_view=p_view,
        radius=radius,
        rect_min=jnp.stack([rect_min_x, rect_min_y], axis=-1),
        rect_max=jnp.stack([rect_max_x, rect_max_y], axis=-1),
        tiles_touched=tiles_touched,
        opacity=op,
        flat=PreFlat(px=px, py=py, cxx=conic_xx, cxy=conic_xy,
                     cyy=conic_yy, rmin_x=rect_min_x, rmin_y=rect_min_y,
                     rmax_x=rect_max_x, rmax_y=rect_max_y),
    )

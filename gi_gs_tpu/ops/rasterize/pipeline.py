"""End-to-end rasterization: preprocess -> bin/sort -> composite -> images.

The jittable equivalent of `CudaRasterizer::Rasterizer::forward`
(rasterizer_impl.cu:486-640) returning the full G-buffer of the reference
`renderCUDA` (forward.cu:423-633).
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .binning import bin_and_sort, Binning
from .composite import composite, NUM_CH
from .config import RasterConfig
from .preprocess import preprocess, Preprocessed


class RasterOutput(NamedTuple):
    color: jnp.ndarray        # [3, H, W] with background composited
    opacity: jnp.ndarray      # [1, H, W] accumulated weight
    depth: jnp.ndarray        # [1, H, W] weight-normalised view z
    normal: jnp.ndarray       # [3, H, W] accumulated world normal (raw)
    normal_view: jnp.ndarray  # [3, H, W] normalised view-space normal (no grad)
    pos_view: jnp.ndarray     # [3, H, W] weight-normalised view position
    albedo: jnp.ndarray       # [3, H, W]
    roughness: jnp.ndarray    # [1, H, W] (+final_T when inference)
    metallic: jnp.ndarray     # [1, H, W]
    final_t: jnp.ndarray      # [1, H, W] residual transmittance
    radii: jnp.ndarray        # [N] int32 screen radii (0 = culled)
    visibility: jnp.ndarray   # [N] bool
    overflow: jnp.ndarray     # [] int32 dropped instances (diagnostics)
    max_tile_count: jnp.ndarray  # [] int32 (diagnostics)


def _tiles_to_image(tiles: jnp.ndarray, grid, cfg: RasterConfig,
                    height: int, width: int) -> jnp.ndarray:
    """[T, CH, P] -> [CH, H, W] (crop the tile padding)."""
    ty, tx = grid
    ch = tiles.shape[1]
    img = tiles.reshape(ty, tx, ch, cfg.tile_h, cfg.tile_w)
    img = img.transpose(2, 0, 3, 1, 4).reshape(ch, ty * cfg.tile_h, tx * cfg.tile_w)
    return img[:, :height, :width]


def _ref_quotient(num: jnp.ndarray, den: jnp.ndarray) -> jnp.ndarray:
    """value = num/den (den>1e-6 else 0) but gradient d/d(num) = 1, matching
    the CUDA backward which routes the depth/pos cotangent straight to the
    weighted sum (backward.cu:590) and drops the quotient term."""
    val = jnp.where(den > 1e-6, num / jnp.where(den > 1e-6, den, 1.0), 0.0)
    return num + jax.lax.stop_gradient(val - num)


def mark_visible(means3d: jnp.ndarray, w2c: jnp.ndarray,
                 near: float = 0.2) -> jnp.ndarray:
    """Frustum-culling visibility (ref markVisible ->
    checkFrustum/in_frustum, rasterizer_impl.cu:790-803 +
    auxiliary.h:150-176: near-plane test only)."""
    z = (means3d[:, 0] * w2c[2, 0] + means3d[:, 1] * w2c[2, 1] +
         means3d[:, 2] * w2c[2, 2] + w2c[2, 3])
    return z > near


def compute_peak_depth_pos(table, binning, cfg: RasterConfig, grid,
                           height: int, width: int):
    """Argmax-weight ("peak") depth/position selection
    (ref forward.cu:577-583,619-622, enabled by argmax_depth). Forward-only
    (the reference never differentiates it); returns
    (peak_depth [1, H, W], peak_pos [3, H, W])."""
    from .composite import (_chunk_geometry, _gather_chunk, _num_steps,
                            _tile_pixel_coords)
    table = jax.lax.stop_gradient(table)
    T = grid[0] * grid[1]
    P = cfg.pixels_per_tile
    px, py = _tile_pixel_coords(grid, cfg)
    n_steps = _num_steps(binning.tile_count, cfg)

    def body(state):
        c, t_cur, done, max_w, pk = state
        row, valid, _ = _gather_chunk(table, binning.ids, binning.tile_start,
                                      binning.tile_count, c, cfg)
        a, pass_mask, _, _, _ = _chunk_geometry(row, valid, px, py, cfg)
        cp = jnp.cumprod(1.0 - a, axis=1)
        t_incl = t_cur[:, None, :] * cp
        t_prev = t_cur[:, None, :] * jnp.concatenate(
            [jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1)
        contrib = pass_mask & (t_incl >= cfg.t_min) & ~done[:, None, :]
        w = jnp.where(contrib, a * t_prev, 0.0)            # [T, K, P]
        # CUDA updates on strictly-greater weight per instance in order;
        # chunk argmax resolves ties to the first index, then strictly-
        # greater across chunks -> identical selection.
        best_k = jnp.argmax(w, axis=1)                     # [T, P]
        best_w = jnp.take_along_axis(w, best_k[:, None, :], axis=1)[:, 0]
        upd = best_w > max_w
        new_pk = []
        for col in (17, 18, 19, 20):  # depth, pos_view xyz
            v = jnp.take_along_axis(row[..., col], best_k, axis=1)  # [T, P]
            new_pk.append(jnp.where(upd, v, pk[len(new_pk)]))
        max_w = jnp.where(upd, best_w, max_w)
        t_new = jnp.minimum(
            jnp.where(contrib, t_incl, jnp.inf).min(axis=1), t_cur)
        done_new = done | (pass_mask & (t_incl < cfg.t_min)).any(axis=1)
        return c + 1, t_new, done_new, max_w, tuple(new_pk)

    zero = jnp.zeros((T, P), jnp.float32)
    init = (jnp.int32(0), jnp.ones((T, P), jnp.float32),
            jnp.zeros((T, P), bool), zero, (zero, zero, zero, zero))
    _, _, _, _, pk = jax.lax.while_loop(lambda s: s[0] < n_steps, body, init)
    stacked = jnp.stack(pk, axis=1)                         # [T, 4, P]
    img = _tiles_to_image(stacked, grid, cfg, height, width)
    return img[0:1], img[1:4]


@functools.partial(jax.jit, static_argnames=("height", "width", "cfg"))
def count_instances(means3d: jnp.ndarray, cov3d: jnp.ndarray,
                    w2c: jnp.ndarray, full_proj: jnp.ndarray,
                    tanfovx, tanfovy, height: int, width: int,
                    cfg: RasterConfig,
                    opacity: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Exact (gaussian, tile) instance count for one view — the TPU analog
    of the reference's `num_rendered` device->host sync
    (rasterizer_impl.cu:589). Used host-side to pick the static
    `cap_instances` bucket (the framework re-jits on overflow instead of
    reallocating per frame). Jitted into ONE program: the eager-op form
    costs ~100 separate remote compiles per probe on networked backends."""
    pre = preprocess(means3d, cov3d, w2c, full_proj, tanfovx, tanfovy,
                     width, height, cfg, opacity=opacity)
    # counts' = max(tiles_touched, 1): every gaussian occupies at least a
    # dummy row in the instance list (see binning.py step 1), so capacity
    # sizing must include them.
    return jnp.maximum(pre.tiles_touched, 1).sum().astype(jnp.int32)


CAP_QUANTUM = 1 << 16  # instance-capacity bucket granularity


def bucket_cap_instances(needed: int, headroom: float = 1.15,
                         quantum: int = CAP_QUANTUM) -> int:
    """Round a measured instance count up to a capacity bucket. Buckets are
    multiples of `quantum` so a recompile only happens when the scene's
    splat-tile population actually outgrows the current bucket."""
    want = max(int(needed * headroom), quantum)
    return -(-want // quantum) * quantum


def _composite_local_tiles(table, b: Binning, cfg: RasterConfig, grid,
                           image_hw, comp, axis: str, n_shards: int):
    """Tile-sharded compositing FROM INSIDE a shard_map: this chip
    composites its contiguous tile range (`tile_base` offset), then an
    all_gather over `axis` reassembles the full tile axis; the AD
    transpose of the all_gather is a psum-scatter, so each chip's
    backward receives exactly its own tiles' cotangents and parameter
    gradients come out as per-chip partials (callers psum them)."""
    T = grid[0] * grid[1]
    pad = (-T) % n_shards
    ts = jnp.pad(b.tile_start, (0, pad))
    tc = jnp.pad(b.tile_count, (0, pad))
    t_local = (T + pad) // n_shards
    base = (jax.lax.axis_index(axis) * t_local).astype(jnp.int32)
    ts_l = jax.lax.dynamic_slice_in_dim(ts, base, t_local)
    tc_l = jax.lax.dynamic_slice_in_dim(tc, base, t_local)
    accum, final_t = comp(table, b.ids, ts_l, tc_l, b.inst_tile, b.inv_perm,
                          b.offsets, b.seg_gaussian, cfg, grid, image_hw,
                          base)
    accum = jax.lax.all_gather(accum, axis, axis=0, tiled=True)[:T]
    final_t = jax.lax.all_gather(final_t, axis, axis=0, tiled=True)[:T]
    return accum, final_t


def rasterize(means3d: jnp.ndarray,
              cov3d: jnp.ndarray,
              opacity: jnp.ndarray,       # [N, 1] activated
              color: jnp.ndarray,         # [N, 3] per-view RGB (SH-evaluated)
              normal: jnp.ndarray,        # [N, 3] activated (unit)
              albedo: jnp.ndarray,        # [N, 3] activated
              roughness: jnp.ndarray,     # [N, 1] activated
              metallic: jnp.ndarray,      # [N, 1] activated
              w2c: jnp.ndarray, full_proj: jnp.ndarray,
              tanfovx, tanfovy, height: int, width: int,
              bg_color: jnp.ndarray,      # [3]
              cfg: RasterConfig,
              ndc_offset: Optional[jnp.ndarray] = None,
              inference: bool = False,
              argmax_depth: bool = False,
              tile_axis: Optional[str] = None,
              tile_shards: int = 1) -> RasterOutput:
    """tile_axis/tile_shards: when set (callable only inside a shard_map
    over that mesh axis), the compositing — the dominant cost — is
    sharded by contiguous tile ranges over the axis while preprocess and
    binning run replicated (BASELINE config 5 shape); parameter-gradient
    partials must be psum'd by the caller (see
    parallel/tile_sharded.make_ts_phase1_step)."""
    grid = cfg.grid(height, width)

    pre = preprocess(means3d, cov3d, w2c, full_proj, tanfovx, tanfovy,
                     width, height, cfg, ndc_offset=ndc_offset,
                     opacity=opacity)

    # Binning consumes integer/ordering decisions only — no gradients flow
    # through the sort keys (the CUDA binning is equally non-differentiable).
    b = bin_and_sort(jax.tree.map(jax.lax.stop_gradient, pre), height, width, cfg)

    table = jnp.concatenate([
        pre.means2d, pre.conic, opacity, color, normal, albedo, roughness,
        metallic, pre.depth[:, None], pre.pos_view,
    ], axis=1)  # [N, 21]

    pk_depth = pk_pos = None
    if cfg.use_pallas and argmax_depth:
        # Inference path (forward.cu with argmax_depth — the reference
        # never differentiates it): ONE forward kernel launch produces the
        # accumulation rows AND the peak depth/pos rows; no custom-VJP
        # wrapper needed since the whole G-buffer is stop-gradient here.
        from .pallas_composite import (FINAL_T_ROW, NUM_CH as _NCH,
                                       PEAK_ROWS, _pack_instances,
                                       _use_interpret, composite_fwd_pallas)
        table_sg = jax.lax.stop_gradient(table)
        inst = _pack_instances(table_sg, b.ids, cfg.chunk)
        packed = composite_fwd_pallas(inst, b.tile_start, b.tile_count, cfg,
                                      grid, interpret=_use_interpret(),
                                      peak=True)
        accum, final_t = packed[:, :_NCH], packed[:, FINAL_T_ROW]
        pk_img = _tiles_to_image(packed[:, PEAK_ROWS], grid, cfg,
                                 height, width)
        pk_depth, pk_pos = pk_img[0:1], pk_img[1:4]
    else:
        if cfg.use_pallas:
            from .pallas_composite import composite_pallas
            comp = composite_pallas
        else:
            comp = composite
        if tile_axis is not None:
            assert not argmax_depth, "argmax_depth is single-chip only"
            accum, final_t = _composite_local_tiles(
                table, b, cfg, grid, (height, width), comp, tile_axis,
                tile_shards)
        else:
            accum, final_t = comp(
                table, b.ids, b.tile_start, b.tile_count, b.inst_tile,
                b.inv_perm, b.offsets, b.seg_gaussian, cfg, grid,
                (height, width))

    img = _tiles_to_image(accum, grid, cfg, height, width)   # [CH, H, W]
    t_img = _tiles_to_image(final_t[:, None, :], grid, cfg, height, width)

    o = img[3:4]
    out_color = img[0:3] + t_img * bg_color[:, None, None]
    out_normal = img[4:7]
    out_albedo = img[7:10]
    out_rough = img[10:11] + (t_img if inference else 0.0)  # forward.cu:612-616
    out_metal = img[11:12]
    if argmax_depth:
        # Peak (max-weight) selection instead of the weighted mean
        # (forward.cu:612-628 with argmax_depth).
        if pk_depth is None:
            pk_depth, pk_pos = compute_peak_depth_pos(table, b, cfg, grid,
                                                      height, width)
        out_depth = jnp.where(o > 1e-6, pk_depth, 0.0)
        out_pos = jnp.where(o > 1e-6, pk_pos, 0.0)
    else:
        out_depth = _ref_quotient(img[12:13], o)
        out_pos = _ref_quotient(img[13:16], o)

    # View-space normal: normalised inside the CUDA kernel with no backward
    # path (forward.cu:600-605; absent from backward args) -> stop_gradient.
    n_view = jnp.einsum("ij,jhw->ihw", w2c[:3, :3], out_normal)
    n_norm = jnp.linalg.norm(n_view, axis=0, keepdims=True)
    n_view = jax.lax.stop_gradient(n_view / jnp.maximum(n_norm, 1e-12))

    return RasterOutput(
        color=out_color, opacity=o, depth=out_depth, normal=out_normal,
        normal_view=n_view, pos_view=out_pos, albedo=out_albedo,
        roughness=out_rough, metallic=out_metal, final_t=t_img,
        radii=pre.radius, visibility=pre.radius > 0,
        overflow=b.overflow, max_tile_count=b.max_tile_count)


def rasterize_lite(means3d, cov3d, opacity, color, w2c, full_proj,
                   tanfovx, tanfovy, height, width, bg_color,
                   cfg: RasterConfig, argmax_depth: bool = False):
    """Color/depth/opacity-only path (ref liteRenderCUDA /
    lite_rasterize_gaussians, forward.cu:279-418 — exposed for baking,
    unused by training). Returns (color [3,H,W], opacity [1,H,W],
    depth [1,H,W], final_t [1,H,W])."""
    zeros3 = jnp.zeros_like(color)
    zeros1 = jnp.zeros_like(opacity)
    out = rasterize(means3d, cov3d, opacity, color, zeros3, zeros3, zeros1,
                    zeros1, w2c, full_proj, tanfovx, tanfovy, height, width,
                    bg_color, cfg, argmax_depth=argmax_depth)
    return out.color, out.opacity, out.depth, out.final_t

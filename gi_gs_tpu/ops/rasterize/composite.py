"""Tile compositing: front-to-back alpha blending of the full G-buffer.

TPU-native re-design of `renderCUDA` forward (cuda_rasterizer/forward.cu:
423-633) and backward (backward.cu:404-630).

Key idiom changes vs CUDA:
* The CUDA kernel walks Gaussians sequentially per pixel with early
  termination. Here each tile processes `chunk` Gaussians at a time: the
  transmittance recurrence is an (associative) cumulative product along
  the chunk axis, and the weighted accumulation of every G-buffer channel
  is a [CH, chunk] x [chunk, P] matmul — the MXU does the blending.
* The CUDA backward replays back-to-front using per-pixel `n_contrib` and
  atomicAdd scatter. TPU has no atomics: our backward replays *forward*
  (suffix sums = total - prefix), emits per-instance gradients densely,
  and reduces them per Gaussian with gathers + one contiguous segment sum
  (prefix-sum differences over the gaussian-major instance order).
* The "done" flag (forward.cu:372-377) is reproduced exactly: a pass-
  tested instance whose tentative transmittance falls below 1e-4 does not
  contribute and permanently terminates the pixel. Because the masked
  cumulative product is monotone non-increasing within a chunk, the mask
  `pass & (T_incl >= 1e-4) & ~done_before_chunk` is equivalent to the
  sticky CUDA flag, including its interaction with `n_contrib` in the
  backward (n_contrib is therefore not needed at all).

Faithfully replicated CUDA backward quirks (deliberate deviations from
true autodiff — these ARE the reference gradients):
* Only the color channels and the opacity accumulator couple into
  d(alpha); normal/albedo/roughness/metallic/depth/pos receive
  feature-only gradients (backward.cu:580-594).
* d(alpha)/d(G) ignores the 0.99 alpha clamp (backward.cu:545,609,627).
* The 1-px image-border normal cotangent is zeroed (backward.cu:497-501).
* final_T is a differentiable output; composing `color + final_T * bg`
  outside reproduces the CUDA background term (backward.cu:602-606).

Packed per-Gaussian table layout (columns of `table` [N, D]):
  0:2   means2d (pixel coords)     2:5  conic (xx, xy, yy)
  5     opacity                    6:9  color (SH-evaluated RGB)
  9:12  world normal              12:15 albedo
  15    roughness                 16    metallic
  17    depth (view z)            18:21 pos_view

Accumulated channels (CH = 16): [color3 | ones1 | normal3 | albedo3 |
rough1 | metal1 | depth1 | pos3]; `ones` integrates to the opacity map.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import RasterConfig

TABLE_DIM = 21
NUM_CH = 16
_COUPLED = 4          # color(3) + ones(1) channels couple into d(alpha)
NORMAL_CH = slice(4, 7)


def _tile_pixel_coords(grid, cfg: RasterConfig, tile_base=None, n_local=None):
    """Pixel coordinates per tile: two [T_local, P] float arrays (x, y).

    tile_base: optional traced scalar — global index of the first local
    tile (tile-sharded rendering: each shard owns a contiguous tile
    range); n_local: number of local tiles (defaults to the full grid).
    """
    ty, tx = grid
    P = cfg.pixels_per_tile
    n = ty * tx if n_local is None else n_local
    t = jnp.arange(n, dtype=jnp.int32)
    if tile_base is not None:
        t = t + tile_base
    trow, tcol = t // tx, t % tx
    lp = jnp.arange(P, dtype=jnp.int32)
    ly, lx = lp // cfg.tile_w, lp % cfg.tile_w
    py = (trow[:, None] * cfg.tile_h + ly[None, :]).astype(jnp.float32)
    px = (tcol[:, None] * cfg.tile_w + lx[None, :]).astype(jnp.float32)
    return px, py


def _features(row: jnp.ndarray) -> jnp.ndarray:
    """[.., K, D] table rows -> [.., K, CH] blended feature vector."""
    ones = jnp.ones(row.shape[:-1] + (1,), row.dtype)
    return jnp.concatenate([row[..., 6:9], ones, row[..., 9:21]], axis=-1)


def _chunk_geometry(row, valid, px, py, cfg: RasterConfig):
    """Per-(instance, pixel) alpha for one chunk.

    row: [T, K, D]; valid: [T, K]; px/py: [T, P].
    Returns (a, pass_mask, G, dx, dy) each [T, K, P] (a==0 where masked).
    Implements forward.cu:529-547.
    """
    dx = row[..., 0:1] - px[:, None, :]   # [T, K, P]
    dy = row[..., 1:2] - py[:, None, :]
    cxx, cxy, cyy = row[..., 2:3], row[..., 3:4], row[..., 4:5]
    power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
    G = jnp.exp(power)
    alpha = jnp.minimum(cfg.alpha_clamp, row[..., 5:6] * G)
    pass_mask = (power <= 0.0) & (alpha >= cfg.alpha_min) & valid[..., None]
    a = jnp.where(pass_mask, alpha, 0.0)
    return a, pass_mask, G, dx, dy


def _gather_chunk(table, ids, tile_start, tile_count, c, cfg: RasterConfig):
    K = cfg.chunk
    cap = ids.shape[0]
    pos = tile_start[:, None] + c * K + jnp.arange(K, dtype=jnp.int32)[None, :]
    valid = (c * K + jnp.arange(K, dtype=jnp.int32))[None, :] < tile_count[:, None]
    gid = ids[jnp.clip(pos, 0, cap - 1)]          # [T, K]
    row = table[gid]                               # [T, K, D]
    return row, valid, gid


def _num_steps(tile_count, cfg):
    return jnp.minimum(
        -(-tile_count.max() // cfg.chunk), cfg.chunks_per_tile).astype(jnp.int32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def composite(table, ids, tile_start, tile_count, inst_tile, inv_perm,
              offsets, seg_gaussian, cfg: RasterConfig,
              grid: Tuple[int, int],
              image_hw: Tuple[int, int], tile_base=None):
    """Blend sorted instances into per-tile accumulators.

    Args:
      table: [N, TABLE_DIM] packed per-Gaussian attributes (differentiable).
      ids/tile_start/tile_count/inst_tile/inv_perm/offsets/seg_gaussian:
        binning metadata (int32, non-differentiable).
      cfg/grid/image_hw: static.

    Returns:
      accum:   [T, CH, P] weighted feature sums (alpha * transmittance).
      final_T: [T, P] residual transmittance.
    """
    return _fwd_impl(table, ids, tile_start, tile_count, cfg, grid,
                     tile_base)


def _fwd_impl(table, ids, tile_start, tile_count, cfg, grid, tile_base=None):
    T = tile_start.shape[0]
    P = cfg.pixels_per_tile
    px, py = _tile_pixel_coords(grid, cfg, tile_base, T)
    n_steps = _num_steps(tile_count, cfg)

    def body(state):
        c, t_cur, done, acc = state
        row, valid, _ = _gather_chunk(table, ids, tile_start, tile_count, c, cfg)
        a, pass_mask, _, _, _ = _chunk_geometry(row, valid, px, py, cfg)
        cp = jnp.cumprod(1.0 - a, axis=1)                      # [T, K, P]
        t_incl = t_cur[:, None, :] * cp
        t_prev = t_cur[:, None, :] * jnp.concatenate(
            [jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1)
        contrib = pass_mask & (t_incl >= cfg.t_min) & ~done[:, None, :]
        w = jnp.where(contrib, a * t_prev, 0.0)                # [T, K, P]
        f = _features(row)                                     # [T, K, CH]
        acc = acc + jnp.einsum("tkc,tkp->tcp", f, w,
                               preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        t_new = jnp.minimum(
            jnp.where(contrib, t_incl, jnp.inf).min(axis=1), t_cur)
        done_new = done | (pass_mask & (t_incl < cfg.t_min)).any(axis=1)
        return c + 1, t_new, done_new, acc

    init = (jnp.int32(0), jnp.ones((T, P), jnp.float32),
            jnp.zeros((T, P), bool), jnp.zeros((T, NUM_CH, P), jnp.float32))
    _, final_t, _, accum = jax.lax.while_loop(
        lambda s: s[0] < n_steps, body, init)
    return accum, final_t


def _composite_fwd(table, ids, tile_start, tile_count, inst_tile, inv_perm,
                   offsets, seg_gaussian, cfg, grid, image_hw,
                   tile_base=None):
    out = _fwd_impl(table, ids, tile_start, tile_count, cfg, grid, tile_base)
    res = (table, ids, tile_start, tile_count, inst_tile, inv_perm, offsets,
           seg_gaussian, tile_base, out[0], out[1])
    return out, res


def _border_mask(grid, cfg, image_hw, tile_base=None, n_local=None):
    """[T, P] float mask: 0 on the 1-px true-image border (and beyond),
    1 inside — the CUDA edge-normal gradient skip (backward.cu:497-501)."""
    H, W = image_hw
    px, py = _tile_pixel_coords(grid, cfg, tile_base, n_local)
    inside = (px > 0) & (px < W - 1) & (py > 0) & (py < H - 1)
    return inside.astype(jnp.float32)


def _composite_bwd(cfg, grid, image_hw, res, cotangents):
    (table, ids, tile_start, tile_count, inst_tile, inv_perm, offsets,
     seg_gaussian, tile_base, accum, final_t) = res
    g_acc, g_t = cotangents
    T = tile_start.shape[0]
    P = cfg.pixels_per_tile
    K = cfg.chunk
    steps = cfg.chunks_per_tile
    px, py = _tile_pixel_coords(grid, cfg, tile_base, T)

    # Border-pixel normal cotangent zeroing (backward.cu:497-501).
    bmask = _border_mask(grid, cfg, image_hw, tile_base, T)[:, None, :]
    g_acc = jnp.concatenate([
        g_acc[:, :NORMAL_CH.start],
        g_acc[:, NORMAL_CH] * bmask,
        g_acc[:, NORMAL_CH.stop:],
    ], axis=1)

    a_total = accum[:, :_COUPLED, :]                           # [T, 4, P]
    n_steps = _num_steps(tile_count, cfg)

    def body(state):
        c, t_cur, done, prefix, grads = state
        row, valid, _ = _gather_chunk(table, ids, tile_start, tile_count, c, cfg)
        a, pass_mask, G, dx, dy = _chunk_geometry(row, valid, px, py, cfg)
        f = _features(row)                                     # [T, K, CH]
        cp = jnp.cumprod(1.0 - a, axis=1)
        t_incl = t_cur[:, None, :] * cp
        t_prev = t_cur[:, None, :] * jnp.concatenate(
            [jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1)
        contrib = pass_mask & (t_incl >= cfg.t_min) & ~done[:, None, :]
        w = jnp.where(contrib, a * t_prev, 0.0)                # [T, K, P]

        # Feature gradients for every channel: dL/df[k,ch] = sum_p w g_ch.
        dfeat = jnp.einsum("tkp,tcp->tkc", w, g_acc,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)  # [T, K, CH]

        # alpha gradient from coupled channels; suffix sums via
        # total - inclusive prefix (the forward-replay version of CUDA's
        # back-to-front accum_rec, backward.cu:570-594).
        wf = w[:, :, None, :] * f[:, :, :_COUPLED, None]       # [T, K, 4, P]
        prefix_incl = prefix[:, None, :, :] + jnp.cumsum(wf, axis=1)
        suffix = a_total[:, None, :, :] - prefix_incl          # [T, K, 4, P]
        one_minus = jnp.where(contrib, 1.0 - a, 1.0)
        d_alpha = jnp.einsum(
            "tkcp,tcp->tkp",
            f[:, :, :_COUPLED, None] * t_prev[:, :, None, :]
            - suffix / one_minus[:, :, None, :],
            g_acc[:, :_COUPLED, :], preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        # final_T path == CUDA's background term (backward.cu:602-606).
        d_alpha = d_alpha + g_t[:, None, :] * (-final_t[:, None, :] / one_minus)
        d_alpha = jnp.where(contrib, d_alpha, 0.0)             # [T, K, P]

        # CUDA quirk: no 0.99-clamp gating (backward.cu:609,627).
        op = row[..., 5:6]
        d_G = op * d_alpha
        d_op = (G * d_alpha).sum(axis=2)
        cxx, cxy, cyy = row[..., 2:3], row[..., 3:4], row[..., 4:5]
        dLdG_G = d_G * G
        d_mx = (dLdG_G * -(cxx * dx + cxy * dy)).sum(axis=2)    # [T, K]
        d_my = (dLdG_G * -(cyy * dy + cxy * dx)).sum(axis=2)
        d_cxx = (dLdG_G * (-0.5 * dx * dx)).sum(axis=2)
        d_cxy = (dLdG_G * (-dx * dy)).sum(axis=2)
        d_cyy = (dLdG_G * (-0.5 * dy * dy)).sum(axis=2)

        g_row = jnp.concatenate([
            d_mx[..., None], d_my[..., None], d_cxx[..., None],
            d_cxy[..., None], d_cyy[..., None], d_op[..., None],
            dfeat[..., 0:3], dfeat[..., 4:16],
        ], axis=-1)                                             # [T, K, 21]
        g_row = jnp.where(valid[..., None], g_row, 0.0)
        grads = jax.lax.dynamic_update_slice(grads, g_row[None], (c, 0, 0, 0))

        prefix_new = prefix + wf.sum(axis=1)
        t_new = jnp.minimum(
            jnp.where(contrib, t_incl, jnp.inf).min(axis=1), t_cur)
        done_new = done | (pass_mask & (t_incl < cfg.t_min)).any(axis=1)
        return c + 1, t_new, done_new, prefix_new, grads

    init = (jnp.int32(0), jnp.ones((T, P), jnp.float32),
            jnp.zeros((T, P), bool),
            jnp.zeros((T, _COUPLED, P), jnp.float32),
            jnp.zeros((steps, T, K, TABLE_DIM), jnp.float32))
    _, _, _, _, grads = jax.lax.while_loop(lambda s: s[0] < n_steps, body, init)

    d_table = _reduce_to_gaussians(grads, inst_tile, tile_start, tile_count,
                                   inv_perm, offsets, seg_gaussian,
                                   table.shape[0], cfg, grid, tile_base)
    return (d_table, None, None, None, None, None, None, None, None)


def _reduce_to_gaussians(grads, inst_tile, tile_start, tile_count, inv_perm,
                         offsets, seg_gaussian, num_gaussians, cfg, grid,
                         tile_base=None):
    """[steps, T, K, D] chunk-grads -> per-Gaussian [N, D], scatter-free.

    Sorted instance s lives at (c, t, k) with t = inst_tile[s],
    j = s - tile_start[t], c = j // K, k = j % K. The pre-sort instance
    order is depth-rank-major, so after unsorting (one gather through
    inv_perm) the per-Gaussian reduction is a prefix-sum difference plus
    a final permutation back to original gaussian order.
    """
    T = tile_start.shape[0]
    K = cfg.chunk
    cap = inst_tile.shape[0]
    base = 0 if tile_base is None else tile_base
    s = jnp.arange(cap, dtype=jnp.int32)
    # inst_tile holds GLOBAL tile ids; this shard owns [base, base+T).
    t_local = inst_tile - base
    t = jnp.clip(t_local, 0, T - 1)
    j = s - tile_start[t]
    lin = (j // K) * (T * K) + t * K + (j % K)
    in_tile = (t_local >= 0) & (t_local < T) & (j >= 0) & (j < tile_count[t])
    lin = jnp.clip(lin, 0, grads.shape[0] * T * K - 1)
    g_sorted = grads.reshape(-1, TABLE_DIM)[lin]
    g_sorted = jnp.where(in_tile[:, None], g_sorted, 0.0)
    return reduce_sorted_instance_grads(g_sorted, inv_perm, offsets,
                                        seg_gaussian)


def reduce_sorted_instance_grads(g_sorted, inv_perm, offsets, seg_gaussian):
    """[CAP, D] sorted-instance grads -> per-Gaussian [N, D]: unsort to the
    depth-rank-major pre-sort order (one gather), contiguous segment sums
    via prefix-sum differences, then a permutation scatter back to the
    original gaussian order. Shared by the jnp and Pallas paths."""
    cap, D = g_sorted.shape
    g_orig = g_sorted[inv_perm]                            # depth-rank-major
    csum = jnp.cumsum(g_orig, axis=0, dtype=jnp.float32)
    csum = jnp.concatenate([jnp.zeros((1, D), csum.dtype), csum], axis=0)
    lo = jnp.clip(offsets[:-1], 0, cap)
    hi = jnp.clip(offsets[1:], 0, cap)
    seg = csum[hi] - csum[lo]                       # [N, D] segment order
    if seg_gaussian is None:
        return seg
    return jnp.zeros_like(seg).at[seg_gaussian].set(seg, unique_indices=True)


composite.defvjp(_composite_fwd, _composite_bwd)

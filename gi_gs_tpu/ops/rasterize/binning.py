"""Tile binning: ragged (gaussian, tile) instance expansion + depth sort.

TPU-native replacement for the CUDA binning stage (duplicateWithKeys +
CUB radix sort + identifyTileRanges, rasterizer_impl.cu:70-138,582-630).

The CUDA path sizes its instance buffer with a device->host sync
(`num_rendered`, rasterizer_impl.cu:589) which is un-jittable; here the
instance list has a static capacity and we report overflow instead.

Pipeline (all static shapes, no atomics):
  1. exclusive-scan of per-Gaussian instance counts -> offsets. Every
     gaussian emits max(tiles_touched, 1) instances: culled gaussians
     contribute one sentinel-tile "dummy", which bounds the gaussian
     span of any 128-instance block and lets the Pallas expansion fetch
     one contiguous table window per block (pallas_expand.py). Dummies
     sort into the sentinel region and never reach a tile list.
  2. ragged expansion: instance j -> owning gaussian, cell within its
     tile rect, depth, and an exact per-tile alpha cull. Two backends:
     a Pallas kernel (default on TPU; monotone-window DMA + one-hot MXU
     row select) and an XLA path (scatter markers + cumsum + row
     gather) kept as the oracle.
  3. stable multi-key sort by (tile_id, depth) with lax.sort,
  4. tile ranges via searchsorted over the sorted tile ids.

The original (pre-sort) instance order is gaussian-major, so per-Gaussian
gradient reduction in the backward is a contiguous segment sum after
unsorting — no scatter-adds anywhere (TPU has no fast atomics).

Note on a rejected design (measured slower on v5e): pre-sorting the
*gaussians* by depth makes instance emission depth-major, which reduces
the instance sort to a single fused int32 key. The cheaper sort was
outweighed by the N-row depth sort and the extra gathers. The
`seg_gaussian` field (identity here) keeps the interface general for
that family of layouts.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .config import RasterConfig
from .preprocess import Preprocessed


class Binning(NamedTuple):
    ids: jnp.ndarray         # [CAP] int32 ORIGINAL gaussian index per sorted instance
    inst_tile: jnp.ndarray   # [CAP] int32 tile id per sorted instance (T = sentinel)
    perm: jnp.ndarray        # [CAP] int32 pre-sort (gaussian-major) position
    inv_perm: jnp.ndarray    # [CAP] int32 inverse of perm
    tile_start: jnp.ndarray  # [T] int32 first sorted-instance row of each tile
    tile_count: jnp.ndarray  # [T] int32 instances in each tile (capped at cap_tile)
    offsets: jnp.ndarray     # [N+1] int32 per-gaussian segment bounds (segment
                             # order, counts' = max(tiles_touched, 1))
    seg_gaussian: jnp.ndarray  # [N] int32 original gaussian of segment k, or None (identity)
    num_instances: jnp.ndarray  # [] int32 real instances emitted (pre-cap, no dummies)
    overflow: jnp.ndarray    # [] int32 rows beyond cap_instances (incl. dummies)
    max_tile_count: jnp.ndarray  # [] int32 max per-tile population (pre-cap)


def _expand_xla(pre: Preprocessed, height: int, width: int,
                cfg: RasterConfig):
    """XLA expansion oracle. Returns (tile, depth, gid, offsets, total')
    with the same semantics as pallas_expand.expand_pallas (exact
    arithmetic cull instead of the bf16-conservative one)."""
    ty_tiles, tx_tiles = cfg.grid(height, width)
    num_tiles = ty_tiles * tx_tiles
    cap = cfg.cap_instances
    n = pre.valid.shape[0]

    counts = pre.tiles_touched  # [N] int32, 0 for culled
    counts1 = jnp.maximum(counts, 1)
    cum = jnp.cumsum(counts1)  # inclusive
    offsets = jnp.concatenate([jnp.zeros((1,), cum.dtype), cum])  # [N+1]
    total = cum[-1]

    # Ragged expansion: instance j in [0, cap) -> owning gaussian. A
    # scatter of segment-start markers + one cumsum beats a [cap]-wide
    # binary search over the offsets (searchsorted costs log2(N) strided
    # gathers per instance on TPU). counts' >= 1 makes offsets strictly
    # increasing, so every marker lands on a distinct row.
    j = jnp.arange(cap, dtype=jnp.int32)
    starts = jnp.clip(offsets[1:-1], 0, cap - 1)  # first row of gaussians 1..N-1
    # Gaussians whose segment starts beyond capacity contribute no marker
    # (their instances are dropped by the capacity anyway).
    markers = jnp.zeros((cap,), jnp.int32).at[starts].add(
        jnp.where(offsets[1:-1] < cap, 1, 0), indices_are_sorted=True)
    g = jnp.cumsum(markers)
    # Rows at/after `total` scatter markers at clipped positions; they are
    # masked by in_range below, so only clamp for safe gathers.
    g_safe = jnp.minimum(g, n - 1)
    in_range = j < total

    # One packed row-gather instead of scalar gathers (offset, rect
    # bounds, depth, mean/conic/opacity for the tile cull): TPU gathers
    # fetch >= a lane-row per index anyway, so batching the per-gaussian
    # scalars into one table costs the same bytes once instead of N times.
    f2i = lambda v: jax.lax.bitcast_convert_type(v, jnp.int32)
    fl = pre.flat
    # Non-emitting gaussians get rect_w = 0 so their dummy row is
    # recognisable after the gather. The 1-D column views avoid the
    # layout-conversion copies [N, k]-stack slices would trigger.
    rmax_eff = jnp.where(counts > 0, fl.rmax_x, fl.rmin_x)
    aux = jnp.stack([
        offsets[:-1].astype(jnp.int32),
        fl.rmin_x, fl.rmin_y, rmax_eff,
        f2i(pre.depth),
        f2i(fl.px), f2i(fl.py),
        f2i(fl.cxx), f2i(fl.cxy), f2i(fl.cyy),
        f2i(pre.opacity),
    ], axis=1)                                        # [N, 11]
    arow = aux[g_safe]                                # [cap, 11]

    local = j - arow[:, 0]  # slot within the gaussian's rect
    rw = arow[:, 3] - arow[:, 1]
    rw_safe = jnp.maximum(rw, 1)
    dy = local // rw_safe
    dx = local - dy * rw_safe
    tx = arow[:, 1] + dx
    tile_y = arow[:, 2] + dy
    tile = tile_y * tx_tiles + tx

    # Exact tile cull: drop the instance when max alpha over the tile's
    # pixel rect is below alpha_min — the per-pixel pass test
    # (forward.cu:537-541) then rejects it at every pixel, so the
    # composited output is identical; only the per-tile instance lists
    # shrink. The max of the (concave, conic-PSD) log-alpha over the box
    # is attained on one of the two faces nearest the mean: optimize
    # both 1-D restrictions in closed form and take the max.
    i2f = lambda v: jax.lax.bitcast_convert_type(v, jnp.float32)
    mx, my = i2f(arow[:, 5]), i2f(arow[:, 6])
    cxx, cxy, cyy = i2f(arow[:, 7]), i2f(arow[:, 8]), i2f(arow[:, 9])
    op = i2f(arow[:, 10])
    # d = mean - pixel; pixel ranges over the tile rect.
    x0 = (tx * cfg.tile_w).astype(jnp.float32)
    y0 = (tile_y * cfg.tile_h).astype(jnp.float32)
    a0, a1 = mx - (x0 + cfg.tile_w - 1), mx - x0
    b0, b1 = my - (y0 + cfg.tile_h - 1), my - y0
    cxx_s = jnp.where(jnp.abs(cxx) > 1e-12, cxx, 1e-12)
    cyy_s = jnp.where(jnp.abs(cyy) > 1e-12, cyy, 1e-12)

    def power(dx_, dy_):
        return -0.5 * (cxx * dx_ * dx_ + cyy * dy_ * dy_) - cxy * dx_ * dy_

    # Max of the concave quadratic over the box: interior optimum (0) if
    # the mean lies inside, else on one of the four faces; each 1-D face
    # restriction maximizes in closed form.
    def face_x(dx_):
        return power(dx_, jnp.clip(-cxy * dx_ / cyy_s, b0, b1))

    def face_y(dy_):
        return power(jnp.clip(-cxy * dy_ / cxx_s, a0, a1), dy_)

    fmax = jnp.maximum(jnp.maximum(face_x(a0), face_x(a1)),
                       jnp.maximum(face_y(b0), face_y(b1)))
    inside = (a0 <= 0) & (0 <= a1) & (b0 <= 0) & (0 <= b1)
    fmax = jnp.where(inside, 0.0, fmax)
    psd = (cxx > 0) & (cyy > 0) & (cxx * cyy - cxy * cxy > 0)
    keep = ~psd | (op * jnp.exp(fmax) >= cfg.alpha_min)

    tile = jnp.where(in_range & keep & (rw >= 1), tile, num_tiles)
    depth = jnp.where(in_range, i2f(arow[:, 4]), jnp.inf)
    return tile, depth, g_safe, offsets.astype(jnp.int32), total


def bin_and_sort(pre: Preprocessed, height: int, width: int,
                 cfg: RasterConfig) -> Binning:
    ty_tiles, tx_tiles = cfg.grid(height, width)
    num_tiles = ty_tiles * tx_tiles
    cap = cfg.cap_instances

    if cfg.expand_backend == "pallas":
        from .pallas_composite import _use_interpret
        from .pallas_expand import expand_pallas
        tile, depth, g_safe, offsets, total = expand_pallas(
            pre, height, width, cfg, interpret=_use_interpret())
    else:
        tile, depth, g_safe, offsets, total = _expand_xla(
            pre, height, width, cfg)

    j = jnp.arange(cap, dtype=jnp.int32)

    # Stable two-key sort (tile asc, depth asc) carrying the original
    # gaussian-major position AND the gaussian id (a payload column costs
    # ~nothing through the TPU sort; re-deriving ids by gather costs 7 ms
    # at 640k rows).
    sorted_tile, _, perm, ids = jax.lax.sort(
        (tile, depth, j, g_safe), num_keys=2, is_stable=True)

    # Inverse permutation via a second (cheap, single-key) sort — faster
    # than a scatter on TPU.
    _, inv_perm = jax.lax.sort((perm, j), num_keys=1, is_stable=False)

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)
    raw_count = tile_end - tile_start
    tile_count = jnp.minimum(raw_count, cfg.cap_tile)

    return Binning(
        ids=ids,
        inst_tile=sorted_tile,
        perm=perm,
        inv_perm=inv_perm,
        tile_start=tile_start,
        tile_count=tile_count,
        offsets=offsets,
        seg_gaussian=None,  # segments are already in original gaussian order
        num_instances=pre.tiles_touched.sum().astype(jnp.int32),
        overflow=jnp.maximum(total - cap, 0).astype(jnp.int32),
        max_tile_count=raw_count.max().astype(jnp.int32),
    )


def segment_sum_by_gaussian(per_instance: jnp.ndarray, binning: Binning,
                            num_gaussians: int) -> jnp.ndarray:
    """Reduce per-*sorted*-instance values [CAP, D] to per-Gaussian [N, D]
    (original gaussian order) without scatter-adds: unsort to the
    depth-rank-major pre-sort order (gather via inv_perm), contiguous
    segment reduction via prefix-sum differences, then one permutation
    scatter back to original gaussian indices.
    """
    orig = per_instance[binning.inv_perm]  # [CAP, D] segment-major
    csum = jnp.cumsum(orig, axis=0, dtype=jnp.float32)
    csum = jnp.concatenate([jnp.zeros((1,) + csum.shape[1:], csum.dtype), csum], axis=0)
    lo = jnp.minimum(binning.offsets[:-1], per_instance.shape[0])
    hi = jnp.minimum(binning.offsets[1:], per_instance.shape[0])
    seg = csum[hi] - csum[lo]              # [N, D] segment order
    if binning.seg_gaussian is None:
        return seg
    return jnp.zeros_like(seg).at[binning.seg_gaussian].set(
        seg, unique_indices=True)

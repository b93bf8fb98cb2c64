"""Tile binning: ragged (gaussian, tile) instance expansion + depth sort.

TPU-native replacement for the CUDA binning stage (duplicateWithKeys +
CUB radix sort + identifyTileRanges, rasterizer_impl.cu:70-138,582-630).

The CUDA path sizes its instance buffer with a device->host sync
(`num_rendered`, rasterizer_impl.cu:589) which is un-jittable; here the
instance list has a static capacity and we report overflow instead.

Pipeline (all static shapes, no atomics):
  1. exclusive-scan `tiles_touched` -> per-Gaussian offsets,
  2. ragged expansion via a scatter of segment-start markers + cumsum:
     instance j -> owning gaussian, local slot -> (dy, dx) in its rect,
  3. stable multi-key sort by (tile_id, depth) with lax.sort,
  4. tile ranges via searchsorted over the sorted tile ids.

The original (pre-sort) instance order is gaussian-major, so per-Gaussian
gradient reduction in the backward is a contiguous segment sum after
unsorting — no scatter-adds anywhere (TPU has no fast atomics).

Note on a rejected design (measured slower on v5e): pre-sorting the
*gaussians* by depth makes instance emission depth-major, which reduces
the instance sort to a single fused int32 key `tile << ceil(log2(cap)) |
j` (no payload, no stability needed). The cheaper sort (-4 ms @1M rows)
was outweighed by the N-row depth sort, the extra id gathers, and the
final rank->gaussian permutation (+20 ms total). The `seg_gaussian` field
(identity here) keeps the interface general for that family of layouts.
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
    offsets: jnp.ndarray     # [N+1] int32 per-gaussian segment bounds (segment order)
    seg_gaussian: jnp.ndarray  # [N] int32 original gaussian of segment k, or None (identity)
    num_instances: jnp.ndarray  # [] int32 total emitted (pre-cap)
    overflow: jnp.ndarray    # [] int32 instances dropped by cap_instances
    max_tile_count: jnp.ndarray  # [] int32 max per-tile population (pre-cap)


def bin_and_sort(pre: Preprocessed, height: int, width: int,
                 cfg: RasterConfig) -> Binning:
    ty_tiles, tx_tiles = cfg.grid(height, width)
    num_tiles = ty_tiles * tx_tiles
    cap = cfg.cap_instances
    n = pre.valid.shape[0]

    counts = pre.tiles_touched  # [N] int32, 0 for culled
    cum = jnp.cumsum(counts)  # inclusive
    offsets = jnp.concatenate([jnp.zeros((1,), cum.dtype), cum])  # [N+1]
    total = cum[-1]

    # Ragged expansion: instance j in [0, cap) -> owning gaussian. A
    # scatter of segment-start markers + one cumsum beats a [cap]-wide
    # binary search over the offsets (searchsorted costs log2(N) strided
    # gathers per instance on TPU). Empty segments scatter-accumulate at
    # the same position, so the cumsum skips them correctly.
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

    # One packed row-gather instead of five scalar gathers (offset, rect
    # bounds, depth): TPU gathers fetch >= a lane-row per index anyway, so
    # batching the per-gaussian scalars into one [N, 8] table costs the
    # same bytes once instead of five times.
    aux = jnp.stack([
        offsets[:-1].astype(jnp.int32),
        pre.rect_min[:, 0], pre.rect_min[:, 1], pre.rect_max[:, 0],
        jax.lax.bitcast_convert_type(pre.depth, jnp.int32),
    ], axis=1)                                        # [N, 5]
    arow = aux[g_safe]                                # [cap, 5]

    local = j - arow[:, 0]  # slot within the gaussian's rect
    rw = arow[:, 3] - arow[:, 1]
    rw_safe = jnp.maximum(rw, 1)
    dy = local // rw_safe
    dx = local - dy * rw_safe
    tx = arow[:, 1] + dx
    tile_y = arow[:, 2] + dy
    tile = tile_y * tx_tiles + tx
    tile = jnp.where(in_range, tile, num_tiles)  # sentinel bucket sorts last

    depth = jnp.where(
        in_range, jax.lax.bitcast_convert_type(arow[:, 4], jnp.float32),
        jnp.inf)

    # Stable two-key sort (tile asc, depth asc) carrying only the original
    # gaussian-major position; gaussian ids are re-derived by one gather
    # (fewer operands = less data movement through the TPU sort).
    sorted_tile, _, perm = jax.lax.sort(
        (tile, depth, j), num_keys=2, is_stable=True)
    ids = g_safe[perm]

    inv_perm = jnp.zeros((cap,), jnp.int32).at[perm].set(
        jnp.arange(cap, dtype=jnp.int32), unique_indices=True,
        indices_are_sorted=False)

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
        offsets=offsets.astype(jnp.int32),
        seg_gaussian=None,  # segments are already in original gaussian order
        num_instances=total.astype(jnp.int32),
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

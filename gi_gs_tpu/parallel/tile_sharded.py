"""Tile-sharded rendering: one image's pixel tiles split across the mesh.

The BASELINE north star's scale-out shape: Gaussian state replicated,
preprocess/binning computed per chip (identical, replicated work — cheap
relative to compositing), and the *compositing* — the dominant cost —
sharded by contiguous tile ranges over ICI. Each chip composites its tile
range with the kernels' `tile_base` offset, then an `all_gather` over the
tile axis reassembles the full G-buffer per chip. Under reverse-mode AD
the all_gather's transpose is a psum-scatter, so parameter gradients are
reduced over ICI exactly as the north star prescribes.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops.rasterize import RasterConfig
from ..ops.rasterize.binning import bin_and_sort
from ..ops.rasterize.composite import composite, NUM_CH
from ..ops.rasterize.preprocess import preprocess


def sharded_composite(mesh: Mesh, table, binning, cfg: RasterConfig,
                      grid: Tuple[int, int], image_hw: Tuple[int, int],
                      axis: str = "data"):
    """Composite with tiles sharded over `axis`.

    The global tile count is padded to a multiple of the mesh size by the
    caller's grid (empty tiles cost one masked chunk). Returns the full
    (accum [T, CH, P], final_t [T, P]) replicated on every chip.
    """
    n_dev = mesh.shape[axis]
    T = grid[0] * grid[1]
    pad = (-T) % n_dev
    tile_start = jnp.pad(binning.tile_start, (0, pad))
    tile_count = jnp.pad(binning.tile_count, (0, pad))

    def local(table, tile_start_l, tile_count_l, ids, inst_tile, inv_perm,
              offsets, seg_gaussian):
        idx = jax.lax.axis_index(axis)
        t_local = tile_start_l.shape[0]
        base = (idx * t_local).astype(jnp.int32)
        if cfg.use_pallas:
            from ..ops.rasterize.pallas_composite import composite_pallas
            comp = composite_pallas
        else:
            comp = composite
        accum, final_t = comp(table, ids, tile_start_l, tile_count_l,
                              inst_tile, inv_perm, offsets, seg_gaussian,
                              cfg, grid, image_hw, base)
        # Reassemble the full tile axis on every chip; the AD transpose of
        # all_gather is a reduce-scatter over ICI.
        accum = jax.lax.all_gather(accum, axis, axis=0, tiled=True)
        final_t = jax.lax.all_gather(final_t, axis, axis=0, tiled=True)
        return accum, final_t

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    accum, final_t = fn(table, tile_start, tile_count, binning.ids,
                        binning.inst_tile, binning.inv_perm, binning.offsets,
                        binning.seg_gaussian)
    return accum[:T], final_t[:T]

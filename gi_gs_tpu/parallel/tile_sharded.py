"""Tile-sharded rendering: one image's pixel tiles split across the mesh.

The BASELINE north star's scale-out shape: Gaussian state replicated,
preprocess/binning computed per chip (identical, replicated work — cheap
relative to compositing), and the *compositing* — the dominant cost —
sharded by contiguous tile ranges over ICI. Each chip composites its tile
range with the kernels' `tile_base` offset, then an `all_gather` over the
tile axis reassembles the full G-buffer per chip. Under reverse-mode AD
the all_gather's transpose is a psum-scatter, so parameter gradients are
reduced over ICI exactly as the north star prescribes.

Two entry points:
* `sharded_composite` — the compositing call alone under its own
  shard_map (eval / diagnostics);
* `make_ts_phase1_step` — the END-TO-END tile-sharded training step
  (BASELINE config 5): loss, psum'd gradient partials, optimizer,
  densification + optimizer surgery and capacity growth all under the
  mesh. Single-chip equivalence: tests/test_tile_sharded.py.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import Config
from ..ops.rasterize import RasterConfig
from ..ops.rasterize.binning import bin_and_sort
from ..ops.rasterize.composite import composite, NUM_CH
from ..ops.rasterize.preprocess import preprocess
from ..scene.cameras import Camera
from ..train.optim import trainable_view
from ..train.trainer import (StepAux, TrainState, _apply_schedule_updates,
                             phase1_view_loss)
from ..utils import image_utils


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


def make_ts_phase1_step(cfg: Config, cameras_extent: float, tx, mesh: Mesh,
                        axis: str = "data", normal_weight: float = 1.0):
    """End-to-end tile-sharded phase-1 TRAIN step (BASELINE config 5):
    one camera per step like the reference; the Gaussian state and the
    preprocess/binning stage run replicated on every chip (measured cheap
    relative to compositing — see BENCH stages), the compositing is
    sharded by contiguous tile ranges, and the per-chip parameter-
    gradient partials (each chip's backward sees only its own tiles'
    cotangents through the all_gather transpose) are psum'd over ICI.
    The optimizer update, densification + optimizer-state surgery and
    opacity resets then run replicated under the mesh — identical inputs
    on every chip keep the state bitwise replicated, so capacity growth
    (trainer.grow_state + retrace) works exactly as on one chip.

    Returns step(state, camera, image, alpha, bg, iteration); every
    argument fully replicated.
    """
    n_shards = mesh.shape[axis]

    def local_step(state: TrainState, camera: Camera, image, alpha, bg,
                   iteration):
        def loss_fn(view, ndc_zeros):
            params = state.params.replace(**view)
            return phase1_view_loss(cfg, params, ndc_zeros, camera, image,
                                    alpha, bg, normal_weight,
                                    tile_axis=axis, tile_shards=n_shards)

        ndc_zeros = jnp.zeros((state.params.capacity, 2), jnp.float32)
        (loss, aux), (grads, ndc_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                trainable_view(state.params), ndc_zeros)
        # Per-chip partials -> full gradients (see _composite_local_tiles).
        grads = jax.tree.map(lambda g: jax.lax.psum(g, axis), grads)
        ndc_grad = jax.lax.psum(ndc_grad, axis)

        new_state, dropped = _apply_schedule_updates(
            cfg, state, state.params, grads, ndc_grad, aux, iteration, tx,
            cameras_extent)
        psnr = image_utils.psnr(aux["render"], aux["gt"])
        return new_state, StepAux(loss, aux["l1"], aux["normal_loss"], psnr,
                                  dropped, aux["overflow"],
                                  aux["max_tile_count"])

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(0,))

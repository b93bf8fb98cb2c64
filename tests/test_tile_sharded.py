"""Tile-sharded compositing over an 8-device CPU mesh vs single-device."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gi_gs_tpu.ops.rasterize import RasterConfig
from gi_gs_tpu.ops.rasterize.binning import bin_and_sort
from gi_gs_tpu.ops.rasterize.composite import composite
from gi_gs_tpu.ops.rasterize.preprocess import preprocess
from gi_gs_tpu.parallel.tile_sharded import sharded_composite

from utils import random_scene

import dataclasses
import pytest

BASE_CFG = RasterConfig(tile_h=8, tile_w=32, cap_instances=1 << 13,
                        cap_tile=256, chunk=8, use_pallas=False)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_sharded_composite_matches_and_grads(use_pallas):
    """Tile-sharded == single-device (jnp oracle), for BOTH compositing
    backends. use_pallas=True runs the Pallas kernels (interpret mode on
    CPU) under shard_map, covering the `tile_base` offset plumbing in
    pallas_composite that only the sharded path exercises."""
    cfg = dataclasses.replace(BASE_CFG, use_pallas=use_pallas)
    scene = random_scene(n=150, seed=0)
    cam, w, h = scene["cam"], scene["width"], scene["height"]
    pre = preprocess(scene["xyz"], scene["cov3d"], cam.w2c, cam.full_proj,
                     cam.tanfovx, cam.tanfovy, w, h, cfg)
    b = bin_and_sort(pre, h, w, cfg)
    table = jnp.concatenate([
        pre.means2d, pre.conic, scene["opacity"], scene["color"],
        scene["normal"], scene["albedo"], scene["roughness"],
        scene["metallic"], pre.depth[:, None], pre.pos_view], axis=1)
    grid = cfg.grid(h, w)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    rng = np.random.RandomState(1)
    T = grid[0] * grid[1]
    P = cfg.pixels_per_tile
    g_acc = jnp.asarray(rng.normal(size=(T, 16, P)).astype(np.float32))
    g_t = jnp.asarray(rng.normal(size=(T, P)).astype(np.float32))

    def loss_single(tbl):
        a, t = composite(tbl, b.ids, b.tile_start, b.tile_count,
                         b.inst_tile, b.inv_perm, b.offsets, b.seg_gaussian,
                         dataclasses.replace(cfg, use_pallas=False), grid,
                         (h, w))
        return (a * g_acc).sum() + (t * g_t).sum()

    def loss_sharded(tbl):
        a, t = sharded_composite(mesh, tbl, b, cfg, grid, (h, w))
        return (a * g_acc).sum() + (t * g_t).sum()

    v1, g1 = jax.value_and_grad(loss_single)(table)
    v2, g2 = jax.value_and_grad(loss_sharded)(table)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    # psum reassociation: tiny float noise allowed
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=5e-5)

"""Pallas compositing kernel vs the jnp reference implementation
(interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from gi_gs_tpu.ops.rasterize import RasterConfig
from gi_gs_tpu.ops.rasterize.binning import bin_and_sort
from gi_gs_tpu.ops.rasterize.composite import _fwd_impl, TABLE_DIM
from gi_gs_tpu.ops.rasterize.pallas_composite import (
    composite_fwd_pallas, ROW)
from gi_gs_tpu.ops.rasterize.preprocess import preprocess

from utils import random_scene

CFG = RasterConfig(tile_h=8, tile_w=32, cap_instances=1 << 13,
                   cap_tile=256, chunk=8, use_pallas=False)


def setup(seed=0, n=200):
    scene = random_scene(n=n, seed=seed)
    cam, w, h = scene["cam"], scene["width"], scene["height"]
    pre = preprocess(scene["xyz"], scene["cov3d"], cam.w2c, cam.full_proj,
                     cam.tanfovx, cam.tanfovy, w, h, CFG)
    b = bin_and_sort(pre, h, w, CFG)
    table = jnp.concatenate([
        pre.means2d, pre.conic, scene["opacity"], scene["color"],
        scene["normal"], scene["albedo"], scene["roughness"],
        scene["metallic"], pre.depth[:, None], pre.pos_view], axis=1)
    grid = CFG.grid(h, w)
    return table, b, grid, (h, w)


def test_pallas_forward_matches_jnp():
    table, b, grid, hw = setup()
    accum_ref, final_t_ref = _fwd_impl(table, b.ids, b.tile_start,
                                       b.tile_count, CFG, grid)
    inst = jnp.pad(table[b.ids], ((0, 0), (0, ROW - TABLE_DIM)))
    packed = composite_fwd_pallas(
        inst, b.tile_start, b.tile_count, CFG, grid, interpret=True)
    accum, final_t = packed[:, :16], packed[:, 16]
    np.testing.assert_allclose(np.asarray(final_t), np.asarray(final_t_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(accum), np.asarray(accum_ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_backward_matches_jnp():
    from gi_gs_tpu.ops.rasterize.composite import composite
    from gi_gs_tpu.ops.rasterize.pallas_composite import composite_pallas
    table, b, grid, hw = setup(seed=1)
    rng = np.random.RandomState(3)
    T = grid[0] * grid[1]
    P = CFG.pixels_per_tile
    g_acc = jnp.asarray(rng.normal(size=(T, 16, P)).astype(np.float32))
    g_t = jnp.asarray(rng.normal(size=(T, P)).astype(np.float32))

    def loss(comp, table):
        accum, final_t = comp(table, b.ids, b.tile_start, b.tile_count,
                              b.inst_tile, b.inv_perm, b.offsets, b.seg_gaussian, CFG, grid,
                              hw)
        return (accum * g_acc).sum() + (final_t * g_t).sum()

    g_jnp = jax.grad(lambda t: loss(composite, t))(table)
    g_pl = jax.grad(lambda t: loss(composite_pallas, t))(table)
    scale = np.abs(np.asarray(g_jnp)).max(axis=0) + 1e-3
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_jnp),
                               rtol=2e-4, atol=2e-5 * scale[None, :].max())

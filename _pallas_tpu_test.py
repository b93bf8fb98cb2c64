import time, numpy as np, jax, jax.numpy as jnp
import sys; sys.path.insert(0, 'tests')
from gi_gs_tpu.ops.rasterize import RasterConfig
from gi_gs_tpu.ops.rasterize.binning import bin_and_sort
from gi_gs_tpu.ops.rasterize.composite import composite, TABLE_DIM
from gi_gs_tpu.ops.rasterize.pallas_composite import composite_pallas
from gi_gs_tpu.ops.rasterize.preprocess import preprocess
from utils import random_scene

CFG = RasterConfig(tile_h=8, tile_w=128, cap_instances=1<<13, cap_tile=256, chunk=32)
scene = random_scene(n=300, seed=0, w=256, h=64)
cam, w, h = scene["cam"], scene["width"], scene["height"]
pre = preprocess(scene["xyz"], scene["cov3d"], cam.w2c, cam.full_proj, cam.tanfovx, cam.tanfovy, w, h, CFG)
b = bin_and_sort(pre, h, w, CFG)
table = jnp.concatenate([pre.means2d, pre.conic, scene["opacity"], scene["color"], scene["normal"],
                         scene["albedo"], scene["roughness"], scene["metallic"], pre.depth[:,None], pre.pos_view], axis=1)
grid = CFG.grid(h, w)
T = grid[0]*grid[1]; P = CFG.pixels_per_tile
rng = np.random.RandomState(3)
g_acc = jnp.asarray(rng.normal(size=(T,16,P)).astype(np.float32))
g_t = jnp.asarray(rng.normal(size=(T,P)).astype(np.float32))

def loss(comp, table):
    accum, final_t = comp(table, b.ids, b.tile_start, b.tile_count, b.inst_tile, b.inv_perm, b.offsets, CFG, grid, (h,w))
    return (accum*g_acc).sum() + (final_t*g_t).sum()

v_j, g_j = jax.value_and_grad(lambda t: loss(composite, t))(table)
print("jnp ok", float(v_j), flush=True)
v_p, g_p = jax.value_and_grad(lambda t: loss(composite_pallas, t))(table)
print("pallas ok", float(v_p), flush=True)
print("value diff", abs(float(v_j)-float(v_p)))
print("grad maxdiff", float(jnp.abs(g_j-g_p).max()), "grad scale", float(jnp.abs(g_j).max()))

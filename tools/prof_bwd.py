"""Split the compositing backward cost: Pallas bwd kernel vs the
per-Gaussian reduction, plus binning sort variants."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gi_gs_tpu.config import Config, ModelConfig, OptimizationConfig, TrainConfig
from gi_gs_tpu.models.gaussians import create_from_points
from gi_gs_tpu.ops.rasterize import RasterConfig
from gi_gs_tpu.ops.rasterize.preprocess import preprocess
from gi_gs_tpu.ops.rasterize.binning import bin_and_sort
from gi_gs_tpu.ops.screen_space import GIParams
from gi_gs_tpu.scene.cameras import make_camera
from gi_gs_tpu.train import trainer

H = W = 800
N = 200_000
CAP = 1 << 18

rng = np.random.RandomState(0)
pts = rng.uniform(-1.0, 1.0, (N, 3)).astype(np.float32)
pts[:, 2] = pts[:, 2] * 0.8 + 3.0
colors = rng.uniform(0.0, 1.0, (N, 3)).astype(np.float32)
params = create_from_points(pts, colors, capacity=CAP)

cfg = Config()
cfg.model = ModelConfig(capacity=CAP)
cam = make_camera(R=np.eye(3), T=np.zeros(3), fovx=0.8, fovy=0.8,
                  width=W, height=H)
cap_i = trainer.probe_cap_instances(cfg, params, [cam])
cfg.raster = dataclasses.replace(cfg.raster, cap_instances=cap_i)
rc = cfg.raster
grid = rc.grid(H, W)
print("cap_instances:", cap_i, "grid:", grid, flush=True)

w2c = jnp.asarray(cam.w2c)
fp = jnp.asarray(cam.full_proj)
p = params
cov3d = jax.jit(lambda q: q.get_covariance(1.0))(p)
opacity = p.get_opacity()
pre = jax.jit(lambda m, c: preprocess(m, c, w2c, fp, cam.tanfovx,
                                      cam.tanfovy, W, H, rc,
                                      opacity=opacity))(p.xyz, cov3d)
b = jax.jit(lambda pr: bin_and_sort(pr, H, W, rc))(pre)
zeros3 = jnp.zeros((CAP, 3))
zeros1 = jnp.zeros((CAP, 1))
table = jnp.concatenate([
    pre.means2d, pre.conic, opacity, zeros3 + 0.5, zeros3, zeros3,
    zeros1, zeros1, pre.depth[:, None], pre.pos_view], axis=1)


def fence(o):
    l = [x for x in jax.tree.leaves(o) if hasattr(x, "reshape")][0]
    _ = np.asarray(l.reshape(-1)[0])


def timeit(name, f, *a, n=10):
    jf = jax.jit(f)
    t0 = time.time(); o = jf(*a); fence(o)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        o = jf(*a)
    fence(o)
    print(f"{name:30s} compile {c:6.1f}s   run {(time.time()-t0)/n*1000:8.2f} ms",
          flush=True)
    return o


which = sys.argv[1:] or ["bwd"]

if "bwd" in which:
    from gi_gs_tpu.ops.rasterize.pallas_composite import (
        composite_fwd_pallas, composite_bwd_pallas, _pack_instances,
        CH_PAD, ROW)
    from gi_gs_tpu.ops.rasterize.composite import (
        reduce_sorted_instance_grads, NUM_CH, TABLE_DIM)

    inst = jax.jit(lambda t, i: _pack_instances(t, i, rc.chunk))(table, b.ids)
    packed = jax.jit(lambda i: composite_fwd_pallas(
        i, b.tile_start, b.tile_count, rc, grid))(inst)
    T = b.tile_start.shape[0]
    P = rc.pixels_per_tile
    cot = jnp.ones((T, CH_PAD, P), jnp.float32)

    rows = timeit("bwd kernel", lambda i, c, f: composite_bwd_pallas(
        i, b.tile_start, b.tile_count, c, f, rc, grid, (H, W)),
        inst, cot, packed)

    def reduce_fn(rows):
        cap = inst.shape[0] - rc.chunk
        s = jnp.arange(cap, dtype=jnp.int32)
        t = jnp.clip(b.inst_tile, 0, T - 1)
        j = s - b.tile_start[t]
        written = ((b.inst_tile >= 0) & (b.inst_tile < T) & (j >= 0) &
                   (j < b.tile_count[t]))
        rr = jnp.where(written[:, None], rows[:, :TABLE_DIM], 0.0)
        return reduce_sorted_instance_grads(rr, b.inv_perm, b.offsets,
                                            b.seg_gaussian)

    timeit("reduce->gaussian", reduce_fn, rows)

if "sort" in which:
    cap = rc.cap_instances
    tile = np.sort(rng.randint(0, 351, cap)).astype(np.int32)
    rng.shuffle(tile)
    depth = rng.rand(cap).astype(np.float32) * 5
    tile_j = jnp.asarray(tile)
    depth_j = jnp.asarray(depth)
    j32 = jnp.arange(cap, dtype=jnp.int32)

    def two_key(t, d):
        st, _, perm = jax.lax.sort((t, d, j32), num_keys=2, is_stable=True)
        return st, perm

    timeit("2-key stable sort", two_key, tile_j, depth_j)

    def fused_key(t, d):
        # depth bits: positive floats order-preserved as int32
        db = jax.lax.bitcast_convert_type(d, jnp.int32)
        key = t * (1 << 23) + (db >> 8)
        sk, perm = jax.lax.sort((key, j32), num_keys=1, is_stable=True)
        return sk, perm

    timeit("fused int32 1-key stable", fused_key, tile_j, depth_j)

    def fused_key_unstable(t, d):
        db = jax.lax.bitcast_convert_type(d, jnp.int32)
        key = t * (1 << 23) + (db >> 8)
        sk, perm = jax.lax.sort((key, j32), num_keys=1, is_stable=False)
        return sk, perm

    timeit("fused int32 1-key unstable", fused_key_unstable, tile_j, depth_j)

    def key_only(t, d):
        db = jax.lax.bitcast_convert_type(d, jnp.int32)
        key = t * (1 << 23) + (db >> 8)
        return jax.lax.sort_key_val(key, j32, is_stable=False)

    timeit("fused sort_key_val", key_only, tile_j, depth_j)

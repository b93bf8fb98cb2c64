"""Sweep rasterizer tile shapes: instance count vs kernel times."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from gi_gs_tpu.config import Config, ModelConfig
from gi_gs_tpu.models.gaussians import create_from_points
from gi_gs_tpu.ops.rasterize import RasterConfig
from gi_gs_tpu.ops.rasterize.preprocess import preprocess
from gi_gs_tpu.ops.rasterize.binning import bin_and_sort
from gi_gs_tpu.ops.rasterize.pipeline import bucket_cap_instances
from gi_gs_tpu.scene.cameras import make_camera

H = W = 800
N = 200_000
CAP = 1 << 18

rng = np.random.RandomState(0)
pts = rng.uniform(-1.0, 1.0, (N, 3)).astype(np.float32)
pts[:, 2] = pts[:, 2] * 0.8 + 3.0
colors = rng.uniform(0.0, 1.0, (N, 3)).astype(np.float32)
params = create_from_points(pts, colors, capacity=CAP)

cam = make_camera(R=np.eye(3), T=np.zeros(3), fovx=0.8, fovy=0.8,
                  width=W, height=H)
w2c = jnp.asarray(cam.w2c)
fp = jnp.asarray(cam.full_proj)
p = params
cov3d = jax.jit(lambda q: q.get_covariance(1.0))(p)
opacity = p.get_opacity()
zeros3 = jnp.zeros((CAP, 3))
zeros1 = jnp.zeros((CAP, 1))


def fence(o):
    l = [x for x in jax.tree.leaves(o) if hasattr(x, "reshape")][0]
    _ = np.asarray(l.reshape(-1)[0])


def timeit(f, *a, n=10):
    jf = jax.jit(f)
    o = jf(*a); fence(o)
    t0 = time.time()
    for _ in range(n):
        o = jf(*a)
    fence(o)
    return (time.time() - t0) / n * 1000, o


shapes = sys.argv[1:] or ["16x128", "8x128", "16x64", "8x64", "16x32",
                          "8x32", "16x16", "8x16"]

# radius stats once
pre0 = jax.jit(lambda m, c: preprocess(m, c, w2c, fp, cam.tanfovx,
                                       cam.tanfovy, W, H, RasterConfig(),
                                       opacity=opacity))(p.xyz, cov3d)
r = np.asarray(pre0.radius)
r = r[r > 0]
print(f"radius px: mean {r.mean():.1f} p50 {np.percentile(r,50):.0f} "
      f"p90 {np.percentile(r,90):.0f} p99 {np.percentile(r,99):.0f} "
      f"max {r.max()}", flush=True)

for s in shapes:
    parts = list(map(int, s.split("x")))
    th, tw = parts[0], parts[1]
    K = parts[2] if len(parts) > 2 else 32
    if (th * tw) % 128:
        print(s, "skipped (P % 128)")
        continue
    rc = RasterConfig(tile_h=th, tile_w=tw, chunk=K)
    pre = jax.jit(lambda m, c: preprocess(
        m, c, w2c, fp, cam.tanfovx, cam.tanfovy, W, H, rc,
        opacity=opacity))(p.xyz, cov3d)
    n_inst = int(jnp.sum(pre.tiles_touched))
    cap_i = bucket_cap_instances(n_inst)
    rc = dataclasses.replace(rc, cap_instances=cap_i)
    grid = rc.grid(H, W)
    T = grid[0] * grid[1]

    t_bin, b = timeit(lambda pr: bin_and_sort(pr, H, W, rc), pre)
    mx = int(b.max_tile_count)

    table = jnp.concatenate([
        pre.means2d, pre.conic, opacity, zeros3 + 0.5, zeros3, zeros3,
        zeros1, zeros1, pre.depth[:, None], pre.pos_view], axis=1)

    from gi_gs_tpu.ops.rasterize.pallas_composite import (
        composite_fwd_pallas, composite_bwd_pallas, _pack_instances, CH_PAD)

    t_pack, inst = timeit(lambda t, i: _pack_instances(t, i, rc.chunk),
                          table, b.ids)
    t_fwd, packed = timeit(lambda i: composite_fwd_pallas(
        i, b.tile_start, b.tile_count, rc, grid), inst)
    cot = jnp.ones((T, CH_PAD, rc.pixels_per_tile), jnp.float32)
    t_bwd, _ = timeit(lambda i, c, f: composite_bwd_pallas(
        i, b.tile_start, b.tile_count, c, f, rc, grid, (H, W)),
        inst, cot, packed)
    print(f"{s:8s} inst {n_inst/1e3:7.0f}k cap {cap_i>>10:5d}k T {T:5d} "
          f"maxtile {mx:6d} | bin {t_bin:6.2f} pack {t_pack:5.2f} "
          f"fwd {t_fwd:6.2f} bwd {t_bwd:6.2f} ms", flush=True)

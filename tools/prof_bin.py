"""Profile bin_and_sort sub-steps to find the expansion bottleneck."""
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

rc0 = RasterConfig()
pre = jax.jit(lambda m, c: preprocess(m, c, w2c, fp, cam.tanfovx,
                                      cam.tanfovy, W, H, rc0))(p.xyz, cov3d)
n_inst = int(jnp.sum(pre.tiles_touched))
cap = bucket_cap_instances(n_inst)
rc = dataclasses.replace(rc0, cap_instances=cap)
ty_tiles, tx_tiles = rc.grid(H, W)
num_tiles = ty_tiles * tx_tiles
print("cap:", cap, flush=True)


def fence(o):
    l = [x for x in jax.tree.leaves(o) if hasattr(x, "reshape")][0]
    _ = np.asarray(l.reshape(-1)[0])


def timeit(name, f, *a, n=20):
    jf = jax.jit(f)
    o = jf(*a); fence(o)
    t0 = time.time()
    for _ in range(n):
        o = jf(*a)
    fence(o)
    print(f"{name:34s} run {(time.time()-t0)/n*1000:8.2f} ms", flush=True)
    return o


counts = pre.tiles_touched
cum = jnp.cumsum(counts)
offsets = jnp.concatenate([jnp.zeros((1,), cum.dtype), cum])
total = cum[-1]
j = jnp.arange(cap, dtype=jnp.int32)

timeit("cumsum counts [N]", lambda c: jnp.cumsum(c), counts)

starts = jnp.clip(offsets[1:-1], 0, cap - 1)


def markers_scatter(starts_, offs):
    return jnp.zeros((cap,), jnp.int32).at[starts_].add(
        jnp.where(offs[1:-1] < cap, 1, 0), indices_are_sorted=True)


m = timeit("markers scatter [N->cap]", markers_scatter, starts, offsets)
g = timeit("cumsum markers [cap]", lambda mm: jnp.cumsum(mm), m)

aux = jnp.stack([
    offsets[:-1].astype(jnp.int32),
    pre.rect_min[:, 0], pre.rect_min[:, 1], pre.rect_max[:, 0],
    jax.lax.bitcast_convert_type(pre.depth, jnp.int32),
], axis=1)
g_safe = jnp.minimum(g, N - 1)
timeit("aux row gather [cap,5]", lambda a_, gs: a_[gs], aux, g_safe)

arow = aux[g_safe]
local = j - arow[:, 0]
rw = jnp.maximum(arow[:, 3] - arow[:, 1], 1)
dy = local // rw
tile = (arow[:, 2] + dy) * tx_tiles + (arow[:, 1] + (local - dy * rw))
tile = jnp.where(j < total, tile, num_tiles)
depth = jnp.where(j < total,
                  jax.lax.bitcast_convert_type(arow[:, 4], jnp.float32),
                  jnp.inf)

timeit("2-key sort", lambda t, d: jax.lax.sort((t, d, j), num_keys=2,
                                               is_stable=True), tile, depth)
sorted_tile, _, perm = jax.lax.sort((tile, depth, j), num_keys=2,
                                    is_stable=True)
timeit("ids gather g_safe[perm]", lambda gs, pm: gs[pm], g_safe, perm)


def invp_scatter(pm):
    return jnp.zeros((cap,), jnp.int32).at[pm].set(
        j, unique_indices=True, indices_are_sorted=False)


timeit("inv_perm scatter", invp_scatter, perm)
timeit("inv_perm via sort", lambda pm: jax.lax.sort((pm, j), num_keys=1,
                                                    is_stable=False), perm)

tids = jnp.arange(num_tiles, dtype=jnp.int32)
timeit("searchsorted x2", lambda st: (
    jnp.searchsorted(st, tids, side="left"),
    jnp.searchsorted(st, tids, side="right")), sorted_tile)

# fused alternatives
from gi_gs_tpu.ops.rasterize.binning import bin_and_sort
timeit("bin_and_sort (full)", lambda pr: bin_and_sort(pr, H, W, rc), pre)

"""Bisect the composite bwd kernel slowness."""
import sys, time, numpy as np, jax, jax.numpy as jnp
from gi_gs_tpu.models.gaussians import create_from_points
from gi_gs_tpu.ops.rasterize import RasterConfig
from gi_gs_tpu.ops.rasterize.preprocess import preprocess
from gi_gs_tpu.ops.rasterize.binning import bin_and_sort
from gi_gs_tpu.ops.rasterize.pallas_composite import (
    composite_fwd_pallas, composite_bwd_pallas, _pack_instances, CH_PAD)
from gi_gs_tpu.scene.cameras import make_camera

H = W = 800
N = 200_000
CAP = 1 << 18
CAPI = 1 << 21
rng = np.random.RandomState(0)
pts = rng.uniform(-1.0, 1.0, (N, 3)).astype(np.float32)
pts[:, 2] = pts[:, 2] * 0.8 + 3.0
colors = rng.uniform(0.0, 1.0, (N, 3)).astype(np.float32)
p = create_from_points(pts, colors, capacity=CAP)
rc = RasterConfig(tile_h=8, tile_w=128, cap_instances=CAPI, cap_tile=4096,
                  chunk=32)
cam = make_camera(R=np.eye(3), T=np.zeros(3), fovx=0.8, fovy=0.8,
                  width=W, height=H)
w2c = jnp.asarray(cam.w2c)
fp = jnp.asarray(cam.full_proj)
grid = rc.grid(H, W)
T = grid[0] * grid[1]
P = rc.pixels_per_tile


def fence(o):
    l = jax.tree.leaves(o)[0]
    _ = np.asarray(l.reshape(-1)[0])


def timeit(name, f, *a, n=3):
    jf = jax.jit(f)
    t0 = time.time(); o = jf(*a); fence(o)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        o = jf(*a)
    fence(o)
    print(f"{name:40s} compile {c:6.1f}s   run {(time.time()-t0)/n*1000:8.2f} ms", flush=True)
    return o


cov3d = p.get_covariance(1.0)
pre = jax.jit(lambda m, c: preprocess(m, c, w2c, fp, cam.tanfovx, cam.tanfovy,
                                      W, H, rc))(p.xyz, cov3d)
b = jax.jit(lambda pr: bin_and_sort(pr, H, W, rc))(pre)
color = p.colors_from_sh(cam.cam_pos)
table = jnp.concatenate([
    pre.means2d, pre.conic, p.get_opacity(), color, p.get_normal(),
    p.get_albedo(), p.get_roughness(), p.get_metallic(),
    pre.depth[:, None], pre.pos_view], axis=1)
inst = jax.jit(_pack_instances)(table, b.ids)
packed = jax.jit(lambda i, s, c: composite_fwd_pallas(i, s, c, rc, grid))(
    inst, b.tile_start, b.tile_count)

which = sys.argv[1]
K = rc.chunk

if which == "zeros_cot":
    cot = jnp.zeros((T, CH_PAD, P), jnp.float32)
    timeit("bwd cot=zeros", lambda i, s, c, ct, pk: composite_bwd_pallas(
        i, s, c, ct, pk, rc, grid, (H, W)),
        inst, b.tile_start, b.tile_count, cot, packed)
elif which == "aligned":
    # force K-aligned tile starts (wrong results; perf signal only)
    ts = (b.tile_start // K) * K
    cot = jnp.ones((T, CH_PAD, P), jnp.float32)
    timeit("bwd aligned starts", lambda i, s, c, ct, pk: composite_bwd_pallas(
        i, s, c, ct, pk, rc, grid, (H, W)),
        inst, ts, b.tile_count, cot, packed)
elif which == "no_gt":
    cot = jnp.ones((T, CH_PAD, P), jnp.float32)
    cot = cot.at[:, 16:].set(0.0)
    timeit("bwd gt-row=0", lambda i, s, c, ct, pk: composite_bwd_pallas(
        i, s, c, ct, pk, rc, grid, (H, W)),
        inst, b.tile_start, b.tile_count, cot, packed)
elif which == "vjp":
    def f(i):
        pk = composite_fwd_pallas(i, b.tile_start, b.tile_count, rc, grid)
        return pk[:, :16].sum()
    timeit("fwd+bwd via pallas_composite vjp",
           lambda t, ids: jax.grad(lambda tt: __import__(
               'gi_gs_tpu.ops.rasterize.pallas_composite',
               fromlist=['composite_pallas']).composite_pallas(
               tt, ids, b.tile_start, b.tile_count, b.inst_tile, b.inv_perm,
               b.offsets, rc, grid, (H, W))[0].sum())(t),
           table, b.ids)
elif which == "n1":
    cot = jnp.ones((T, CH_PAD, P), jnp.float32)
    timeit("bwd n=1", lambda i, s, c, ct, pk: composite_bwd_pallas(
        i, s, c, ct, pk, rc, grid, (H, W)),
        inst, b.tile_start, b.tile_count, cot, packed, n=1)
elif which == "smallcount":
    ct = jnp.minimum(b.tile_count, 64)
    cot = jnp.ones((T, CH_PAD, P), jnp.float32)
    timeit("bwd count<=64", lambda i, s, c, ct_, pk: composite_bwd_pallas(
        i, s, c, ct_, pk, rc, grid, (H, W)),
        inst, b.tile_start, ct, cot, packed)

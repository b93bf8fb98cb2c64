"""Profile backward sub-parts + sort variants at bench scale."""
import sys, time, numpy as np, jax, jax.numpy as jnp
from gi_gs_tpu.models.gaussians import create_from_points
from gi_gs_tpu.ops.rasterize import RasterConfig
from gi_gs_tpu.ops.rasterize.preprocess import preprocess
from gi_gs_tpu.ops.rasterize.binning import bin_and_sort
from gi_gs_tpu.ops.rasterize.pallas_composite import (
    composite_fwd_pallas, composite_bwd_pallas, _pack_instances, ROW, CH_PAD,
    NUM_CH, FINAL_T_ROW)
from gi_gs_tpu.ops.rasterize.composite import reduce_sorted_instance_grads, TABLE_DIM
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


def timeit(name, f, *a, n=5):
    jf = jax.jit(f)
    t0 = time.time(); o = jf(*a); fence(o)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        o = jf(*a)
    fence(o)
    print(f"{name:36s} compile {c:6.1f}s   run {(time.time()-t0)/n*1000:8.2f} ms", flush=True)
    return o


which = sys.argv[1] if len(sys.argv) > 1 else "all"

cov3d = p.get_covariance(1.0)
pre = jax.jit(lambda m, c: preprocess(m, c, w2c, fp, cam.tanfovx, cam.tanfovy,
                                      W, H, rc))(p.xyz, cov3d)
b = jax.jit(lambda pr: bin_and_sort(pr, H, W, rc))(pre)
table = jnp.concatenate([
    pre.means2d, pre.conic, p.get_opacity(), colors[:0+N//N*0+0:], ], axis=1) if False else None
color = p.colors_from_sh(cam.cam_pos)
table = jnp.concatenate([
    pre.means2d, pre.conic, p.get_opacity(), color, p.get_normal(),
    p.get_albedo(), p.get_roughness(), p.get_metallic(),
    pre.depth[:, None], pre.pos_view], axis=1)

if which in ("all", "bwd"):
    inst = timeit("pack_instances (gather)", lambda t, i: _pack_instances(t, i),
                  table, b.ids)
    packed = timeit("composite fwd kernel",
                    lambda i, s, c: composite_fwd_pallas(i, s, c, rc, grid),
                    inst, b.tile_start, b.tile_count)
    cot = jnp.ones((T, CH_PAD, P), jnp.float32)
    rows = timeit("composite bwd kernel",
                  lambda i, s, c, ct, pk: composite_bwd_pallas(
                      i, s, c, ct, pk, rc, grid, (H, W)),
                  inst, b.tile_start, b.tile_count, cot, packed)
    timeit("bwd reduce (inv_perm+cumsum)",
           lambda r, ip, off: reduce_sorted_instance_grads(
               r[:, :TABLE_DIM], ip, off),
           rows, b.inv_perm, b.offsets)

    def pre_bwd(m, c):
        def f(m, c):
            pr = preprocess(m, c, w2c, fp, cam.tanfovx, cam.tanfovy, W, H, rc)
            return (pr.means2d.sum() + pr.conic.sum() + pr.depth.sum()
                    + pr.pos_view.sum())
        return jax.grad(f, argnums=(0, 1))(m, c)
    timeit("preprocess bwd", pre_bwd, p.xyz, cov3d)

if which in ("all", "sort"):
    tile = jnp.asarray(rng.randint(0, T + 1, CAPI).astype(np.int32))
    depth = jnp.asarray((rng.rand(CAPI) * 5).astype(np.float32))
    j = jnp.arange(CAPI, dtype=jnp.int32)
    timeit("sort 2key 3op (current)",
           lambda t, d, jj: jax.lax.sort((t, d, jj), num_keys=2,
                                         is_stable=True), tile, depth, j)
    fused = (tile << 21) | j
    timeit("sort 1key 1op fused i32",
           lambda f_: jax.lax.sort((f_,), num_keys=1, is_stable=False)[0],
           fused)
    dn = jnp.asarray((rng.rand(N) * 5).astype(np.float32))
    jn = jnp.arange(N, dtype=jnp.int32)
    timeit("gaussian depth sort (N)",
           lambda d, jj: jax.lax.sort((d, jj), num_keys=1, is_stable=True),
           dn, jn)
    timeit("inv_perm scatter",
           lambda pm: jnp.zeros((CAPI,), jnp.int32).at[pm].set(
               jnp.arange(CAPI, dtype=jnp.int32), unique_indices=True),
           b.perm)

import time, numpy as np, jax, jax.numpy as jnp
from gi_gs_tpu.models.gaussians import create_from_points
from gi_gs_tpu.ops.rasterize import RasterConfig
from gi_gs_tpu.ops.rasterize.preprocess import preprocess
from gi_gs_tpu.scene.cameras import make_camera

H = W = 800; N = 200_000; CAP_G = 1 << 18
rng = np.random.RandomState(0)
pts = rng.uniform(-1.0, 1.0, (N, 3)).astype(np.float32); pts[:, 2] = pts[:, 2]*0.8 + 3.0
colors = rng.uniform(0.0, 1.0, (N, 3)).astype(np.float32)
params = create_from_points(pts, colors, capacity=CAP_G)
cam = make_camera(R=np.eye(3), T=np.zeros(3), fovx=0.8, fovy=0.8, width=W, height=H)
rcfg = RasterConfig(tile_h=8, tile_w=128, cap_instances=1<<20, cap_tile=4096, chunk=32)
cov = params.get_covariance()
pre = preprocess(params.xyz, cov, cam.w2c, cam.full_proj, cam.tanfovx, cam.tanfovy, W, H, rcfg)
cap = rcfg.cap_instances
ty, tx = rcfg.grid(H, W); num_tiles = ty*tx
n = CAP_G

counts = pre.tiles_touched
cum = jnp.cumsum(counts)
offsets = jnp.concatenate([jnp.zeros((1,), cum.dtype), cum])

def timeit(name, f, *a):
    jf = jax.jit(f)
    o = jf(*a); jax.tree.map(lambda x: x.block_until_ready(), o)
    # force real sync via copy
    t0=time.time()
    for _ in range(5):
        o = jf(*a)
        leaf = jax.tree.leaves(o)[0]
        _ = np.asarray(leaf[:1])
    print(f"{name}: {(time.time()-t0)/5*1000:.1f} ms", flush=True)

def expand(cum, offsets, rect_min, rect_max, depth_in):
    j = jnp.arange(cap, dtype=jnp.int32)
    g = jnp.searchsorted(cum, j, side="right").astype(jnp.int32)
    g_safe = jnp.minimum(g, n - 1)
    in_range = j < cum[-1]
    local = j - offsets[g_safe]
    rw = (rect_max[g_safe, 0] - rect_min[g_safe, 0])
    rw_safe = jnp.maximum(rw, 1)
    dy = local // rw_safe
    dx = local - dy * rw_safe
    t_x = rect_min[g_safe, 0] + dx
    t_y = rect_min[g_safe, 1] + dy
    tile = jnp.where(in_range, t_y * tx + t_x, num_tiles)
    depth = jnp.where(in_range, depth_in[g_safe], jnp.inf)
    return tile, depth, g_safe, j

#timeit("expand", expand, cum, offsets, pre.rect_min, pre.rect_max, pre.depth)
tile, depth, g_safe, j = jax.jit(expand)(cum, offsets, pre.rect_min, pre.rect_max, pre.depth)
timeit("sort3", lambda t, d, jj: jax.lax.sort((t, d, jj), num_keys=2, is_stable=True), tile, depth, j)
st, sd, perm = jax.lax.sort((tile, depth, j), num_keys=2, is_stable=True)
#timeit("ids_gather", lambda p, g: g[p], perm, g_safe)

timeit("inv_perm_scatter", lambda p: jnp.zeros((cap,), jnp.int32).at[p].set(jnp.arange(cap, dtype=jnp.int32), unique_indices=True), perm)
timeit("sort1key", lambda t, jj: jax.lax.sort((t, jj), num_keys=1, is_stable=True), tile, j)

import time, numpy as np, jax, jax.numpy as jnp
from gi_gs_tpu.models.gaussians import create_from_points
from gi_gs_tpu.ops.rasterize import RasterConfig
from gi_gs_tpu.ops.rasterize.binning import bin_and_sort
from gi_gs_tpu.ops.rasterize.composite import composite
from gi_gs_tpu.ops.rasterize.pallas_composite import composite_pallas
from gi_gs_tpu.ops.rasterize.preprocess import preprocess
from gi_gs_tpu.scene.cameras import make_camera

H = W = 800; N = 200_000; CAP = 1 << 18
rng = np.random.RandomState(0)
pts = rng.uniform(-1.0, 1.0, (N, 3)).astype(np.float32); pts[:, 2] = pts[:, 2]*0.8 + 3.0
colors = rng.uniform(0.0, 1.0, (N, 3)).astype(np.float32)
params = create_from_points(pts, colors, capacity=CAP)
cam = make_camera(R=np.eye(3), T=np.zeros(3), fovx=0.8, fovy=0.8, width=W, height=H)
rcfg = RasterConfig(tile_h=8, tile_w=128, cap_instances=1<<20, cap_tile=4096, chunk=32)
cov = params.get_covariance(); op = params.get_opacity(); col = params.colors_from_sh(cam.cam_pos)
pre = preprocess(params.xyz, cov, cam.w2c, cam.full_proj, cam.tanfovx, cam.tanfovy, W, H, rcfg)
b = bin_and_sort(pre, H, W, rcfg)
table = jnp.concatenate([pre.means2d, pre.conic, op, col, jnp.zeros((CAP, 12))], axis=1)
grid = rcfg.grid(H, W)
T = grid[0]*grid[1]; P = rcfg.pixels_per_tile
g_acc = jnp.ones((T, 16, P)); g_t = jnp.ones((T, P))

def make_loss(comp):
    @jax.jit
    def loss(table):
        accum, final_t = comp(table, b.ids, b.tile_start, b.tile_count, b.inst_tile, b.inv_perm, b.offsets, rcfg, grid, (H, W))
        return (accum*g_acc).sum() + (final_t*g_t).sum()
    return jax.jit(jax.value_and_grad(loss))

for name, comp in [("pallas", composite_pallas), ("jnp", composite)]:
    f = make_loss(comp)
    t0=time.time(); v, g = f(table); _=float(v); _=float(g.sum()); print(f"{name} compile {time.time()-t0:.1f}s", flush=True)
    t0=time.time()
    for _ in range(5):
        v, g = f(table); _=float(v); _=float(g[0,0])
    print(f"{name} fwd+bwd: {(time.time()-t0)/5*1000:.1f} ms", flush=True)

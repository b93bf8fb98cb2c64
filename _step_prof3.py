"""Minimal bottleneck split at bench scale: bin+sort vs composite fwd+bwd vs rest."""
import sys, time, numpy as np, jax, jax.numpy as jnp

from gi_gs_tpu.config import Config, ModelConfig, OptimizationConfig, TrainConfig
from gi_gs_tpu.models.gaussians import create_from_points
from gi_gs_tpu.ops.rasterize import RasterConfig
from gi_gs_tpu.ops.rasterize.preprocess import preprocess
from gi_gs_tpu.ops.rasterize.binning import bin_and_sort
from gi_gs_tpu.ops.screen_space import GIParams
from gi_gs_tpu.scene.cameras import make_camera
from gi_gs_tpu.train import trainer
from gi_gs_tpu.train.optim import build_optimizer

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
cfg.opt = OptimizationConfig(densify_from_iter=10**9)
cfg.train = TrainConfig()
cfg.raster = RasterConfig()
cfg.gi = GIParams()

cam = make_camera(R=np.eye(3), T=np.zeros(3), fovx=0.8, fovy=0.8,
                  width=W, height=H)
import dataclasses
cap_i = trainer.probe_cap_instances(cfg, params, [cam])
cfg.raster = dataclasses.replace(cfg.raster, cap_instances=cap_i)
print("cap_instances:", cap_i, flush=True)
rc = cfg.raster
image = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
alpha = jnp.ones((1, H, W), jnp.float32)
bg = jnp.zeros(3)

state = trainer.make_train_state(cfg, params, spatial_lr_scale=1.0)
tx = build_optimizer(cfg.opt, 1.0)
p = state.params
w2c = jnp.asarray(cam.w2c)
fp = jnp.asarray(cam.full_proj)


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
    print(f"{name:34s} compile {c:6.1f}s   run {(time.time()-t0)/n*1000:8.2f} ms", flush=True)
    return o


which = sys.argv[1:] or ["step", "bin"]

if "step" in which:
    step = trainer.make_phase1_step(cfg, cameras_extent=3.0, tx=tx)
    it = jnp.int32(1)
    t0 = time.time(); s2, aux = step(state, cam, image, alpha, bg, it); fence(aux)
    print(f"{'phase1 step':34s} compile {time.time()-t0:6.1f}s", flush=True)
    t0 = time.time()
    for _ in range(5):
        s2, aux = step(s2, cam, image, alpha, bg, it)
    fence(aux)
    print(f"{'phase1 step run':34s}                 {(time.time()-t0)/5*1000:8.2f} ms", flush=True)

if "bin" in which:
    cov3d = p.get_covariance(1.0)

    def bin_fn(m, c):
        pr = preprocess(m, c, w2c, fp, cam.tanfovx, cam.tanfovy, W, H, rc)
        return bin_and_sort(pr, H, W, rc)
    timeit("preprocess+bin_and_sort", bin_fn, p.xyz, cov3d)

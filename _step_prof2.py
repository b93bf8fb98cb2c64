"""Careful phase-1 step timing (axon fencing quirks)."""
import time, numpy as np, jax, jax.numpy as jnp
from gi_gs_tpu.config import Config, ModelConfig, OptimizationConfig, TrainConfig
from gi_gs_tpu.models.gaussians import create_from_points
from gi_gs_tpu.ops.rasterize import RasterConfig
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
cfg.raster = RasterConfig(tile_h=8, tile_w=128, cap_instances=1 << 21,
                          cap_tile=4096, chunk=32)
cfg.gi = GIParams()

cam = make_camera(R=np.eye(3), T=np.zeros(3), fovx=0.8, fovy=0.8,
                  width=W, height=H)
image = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
alpha = jnp.ones((1, H, W), jnp.float32)
bg = jnp.zeros(3)

state = trainer.make_train_state(cfg, params, spatial_lr_scale=1.0)
tx = build_optimizer(cfg.opt, 1.0)
step = trainer.make_phase1_step(cfg, cameras_extent=3.0, tx=tx)

t0 = time.perf_counter()
state, aux = step(state, cam, image, alpha, bg, jnp.int32(1))
_ = float(aux.loss)
print("compile+first:", round(time.perf_counter() - t0, 1), "s", flush=True)

# per-iter float sync (bench style)
t0 = time.perf_counter()
for i in range(10):
    state, aux = step(state, cam, image, alpha, bg, jnp.int32(2 + i))
    _ = float(aux.loss)
print("per-iter sync:", round((time.perf_counter() - t0) / 10 * 1000, 1), "ms/it", flush=True)

# end-only sync
t0 = time.perf_counter()
for i in range(10):
    state, aux = step(state, cam, image, alpha, bg, jnp.int32(12 + i))
_ = float(aux.loss)
print("end-only sync:", round((time.perf_counter() - t0) / 10 * 1000, 1), "ms/it", flush=True)

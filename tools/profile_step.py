"""Stage-level profiler for the phase-1/phase-2 train step at bench scale.

Usage: python tools/profile_step.py [stage ...]
  stages: pre bin pack fwd fwdbwd render loss step step2 ssao

Times each pipeline stage separately on the attached accelerator so perf
work can target the dominant cost. Unlike the train step itself nothing
here donates its inputs, so stages can be re-run freely.
"""
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
from gi_gs_tpu.train.optim import build_optimizer, build_light_optimizer

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
cfg.train = TrainConfig(indirect=('step2' in sys.argv))
cfg.raster = RasterConfig()
cfg.gi = GIParams()

cam = make_camera(R=np.eye(3), T=np.zeros(3), fovx=0.8, fovy=0.8,
                  width=W, height=H)
cap_i = trainer.probe_cap_instances(cfg, params, [cam])
cfg.raster = dataclasses.replace(cfg.raster, cap_instances=cap_i)
print("cap_instances:", cap_i, flush=True)
rc = cfg.raster
grid = rc.grid(H, W)
image = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
alpha = jnp.ones((1, H, W), jnp.float32)
bg = jnp.zeros(3)

w2c = jnp.asarray(cam.w2c)
fp = jnp.asarray(cam.full_proj)


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


which = sys.argv[1:] or ["pre", "bin", "pack", "fwd", "fwdbwd", "loss", "step"]

p = params
cov3d = jax.jit(lambda q: q.get_covariance(1.0))(p)
table = None
b = None

if set(which) & {"pre", "bin", "pack", "fwd", "fwdbwd"}:
    pre = jax.jit(lambda m, c: preprocess(m, c, w2c, fp, cam.tanfovx,
                                          cam.tanfovy, W, H, rc))(p.xyz, cov3d)
    b = jax.jit(lambda pr: bin_and_sort(pr, H, W, rc))(pre)
    opacity = p.get_opacity()
    zeros3 = jnp.zeros((CAP, 3))
    zeros1 = jnp.zeros((CAP, 1))
    table = jnp.concatenate([
        pre.means2d, pre.conic, opacity, zeros3 + 0.5, zeros3, zeros3,
        zeros1, zeros1, pre.depth[:, None], pre.pos_view], axis=1)

if "pre" in which:
    timeit("preprocess", lambda m, c: preprocess(
        m, c, w2c, fp, cam.tanfovx, cam.tanfovy, W, H, rc), p.xyz, cov3d)

if "bin" in which:
    timeit("bin_and_sort", lambda pr: bin_and_sort(pr, H, W, rc), pre)
    timeit("pre+bin", lambda m, c: bin_and_sort(preprocess(
        m, c, w2c, fp, cam.tanfovx, cam.tanfovy, W, H, rc), H, W, rc),
        p.xyz, cov3d)

if "pack" in which:
    from gi_gs_tpu.ops.rasterize.pallas_composite import _pack_instances
    timeit("pack_instances", lambda t, i: _pack_instances(t, i, rc.chunk),
           table, b.ids)

if "fwd" in which:
    from gi_gs_tpu.ops.rasterize.pallas_composite import composite_pallas
    timeit("composite fwd", lambda t: composite_pallas(
        t, b.ids, b.tile_start, b.tile_count, b.inst_tile, b.inv_perm,
        b.offsets, b.seg_gaussian, rc, grid, (H, W)), table)

if "fwdbwd" in which:
    from gi_gs_tpu.ops.rasterize.pallas_composite import composite_pallas

    def f(t):
        acc, ft = composite_pallas(
            t, b.ids, b.tile_start, b.tile_count, b.inst_tile, b.inv_perm,
            b.offsets, b.seg_gaussian, rc, grid, (H, W))
        return (acc ** 2).sum() + (ft ** 2).sum()

    timeit("composite fwd+bwd", jax.grad(f), table)

if "render" in which:
    from gi_gs_tpu.renderer import render
    timeit("render fwd", lambda q: render(cam, q, bg, rc, cfg.gi,
                                          derive_normal=True,
                                          compute_occlusion=False)["render"],
           p)

if "loss" in which:
    from gi_gs_tpu.renderer import render
    from gi_gs_tpu.utils import image_utils
    from gi_gs_tpu.train import losses
    from gi_gs_tpu.train.optim import trainable_view

    def loss_fn(view):
        q = p.replace(**view)
        res = render(cam, q, bg, rc, cfg.gi, derive_normal=True,
                     compute_occlusion=False)
        gt = image
        l1 = image_utils.l1_loss(res["render"], gt)
        loss = 0.8 * l1 + 0.2 * (1.0 - image_utils.ssim(res["render"], gt))
        nl = jnp.abs(res["normal_map"] - res["normal_map_from_depth"]).mean()
        return loss + nl + 0.01 * losses.tv_loss(gt, res["normal_map"])

    timeit("loss fwd", loss_fn, trainable_view(p))
    timeit("loss fwd+bwd", jax.grad(loss_fn), trainable_view(p))

if "step" in which:
    tx = build_optimizer(cfg.opt, 1.0)
    state = trainer.make_train_state(cfg, params, spatial_lr_scale=1.0)
    step = trainer.make_phase1_step(cfg, cameras_extent=3.0, tx=tx)
    it = jnp.int32(1)
    t0 = time.time(); state, aux = step(state, cam, image, alpha, bg, it)
    fence(aux)
    print(f"{'phase1 step':30s} compile {time.time()-t0:6.1f}s", flush=True)
    t0 = time.time()
    for _ in range(10):
        state, aux = step(state, cam, image, alpha, bg, it)
    fence(aux)
    print(f"{'phase1 step':30s}                 run "
          f"{(time.time()-t0)/10*1000:8.2f} ms", flush=True)

if "step2" in which:
    tx = build_optimizer(cfg.opt, 1.0)
    ltx = build_light_optimizer(cfg.opt)
    state = trainer.make_train_state(cfg, params, spatial_lr_scale=1.0)
    step2 = trainer.make_phase2_step(cfg, cameras_extent=3.0, tx=tx, ltx=ltx)
    it = jnp.int32(1)
    t0 = time.time(); state, aux = step2(state, cam, image, alpha, bg, it)
    fence(aux)
    print(f"{'phase2 step':30s} compile {time.time()-t0:6.1f}s", flush=True)
    t0 = time.time()
    for _ in range(10):
        state, aux = step2(state, cam, image, alpha, bg, it)
    fence(aux)
    print(f"{'phase2 step':30s}                 run "
          f"{(time.time()-t0)/10*1000:8.2f} ms", flush=True)

if "ssao" in which:
    from gi_gs_tpu.ops import screen_space
    nv = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    dp = jnp.asarray(rng.rand(3, H, W).astype(np.float32) * 3 + 1)
    timeit("ssao", lambda a_, b_: screen_space.ssao(
        a_, b_, cam.fx, cam.fy, cfg.gi), nv, dp)
    rgbmap = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    alb = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    r1 = jnp.asarray(rng.rand(1, H, W).astype(np.float32))
    timeit("ssr", lambda *a_: screen_space.ssr(*a_, cam.fx, cam.fy, cfg.gi),
           nv, dp, rgbmap, alb, r1, r1, alb)

"""Scratch: instrumented phase-1 gate trajectory (held-out PSNR every 250
iters) to locate where long-run training degrades."""
import sys, dataclasses
sys.path.insert(0, '.')
import numpy as np, jax, jax.numpy as jnp
from tools.quality_gate import (make_gt_scene, ring_cameras, _build_cfg,
                                _split_ring, _psnr)
from gi_gs_tpu.renderer import render
from gi_gs_tpu.train import trainer
from gi_gs_tpu.train.optim import build_optimizer
from gi_gs_tpu.models.gaussians import create_from_points
from gi_gs_tpu.ops.rasterize.pipeline import bucket_cap_instances

size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
extent = float(sys.argv[3]) if len(sys.argv) > 3 else 3.3
cap = int(sys.argv[4]) if len(sys.argv) > 4 else 8192
n = 800
cfg = _build_cfg(size, cap, 64)
gt = make_gt_scene(n=n, seed=0, capacity=cap)
train_cams, test_cams = _split_ring(ring_cameras(20, size), 4)
bg = jnp.zeros(3)
cap_i = trainer.probe_cap_instances(cfg, gt, train_cams)
cfg.raster = dataclasses.replace(cfg.raster, cap_instances=cap_i)
rf = jax.jit(lambda p, c: jnp.clip(render(
    c, p, bg, cfg.raster, cfg.gi, derive_normal=False,
    compute_occlusion=False)["render"], 0, 1))
gt_train = [rf(gt, c) for c in train_cams]
gt_test = [rf(gt, c) for c in test_cams]
print("GT done", flush=True)

rng = np.random.RandomState(1)
pts0 = np.asarray(gt.xyz[:n])
keep = rng.rand(n) < 0.6
pts = pts0[keep] + rng.normal(scale=0.04, size=(keep.sum(), 3)).astype(np.float32)
params = create_from_points(pts, np.full((len(pts), 3), 0.5, np.float32),
                            capacity=cap)
state = trainer.make_train_state(cfg, params, spatial_lr_scale=1.0)
tx = build_optimizer(cfg.opt, 1.0)
step = trainer.make_phase1_step(cfg, cameras_extent=extent, tx=tx)
alphas = jnp.ones((1, size, size), jnp.float32)
order = []
ev = None
for it in range(1, iters + 1):
    if it % 1000 == 0:
        state = state._replace(params=state.params.one_up_sh_degree())
    if not order:
        order = list(rng.permutation(len(train_cams)))
    vi = int(order.pop())
    state, aux = step(state, train_cams[vi], gt_train[vi], alphas, bg,
                      jnp.int32(it))
    if it % 100 == 0 or it == 1:
        changed = False
        ovf = int(aux.overflow)
        if ovf > 0:
            cfg.raster = dataclasses.replace(
                cfg.raster, cap_instances=bucket_cap_instances(
                    cfg.raster.cap_instances + ovf, headroom=1.3))
            changed = True
        mtc = int(aux.max_tile_count)
        if mtc > cfg.raster.cap_tile:
            ch = cfg.raster.chunk
            cfg.raster = dataclasses.replace(
                cfg.raster, cap_tile=-(-int(mtc * 1.3) // ch) * ch)
            changed = True
        if changed:
            print(f"it {it}: regrow cap_i={cfg.raster.cap_instances} "
                  f"cap_t={cfg.raster.cap_tile}", flush=True)
            step = trainer.make_phase1_step(cfg, cameras_extent=extent, tx=tx)
            ev = None
    if it % 250 == 0 or it == 1:
        if ev is None:
            ev = jax.jit(lambda p, c: jnp.clip(render(
                c, p, bg, cfg.raster, cfg.gi, derive_normal=False,
                compute_occlusion=False)["render"], 0, 1))
        tp = np.mean([_psnr(ev(state.params, c), g)
                      for c, g in zip(test_cams, gt_test)])
        op = np.asarray(jax.nn.sigmoid(state.params.opacity[:, 0]))
        al = np.asarray(state.params.alive)
        print(f"it {it}: loss {float(aux.loss):.4f} l1 {float(aux.l1):.4f} "
              f"train_psnr {float(aux.psnr):.2f} test_psnr {tp:.2f} "
              f"alive {int(al.sum())} med_op {np.median(op[al]):.3f}",
              flush=True)
print("done", flush=True)

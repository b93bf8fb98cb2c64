#!/usr/bin/env python
"""Benchmark: phase-1 train step throughput at the lego config scale
(800x800, ~200k Gaussians) on the available accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

The reference publishes no numbers (BASELINE.md); `vs_baseline` is
reported against a nominal 7 train-iters/s for the reference CUDA
implementation on a datacenter GPU at this configuration (typical
3DGS-with-G-buffer throughput; the working baseline per BASELINE.md is
the reference itself, which cannot run here without CUDA).
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
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
    # Lego-like: points in a unit box in front of the camera.
    pts = rng.uniform(-1.0, 1.0, (N, 3)).astype(np.float32)
    pts[:, 2] = pts[:, 2] * 0.8 + 3.0
    colors = rng.uniform(0.0, 1.0, (N, 3)).astype(np.float32)
    params = create_from_points(pts, colors, capacity=CAP)

    cfg = Config()
    cfg.model = ModelConfig(capacity=CAP)
    cfg.opt = OptimizationConfig(densify_from_iter=10**9)  # pure fwd+bwd cost
    cfg.train = TrainConfig()
    cfg.raster = RasterConfig()  # library defaults (16x128 tiles)
    cfg.gi = GIParams()

    cam = make_camera(R=np.eye(3), T=np.zeros(3), fovx=0.8, fovy=0.8,
                      width=W, height=H)

    # Adaptive instance-capacity bucket, exactly as the training CLI does.
    import dataclasses
    cap_i = trainer.probe_cap_instances(cfg, params, [cam])
    cfg.raster = dataclasses.replace(cfg.raster, cap_instances=cap_i)
    image = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    alpha = jnp.ones((1, H, W), jnp.float32)
    bg = jnp.zeros(3)

    state = trainer.make_train_state(cfg, params, spatial_lr_scale=1.0)
    tx = build_optimizer(cfg.opt, 1.0)
    step = trainer.make_phase1_step(cfg, cameras_extent=3.0, tx=tx)

    # Warmup/compile. NOTE: block_until_ready does not reliably fence on
    # the experimental axon platform; a host transfer (float()) does.
    state, aux = step(state, cam, image, alpha, bg, jnp.int32(1))
    _ = float(aux.loss)

    # Steps chain on `state`, so they execute sequentially on device; one
    # fence after the loop measures true device throughput instead of
    # adding a host<->TPU tunnel round-trip per iteration (training does
    # not read the loss back every step).
    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        state, aux = step(state, cam, image, alpha, bg, jnp.int32(2 + i))
    _ = float(aux.loss)
    dt = (time.perf_counter() - t0) / iters

    iters_per_s = 1.0 / dt
    rays_per_s = H * W / dt
    result = {
        "metric": "train_iters_per_s_lego800_fwd_bwd",
        "value": round(iters_per_s, 4),
        "unit": "iter/s",
        "vs_baseline": round(iters_per_s / 7.0, 4),
        "extra": {
            "rays_per_s": round(rays_per_s, 1),
            "n_gaussians": N,
            "resolution": [H, W],
            "device": str(jax.devices()[0]),
            "loss_finite": bool(np.isfinite(float(aux.loss))),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

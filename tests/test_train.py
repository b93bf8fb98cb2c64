"""End-to-end training smoke tests: phase 1 + phase 2 on a tiny synthetic
scene (GT images rendered from a known Gaussian set)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gi_gs_tpu.config import Config, ModelConfig, OptimizationConfig, TrainConfig
from gi_gs_tpu.models.gaussians import GaussianParams, create_from_points
from gi_gs_tpu.ops.rasterize import RasterConfig
from gi_gs_tpu.ops.screen_space import GIParams
from gi_gs_tpu.renderer import render
from gi_gs_tpu.scene.cameras import make_camera
from gi_gs_tpu.train import trainer
from gi_gs_tpu.train.optim import build_light_optimizer, build_optimizer

from utils import random_scene

CAP = 512
RCFG = RasterConfig(tile_h=8, tile_w=32, cap_instances=1 << 14,
                    cap_tile=256, chunk=8)
GI = GIParams(step=4, start=2, delta=0.25)


def tiny_cfg(**train_kw):
    cfg = Config()
    cfg.model = ModelConfig(capacity=CAP, white_background=False)
    cfg.opt = OptimizationConfig(
        densify_from_iter=10, densification_interval=20,
        densify_until_iter=100, opacity_reset_interval=1000)
    cfg.train = TrainConfig(light_base_res=64, **train_kw)
    cfg.raster = RCFG
    cfg.gi = GI
    return cfg


def gt_setup(seed=0, n_cams=3, w=64, h=48):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-0.5, 0.5, (200, 3)).astype(np.float32)
    pts[:, 2] += 2.5
    colors = rng.uniform(0.2, 0.9, (200, 3)).astype(np.float32)
    gt_params = create_from_points(pts, colors, capacity=256)
    gt_params = gt_params.replace(
        opacity=jnp.full_like(gt_params.opacity, 2.0),
        scaling=gt_params.scaling + 1.0)
    cams, images = [], []
    for i in range(n_cams):
        angle = 0.1 * (i - 1)
        R = np.array([[np.cos(angle), 0, np.sin(angle)],
                      [0, 1, 0],
                      [-np.sin(angle), 0, np.cos(angle)]])
        cam = make_camera(R=R, T=np.array([0.0, 0.0, 0.0]), fovx=1.0,
                          fovy=0.8, width=w, height=h)
        res = render(cam, gt_params, jnp.zeros(3), RCFG, GI,
                     compute_occlusion=False)
        cams.append(cam)
        images.append(np.asarray(res["render"]))
    return cams, images


def init_state(cfg, seed=1):
    rng = np.random.RandomState(seed)
    pts = rng.uniform(-0.5, 0.5, (150, 3)).astype(np.float32)
    pts[:, 2] += 2.5
    colors = rng.uniform(0.3, 0.7, (150, 3)).astype(np.float32)
    params = create_from_points(pts, colors, capacity=CAP)
    return trainer.make_train_state(cfg, params, spatial_lr_scale=1.0)


def run_steps(step_fn, state, cams, images, iters, start_iter=1):
    losses, l1s, psnrs = [], [], []
    alpha = jnp.ones((1,) + images[0].shape[1:])
    bg = jnp.zeros(3)
    for i in range(iters):
        cam = cams[i % len(cams)]
        img = jnp.asarray(images[i % len(images)])
        state, aux = step_fn(state, cam, img, alpha, bg,
                             jnp.int32(start_iter + i))
        losses.append(float(aux.loss))
        l1s.append(float(aux.l1))
        psnrs.append(float(aux.psnr))
    return state, losses, l1s, psnrs


@pytest.mark.slow
def test_phase1_training_reduces_loss():
    cfg = tiny_cfg()
    cams, images = gt_setup()
    state = init_state(cfg)
    tx = build_optimizer(cfg.opt, 1.0)
    step = trainer.make_phase1_step(cfg, cameras_extent=1.0, tx=tx)
    state, losses, l1s, psnrs = run_steps(step, state, cams, images, 60)
    assert np.isfinite(losses).all()
    # Photometric fit improves (the normal-consistency term is noisy on a
    # random synthetic scene, so track l1/psnr, not the total).
    assert np.mean(l1s[-10:]) < 0.75 * np.mean(l1s[:5]), (l1s[:5], l1s[-10:])
    assert np.mean(psnrs[-10:]) > np.mean(psnrs[:5]) + 1.0
    # densification ran and params stay finite
    assert int(state.params.alive.sum()) > 150
    assert np.isfinite(np.asarray(state.params.xyz)).all()


@pytest.mark.slow
def test_cap_tile_overflow_detected_and_grown():
    """A tile whose pre-cap population exceeds cap_tile must be reported
    through StepAux.max_tile_count (not silently truncated), and the CLI
    growth rule must produce a chunk-aligned capacity covering it
    (binning.py tile_count clamp; train_cli.grow_cap_tile)."""
    import dataclasses
    cfg = tiny_cfg()
    # 120 Gaussians piled on one spot -> one tile holds ~all instances.
    rng = np.random.RandomState(3)
    pts = (rng.uniform(-0.01, 0.01, (120, 3)) +
           np.array([0.0, 0.0, 2.5])).astype(np.float32)
    colors = rng.uniform(0.2, 0.9, (120, 3)).astype(np.float32)
    params = create_from_points(pts, colors, capacity=CAP)
    params = params.replace(opacity=jnp.full_like(params.opacity, 2.0))

    cfg.raster = dataclasses.replace(RCFG, cap_tile=16, chunk=8)
    # keep an undonated copy: the phase step donates its state, which
    # aliases `params`' buffers
    params_copy = jax.tree.map(jnp.copy, params)
    state = trainer.make_train_state(cfg, params, spatial_lr_scale=1.0)
    tx = build_optimizer(cfg.opt, 1.0)
    cam = make_camera(R=np.eye(3), T=np.zeros(3), fovx=1.0, fovy=0.8,
                      width=64, height=48)
    img = jnp.full((3, 48, 64), 0.5)
    alpha = jnp.ones((1, 48, 64))
    step = trainer.make_phase1_step(cfg, cameras_extent=1.0, tx=tx)
    _, aux = step(state, cam, img, alpha, jnp.zeros(3), jnp.int32(1))
    mtc = int(aux.max_tile_count)
    assert mtc > cfg.raster.cap_tile, (mtc, cfg.raster.cap_tile)

    # CLI growth rule: chunk-aligned, with headroom, covers the demand.
    ch = cfg.raster.chunk
    new_cap = -(-int(mtc * 1.3) // ch) * ch
    assert new_cap >= mtc and new_cap % ch == 0
    cfg.raster = dataclasses.replace(cfg.raster, cap_tile=new_cap)
    state2 = trainer.make_train_state(cfg, params_copy, spatial_lr_scale=1.0)
    step2 = trainer.make_phase1_step(cfg, cameras_extent=1.0, tx=tx)
    _, aux2 = step2(state2, cam, img, alpha, jnp.zeros(3), jnp.int32(1))
    assert int(aux2.max_tile_count) <= cfg.raster.cap_tile
    # With the full population composited the loss actually changes —
    # proof the truncation was dropping visible instances.
    assert abs(float(aux2.loss) - float(aux.loss)) > 1e-6


@pytest.mark.slow
def test_phase2_training_runs():
    cfg = tiny_cfg(indirect=True, metallic=True)
    cams, images = gt_setup(n_cams=2)
    state = init_state(cfg)
    tx = build_optimizer(cfg.opt, 1.0)
    ltx = build_light_optimizer(cfg.opt)
    step = trainer.make_phase2_step(cfg, cameras_extent=1.0, tx=tx, ltx=ltx)
    state, losses, _, _ = run_steps(step, state, cams, images, 6,
                                    start_iter=30001)
    assert np.isfinite(losses).all()
    assert (np.asarray(state.cubemap) >= 0).all()
    assert np.isfinite(np.asarray(state.cubemap)).all()

"""Data-parallel step semantics on the 8-device CPU mesh.

Checks (VERDICT round-2 item 3):
  * mesh invariance — the 8-device DP step with 8 DISTINCT cameras
    produces the same updated parameters/loss as the same batch on a
    1-device mesh (shard_map over one device = plain batch math);
  * batch semantics — the 1-device DP loss/grads equal a hand-built
    mean over per-view losses (no shard_map), i.e. the DP step really is
    "mean gradient over the camera batch".
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from gi_gs_tpu.config import Config, ModelConfig, OptimizationConfig, TrainConfig
from gi_gs_tpu.ops.rasterize import RasterConfig
from gi_gs_tpu.ops.screen_space import GIParams
from gi_gs_tpu.parallel.data_parallel import (make_dp_phase1_step,
                                              make_dp_phase2_step,
                                              stack_cameras)
from gi_gs_tpu.train import trainer
from gi_gs_tpu.train.optim import (build_light_optimizer, build_optimizer,
                                   trainable_view)

from utils import random_scene  # noqa: F401 (scene helpers)


def _setup(n_cams=8, w=32, h=16, capacity=128, n=80):
    from gi_gs_tpu.models.gaussians import create_from_points
    from gi_gs_tpu.scene.cameras import make_camera

    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    pts[:, 2] += 2.5
    colors = rng.uniform(0.2, 0.9, (n, 3)).astype(np.float32)
    params = create_from_points(pts, colors, capacity=capacity)
    params = params.replace(opacity=jnp.full_like(params.opacity, 1.0))

    cfg = Config()
    cfg.model = ModelConfig(capacity=capacity)
    cfg.opt = OptimizationConfig(densify_from_iter=10 ** 9)
    cfg.train = TrainConfig(light_base_res=64)
    cfg.raster = RasterConfig(tile_h=8, tile_w=16, cap_instances=1 << 11,
                              cap_tile=128, chunk=8)
    cfg.gi = GIParams(step=4, start=2, delta=0.25)

    cams = []
    for i in range(n_cams):
        ang = 0.2 * (i - (n_cams - 1) / 2.0)
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        T = np.array([0.1 * i, 0.0, 0.05 * (i % 2)], np.float32)
        cams.append(make_camera(R=R, T=T, fovx=1.0, fovy=0.7,
                                width=w, height=h))
    images = jnp.asarray(rng.rand(n_cams, 3, h, w).astype(np.float32))
    alphas = jnp.ones((n_cams, 1, h, w), jnp.float32)
    return cfg, params, cams, images, alphas


def _state(cfg, params):
    # Fresh buffer copies: the DP steps donate their input state, and the
    # test builds several states from the same `params` arrays.
    params = jax.tree.map(jnp.copy, params)
    return trainer.make_train_state(cfg, params, spatial_lr_scale=1.0)


@pytest.mark.slow
def test_dp_phase1_mesh_invariance_and_batch_semantics():
    cfg, params, cams, images, alphas = _setup()
    tx = build_optimizer(cfg.opt, 1.0)
    bg = jnp.zeros(3)
    it = jnp.int32(1)
    batch = stack_cameras(cams)

    mesh8 = Mesh(np.array(jax.devices()[:8]), ("data",))
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("data",))
    step8 = make_dp_phase1_step(cfg, cameras_extent=1.0, tx=tx, mesh=mesh8)
    step1 = make_dp_phase1_step(cfg, cameras_extent=1.0, tx=tx, mesh=mesh1)

    s8, a8 = step8(_state(cfg, params), batch, images, alphas, bg, it)
    s1, a1 = step1(_state(cfg, params), batch, images, alphas, bg, it)

    np.testing.assert_allclose(float(a8.loss), float(a1.loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s8.params.xyz),
                               np.asarray(s1.params.xyz),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s8.params.opacity),
                               np.asarray(s1.params.opacity),
                               rtol=1e-4, atol=1e-6)

    # Batch semantics: DP loss/grads == mean over per-view losses, built
    # directly from the single-view loss pieces without any shard_map.
    from gi_gs_tpu.renderer import render
    from gi_gs_tpu.train import losses
    from gi_gs_tpu.train.trainer import _gt_image, _masked_l1
    from gi_gs_tpu.utils import image_utils

    state = _state(cfg, params)

    def mean_loss(view):
        p = state.params.replace(**view)
        ndc = jnp.zeros((p.capacity, 2), jnp.float32)
        total = 0.0
        for i, cam in enumerate(cams):
            res = render(cam, p, bg, cfg.raster, cfg.gi,
                         derive_normal=True, compute_occlusion=False,
                         ndc_offset=ndc)
            gt = _gt_image(images[i], alphas[i], bg)
            l1 = image_utils.l1_loss(res["render"], gt)
            l = (1.0 - cfg.opt.lambda_dssim) * l1 + cfg.opt.lambda_dssim * (
                1.0 - image_utils.ssim(res["render"], gt))
            l = l + _masked_l1(res["normal_map_world"],
                               res["normal_map_from_depth"],
                               res["normal_from_depth_mask"])
            l = l + cfg.train.normal_tv_weight * losses.tv_loss(
                gt, res["normal_map"])
            total = total + l
        return total / len(cams)

    ref_loss, ref_grads = jax.value_and_grad(mean_loss)(
        trainable_view(state.params))
    # vmapped-vs-looped conv/SSIM reassociation: ~2e-4 relative noise.
    np.testing.assert_allclose(float(a1.loss), float(ref_loss), rtol=1e-3)

    # Verify the mean-gradient semantics through the optimizer: applying
    # tx to the reference grads reproduces the DP-updated xyz.
    import optax
    upd, _ = tx.update(ref_grads, _state(cfg, params).opt_state,
                       trainable_view(state.params))
    expect = optax.apply_updates(trainable_view(state.params), upd)
    # Elements whose true gradient is fp-noise-level get arbitrary
    # +-~3.16*lr Adam updates across differently-fused programs; require
    # near-exact agreement except for such (rare) elements.
    d = np.abs(np.asarray(s1.params.xyz) - np.asarray(expect["xyz"]))
    assert (d > 1e-4).mean() < 0.02, (d > 1e-4).mean()
    assert d.max() <= 3.2 * cfg.opt.position_lr_init * 10, d.max()


@pytest.mark.slow
def test_dp_phase2_mesh_invariance():
    cfg, params, cams, images, alphas = _setup()
    cfg.train = TrainConfig(light_base_res=64, indirect=True)
    tx = build_optimizer(cfg.opt, 1.0)
    ltx = build_light_optimizer(cfg.opt)
    bg = jnp.zeros(3)
    it = jnp.int32(1)
    batch = stack_cameras(cams)

    mesh8 = Mesh(np.array(jax.devices()[:8]), ("data",))
    mesh1 = Mesh(np.array(jax.devices()[:1]), ("data",))
    step8 = make_dp_phase2_step(cfg, cameras_extent=1.0, tx=tx, ltx=ltx,
                                mesh=mesh8)
    step1 = make_dp_phase2_step(cfg, cameras_extent=1.0, tx=tx, ltx=ltx,
                                mesh=mesh1)

    s8, a8 = step8(_state(cfg, params), batch, images, alphas, bg, it)
    s1, a1 = step1(_state(cfg, params), batch, images, alphas, bg, it)

    assert np.isfinite(float(a8.loss))
    np.testing.assert_allclose(float(a8.loss), float(a1.loss), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s8.params.albedo),
                               np.asarray(s1.params.albedo),
                               rtol=1e-4, atol=1e-6)
    # Light gradients pmean'd identically -> identical cubemap update.
    np.testing.assert_allclose(np.asarray(s8.cubemap),
                               np.asarray(s1.cubemap),
                               rtol=1e-4, atol=1e-6)

"""Tile-sharded compositing over an 8-device CPU mesh vs single-device."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from gi_gs_tpu.ops.rasterize import RasterConfig
from gi_gs_tpu.ops.rasterize.binning import bin_and_sort
from gi_gs_tpu.ops.rasterize.composite import composite
from gi_gs_tpu.ops.rasterize.preprocess import preprocess
from gi_gs_tpu.parallel.tile_sharded import sharded_composite

from utils import random_scene

import dataclasses
import pytest

BASE_CFG = RasterConfig(tile_h=8, tile_w=32, cap_instances=1 << 13,
                        cap_tile=256, chunk=8, use_pallas=False)


@pytest.mark.slow
@pytest.mark.parametrize("use_pallas", [False, True])
def test_sharded_composite_matches_and_grads(use_pallas):
    """Tile-sharded == single-device (jnp oracle), for BOTH compositing
    backends. use_pallas=True runs the Pallas kernels (interpret mode on
    CPU) under shard_map, covering the `tile_base` offset plumbing in
    pallas_composite that only the sharded path exercises."""
    cfg = dataclasses.replace(BASE_CFG, use_pallas=use_pallas)
    scene = random_scene(n=150, seed=0)
    cam, w, h = scene["cam"], scene["width"], scene["height"]
    pre = preprocess(scene["xyz"], scene["cov3d"], cam.w2c, cam.full_proj,
                     cam.tanfovx, cam.tanfovy, w, h, cfg)
    b = bin_and_sort(pre, h, w, cfg)
    table = jnp.concatenate([
        pre.means2d, pre.conic, scene["opacity"], scene["color"],
        scene["normal"], scene["albedo"], scene["roughness"],
        scene["metallic"], pre.depth[:, None], pre.pos_view], axis=1)
    grid = cfg.grid(h, w)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    rng = np.random.RandomState(1)
    T = grid[0] * grid[1]
    P = cfg.pixels_per_tile
    g_acc = jnp.asarray(rng.normal(size=(T, 16, P)).astype(np.float32))
    g_t = jnp.asarray(rng.normal(size=(T, P)).astype(np.float32))

    def loss_single(tbl):
        a, t = composite(tbl, b.ids, b.tile_start, b.tile_count,
                         b.inst_tile, b.inv_perm, b.offsets, b.seg_gaussian,
                         dataclasses.replace(cfg, use_pallas=False), grid,
                         (h, w))
        return (a * g_acc).sum() + (t * g_t).sum()

    def loss_sharded(tbl):
        a, t = sharded_composite(mesh, tbl, b, cfg, grid, (h, w))
        return (a * g_acc).sum() + (t * g_t).sum()

    v1, g1 = jax.value_and_grad(loss_single)(table)
    v2, g2 = jax.value_and_grad(loss_sharded)(table)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    # psum reassociation: tiny float noise allowed
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-3, atol=5e-5)


@pytest.mark.slow
def test_ts_phase1_train_step_matches_single_chip():
    """End-to-end tile-sharded TRAIN step (make_ts_phase1_step) over the
    8-device CPU mesh vs the single-chip trainer step: identical loss and
    parameters after steps that include a densify+surgery iteration
    (psum'd gradient partials must reproduce the full gradient)."""
    from gi_gs_tpu.config import (Config, ModelConfig, OptimizationConfig,
                                  TrainConfig)
    from gi_gs_tpu.models.gaussians import create_from_points
    from gi_gs_tpu.parallel.tile_sharded import make_ts_phase1_step
    from gi_gs_tpu.scene.cameras import make_camera
    from gi_gs_tpu.train import trainer
    from gi_gs_tpu.train.optim import build_optimizer

    rng = np.random.RandomState(0)
    n, capacity = 80, 256
    pts = rng.uniform(-0.5, 0.5, (n, 3)).astype(np.float32)
    pts[:, 2] += 2.5
    params = create_from_points(
        pts, rng.uniform(0.2, 0.9, (n, 3)).astype(np.float32),
        capacity=capacity)
    cam = make_camera(R=np.eye(3), T=np.zeros(3), fovx=1.0, fovy=0.7,
                      width=64, height=32)
    cfg = Config()
    cfg.model = ModelConfig(capacity=capacity)
    # iteration 2 fires densify (decisive threshold so chips agree).
    cfg.opt = OptimizationConfig(densify_from_iter=0,
                                 densification_interval=2,
                                 densify_until_iter=10,
                                 densify_grad_threshold=1e-8)
    cfg.train = TrainConfig(light_base_res=16)
    cfg.raster = dataclasses.replace(BASE_CFG, cap_instances=1 << 12,
                                     tile_w=16)

    image = jnp.asarray(rng.rand(3, 32, 64).astype(np.float32))
    alpha = jnp.ones((1, 32, 64), jnp.float32)
    bg = jnp.zeros(3)
    tx = build_optimizer(cfg.opt, 1.0)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    def run(step_fn):
        # Deep copy: both steps donate their state buffers.
        state = trainer.make_train_state(
            cfg, jax.tree.map(jnp.copy, params), spatial_lr_scale=1.0)
        outs = []
        for it in (1, 2, 3):
            state, aux = step_fn(state, cam, image, alpha, bg,
                                 jnp.int32(it))
            outs.append(float(aux.loss))
        return state, outs

    s1, l1 = run(trainer.make_phase1_step(cfg, 1.0, tx))
    s2, l2 = run(make_ts_phase1_step(cfg, 1.0, tx, mesh))

    np.testing.assert_allclose(l1, l2, rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s1.params.alive),
                                  np.asarray(s2.params.alive))
    assert int(np.asarray(s1.params.alive).sum()) > n  # densify fired
    # Adam normalises by sqrt(second moment): for an element whose true
    # gradient is numerically ~0, the psum association noise fully
    # determines m/sqrt(v), so that element's update is arbitrary within
    # +-~3.16*lr. Require near-exact agreement except for (rare) such
    # elements, whose divergence must stay within one noise-step.
    lrs = {"xyz": 0.00016 * 1.5, "opacity": 0.05, "scaling": 0.005}
    for f, lr in lrs.items():
        a = np.asarray(getattr(s1.params, f))
        b = np.asarray(getattr(s2.params, f))
        d = np.abs(a - b)
        assert (d > 1e-4).mean() < 0.01, (f, (d > 1e-4).mean())
        assert d.max() <= 3 * 3.2 * lr, (f, d.max())

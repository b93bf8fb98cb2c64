"""Capacity growth (grow_params / surgery_grow / trainer.grow_state).

The reference reallocates Gaussian tensors without limit on densify
(/root/reference/scene/gaussian_model.py:664-749). The TPU-native
equivalent keeps static shapes and doubles the padded capacity when the
alive population saturates the bucket. These tests pin down the growth
invariants:

 (a) growth is render-invariant (no mass loss — dead slots stay dead,
     live slots untouched),
 (b) Adam moments of surviving slots are preserved exactly, new slots
     start zeroed like freshly densified points,
 (c) training continues through a growth event: densification that was
     saturated (dropped > 0) proceeds past the old capacity and the loss
     keeps decreasing.

Exact trajectory equality against an oversized-from-start run is NOT
asserted: densify samples its position noise as normal(key, (capacity, 3)),
so different capacities draw different noise for the same key by
construction.
"""
import dataclasses
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, ".")

from gi_gs_tpu.models.gaussians import create_from_points, grow_params
from gi_gs_tpu.renderer import render
from gi_gs_tpu.train import trainer
from gi_gs_tpu.train.optim import build_optimizer, trainable_view
from tools.quality_gate import _build_cfg, make_gt_scene, ring_cameras


@pytest.fixture(scope="module")
def small():
    cfg = _build_cfg(size=48, capacity=256, light_res=16)
    gt = make_gt_scene(n=150, seed=0, capacity=256)
    cams = ring_cameras(6, 48)
    cap_i = trainer.probe_cap_instances(cfg, gt, cams)
    cfg.raster = dataclasses.replace(cfg.raster, cap_instances=cap_i)
    bg = jnp.zeros(3)
    render_fn = jax.jit(lambda p, c: render(
        c, p, bg, cfg.raster, cfg.gi, derive_normal=False,
        compute_occlusion=False)["render"])
    gt_imgs = [render_fn(gt, c) for c in cams]
    return cfg, gt, cams, gt_imgs, bg, render_fn


def test_grow_render_invariant(small):
    cfg, gt, cams, gt_imgs, bg, render_fn = small
    big = grow_params(gt, 512)
    assert big.capacity == 512
    assert int(big.alive.sum()) == int(gt.alive.sum())
    for f in ("xyz", "opacity", "scaling", "rotation", "albedo"):
        np.testing.assert_array_equal(np.asarray(getattr(big, f))[:256],
                                      np.asarray(getattr(gt, f)))
    img_small = np.asarray(render_fn(gt, cams[0]))
    img_big = np.asarray(render_fn(big, cams[0]))
    np.testing.assert_allclose(img_big, img_small, atol=1e-5)


@pytest.mark.slow
def test_grow_state_preserves_moments(small):
    cfg, gt, cams, gt_imgs, bg, _ = small
    state = trainer.make_train_state(cfg, gt, spatial_lr_scale=1.0)
    tx = build_optimizer(cfg.opt, 1.0)
    step = trainer.make_phase1_step(cfg, cameras_extent=1.5, tx=tx)
    alpha = jnp.ones((1, 48, 48), jnp.float32)
    # A couple of steps to populate nonzero Adam moments.
    for it in (1, 2):
        state, _ = step(state, cams[0], gt_imgs[0], alpha, bg, jnp.int32(it))
    mu_before = jax.tree.leaves(state.opt_state)
    grown = trainer.grow_state(state, 512)
    assert grown.params.capacity == 512
    # Every per-Gaussian float leaf: first 256 rows exact, tail zero.
    n_checked = 0
    for a, b in zip(mu_before, jax.tree.leaves(grown.opt_state)):
        if not (isinstance(a, jnp.ndarray) and a.ndim >= 1
                and a.shape[0] == 256):
            continue
        n_checked += 1
        np.testing.assert_array_equal(np.asarray(b)[:256], np.asarray(a))
        assert float(jnp.abs(b[256:]).max()) == 0.0
    assert n_checked >= 10  # mu+nu over the 10 parameter groups
    # Growth alone must not change what renders.
    r0 = np.asarray(render(cams[1], state.params, bg, cfg.raster, cfg.gi,
                           derive_normal=False,
                           compute_occlusion=False)["render"])
    r1 = np.asarray(render(cams[1], grown.params, bg, cfg.raster, cfg.gi,
                           derive_normal=False,
                           compute_occlusion=False)["render"])
    np.testing.assert_allclose(r1, r0, atol=1e-5)


@pytest.mark.slow
def test_training_through_saturation_growth(small):
    cfg, gt, cams, gt_imgs, bg, _ = small
    # Tight capacity: 150 alive of 160 — densification saturates fast.
    cfg = dataclasses.replace(cfg) if dataclasses.is_dataclass(cfg) else cfg
    import copy
    cfg = copy.deepcopy(cfg)
    cfg.opt = dataclasses.replace(
        cfg.opt, densify_from_iter=1, densification_interval=2,
        densify_grad_threshold=1e-5)  # fire on everything
    tight = make_gt_scene(n=150, seed=0, capacity=160)
    state = trainer.make_train_state(cfg, tight, spatial_lr_scale=1.0)
    tx = build_optimizer(cfg.opt, 1.0)
    step = trainer.make_phase1_step(cfg, cameras_extent=1.5, tx=tx)
    alpha = jnp.ones((1, 48, 48), jnp.float32)

    saw_dropped = False
    it = 0
    losses = []
    for _ in range(10):
        it += 1
        state, aux = step(state, cams[it % len(cams)], gt_imgs[it % len(cams)],
                          alpha, bg, jnp.int32(it))
        losses.append(float(aux.loss))
        if int(aux.densify_dropped) > 0:
            saw_dropped = True
            break
    assert saw_dropped, "densification never saturated the tight bucket"

    state = trainer.grow_state(state, 1024)
    alive_at_growth = int(state.params.alive.sum())
    for _ in range(6):
        it += 1
        state, aux = step(state, cams[it % len(cams)], gt_imgs[it % len(cams)],
                          alpha, bg, jnp.int32(it))
        losses.append(float(aux.loss))
    assert np.isfinite(losses).all()
    alive_end = int(state.params.alive.sum())
    assert alive_end > 160, (
        f"population never outgrew the old capacity ({alive_end})")
    assert alive_end >= alive_at_growth

    # Past the densify window (no more churn) the loss must keep
    # decreasing — pure optimization over the grown population.
    tail = []
    for k in range(12):
        state, aux = step(state, cams[k % len(cams)], gt_imgs[k % len(cams)],
                          alpha, bg, jnp.int32(20_000 + k))
        tail.append(float(aux.loss))
    assert np.isfinite(tail).all()
    assert np.mean(tail[-6:]) < np.mean(tail[:6])

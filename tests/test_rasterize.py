"""Rasterizer core: tiled pipeline vs brute-force oracle, fwd + grads."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gi_gs_tpu.ops.rasterize import RasterConfig
from gi_gs_tpu.ops.rasterize.binning import bin_and_sort
from gi_gs_tpu.ops.rasterize.composite import composite
from gi_gs_tpu.ops.rasterize.preprocess import preprocess
from gi_gs_tpu.ops.rasterize.pipeline import rasterize, _tiles_to_image
from gi_gs_tpu.ops.rasterize.reference import rasterize_bruteforce

from utils import random_scene

CFG = RasterConfig(tile_h=8, tile_w=32, cap_instances=1 << 14,
                   cap_tile=512, chunk=8)


def full_features(scene, pre):
    return jnp.concatenate([
        scene["color"], jnp.ones_like(scene["roughness"]), scene["normal"],
        scene["albedo"], scene["roughness"], scene["metallic"],
        pre.depth[:, None], pre.pos_view], axis=1)  # [N, 16]


def run_tiled(scene, cfg=CFG):
    cam, w, h = scene["cam"], scene["width"], scene["height"]
    return rasterize(
        scene["xyz"], scene["cov3d"], scene["opacity"], scene["color"],
        scene["normal"], scene["albedo"], scene["roughness"],
        scene["metallic"], cam.w2c, cam.full_proj, cam.tanfovx, cam.tanfovy,
        h, w, jnp.zeros(3), cfg)


def run_oracle(scene, cfg=CFG):
    cam, w, h = scene["cam"], scene["width"], scene["height"]
    pre = preprocess(scene["xyz"], scene["cov3d"], cam.w2c, cam.full_proj,
                     cam.tanfovx, cam.tanfovy, w, h, cfg)
    feats = full_features(scene, pre)
    return rasterize_bruteforce(
        scene["xyz"], scene["cov3d"], scene["opacity"], feats, cam.w2c,
        cam.full_proj, cam.tanfovx, cam.tanfovy, h, w, cfg)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_forward_matches_oracle(seed):
    scene = random_scene(n=300, seed=seed)
    out = run_tiled(scene)
    acc, final_t = run_oracle(scene)
    np.testing.assert_allclose(out.final_t[0], final_t, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out.color, acc[0:3], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out.opacity[0], acc[3], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out.normal, acc[4:7], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out.albedo, acc[7:10], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out.roughness[0], acc[10], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out.metallic[0], acc[11], rtol=1e-4, atol=1e-5)
    # depth/pos are weight-normalised in the pipeline
    o = np.asarray(acc[3])
    d = np.where(o > 1e-6, np.asarray(acc[12]) / np.where(o > 1e-6, o, 1), 0)
    np.testing.assert_allclose(out.depth[0], d, rtol=1e-4, atol=1e-5)


def test_background_composited():
    scene = random_scene(n=50, seed=3)
    cam, w, h = scene["cam"], scene["width"], scene["height"]
    bg = jnp.array([0.2, 0.4, 0.8])
    out = rasterize(
        scene["xyz"], scene["cov3d"], scene["opacity"], scene["color"],
        scene["normal"], scene["albedo"], scene["roughness"],
        scene["metallic"], cam.w2c, cam.full_proj, cam.tanfovx, cam.tanfovy,
        h, w, bg, CFG)
    acc, final_t = run_oracle(scene)
    expect = np.asarray(acc[0:3]) + np.asarray(final_t)[None] * np.asarray(bg)[:, None, None]
    np.testing.assert_allclose(out.color, expect, rtol=1e-4, atol=1e-5)


def oracle_with_ref_grad_semantics(scene, cfg=CFG):
    """Oracle whose autodiff reproduces the CUDA backward quirks: aux
    channels (everything beyond color+ones) get feature-only gradients."""
    cam, w, h = scene["cam"], scene["width"], scene["height"]

    def fwd(color, normal, albedo, rough, metal, opacity, xyz, cov3d):
        pre = preprocess(xyz, cov3d, cam.w2c, cam.full_proj,
                         cam.tanfovx, cam.tanfovy, w, h, cfg)
        sg = jax.lax.stop_gradient
        feats_coupled = jnp.concatenate(
            [color, jnp.ones_like(rough)], axis=1)           # [N, 4]
        feats_aux = jnp.concatenate(
            [normal, albedo, rough, metal, pre.depth[:, None], pre.pos_view],
            axis=1)                                           # [N, 12]
        acc_c, final_t = rasterize_bruteforce(
            xyz, cov3d, opacity, feats_coupled, cam.w2c, cam.full_proj,
            cam.tanfovx, cam.tanfovy, h, w, cfg)
        # Aux channels: weights detached == no alpha coupling.
        acc_a, _ = rasterize_bruteforce(
            sg(xyz), sg(cov3d), sg(opacity), feats_aux, cam.w2c,
            cam.full_proj, cam.tanfovx, cam.tanfovy, h, w, cfg)
        return jnp.concatenate([acc_c, acc_a], axis=0), final_t

    return fwd


@pytest.mark.slow
def test_gradients_match_reference_semantics():
    scene = random_scene(n=120, seed=5, op_max=0.9)
    cam, w, h = scene["cam"], scene["width"], scene["height"]
    rng = np.random.RandomState(7)
    g_acc_img = jnp.asarray(rng.normal(size=(16, h, w)).astype(np.float32))
    # Zero the normal-channel cotangent on the border like the CUDA kernel
    # does internally, so the oracle (which has no such logic) agrees.
    border = np.zeros((h, w), np.float32)
    border[1:-1, 1:-1] = 1.0
    mask = np.ones((16, 1, 1), np.float32)
    g_acc_img = g_acc_img.at[4:7].multiply(jnp.asarray(border)[None])
    g_t_img = jnp.asarray(rng.normal(size=(h, w)).astype(np.float32))

    def loss_tiled(color, normal, albedo, rough, metal, opacity, xyz, cov3d):
        pre = preprocess(xyz, cov3d, cam.w2c, cam.full_proj, cam.tanfovx,
                         cam.tanfovy, w, h, CFG)
        b = bin_and_sort(jax.tree.map(jax.lax.stop_gradient, pre), h, w, CFG)
        table = jnp.concatenate([
            pre.means2d, pre.conic, opacity, color, normal, albedo, rough,
            metal, pre.depth[:, None], pre.pos_view], axis=1)
        grid = CFG.grid(h, w)
        accum, final_t = composite(table, b.ids, b.tile_start, b.tile_count,
                                   b.inst_tile, b.inv_perm, b.offsets, b.seg_gaussian, CFG,
                                   grid, (h, w))
        img = _tiles_to_image(accum, grid, CFG, h, w)
        t_img = _tiles_to_image(final_t[:, None, :], grid, CFG, h, w)[0]
        return (img * g_acc_img).sum() + (t_img * g_t_img).sum()

    oracle = oracle_with_ref_grad_semantics(scene)

    def loss_oracle(color, normal, albedo, rough, metal, opacity, xyz, cov3d):
        acc, final_t = oracle(color, normal, albedo, rough, metal, opacity,
                              xyz, cov3d)
        return (acc * g_acc_img).sum() + (final_t * g_t_img).sum()

    args = (scene["color"], scene["normal"], scene["albedo"],
            scene["roughness"], scene["metallic"], scene["opacity"],
            scene["xyz"], scene["cov3d"])
    g1 = jax.grad(loss_tiled, argnums=tuple(range(8)))(*args)
    g2 = jax.grad(loss_oracle, argnums=tuple(range(8)))(*args)
    names = ["color", "normal", "albedo", "rough", "metal", "opacity",
             "xyz", "cov3d"]
    for n, a, b in zip(names, g1, g2):
        scale = np.maximum(np.abs(np.asarray(b)).max(), 1e-3)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4 * scale,
            err_msg=f"grad mismatch: {n}")


def test_overflow_counters():
    scene = random_scene(n=300, seed=0)
    tiny = RasterConfig(tile_h=8, tile_w=32, cap_instances=64, cap_tile=64,
                        chunk=8)
    out = run_tiled(scene, tiny)
    assert int(out.overflow) > 0

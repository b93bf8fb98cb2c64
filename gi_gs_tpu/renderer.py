"""Render orchestration — the equivalent of `gaussian_renderer/__init__.py
render()` plus the filter/derive chain inside `GaussianRasterizer.forward`
(diff_gaussian_rasterization/__init__.py:390-537).

One fully-jittable function: activations -> SH colors -> rasterize ->
median-blur depth -> depth->normal -> bilateral blur -> median-blur
positions -> SSAO -> normal post-processing. Returns the same result-dict
vocabulary as the reference so the trainer/eval layers read identically.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .models.gaussians import GaussianParams
from .ops.rasterize import RasterConfig
from .ops.rasterize.pipeline import rasterize
from .ops import screen_space
from .ops.screen_space import GIParams
from .scene.cameras import Camera
from .utils import image_utils


def render(camera: Camera, pc: GaussianParams, bg_color: jnp.ndarray,
           cfg: RasterConfig = RasterConfig(),
           gi: GIParams = GIParams(),
           scaling_modifier: float = 1.0,
           override_color: Optional[jnp.ndarray] = None,
           inference: bool = False,
           pad_normal: bool = False,
           derive_normal: bool = True,
           compute_occlusion: bool = True,
           argmax_depth: bool = False,
           ndc_offset: Optional[jnp.ndarray] = None,
           tile_axis: Optional[str] = None,
           tile_shards: int = 1) -> Dict[str, jnp.ndarray]:
    """Full G-buffer render of one view (ref gaussian_renderer render()).

    ndc_offset: optional [N, 2] zeros; its gradient equals the reference's
    screenspace_points.grad used for densification stats.

    argmax_depth is an INFERENCE-ONLY feature: with cfg.use_pallas the
    whole G-buffer (including color) is stop-gradient'ed on this path
    (one fused fwd+peak kernel launch, pipeline.py rasterize), while the
    jnp path keeps color differentiable — do not train through
    argmax_depth=True. The reference never differentiates it either
    (forward.cu:577-583 has no backward).
    """
    H, W = camera.height, camera.width

    opacity = pc.get_opacity()
    normal = pc.get_normal()
    albedo = pc.get_albedo()
    roughness = pc.get_roughness()
    metallic = pc.get_metallic()
    cov3d = pc.get_covariance(scaling_modifier)
    if override_color is None:
        color = pc.colors_from_sh(camera.cam_pos)
    else:
        color = override_color

    out = rasterize(
        pc.xyz, cov3d, opacity, color, normal, albedo, roughness, metallic,
        camera.w2c, camera.full_proj, camera.tanfovx, camera.tanfovy,
        H, W, bg_color, cfg, ndc_offset=ndc_offset, inference=inference,
        argmax_depth=argmax_depth, tile_axis=tile_axis,
        tile_shards=tile_shards)

    # --- derived maps (GaussianRasterizer.forward, __init__.py:475-537) ---
    # The reference runs _C.depth_to_normal outside autograd (no grad_fn on
    # its output); replicate by detaching the depth input.
    if derive_normal:
        depth_sg = jax.lax.stop_gradient(out.depth)
        depth_filter = image_utils.median_blur_3x3(depth_sg)[0]  # [H, W]
        normal_from_depth, depth_pos = screen_space.depth_to_normal(
            depth_filter, camera.w2c, camera.fx, camera.fy)
    else:
        normal_from_depth = jnp.zeros_like(out.normal)
        depth_pos = jnp.zeros_like(out.normal)

    normal_from_depth = image_utils.bilateral_blur_3x3(normal_from_depth)

    depth_pos_filter = image_utils.median_blur_3x3(depth_pos)
    if compute_occlusion:
        occlusion = screen_space.ssao(out.normal_view, depth_pos_filter,
                                      camera.fx, camera.fy, gi)
    else:
        occlusion = jnp.ones_like(out.depth)

    # --- post-processing (gaussian_renderer/__init__.py:157-219) ---
    normal_map = out.normal
    opacity_map = out.opacity
    normal_from_depth_mask = (normal_from_depth != 0).all(axis=0)
    normal_mask = (normal_map != 0).all(axis=0, keepdims=True)

    if pad_normal:
        opacity_map = jnp.where(opacity_map < 0.004, 0.0, opacity_map)
        opacity_map = jnp.where(opacity_map > 1.0 - 0.004, 1.0, opacity_map)
        normal_bg = jnp.array([0.0, 0.0, 1.0])[:, None, None]
        normal_map = normal_map * opacity_map + (1.0 - opacity_map) * normal_bg
        mask_fd = (normal_from_depth == 0.0).all(axis=0, keepdims=True).astype(jnp.float32)
        normal_from_depth = normal_from_depth * (1.0 - mask_fd) + mask_fd * normal_bg

    def _norm_where_nonzero(v):
        # rsqrt(max(., eps)) keeps the gradient at ||v|| == 0 finite (the
        # where() alone would still propagate NaN from the unselected
        # branch's backward).
        n2 = (v * v).sum(axis=0, keepdims=True)
        unit = v * jax.lax.rsqrt(jnp.maximum(n2, 1e-24))
        return jnp.where(n2 > 0, unit, v)

    normal_from_depth = _norm_where_nonzero(normal_from_depth)
    normal_map = _norm_where_nonzero(normal_map)
    normal_map = image_utils.median_blur_3x3(normal_map)

    # View-space (negated) normal map — the fork's returned "normal_map"
    # (gaussian_renderer/__init__.py:188-190,212, "# replaced normal map").
    # NOTE documented deviation: the fork feeds THIS map into the
    # world-frame normal-consistency loss (train.py:325-327) and into
    # pbr_shading with world view_dirs (train.py:341-353) — a frame
    # mismatch introduced relative to its GS-IR/GI-GS upstream, which uses
    # the world-space composite for both. The mismatch makes the normal
    # loss un-minimizable (measured plateau ~0.45) and the reflection
    # lookups frame-inconsistent; our trainer consumes
    # "normal_map_world" below instead (upstream semantics), while this
    # key keeps the fork vocabulary for the eval image dumps.
    normals_view = -jnp.einsum("ij,jhw->ihw", camera.w2c[:3, :3], normal_map)

    out_normal_view = _norm_where_nonzero(out.normal_view)
    out_normal_view = image_utils.median_blur_3x3(out_normal_view)

    return {
        "render": out.color,
        "visibility_filter": out.visibility,
        "radii": out.radii,
        "opacity_map": opacity_map,
        "depth_map": out.depth,
        "normal_map_from_depth": normal_from_depth,
        "normal_from_depth_mask": normal_from_depth_mask,
        "normal_map": normals_view,
        "normal_map_world": normal_map,
        "normal_mask": normal_mask,
        "albedo_map": out.albedo,
        "roughness_map": out.roughness,
        "metallic_map": out.metallic,
        "occlusion_map": occlusion,
        "out_normal_view": out_normal_view,
        "depth_pos": depth_pos_filter,
        "overflow": out.overflow,
        "max_tile_count": out.max_tile_count,
    }

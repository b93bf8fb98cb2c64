"""Two-phase training driver (functional core of the reference
`training()`, train.py:171-527).

Phase 1 (iter <= pbr_iteration): photometric L1+DSSIM + normal
consistency + normal TV. Phase 2: deferred PBR shading against the
learnable cubemap + SSR indirect + BRDF/env regularisers.

Everything per-iteration is one jitted function per phase; densification
and opacity reset run under lax.cond inside the step so the whole
schedule stays on-device with static shapes.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..models.gaussians import GaussianParams
from ..models.light import (CubemapLight, build_mips, build_mips_packed,
                            build_prefilter_tables)
from ..ops import screen_space
from ..ops.shading import pbr_shading_chw, get_brdf_lut
from ..ops.cubemap import sample_cubemap
from ..renderer import render
from ..scene.cameras import Camera
from ..utils import image_utils, math_utils
from . import losses
from .densify import DensifyStats, densify_and_prune, reset_opacity, update_stats
from .optim import (build_light_optimizer, build_optimizer,
                    surgery_new_slots, surgery_reset_group, trainable_view)


class TrainState(NamedTuple):
    params: GaussianParams
    opt_state: Any
    stats: DensifyStats
    cubemap: jnp.ndarray          # [6, R, R, 3] env light base
    light_opt_state: Any
    key: jax.Array


class StepAux(NamedTuple):
    loss: jnp.ndarray
    l1: jnp.ndarray
    normal_loss: jnp.ndarray
    psnr: jnp.ndarray
    densify_dropped: jnp.ndarray
    overflow: jnp.ndarray
    # Pre-cap per-tile instance maximum (diagnostic): > cfg.raster.cap_tile
    # means the most-occluded instances of some tile were silently dropped
    # (binning.py tile_count clamp) — the CLI grows cap_tile and re-jits.
    max_tile_count: jnp.ndarray


def make_train_state(cfg: Config, params: GaussianParams,
                     spatial_lr_scale: float, seed: int = 0,
                     tx=None) -> TrainState:
    """`tx` must be the SAME optax transform later passed to the step
    builders when it differs structurally from the default (e.g. a
    build_optimizer(..., lr_scale_fn=...) — its per-group states carry a
    schedule count the default's constant-lr groups lack)."""
    key = jax.random.PRNGKey(seed)
    k1, key = jax.random.split(key)
    if tx is None:
        tx = build_optimizer(cfg.opt, spatial_lr_scale)
    ltx = build_light_optimizer(cfg.opt)
    base = jax.random.uniform(
        k1, (6, cfg.train.light_base_res, cfg.train.light_base_res, 3),
        jnp.float32) * 0.5 + 0.25  # CubemapLight init (pbr/light.py:103-107)
    return TrainState(
        params=params, opt_state=tx.init(trainable_view(params)),
        stats=DensifyStats.zeros(params.capacity),
        cubemap=base, light_opt_state=ltx.init(base),
        key=key)


def grow_state(state: TrainState, new_capacity: int) -> TrainState:
    """Grow the Gaussian capacity of a whole train state: params re-padded
    (models.gaussians.grow_params), per-Gaussian optimizer moments padded
    with zeros (optim.surgery_grow), densify stats re-zeroed at the new
    size. The caller re-runs its jitted step, which retraces for the new
    shapes. Equivalent capability to the reference's unbounded densify
    reallocation (gaussian_model.py:664-749)."""
    from ..models.gaussians import grow_params
    from .optim import surgery_grow
    old = state.params.capacity
    if new_capacity <= old:
        return state
    return state._replace(
        params=grow_params(state.params, new_capacity),
        opt_state=surgery_grow(state.opt_state, old, new_capacity),
        stats=DensifyStats(
            accum=_pad0(state.stats.accum, new_capacity),
            accum_abs=_pad0(state.stats.accum_abs, new_capacity),
            accum_abs_max=_pad0(state.stats.accum_abs_max, new_capacity),
            denom=_pad0(state.stats.denom, new_capacity),
            max_radii2d=_pad0(state.stats.max_radii2d, new_capacity)))


def _pad0(x: jnp.ndarray, new_cap: int) -> jnp.ndarray:
    extra = jnp.zeros((new_cap - x.shape[0],) + x.shape[1:], x.dtype)
    return jnp.concatenate([x, extra], axis=0)


def probe_cap_instances(cfg: Config, params: GaussianParams, cameras,
                        max_views: int = 3) -> int:
    """Measure the (gaussian, tile) instance count over a camera sample and
    return the capacity bucket to compile with (the adaptive replacement
    for the reference's exact per-frame `num_rendered` allocation,
    rasterizer_impl.cu:582-592)."""
    from ..ops.rasterize.pipeline import bucket_cap_instances, count_instances
    cov3d = params.get_covariance(1.0)
    opacity = params.get_opacity()
    worst = 0
    for cam in cameras[:max_views]:
        n = int(count_instances(params.xyz, cov3d, cam.w2c, cam.full_proj,
                                cam.tanfovx, cam.tanfovy, cam.height,
                                cam.width, cfg.raster, opacity=opacity))
        worst = max(worst, n)
    return bucket_cap_instances(worst)


def _gt_image(image, alpha, bg):
    return jnp.clip(image * alpha + bg[:, None, None] * (1.0 - alpha), 0.0, 1.0)


def _masked_l1(a, b, mask):
    """F.l1_loss(a[:, mask], b[:, mask]) with boolean [H, W] mask."""
    m = mask[None].astype(jnp.float32)
    diff = jnp.abs(a - b) * m
    return diff.sum() / jnp.maximum(m.sum() * a.shape[0], 1.0)


def _apply_schedule_updates(cfg, state, params, grads, ndc_grad, aux_render,
                            iteration, tx, cameras_extent):
    """Optimizer step + densification schedule, shared by both phases.

    `grads` is a trainable-view dict (see optim.trainable_view)."""
    updates, opt_state = tx.update(grads, state.opt_state,
                                   trainable_view(state.params))
    new_view = optax.apply_updates(trainable_view(state.params), updates)
    params = state.params.replace(**new_view)

    stats = update_stats(state.stats, ndc_grad, aux_render["visibility"],
                         aux_render["radii"])

    key, k_densify = jax.random.split(state.key)

    do_densify = (
        (iteration < cfg.opt.densify_until_iter) &
        (iteration > cfg.opt.densify_from_iter) &
        (iteration % cfg.opt.densification_interval == 0))

    def densify_branch(args):
        params, stats, opt_state, k = args
        # size_threshold = 20 after the first opacity reset, else disabled
        # (train.py:504; configurable via opt.size_screen_threshold).
        size_thr = jnp.where(iteration > cfg.opt.opacity_reset_interval,
                             cfg.opt.size_screen_threshold, jnp.inf)
        new_params, new_stats, new_slots, dropped = densify_and_prune(
            k, params, stats, cfg.opt.densify_grad_threshold, 0.05,
            cameras_extent, size_thr, cfg.opt.percent_dense)
        new_opt = surgery_new_slots(opt_state, new_slots)
        return new_params, new_stats, new_opt, dropped

    def no_densify(args):
        params, stats, opt_state, _ = args
        return params, stats, opt_state, jnp.int32(0)

    params, stats, opt_state, dropped = jax.lax.cond(
        do_densify, densify_branch, no_densify,
        (params, stats, opt_state, k_densify))
    dropped = dropped.astype(jnp.int32)

    do_reset = (iteration < cfg.opt.densify_until_iter) & (
        (iteration % cfg.opt.opacity_reset_interval == 0) |
        (jnp.asarray(cfg.model.white_background) &
         (iteration == cfg.opt.densify_from_iter)))

    def reset_branch(args):
        params, opt_state = args
        return reset_opacity(params), surgery_reset_group(opt_state, "opacity")

    params, opt_state = jax.lax.cond(
        do_reset, reset_branch, lambda a: a, (params, opt_state))

    return state._replace(params=params, opt_state=opt_state, stats=stats,
                          key=key), dropped


def phase1_view_loss(cfg: Config, params, ndc_zeros, camera: Camera,
                     image, alpha, bg, normal_weight: float = 1.0,
                     tile_axis=None, tile_shards: int = 1):
    """Per-view phase-1 loss (train.py:309-327): photometric L1+DSSIM,
    world-frame normal consistency (upstream GS-IR semantics; see the
    frame-mismatch note in renderer.py) and normal TV. Shared by the
    single-chip step and the tile-sharded step (which shards the
    compositing inside via tile_axis)."""
    res = render(camera, params, bg, cfg.raster, cfg.gi,
                 derive_normal=True, compute_occlusion=False,
                 ndc_offset=ndc_zeros, tile_axis=tile_axis,
                 tile_shards=tile_shards)
    gt = _gt_image(image, alpha, bg)
    l1 = image_utils.l1_loss(res["render"], gt)
    loss = (1.0 - cfg.opt.lambda_dssim) * l1 + cfg.opt.lambda_dssim * (
        1.0 - image_utils.ssim(res["render"], gt))
    normal_loss = _masked_l1(res["normal_map_world"],
                             res["normal_map_from_depth"],
                             res["normal_from_depth_mask"])
    loss = loss + normal_weight * normal_loss
    loss = loss + cfg.train.normal_tv_weight * losses.tv_loss(
        gt, res["normal_map"], pad=1, step=1)
    aux = {"l1": l1, "normal_loss": normal_loss,
           "render": res["render"], "gt": gt,
           "visibility": res["visibility_filter"],
           "radii": res["radii"], "overflow": res["overflow"],
           "max_tile_count": res["max_tile_count"]}
    return loss, aux


def make_phase1_step(cfg: Config, cameras_extent: float, tx,
                     normal_weight: float = 1.0):
    """Returns jitted step(state, camera, image, alpha, bg, iteration).
    normal_weight is the reference's hard-coded normal_loss_weight = 1.0
    (train.py:324); exposed for the diagnostic ablations."""

    def step(state: TrainState, camera: Camera, image, alpha, bg, iteration):
        def loss_fn(view, ndc_zeros):
            params = state.params.replace(**view)
            return phase1_view_loss(cfg, params, ndc_zeros, camera, image,
                                    alpha, bg, normal_weight)

        ndc_zeros = jnp.zeros((state.params.capacity, 2), jnp.float32)
        (loss, aux), (grads, ndc_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                trainable_view(state.params), ndc_zeros)

        new_state, dropped = _apply_schedule_updates(
            cfg, state, state.params, grads, ndc_grad, aux, iteration, tx,
            cameras_extent)

        psnr = image_utils.psnr(aux["render"], aux["gt"])
        return new_state, StepAux(loss, aux["l1"], aux["normal_loss"], psnr,
                                  dropped, aux["overflow"],
                                  aux["max_tile_count"])

    return jax.jit(step, donate_argnums=(0,))


def compute_view_dirs(camera: Camera) -> jnp.ndarray:
    """[3, H, W] outward view directions from canonical rays
    (train.py:303-307; channels-first — the renderer's native layout)."""
    from ..scene.cameras import canonical_rays
    rays = canonical_rays(camera)                       # [HW, 3]
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    c2w = jnp.linalg.inv(camera.w2c)
    vd = -(rays @ c2w[:3, :3].T)
    return vd.T.reshape(3, camera.height, camera.width)


def phase2_view_loss(cfg: Config, brdf_lut, light, params, ndc_zeros,
                     camera: Camera, image, alpha, bg, view_dirs):
    """Per-view deferred-PBR loss (train.py:330-407): render the G-buffer,
    split-sum shade against the prefiltered `light`, add SSR indirect and
    the per-view regularisers. Shared by the single-chip phase-2 step and
    the data-parallel step (which vmaps it over the camera shard); the
    per-*step* env-TV term lives in the callers."""
    t = cfg.train
    res = render(camera, params, bg, cfg.raster, cfg.gi,
                 derive_normal=True, compute_occlusion=t.indirect,
                 ndc_offset=ndc_zeros)
    gt = _gt_image(image, alpha, bg)

    rmax, rmin = 1.0, 0.04
    roughness_map = res["roughness_map"] * (rmax - rmin) + rmin
    metallic_map = res["metallic_map"]
    albedo_map = res["albedo_map"]
    normal_mask = res["normal_mask"]            # [1, H, W]

    if t.indirect:
        occlusion = res["occlusion_map"]
    else:
        occlusion = jnp.ones_like(roughness_map)

    # Channels-first fast path: no layout transposes anywhere (the
    # channel-last oracle costs ~23 [H, W, 3] layout copies per call on
    # TPU; parity pinned by tests/test_shading.py).
    pbr = pbr_shading_chw(
        light=light,
        normals=jax.lax.stop_gradient(res["normal_map_world"]),
        view_dirs=view_dirs,
        albedo=albedo_map,
        roughness=roughness_map,
        mask=normal_mask,
        tone=t.tone, gamma=t.gamma,
        occlusion=jax.lax.stop_gradient(occlusion),
        metallic=metallic_map if t.metallic else None)

    render_direct = pbr["render_rgb"]                     # [3, H, W]
    render_direct = jnp.where(normal_mask, render_direct,
                              bg[:, None, None])

    if t.metallic:
        f0 = (1.0 - metallic_map) * 0.04 + albedo_map * metallic_map
    else:
        f0 = jnp.ones_like(albedo_map) * 0.04
        metallic_map = jnp.zeros_like(roughness_map)

    sg = jax.lax.stop_gradient
    linear_rgb = math_utils.srgb_to_linear(render_direct)
    irr, _ = screen_space.ssr(
        sg(res["out_normal_view"]), sg(res["depth_pos"]),
        sg(linear_rgb), albedo_map, roughness_map, metallic_map,
        f0, camera.fx, camera.fy, cfg.gi)
    irr = math_utils.linear_to_srgb(irr)
    irr = image_utils.median_blur_3x3(irr)
    render_rgb = render_direct + irr

    pbr_l1 = image_utils.l1_loss(render_rgb, gt)
    loss = pbr_l1

    brdf_maps = jnp.concatenate(
        [albedo_map, roughness_map, metallic_map], axis=0)
    has_bg = (normal_mask == 0).sum() > 0
    brdf_tv = jnp.where(
        has_bg,
        losses.masked_tv_loss(normal_mask, gt, brdf_maps),
        losses.tv_loss(gt, brdf_maps, pad=1, step=1))
    loss = loss + brdf_tv * t.brdf_tv_weight

    m = normal_mask.astype(jnp.float32)
    msum = jnp.maximum(m.sum(), 1.0)
    lamb = ((1.0 - roughness_map) * m).sum() / msum + \
        (metallic_map * m).sum() / msum
    loss = loss + 0.001 * lamb

    aux = {"l1": pbr_l1, "normal_loss": jnp.float32(0.0),
           "render": render_rgb, "gt": gt,
           "visibility": res["visibility_filter"],
           "radii": res["radii"], "overflow": res["overflow"],
           "max_tile_count": res["max_tile_count"]}
    return loss, aux


def env_tv_loss(cubemap_base) -> jnp.ndarray:
    """Per-step environment-map TV on the exported lat-long grid
    (train.py:409-416). The lat-long dirs are fixed, so the sample uses
    the static-structure custom VJP (scatter-free transpose)."""
    from ..models.light import make_latlong_sampler
    sampler = make_latlong_sampler(cubemap_base.shape[1])
    envmap = sampler(cubemap_base)
    return ((envmap[1:] - envmap[:-1]) ** 2).mean() + \
        ((envmap[:, 1:] - envmap[:, :-1]) ** 2).mean()


def make_phase2_step(cfg: Config, cameras_extent: float, tx, ltx):
    """Deferred-PBR phase step (train.py:330-421). Background is forced to
    black like the reference (train.py:264-265).

    The cubemap prefilter weight tables are built host-side once and
    passed as jit arguments (closure capture would embed hundreds of MB of
    constants into the HLO)."""
    brdf_lut = get_brdf_lut()
    t = cfg.train
    light_spec, light_arrays = build_prefilter_tables(t.light_base_res)

    def step(state: TrainState, camera: Camera, image, alpha, bg, iteration,
             light_tables):
        bg = jnp.zeros_like(bg)  # NOTE: black background for PBR
        view_dirs = compute_view_dirs(camera)

        def loss_fn(view, cubemap_base, ndc_zeros):
            params = state.params.replace(**view)
            light = build_mips_packed(cubemap_base, light_spec,
                                      light_tables)
            loss, aux = phase2_view_loss(cfg, brdf_lut, light, params,
                                         ndc_zeros, camera, image, alpha,
                                         bg, view_dirs)
            loss = loss + env_tv_loss(cubemap_base) * t.env_tv_weight
            return loss, aux

        ndc_zeros = jnp.zeros((state.params.capacity, 2), jnp.float32)
        (loss, aux), (grads, light_grads, ndc_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
                trainable_view(state.params), state.cubemap, ndc_zeros)

        new_state, dropped = _apply_schedule_updates(
            cfg, state, state.params, grads, ndc_grad, aux, iteration, tx,
            cameras_extent)

        lupd, light_opt_state = ltx.update(light_grads, state.light_opt_state,
                                           state.cubemap)
        cubemap = jnp.maximum(optax.apply_updates(state.cubemap, lupd), 0.0)
        new_state = new_state._replace(cubemap=cubemap,
                                       light_opt_state=light_opt_state)

        psnr = image_utils.psnr(
            jnp.clip(aux["render"], 0.0, 1.0), aux["gt"])
        return new_state, StepAux(loss, aux["l1"], jnp.float32(0.0), psnr,
                                  dropped, aux["overflow"],
                                  aux["max_tile_count"])

    jitted = jax.jit(step, donate_argnums=(0,))

    def run(state, camera, image, alpha, bg, iteration):
        return jitted(state, camera, image, alpha, bg, iteration,
                      light_arrays)

    # Exposed for ahead-of-time compilation (bench.py lowers + compiles
    # all programs in parallel threads to hide remote-compile latency).
    run.jitted = jitted
    run.light_arrays = light_arrays
    return run

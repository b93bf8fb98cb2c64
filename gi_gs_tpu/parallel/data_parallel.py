"""Multi-chip scale-out via jax.sharding + shard_map.

The reference is strictly single-GPU (SURVEY §2.3: no torch.distributed /
NCCL anywhere); this layer is the genuinely new TPU capability:

* **Camera data-parallelism**: the Gaussian state is replicated across
  the mesh; each chip renders a different training view; parameter
  gradients are `psum`-all-reduced over ICI inside the backward step and
  the (replicated) optimizer update happens identically everywhere.
  The reference's schedule is batch-size-1; a batch of n_devices views
  per step is the TPU-native equivalent (documented deviation: more
  gradient signal per step; losses are averaged).
* Densification stats are psum'd too, so clone/split decisions stay
  consistent across chips.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import Config
from ..renderer import render
from ..scene.cameras import Camera
from ..train import losses
from ..train.optim import trainable_view
from ..train.trainer import TrainState, StepAux, _gt_image, _masked_l1, \
    _apply_schedule_updates
from ..utils import image_utils


def make_dp_phase1_step(cfg: Config, cameras_extent: float, tx, mesh: Mesh,
                        axis: str = "data"):
    """Returns step(state, cam_batch, images, alphas, bg, iteration) where
    the leading batch axis of cameras/images is sharded over `axis`.
    state is fully replicated."""

    def loss_one(params, ndc_zeros, camera: Camera, image, alpha, bg):
        res = render(camera, params, bg, cfg.raster, cfg.gi,
                     derive_normal=True, compute_occlusion=False,
                     ndc_offset=ndc_zeros)
        gt = _gt_image(image, alpha, bg)
        l1 = image_utils.l1_loss(res["render"], gt)
        loss = (1.0 - cfg.opt.lambda_dssim) * l1 + cfg.opt.lambda_dssim * (
            1.0 - image_utils.ssim(res["render"], gt))
        normal_loss = _masked_l1(res["normal_map_world"],
                                 res["normal_map_from_depth"],
                                 res["normal_from_depth_mask"])
        loss = loss + normal_loss
        loss = loss + cfg.train.normal_tv_weight * losses.tv_loss(
            gt, res["normal_map"])
        aux = {"l1": l1, "normal_loss": normal_loss,
               "visibility": res["visibility_filter"], "radii": res["radii"],
               "render": res["render"], "gt": gt, "overflow": res["overflow"],
               "max_tile_count": res["max_tile_count"]}
        return loss, aux

    def local_step(state: TrainState, cam_batch, images, alphas, bg, iteration):
        # Inside shard_map: leading batch dim is the per-device shard.
        def loss_fn(view, ndc_zeros):
            params = state.params.replace(**view)
            def one(cam, img, al):
                return loss_one(params, ndc_zeros, cam, img, al, bg)
            l, aux = jax.vmap(one)(cam_batch, images, alphas)
            return l.mean(), jax.tree.map(lambda x: x, aux)

        ndc_zeros = jnp.zeros((state.params.capacity, 2), jnp.float32)
        (loss, aux), (grads, ndc_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                trainable_view(state.params), ndc_zeros)

        # All-reduce over ICI: parameter grads averaged, densification
        # stats summed (each view contributes like a reference iteration).
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        ndc_grad = jax.lax.pmean(ndc_grad, axis)
        vis_any = jax.lax.pmax(aux["visibility"].any(axis=0).astype(jnp.int32), axis)
        radii_max = jax.lax.pmax(aux["radii"].max(axis=0), axis)

        aux_red = {"visibility": vis_any > 0, "radii": radii_max,
                   "overflow": aux["overflow"].max()}
        new_state, dropped = _apply_schedule_updates(
            cfg, state, state.params, grads, ndc_grad, aux_red, iteration, tx,
            cameras_extent)
        psnr = jax.lax.pmean(
            jax.vmap(image_utils.psnr)(aux["render"], aux["gt"]).mean(), axis)
        return new_state, StepAux(loss, jax.lax.pmean(aux["l1"].mean(), axis),
                                  jax.lax.pmean(aux["normal_loss"].mean(), axis),
                                  psnr, dropped,
                                  jax.lax.pmax(aux_red["overflow"], axis),
                                  jax.lax.pmax(aux["max_tile_count"].max(),
                                               axis))

    rep = P()
    batch = P(axis)

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(rep, batch, batch, batch, rep, rep),
        out_specs=(rep, rep),
        check_vma=False)

    return jax.jit(sharded, donate_argnums=(0,))


def make_dp_phase2_step(cfg: Config, cameras_extent: float, tx, ltx,
                        mesh: Mesh, axis: str = "data"):
    """Data-parallel deferred-PBR step: cameras sharded over `axis`,
    Gaussian state + cubemap replicated, parameter AND light gradients
    pmean'd over ICI. The prefilter tables ride in as jit arguments like
    the single-chip step (trainer.make_phase2_step)."""
    from ..models.light import build_mips_packed, build_prefilter_tables
    from ..ops.shading import get_brdf_lut
    from ..train.trainer import (compute_view_dirs, env_tv_loss,
                                 phase2_view_loss)

    brdf_lut = get_brdf_lut()
    t = cfg.train
    light_spec, light_arrays = build_prefilter_tables(t.light_base_res)

    def local_step(state: TrainState, cam_batch, images, alphas, bg,
                   iteration, light_tables):
        bg = jnp.zeros_like(bg)  # black background for PBR (train.py:264)

        def loss_fn(view, cubemap_base, ndc_zeros):
            params = state.params.replace(**view)
            light = build_mips_packed(cubemap_base, light_spec, light_tables)

            def one(cam, img, al):
                vd = compute_view_dirs(cam)
                return phase2_view_loss(cfg, brdf_lut, light, params,
                                        ndc_zeros, cam, img, al, bg, vd)

            l, aux = jax.vmap(one)(cam_batch, images, alphas)
            loss = l.mean() + env_tv_loss(cubemap_base) * t.env_tv_weight
            return loss, aux

        ndc_zeros = jnp.zeros((state.params.capacity, 2), jnp.float32)
        (loss, aux), (grads, light_grads, ndc_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True)(
                trainable_view(state.params), state.cubemap, ndc_zeros)

        grads = jax.lax.pmean(grads, axis)
        light_grads = jax.lax.pmean(light_grads, axis)
        loss = jax.lax.pmean(loss, axis)
        ndc_grad = jax.lax.pmean(ndc_grad, axis)
        vis_any = jax.lax.pmax(
            aux["visibility"].any(axis=0).astype(jnp.int32), axis)
        radii_max = jax.lax.pmax(aux["radii"].max(axis=0), axis)

        aux_red = {"visibility": vis_any > 0, "radii": radii_max,
                   "overflow": aux["overflow"].max()}
        new_state, dropped = _apply_schedule_updates(
            cfg, state, state.params, grads, ndc_grad, aux_red, iteration, tx,
            cameras_extent)

        lupd, light_opt_state = ltx.update(light_grads, state.light_opt_state,
                                           state.cubemap)
        cubemap = jnp.maximum(optax.apply_updates(state.cubemap, lupd), 0.0)
        new_state = new_state._replace(cubemap=cubemap,
                                       light_opt_state=light_opt_state)

        psnr = jax.lax.pmean(jax.vmap(
            lambda r, g: image_utils.psnr(jnp.clip(r, 0.0, 1.0), g))(
                aux["render"], aux["gt"]).mean(), axis)
        return new_state, StepAux(loss, jax.lax.pmean(aux["l1"].mean(), axis),
                                  jnp.float32(0.0), psnr, dropped,
                                  jax.lax.pmax(aux["overflow"].max(), axis),
                                  jax.lax.pmax(aux["max_tile_count"].max(),
                                               axis))

    rep = P()
    batch = P(axis)
    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(rep, batch, batch, batch, rep, rep, rep),
        out_specs=(rep, rep),
        check_vma=False)
    jitted = jax.jit(sharded, donate_argnums=(0,))

    def run(state, cam_batch, images, alphas, bg, iteration):
        return jitted(state, cam_batch, images, alphas, bg, iteration,
                      light_arrays)

    run.jitted = jitted
    run.light_arrays = light_arrays
    return run


def stack_cameras(cams) -> Camera:
    """List[Camera] -> batched Camera pytree with a leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)

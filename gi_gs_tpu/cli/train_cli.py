"""Training CLI — the equivalent of the reference `train.py` driver
(train.py:171-527,821-899): two-phase schedule, random camera order,
periodic evaluation, checkpoints, TensorBoard scalars.
"""
from __future__ import annotations

import json
import os
import time
from argparse import ArgumentParser
from random import randint
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .. import config as config_mod
from ..models.gaussians import create_from_points
from ..scene.dataset import load_scene
from ..train import trainer as trainer_mod
from ..train.optim import build_light_optimizer, build_optimizer
from ..utils import checkpoint as ckpt
from ..utils import image_utils


def evaluate(cfg, state, records, phase2: bool, max_views: int = 8,
             tb=None, iteration: int = 0) -> Dict:
    """Held-out metrics + optional TensorBoard image grids
    (ref training_report, train.py:553-818). Per-view renders run through
    one jitted program (all views share shapes)."""
    from ..renderer import render
    from ..cli.render_cli import build_light_jit, make_pbr_view_fn

    psnrs, ssims = [], []
    bg = jnp.asarray([1.0, 1.0, 1.0] if cfg.model.white_background
                     else [0.0, 0.0, 0.0])
    if phase2:
        light = build_light_jit(cfg, state.cubemap)
        view_fn = make_pbr_view_fn(cfg)
    else:
        view_fn = jax.jit(lambda params, cam, bg: render(
            cam, params, bg, cfg.raster, cfg.gi, derive_normal=False,
            compute_occlusion=False))
    for i, rec in enumerate(records[:max_views]):
        cam = rec.camera()
        gt = jnp.clip(jnp.asarray(rec.image) * jnp.asarray(rec.alpha) +
                      bg[:, None, None] * (1 - jnp.asarray(rec.alpha)), 0, 1)
        if phase2:
            out = view_fn(state, cam, bg, light)
            img = out["render_rgb"]
        else:
            res = view_fn(state.params, cam, bg)
            out = res
            img = jnp.clip(res["render"], 0.0, 1.0)
        psnrs.append(float(image_utils.psnr(jnp.clip(img, 0, 1), gt)))
        ssims.append(float(image_utils.ssim(jnp.clip(img, 0, 1), gt)))
        if tb is not None and i < 3:
            tb.add_image(f"eval/render_{i}",
                         np.clip(np.asarray(img), 0, 1), iteration)
            tb.add_image(f"eval/gt_{i}", np.asarray(gt), iteration)
            if phase2:
                tb.add_image(f"eval/albedo_{i}",
                             np.clip(np.asarray(out["albedo_map"]), 0, 1),
                             iteration)
                tb.add_image(f"eval/normal_{i}",
                             (np.asarray(out["normal_map"]) + 1) / 2,
                             iteration)
    return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)),
            "n_views": len(psnrs)}


def main(argv=None):
    parser = ArgumentParser(description="gi_gs_tpu training")
    config_mod.add_args(parser)
    args = parser.parse_args(argv)
    cfg = config_mod.from_args(args)
    assert cfg.model.source_path, "--source_path required"
    assert cfg.model.model_path, "--model_path required"

    os.makedirs(cfg.model.model_path, exist_ok=True)
    config_mod.save_cfg(cfg, cfg.model.model_path)
    from ..scene.cameras import camera_to_json

    try:
        from torch.utils.tensorboard import SummaryWriter
        tb = SummaryWriter(cfg.model.model_path)
    except Exception:
        tb = None

    scene = load_scene(
        cfg.model.source_path, images=cfg.model.images,
        eval_split=cfg.model.eval, resolution=cfg.model.resolution,
        white_background=cfg.model.white_background,
        max_cameras=cfg.model.max_cameras or None)

    # SIBR-compatible camera dump + input point cloud
    # (ref prepare_output_and_logger / Scene.__init__ side outputs).
    with open(os.path.join(cfg.model.model_path, "cameras.json"), "w") as f:
        json.dump([camera_to_json(i, r) for i, r in
                   enumerate(scene.train_cameras + scene.test_cameras)], f)

    params = create_from_points(scene.points, scene.colors,
                                capacity=cfg.model.capacity,
                                max_sh_degree=cfg.model.sh_degree)
    state = trainer_mod.make_train_state(cfg, params, scene.cameras_extent,
                                         seed=cfg.train.seed)
    first_iter = 0
    if cfg.train.start_checkpoint:
        host_state, extra = ckpt.load_state(cfg.train.start_checkpoint)
        state = jax.tree.map(jnp.asarray, host_state)
        first_iter = extra.get("iteration", 0)
        print(f"Loaded checkpoint {cfg.train.start_checkpoint} @ {first_iter}")

    tx = build_optimizer(cfg.opt, scene.cameras_extent)
    ltx = build_light_optimizer(cfg.opt)

    # Adaptive instance capacity: probe the real splat-tile population and
    # compile for that bucket; on overflow the bucket grows and the step is
    # re-jitted (TPU-native replacement for the reference's exact per-frame
    # buffer allocation, rasterizer_impl.cu:582-592).
    import dataclasses
    probe_cams = [r.camera() for r in scene.train_cameras[:3]]
    cap0 = trainer_mod.probe_cap_instances(cfg, params, probe_cams)
    # An explicitly smaller --cap_instances is respected (overflow growth
    # recovers if it was too tight); the probe only shrinks the default.
    cap0 = min(cap0, cfg.raster.cap_instances)
    cfg.raster = dataclasses.replace(cfg.raster, cap_instances=cap0)
    print(f"instance capacity bucket: {cap0}", flush=True)

    # Data-parallel scale-out: one camera per chip over a device mesh,
    # gradients pmean'd over ICI (SURVEY §2.3 — capability the reference
    # lacks). dp=1 keeps the reference-equivalent single-chip path.
    dp = max(int(cfg.train.dp), 1)
    mesh = None
    if dp > 1:
        from jax.sharding import Mesh
        devs = jax.devices()
        assert len(devs) >= dp, (
            f"--dp {dp} requested but only {len(devs)} devices visible "
            "(set XLA_FLAGS=--xla_force_host_platform_device_count=N "
            "JAX_PLATFORMS=cpu to emulate)")
        mesh = Mesh(np.array(devs[:dp]), ("data",))
        print(f"data-parallel over {dp} devices: {devs[:dp]}", flush=True)

    step_cache: Dict = {}

    def get_step(phase2: bool):
        key = ("p2" if phase2 else "p1", cfg.raster.cap_instances,
               cfg.raster.cap_tile)
        if key not in step_cache:
            if mesh is not None:
                from ..parallel.data_parallel import (make_dp_phase1_step,
                                                      make_dp_phase2_step)
                if phase2:
                    step_cache[key] = make_dp_phase2_step(
                        cfg, scene.cameras_extent, tx, ltx, mesh)
                else:
                    step_cache[key] = make_dp_phase1_step(
                        cfg, scene.cameras_extent, tx, mesh)
            elif phase2:
                step_cache[key] = trainer_mod.make_phase2_step(
                    cfg, scene.cameras_extent, tx, ltx)
            else:
                step_cache[key] = trainer_mod.make_phase1_step(
                    cfg, scene.cameras_extent, tx)
        return step_cache[key]

    def grow_capacity(overflow: int):
        from ..ops.rasterize.pipeline import bucket_cap_instances
        needed = cfg.raster.cap_instances + overflow
        # Wider headroom on growth so re-jits stay rare while the
        # densification schedule is still adding Gaussians.
        new_cap = bucket_cap_instances(needed, headroom=1.3)
        cfg.raster = dataclasses.replace(cfg.raster, cap_instances=new_cap)
        print(f"instance capacity bucket -> {new_cap} "
              f"(overflowed by {overflow})", flush=True)

    def grow_cap_tile(max_tile_count: int):
        """Per-tile compositing depth outgrew cap_tile: instances past the
        cap are the most-occluded ones but may still be visible
        (binning.py tile_count clamp) — grow and re-jit instead of
        silently truncating."""
        ch = cfg.raster.chunk
        want = int(max_tile_count * 1.3)
        new_cap = -(-want // ch) * ch  # cap_tile must stay chunk-aligned
        cfg.raster = dataclasses.replace(cfg.raster, cap_tile=new_cap)
        print(f"tile depth capacity -> {new_cap} "
              f"(max per-tile population {max_tile_count})", flush=True)

    train_recs = scene.train_cameras
    cams = [r.camera() for r in train_recs]
    images = [jnp.asarray(r.image) for r in train_recs]
    alphas = [jnp.asarray(r.alpha) for r in train_recs]
    bg_const = jnp.asarray([1.0, 1.0, 1.0] if cfg.model.white_background
                           else [0.0, 0.0, 0.0])

    stack = []
    t0 = time.time()
    t_report = t0
    rng = np.random.RandomState(cfg.train.seed)
    def next_view():
        nonlocal stack
        if not stack:
            stack = list(range(len(train_recs)))
        return stack.pop(rng.randint(0, len(stack)))

    for iteration in range(first_iter + 1, cfg.opt.iterations + 1):
        if iteration % 1000 == 0:
            state = state._replace(params=state.params.one_up_sh_degree())

        phase2 = iteration > cfg.train.pbr_iteration
        if cfg.opt.random_background and not phase2:
            bg = jnp.asarray(rng.rand(3).astype(np.float32))
        else:
            bg = bg_const
        step = get_step(phase2)
        if mesh is not None:
            # One distinct camera per chip per step (documented deviation:
            # dp gradient samples per iteration instead of 1; all views
            # must share one resolution, as Blender/TensoIR scenes do).
            from ..parallel.data_parallel import stack_cameras
            vis = [next_view() for _ in range(dp)]
            state, aux = step(state, stack_cameras([cams[v] for v in vis]),
                              jnp.stack([images[v] for v in vis]),
                              jnp.stack([alphas[v] for v in vis]),
                              bg, jnp.int32(iteration))
        else:
            vi = next_view()
            state, aux = step(state, cams[vi], images[vi], alphas[vi], bg,
                              jnp.int32(iteration))

        # Check on the densify cadence as well as the report cadence: if
        # densification_interval is not a divisor of 100, drop events on
        # off-cadence iterations would otherwise never be seen and
        # capacity growth would rely solely on the alive heuristic.
        if iteration % 100 == 0 or iteration == first_iter + 1 or \
                iteration % cfg.opt.densification_interval == 0:
            loss = float(aux.loss)
            overflow = int(aux.overflow)
            if overflow > 0:
                grow_capacity(overflow)
            mtc = int(aux.max_tile_count)
            if mtc > cfg.raster.cap_tile:
                grow_cap_tile(mtc)
            alive = int(state.params.alive.sum())
            dropped = int(aux.densify_dropped)
            # Capacity saturation: densification wanted more slots than the
            # bucket holds (dropped > 0), or the alive population is at the
            # bucket ceiling — double the Gaussian capacity like the
            # reference's unbounded reallocation (gaussian_model.py:664-749)
            # and let the jitted step retrace for the new shapes.
            cap = state.params.capacity
            if (dropped > 0 or alive > 0.92 * cap) and \
                    iteration < cfg.opt.densify_until_iter and \
                    cfg.model.max_capacity and cap < cfg.model.max_capacity:
                new_cap = min(cap * 2, cfg.model.max_capacity)
                state = trainer_mod.grow_state(state, new_cap)
                print(f"[{iteration}] Gaussian capacity {cap} -> {new_cap} "
                      f"(alive {alive}, densify dropped {dropped})",
                      flush=True)
            now = time.time()
            ips = 100.0 / max(now - t_report, 1e-9)
            t_report = now
            print(f"[{iteration}] loss {loss:.5f} l1 {float(aux.l1):.5f} "
                  f"psnr {float(aux.psnr):.2f} "
                  f"alive {alive}"
                  + (f" dropped {dropped}" if dropped else "") +
                  f" {ips:.2f} it/s", flush=True)
            if tb:
                tb.add_scalar("train/loss", loss, iteration)
                tb.add_scalar("train/l1", float(aux.l1), iteration)
                tb.add_scalar("train/psnr", float(aux.psnr), iteration)
                tb.add_scalar("train/alive", alive, iteration)
                tb.add_scalar("train/densify_dropped", dropped, iteration)
                tb.add_scalar("train/capacity",
                              state.params.capacity, iteration)
                tb.add_scalar("train/iters_per_s", ips, iteration)

        if iteration in cfg.train.test_iterations and scene.test_cameras:
            # Mid-train evals sample 8 held-out views; the final one runs
            # the FULL test split like the reference's offline render.py
            # metric pass (train.py:584-800, render.py:379-395).
            n_eval = (len(scene.test_cameras)
                      if iteration == cfg.opt.iterations else 8)
            metrics = evaluate(cfg, state, scene.test_cameras, phase2,
                               max_views=n_eval, tb=tb, iteration=iteration)
            print(f"[ITER {iteration}] eval: {metrics}", flush=True)
            if tb:
                tb.add_scalar("test/psnr", metrics["psnr"], iteration)
                tb.add_scalar("test/ssim", metrics["ssim"], iteration)
            with open(os.path.join(cfg.model.model_path,
                                   f"eval_{iteration}.json"), "w") as f:
                json.dump(metrics, f)

        if iteration in cfg.train.save_iterations or \
                iteration in cfg.train.checkpoint_iterations or \
                iteration == cfg.opt.iterations:
            path = os.path.join(cfg.model.model_path, f"chkpnt{iteration}.pkl")
            ckpt.save_state(path, state, {"iteration": iteration})
            ckpt.save_gaussians_ply(
                os.path.join(cfg.model.model_path,
                             f"point_cloud/iteration_{iteration}",
                             "point_cloud.ply"), state.params)
            print(f"[ITER {iteration}] saved checkpoint {path}", flush=True)

    print(f"Training complete in {time.time() - t0:.1f}s")


if __name__ == "__main__":
    main()

"""Relighting CLI — equivalent of the reference `relight.py`: load a new
HDRI -> cubemap, apply the saved albedo-ratio, re-shade the G-buffer +
SSR, save relit frames (relight.py:114-334).
"""
from __future__ import annotations

import json
import os
from argparse import ArgumentParser

import numpy as np
import jax
import jax.numpy as jnp

from .. import config as config_mod
from ..models import light as light_mod
from ..scene.dataset import load_scene
from ..utils import checkpoint as ckpt
from .render_cli import build_light_jit, make_pbr_view_fn, save_image


def main(argv=None):
    parser = ArgumentParser(description="gi_gs_tpu relighting")
    config_mod.add_args(parser)
    parser.add_argument("--checkpoint", type=str, default="")
    parser.add_argument("--hdri", type=str, required=True)
    parser.add_argument("--cubemap_res", type=int, default=256)
    parser.add_argument("--max_views", type=int, default=0)
    args = parser.parse_args(argv)
    cfg = config_mod.load_cfg(args.model_path) \
        if os.path.exists(os.path.join(args.model_path or "",
                                       "cfg_args.json")) else config_mod.Config()
    cfg = config_mod.from_args(args, cfg)
    if args.backend is None:
        # Exact GI kernel for eval (see render_cli); --backend to opt out.
        cfg.gi = cfg.gi._replace(backend="pallas_exact")

    ckpt_path = args.checkpoint
    if not ckpt_path:
        cands = sorted([f for f in os.listdir(cfg.model.model_path)
                        if f.startswith("chkpnt")])
        assert cands, "no checkpoint found"
        ckpt_path = os.path.join(cfg.model.model_path, cands[-1])
    host_state, extra = ckpt.load_state(ckpt_path)
    state = jax.tree.map(jnp.asarray, host_state)
    iteration = extra.get("iteration", 0)

    # New environment light from the HDRI (relight.py:254-334).
    hdri = light_mod.load_hdr(args.hdri)
    base = jax.jit(light_mod.latlong_to_cubemap,
                   static_argnums=(1,))(jnp.asarray(hdri), args.cubemap_res)
    light = build_light_jit(cfg, base)
    state = state._replace(cubemap=base)

    # Albedo ratio from the NVS albedo eval, if present
    # (relight.py:204-210).
    ratio = None
    ratio_path = os.path.join(cfg.model.model_path, "test",
                              f"ours_{iteration}", "albedo",
                              "albedo_ratio.json")
    if os.path.exists(ratio_path):
        with open(ratio_path) as f:
            ratio = jnp.asarray(json.load(f)["albedo_ratio"], jnp.float32)
        print(f"albedo ratio: {ratio}")

    scene = load_scene(cfg.model.source_path, images=cfg.model.images,
                       eval_split=True, resolution=cfg.model.resolution,
                       white_background=cfg.model.white_background,
                       max_cameras=cfg.model.max_cameras or None)
    views = scene.test_cameras or scene.train_cameras
    if args.max_views:
        views = views[:args.max_views]

    env_name = os.path.splitext(os.path.basename(args.hdri))[0]
    out_dir = os.path.join(cfg.model.model_path, "test",
                           f"ours_{iteration}", "relight", env_name)
    os.makedirs(out_dir, exist_ok=True)
    envmap = jax.jit(light_mod.export_envmap)(base)
    save_image(os.path.join(out_dir, "envmap.png"),
               np.asarray(envmap) / max(float(envmap.max()), 1e-6), chw=False)

    bg = jnp.zeros(3)
    view_fn = make_pbr_view_fn(cfg, albedo_ratio=ratio)
    for idx, rec in enumerate(views):
        out = view_fn(state, rec.camera(), bg, light)
        save_image(os.path.join(out_dir, f"{rec.name}.png"), out["render_rgb"])
        print(f"relit view {idx}: {rec.name}", flush=True)


if __name__ == "__main__":
    main()

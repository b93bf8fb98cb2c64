"""NVS + albedo evaluation CLI — equivalent of the reference `render.py`
(render_set :115-395, eval_brdf :496-635): renders test views through the
full PBR+SSR pipeline, saves the image products, and writes
PSNR/SSIM(/LPIPS) JSON. LPIPS requires pretrained VGG weights which are
not available in this offline environment; the JSON reports null for it
(documented substitute: PSNR/SSIM are computed identically).
"""
from __future__ import annotations

import functools
import json
import os
from argparse import ArgumentParser
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
from PIL import Image

from .. import config as config_mod
from ..models import light as light_mod
from ..ops import screen_space
from ..ops.shading import get_brdf_lut, pbr_shading_chw
from ..renderer import render
from ..scene.dataset import load_scene
from ..train.trainer import compute_view_dirs
from ..utils import checkpoint as ckpt
from ..utils import image_utils, math_utils


def save_image(path: str, img, chw=True) -> None:
    arr = np.asarray(img)
    if chw and arr.ndim == 3:
        arr = arr.transpose(1, 2, 0)
    arr = np.clip(arr, 0.0, 1.0)
    if arr.ndim == 3 and arr.shape[-1] == 1:
        arr = arr[..., 0]
    Image.fromarray((arr * 255).astype(np.uint8)).save(path)


def build_light_jit(cfg, cubemap):
    """Prefiltered light via ONE jitted program with the static weight
    tables passed as arguments (matching trainer.make_phase2_step; the
    eager form costs minutes of per-op compiles on slow backends)."""
    spec, arrays = light_mod.build_prefilter_tables(cubemap.shape[1])
    return jax.jit(lambda b, t: light_mod.build_mips_packed(b, spec, t))(
        cubemap, arrays)


def make_pbr_view_fn(cfg, albedo_ratio=None):
    """One jitted render_pbr_view(state, cam, bg, light) for repeated
    per-view evaluation (all views share shapes, so this compiles once)."""
    brdf_lut = get_brdf_lut()
    ratio = None if albedo_ratio is None else jnp.asarray(albedo_ratio)

    @jax.jit
    def view_fn(state, cam, bg, light):
        return render_pbr_view(cfg, state, cam, bg, light=light,
                               albedo_ratio=ratio, brdf_lut=brdf_lut)

    return view_fn


def render_pbr_view(cfg, state, cam, bg, light=None, albedo_ratio=None,
                    brdf_lut=None) -> Dict[str, jnp.ndarray]:
    """Full PBR + SSR render of one view (render.py:206-341). Returns the
    product dict with channel-first images."""
    if light is None:
        light = build_light_jit(cfg, state.cubemap)
    if brdf_lut is None:
        brdf_lut = get_brdf_lut()
    t = cfg.train

    res = render(cam, state.params, bg, cfg.raster, cfg.gi, inference=True,
                 pad_normal=True, derive_normal=True, compute_occlusion=True)
    rmax, rmin = 1.0, 0.04
    roughness_map = res["roughness_map"] * (rmax - rmin) + rmin
    albedo_map = res["albedo_map"]
    if albedo_ratio is not None:
        albedo_map = albedo_map * albedo_ratio[:, None, None]
    metallic_map = res["metallic_map"]
    normal_mask = res["normal_mask"]
    occlusion = res["occlusion_map"]
    view_dirs = compute_view_dirs(cam)     # [3, H, W]

    pbr = pbr_shading_chw(
        light=light, normals=res["normal_map_world"],
        view_dirs=view_dirs, albedo=albedo_map,
        roughness=roughness_map,
        mask=normal_mask,
        tone=t.tone, gamma=t.gamma, occlusion=occlusion,
        metallic=metallic_map if t.metallic else None)

    render_rgb = pbr["render_rgb"]
    diffuse_rgb = jnp.clip(pbr["diffuse_rgb"], 0, 1)
    specular_rgb = jnp.clip(pbr["specular_rgb"], 0, 1)
    b = bg[:, None, None]
    render_rgb = jnp.where(normal_mask, render_rgb, b)
    diffuse_rgb = jnp.where(normal_mask, diffuse_rgb, b)
    specular_rgb = jnp.where(normal_mask, specular_rgb, b)

    if t.metallic:
        f0 = (1.0 - metallic_map) * 0.04 + albedo_map * metallic_map
    else:
        f0 = jnp.ones_like(albedo_map) * 0.04
        metallic_map = jnp.zeros_like(roughness_map)

    linear_rgb = math_utils.srgb_to_linear(render_rgb)
    irr, _ = screen_space.ssr(
        res["out_normal_view"], res["depth_pos"], linear_rgb, albedo_map,
        roughness_map, metallic_map, f0, cam.fx, cam.fy, cfg.gi)
    irr2 = image_utils.median_blur_3x3(math_utils.linear_to_srgb(irr))
    render_rgb = jnp.where(normal_mask, render_rgb + irr2, b)

    return {
        "render_rgb": render_rgb, "diffuse_rgb": diffuse_rgb,
        "specular_rgb": specular_rgb, "indirect": irr2,
        "albedo_map": albedo_map, "roughness_map": roughness_map,
        "metallic_map": metallic_map, "normal_map": res["normal_map"],
        "normal_map_from_depth": res["normal_map_from_depth"],
        "normal_mask": normal_mask, "depth_map": res["depth_map"],
        "occlusion_map": res["occlusion_map"], "render_raw": res["render"],
    }


def eval_albedo(cfg, state, records, out_dir: str) -> Dict:
    """Albedo eval with 3-channel median-ratio rescale (TensoIR protocol,
    render.py:496-635). GT albedo images are `<name>_albedo.png` files
    next to the RGB frames when present."""
    import os.path as osp
    gts, preds, masks = [], [], []
    albedo_fn = jax.jit(lambda params, cam: render(
        cam, params, jnp.zeros(3), cfg.raster, cfg.gi, inference=True,
        pad_normal=True, derive_normal=False, compute_occlusion=False))
    for rec in records:
        base = osp.join(cfg.model.source_path, "test", f"{rec.name}_albedo.png")
        alt = osp.join(cfg.model.source_path, f"{rec.name}_albedo.png")
        gt_path = base if osp.exists(base) else (alt if osp.exists(alt) else None)
        if gt_path is None:
            continue
        gt = np.asarray(Image.open(gt_path), np.float32)[..., :3] / 255.0
        cam = rec.camera()
        res = albedo_fn(state.params, cam)
        preds.append(np.asarray(res["albedo_map"]).transpose(1, 2, 0))
        gts.append(gt)
        masks.append(np.asarray(rec.alpha)[0] > 0.5)
    if not gts:
        return {"error": "no GT albedo found"}

    # per-channel median ratio over masked pixels, global over the set
    all_gt = np.concatenate([g[m] for g, m in zip(gts, masks)], 0)
    all_pr = np.concatenate([p[m] for p, m in zip(preds, masks)], 0)
    ratio = np.median(all_gt / np.clip(all_pr, 1e-6, None), axis=0)

    psnrs, ssims = [], []
    os.makedirs(out_dir, exist_ok=True)
    for i, (g, p, m) in enumerate(zip(gts, preds, masks)):
        scaled = np.clip(p * ratio, 0, 1) * m[..., None]
        gm = g * m[..., None]
        psnrs.append(float(image_utils.psnr(jnp.asarray(scaled), jnp.asarray(gm))))
        ssims.append(float(image_utils.ssim(
            jnp.asarray(scaled.transpose(2, 0, 1)),
            jnp.asarray(gm.transpose(2, 0, 1)))))
        save_image(os.path.join(out_dir, f"albedo_{i:05d}.png"), scaled, chw=False)
    result = {"albedo_psnr": float(np.mean(psnrs)),
              "albedo_ssim": float(np.mean(ssims)),
              "albedo_ratio": ratio.tolist()}
    with open(os.path.join(out_dir, "albedo_ratio.json"), "w") as f:
        json.dump({"albedo_ratio": ratio.tolist()}, f)
    return result


def main(argv=None):
    parser = ArgumentParser(description="gi_gs_tpu NVS rendering/eval")
    config_mod.add_args(parser)
    parser.add_argument("--checkpoint", type=str, default="")
    parser.add_argument("--skip_train", action="store_true", default=True)
    parser.add_argument("--pbr", action="store_true")
    parser.add_argument("--brdf_eval", action="store_true")
    parser.add_argument("--max_views", type=int, default=0)
    parser.add_argument("--lpips_weights", type=str, default="",
                        help="VGG-LPIPS weights file (.npz or torch .pt); "
                             "lpips_avg is null when absent")
    args = parser.parse_args(argv)
    from ..utils import lpips as lpips_mod
    lpips_w = lpips_mod.maybe_load(args.lpips_weights)
    cfg = config_mod.load_cfg(args.model_path) \
        if os.path.exists(os.path.join(args.model_path or "",
                                       "cfg_args.json")) else config_mod.Config()
    cfg = config_mod.from_args(args, cfg)
    if args.backend is None:
        # Eval defaults to the EXACT GI kernel regardless of the training
        # backend saved in cfg_args (the coherent kernel is a bounded
        # training-speed approximation); pass --backend pallas to opt out.
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

    scene = load_scene(cfg.model.source_path, images=cfg.model.images,
                       eval_split=True, resolution=cfg.model.resolution,
                       white_background=cfg.model.white_background,
                       max_cameras=cfg.model.max_cameras or None)
    views = scene.test_cameras or scene.train_cameras
    if args.max_views:
        views = views[:args.max_views]

    out_root = os.path.join(cfg.model.model_path, "test", f"ours_{iteration}")
    for sub in ("renders", "gt", "normal", "pbr", "depth"):
        os.makedirs(os.path.join(out_root, sub), exist_ok=True)

    light = build_light_jit(cfg, state.cubemap)
    envmap = jax.jit(light_mod.export_envmap)(state.cubemap)
    save_image(os.path.join(cfg.model.model_path, "test", "envmap.png"),
               np.asarray(envmap) / max(float(envmap.max()), 1e-6), chw=False)

    bg = jnp.zeros(3)
    view_fn = make_pbr_view_fn(cfg)
    psnrs, ssims, lpipss = [], [], []
    for idx, rec in enumerate(views):
        cam = rec.camera()
        gt = jnp.clip(jnp.asarray(rec.image) * jnp.asarray(rec.alpha) +
                      bg[:, None, None] * (1 - jnp.asarray(rec.alpha)), 0, 1)
        out = view_fn(state, cam, bg, light)
        name = rec.name
        save_image(os.path.join(out_root, "pbr", f"{name}.png"), out["render_rgb"])
        save_image(os.path.join(out_root, "pbr", f"{name}_albedo.png"), out["albedo_map"])
        save_image(os.path.join(out_root, "pbr", f"{name}_roughness.png"), out["roughness_map"])
        save_image(os.path.join(out_root, "pbr", f"{name}_metallic.png"), out["metallic_map"])
        save_image(os.path.join(out_root, "pbr", f"{name}_diffuse.png"), out["diffuse_rgb"])
        save_image(os.path.join(out_root, "pbr", f"{name}_specular.png"), out["specular_rgb"])
        save_image(os.path.join(out_root, "pbr", f"{name}_indirect.png"), out["indirect"])
        save_image(os.path.join(out_root, "pbr", f"{name}_occlusion.png"), out["occlusion_map"])
        # Side-by-side BRDF sheet + direct-only image (render - indirect),
        # completing the reference's per-view product set (render.py:363-377).
        brdf_sheet = np.concatenate(
            [np.asarray(out["albedo_map"]),
             np.tile(np.asarray(out["roughness_map"]), (3, 1, 1)),
             np.tile(np.asarray(out["metallic_map"]), (3, 1, 1))], axis=2)
        save_image(os.path.join(out_root, "pbr", f"{name}_brdf.png"), brdf_sheet)
        save_image(os.path.join(out_root, "pbr", f"{name}_DIR.png"),
                   np.clip(np.asarray(out["render_rgb"]) -
                           np.asarray(out["indirect"]), 0, 1))
        save_image(os.path.join(out_root, "normal", f"{name}_normal.png"),
                   (out["normal_map"] + 1) / 2)
        save_image(os.path.join(out_root, "normal", f"{name}_from_depth.png"),
                   (out["normal_map_from_depth"] + 1) / 2)
        d = np.asarray(out["depth_map"])
        save_image(os.path.join(out_root, "depth", f"{name}_depth.png"),
                   (d - d.min()) / max(d.max() - d.min(), 1e-6))
        save_image(os.path.join(out_root, "renders", f"{idx:05d}.png"),
                   out["render_raw"])
        save_image(os.path.join(out_root, "gt", f"{idx:05d}.png"), gt)
        psnrs.append(float(image_utils.psnr(jnp.clip(out["render_rgb"], 0, 1), gt)))
        ssims.append(float(image_utils.ssim(jnp.clip(out["render_rgb"], 0, 1), gt)))
        if lpips_w is not None:
            lpipss.append(lpips_mod.lpips(
                jnp.clip(out["render_rgb"], 0, 1), gt, lpips_w))
        print(f"view {idx} psnr {psnrs[-1]:.2f}", flush=True)

    results = {"psnr_avg": float(np.mean(psnrs)),
               "ssim_avg": float(np.mean(ssims)),
               "lpips_avg": float(np.mean(lpipss)) if lpipss else None}
    if args.brdf_eval:
        results.update(eval_albedo(cfg, state, views,
                                   os.path.join(out_root, "albedo")))
    with open(os.path.join(out_root, "pbr", "NVS.json"), "w") as f:
        json.dump(results, f, indent=4)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()

"""Relighting metric evaluation — equivalent of `relight_eval.py:20-87`:
PSNR/SSIM over predicted relit frames vs GT renders at the fixed TensoIR
test ids (every 10th frame), honouring the DATA_SUBDIR/MAP_NAME/DATASET
env hooks of the fork. LPIPS reported as null (no pretrained VGG offline).
"""
from __future__ import annotations

import json
import os
from argparse import ArgumentParser

import numpy as np
import jax.numpy as jnp
from PIL import Image

from ..utils import image_utils


def main(argv=None):
    parser = ArgumentParser(description="gi_gs_tpu relight evaluation")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--gt_dir", type=str, required=True)
    parser.add_argument("--num_test", type=int, default=0)
    parser.add_argument("--size", type=int, default=400)
    parser.add_argument("--lpips_weights", type=str, default="",
                        help="VGG-LPIPS weights file (.npz or torch .pt); "
                             "lpips_avg is null when absent")
    args = parser.parse_args(argv)
    from ..utils import lpips as lpips_mod
    lw = lpips_mod.maybe_load(args.lpips_weights)

    data_subdir = os.environ.get("DATA_SUBDIR", "")
    map_name = os.environ.get("MAP_NAME", "")
    dataset = os.environ.get("DATASET", "")
    num_test = args.num_test or (9 if "spheres" in dataset else 15)

    psnr_avg, ssim_avg, lpips_avg, n = 0.0, 0.0, 0.0, 0
    for idx in range(num_test):
        fid = 10 * (idx + 1)
        pred_path = os.path.join(args.output_dir, f"r_{fid:04}_{map_name}.png")
        gt_path = os.path.join(args.gt_dir, dataset, map_name, f"r_{fid:04}.png")
        if not (os.path.exists(pred_path) and os.path.exists(gt_path)):
            continue
        pred = np.array(Image.open(pred_path))[..., :3] / 255.0
        gt = np.array(Image.open(gt_path))[..., :3] / 255.0
        if gt.shape[0] != args.size:
            gt_img = Image.fromarray((gt * 255).astype(np.uint8)).resize(
                (args.size, args.size), Image.BILINEAR)
            gt = np.asarray(gt_img) / 255.0
        p = jnp.asarray(pred.transpose(2, 0, 1))
        g = jnp.asarray(gt.transpose(2, 0, 1))
        psnr_avg += float(image_utils.psnr(p, g))
        ssim_avg += float(image_utils.ssim(p, g))
        if lw is not None:
            lpips_avg += lpips_mod.lpips(p, g, lw)
        n += 1

    assert n > 0, "no prediction/GT pairs found"
    metrics = {"psnr_avg": psnr_avg / n, "ssim_avg": ssim_avg / n,
               "lpips_avg": (lpips_avg / n) if lw is not None else None}
    print(metrics)
    out_dir = os.path.join("relight", dataset, f"relight_FROM_{data_subdir}",
                           f"relight_TO_{map_name}")
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"{map_name}.json"), "w") as f:
        json.dump(metrics, f, indent=4)


if __name__ == "__main__":
    main()

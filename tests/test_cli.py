"""End-to-end CLI smoke: train a few iters on a synthetic Blender scene,
then render/eval from the checkpoint."""
import json
import os
import sys

import numpy as np
import pytest

from test_io import make_blender_dataset


@pytest.mark.slow
def test_train_and_render_cli(tmp_path):
    data = str(tmp_path / "scene")
    out = str(tmp_path / "out")
    make_blender_dataset(data, n_frames=2, size=32)

    from gi_gs_tpu.cli import train_cli, render_cli
    train_cli.main([
        "--source_path", data, "--model_path", out, "--eval",
        "--white_background", "--iterations", "8",
        "--capacity", "4096", "--cap_instances", "16384",
        "--cap_tile", "256", "--chunk", "8", "--tile_w", "32",
        "--light_base_res", "64",
        "--test_iterations", "8", "--save_iterations", "8",
        "--densify_from_iter", "100", "--step", "4", "--start", "2",
        "--delta", "0.25",
    ])
    assert os.path.exists(os.path.join(out, "chkpnt8.pkl"))
    assert os.path.exists(os.path.join(out, "cameras.json"))
    assert os.path.exists(os.path.join(
        out, "point_cloud/iteration_8/point_cloud.ply"))
    assert os.path.exists(os.path.join(out, "eval_8.json"))

    render_cli.main(["--model_path", out, "--source_path", data,
                     "--max_views", "1"])
    nvs = os.path.join(out, "test", "ours_8", "pbr", "NVS.json")
    assert os.path.exists(nvs)
    with open(nvs) as f:
        metrics = json.load(f)
    assert np.isfinite(metrics["psnr_avg"])

"""Dataset loaders + checkpoint/PLY interchange roundtrips."""
import json
import os

import numpy as np
import jax.numpy as jnp
from PIL import Image

from gi_gs_tpu.models.gaussians import create_from_points
from gi_gs_tpu.scene import ply
from gi_gs_tpu.scene.dataset import load_blender, load_scene
from gi_gs_tpu.utils import checkpoint as ckpt


def make_blender_dataset(root, n_frames=3, size=32):
    os.makedirs(os.path.join(root, "train"), exist_ok=True)
    os.makedirs(os.path.join(root, "test"), exist_ok=True)
    rng = np.random.RandomState(0)
    for split in ("train", "test"):
        frames = []
        for i in range(n_frames):
            c2w = np.eye(4)
            c2w[2, 3] = 3.0 + 0.1 * i
            frames.append({"file_path": f"./{split}/r_{i}",
                           "transform_matrix": c2w.tolist()})
            img = (rng.rand(size, size, 4) * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(root, split, f"r_{i}.png"))
        with open(os.path.join(root, f"transforms_{split}.json"), "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)


def test_blender_loader(tmp_path):
    root = str(tmp_path / "lego")
    make_blender_dataset(root)
    scene = load_scene(root, white_background=True, eval_split=True, seed=1)
    assert len(scene.train_cameras) == 3
    assert len(scene.test_cameras) == 3
    rec = scene.train_cameras[0]
    assert rec.image.shape == (3, 32, 32)
    assert rec.alpha.shape == (1, 32, 32)
    assert scene.points.shape[1] == 3
    assert scene.cameras_extent > 0
    cam = rec.camera()
    assert cam.w2c.shape == (4, 4)
    # points3d.ply was created and reloads
    pts, colors, _ = ply.fetch_point_cloud(scene.ply_path)
    assert pts.shape[0] == 100_000


def test_gaussian_ply_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.rand(50, 3).astype(np.float32)
    colors = rng.rand(50, 3).astype(np.float32)
    params = create_from_points(pts, colors, capacity=64)
    path = str(tmp_path / "pc.ply")
    ckpt.save_gaussians_ply(path, params)
    loaded = ckpt.load_gaussians_ply(path, capacity=64)
    for field in ("xyz", "features_dc", "features_rest", "opacity", "normal",
                  "albedo", "roughness", "metallic", "scaling", "rotation"):
        a = np.asarray(getattr(params, field))[:50]
        b = np.asarray(getattr(loaded, field))[:50]
        np.testing.assert_allclose(a, b, atol=1e-6, err_msg=field)
    assert int(loaded.alive.sum()) == 50


def test_state_checkpoint_roundtrip(tmp_path):
    from gi_gs_tpu.config import Config, ModelConfig
    from gi_gs_tpu.train import trainer
    cfg = Config()
    cfg.model = ModelConfig(capacity=64)
    cfg.train.light_base_res = 64
    rng = np.random.RandomState(0)
    params = create_from_points(rng.rand(50, 3).astype(np.float32),
                                rng.rand(50, 3).astype(np.float32), 64)
    state = trainer.make_train_state(cfg, params, 1.0)
    path = str(tmp_path / "chk.pkl")
    ckpt.save_state(path, state, {"iteration": 123})
    host, extra = ckpt.load_state(path)
    assert extra["iteration"] == 123
    np.testing.assert_allclose(np.asarray(state.cubemap), host.cubemap)
    np.testing.assert_allclose(np.asarray(state.params.xyz), host.params.xyz)

"""Scene/dataset assembly: COLMAP + Blender(NeRF-synthetic) loaders.

Host-side (numpy) equivalent of the reference `scene/dataset_readers.py` +
`scene/__init__.py` Scene: produces camera records grouped so one jitted
train step serves every view of a resolution, plus the initial point
cloud and the NeRF++ normalisation radius (= `cameras_extent`).

Also honours the fork's `DATA_SUBDIR` env hook for relit image variants
(scene/dataset_readers.py:247).
"""
from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import List, Optional

import numpy as np
from PIL import Image as PILImage

from . import colmap, ply
from .cameras import Camera, make_camera
from ..utils.math_utils import focal2fov, fov2focal, world_to_view


@dataclasses.dataclass
class CameraRecord:
    uid: int
    name: str
    R: np.ndarray           # cam-to-world rotation (COLMAP convention)
    T: np.ndarray           # world-to-cam translation
    fovx: float
    fovy: float
    image: np.ndarray       # [3, H, W] float32 in [0, 1]
    alpha: np.ndarray       # [1, H, W] float32 (ones if no alpha channel)

    @property
    def height(self) -> int:
        return self.image.shape[1]

    @property
    def width(self) -> int:
        return self.image.shape[2]

    def camera(self) -> Camera:
        return make_camera(self.R, self.T, self.fovx, self.fovy,
                           self.width, self.height)


@dataclasses.dataclass
class SceneData:
    train_cameras: List[CameraRecord]
    test_cameras: List[CameraRecord]
    points: np.ndarray      # [N, 3]
    colors: np.ndarray      # [N, 3] in [0, 1]
    cameras_extent: float   # NeRF++ radius (scene/dataset_readers.py:57-78)
    translate: np.ndarray
    ply_path: str


def _resize_image(img: PILImage.Image, resolution) -> np.ndarray:
    """PILtoTorch equivalent: resize then CHW float [0,1]."""
    img = img.resize(resolution)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr.transpose(2, 0, 1)


def _target_resolution(orig_w, orig_h, resolution, resolution_scale=1.0):
    """utils/camera_utils.py:30-55 downscale policy."""
    if resolution in (1, 2, 4, 8):
        return (round(orig_w / (resolution_scale * resolution)),
                round(orig_h / (resolution_scale * resolution)))
    if resolution == -1:
        global_down = orig_w / 1600 if orig_w > 1600 else 1
    else:
        global_down = orig_w / resolution
    scale = float(global_down) * float(resolution_scale)
    return int(orig_w / scale), int(orig_h / scale)


def _record_from(uid, name, R, T, fovx, fovy, pil_image, resolution,
                 resolution_scale=1.0) -> CameraRecord:
    res = _target_resolution(pil_image.size[0], pil_image.size[1],
                             resolution, resolution_scale)
    arr = _resize_image(pil_image, res)
    if arr.shape[0] == 4:
        image, alpha = arr[:3], arr[3:4]
    else:
        image, alpha = arr[:3], np.ones((1, arr.shape[1], arr.shape[2]), np.float32)
    return CameraRecord(uid=uid, name=name, R=R, T=T, fovx=fovx, fovy=fovy,
                        image=np.clip(image, 0.0, 1.0), alpha=alpha)


def _nerfpp_norm(records: List[CameraRecord]):
    centers = []
    for r in records:
        w2c = world_to_view(r.R, r.T)
        centers.append(np.linalg.inv(w2c)[:3, 3])
    centers = np.stack(centers)
    center = centers.mean(axis=0)
    radius = float(np.linalg.norm(centers - center, axis=1).max()) * 1.1
    return -center, radius


def load_blender(path: str, white_background: bool = True, eval_split: bool = True,
                 extension: str = ".png", resolution: int = 1,
                 max_cameras: Optional[int] = None, seed: int = 0) -> SceneData:
    """transforms_{train,test}.json loader
    (ref readNerfSyntheticInfo, scene/dataset_readers.py:283-325)."""

    def read_split(fname, base_uid=0):
        with open(os.path.join(path, fname)) as f:
            contents = json.load(f)
        fovx = contents["camera_angle_x"]
        recs = []
        frames = contents["frames"]
        if max_cameras is not None:
            frames = frames[:max_cameras]
        for idx, frame in enumerate(frames):
            cam_name = os.path.join(path, frame["file_path"] + extension)
            c2w = np.array(frame["transform_matrix"])
            c2w[:3, 1:3] *= -1  # OpenGL -> COLMAP axes
            w2c = np.linalg.inv(c2w)
            R = np.transpose(w2c[:3, :3])
            T = w2c[:3, 3]
            subdir = os.environ.get("DATA_SUBDIR", "")
            image_path = os.path.join(path, subdir, os.path.basename(cam_name)) \
                if subdir else cam_name
            img = PILImage.open(image_path)
            fovy = focal2fov(fov2focal(fovx, img.size[0]), img.size[1])
            recs.append(_record_from(base_uid + idx, Path(cam_name).stem,
                                     R, T, fovx, fovy, img, resolution))
        return recs

    train = read_split("transforms_train.json")
    test = read_split("transforms_test.json", base_uid=len(train)) \
        if os.path.exists(os.path.join(path, "transforms_test.json")) else []
    if not eval_split:
        train = train + test
        test = []

    translate, radius = _nerfpp_norm(train)

    ply_path = os.path.join(path, "points3d.ply")
    if os.path.exists(ply_path):
        xyz, colors, _ = ply.fetch_point_cloud(ply_path)
    else:
        # Random init inside the synthetic-scene bounds
        # (scene/dataset_readers.py:303-311).
        rng = np.random.RandomState(seed)
        num_pts = 100_000
        xyz = rng.random((num_pts, 3)) * 2.6 - 1.3
        shs = rng.random((num_pts, 3)) / 255.0
        colors = shs * 0.28209479177387814 + 0.5
        try:
            ply.store_point_cloud(ply_path, xyz, colors * 255)
        except OSError:
            pass

    return SceneData(train_cameras=train, test_cameras=test,
                     points=xyz.astype(np.float32),
                     colors=colors.astype(np.float32),
                     cameras_extent=radius, translate=translate,
                     ply_path=ply_path)


def load_colmap(path: str, images: str = "images", eval_split: bool = True,
                llffhold: int = 8, resolution: int = -1,
                max_cameras: Optional[int] = None) -> SceneData:
    """COLMAP sparse/0 loader (ref readColmapSceneInfo,
    scene/dataset_readers.py:170-221)."""
    from .. import native
    sparse = os.path.join(path, "sparse/0")
    try:
        cams = colmap.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
        imgs = native.read_images_binary(os.path.join(sparse, "images.bin"))
    except FileNotFoundError:
        cams = colmap.read_cameras_text(os.path.join(sparse, "cameras.txt"))
        imgs = colmap.read_images_text(os.path.join(sparse, "images.txt"))

    recs = []
    for iid, im in sorted(imgs.items(), key=lambda kv: kv[1].name):
        cam = cams[im.camera_id]
        R = np.transpose(colmap.qvec2rotmat(im.qvec))
        T = np.array(im.tvec)
        fx, fy = colmap.focals_from_camera(cam)
        fovx = focal2fov(fx, cam.width)
        fovy = focal2fov(fy, cam.height)
        img = PILImage.open(os.path.join(path, images, im.name))
        recs.append(_record_from(len(recs), Path(im.name).stem, R, T,
                                 fovx, fovy, img, resolution))
        if max_cameras is not None and len(recs) >= max_cameras:
            break

    if eval_split:
        train = [c for i, c in enumerate(recs) if i % llffhold != 0]
        test = [c for i, c in enumerate(recs) if i % llffhold == 0]
    else:
        train, test = recs, []

    translate, radius = _nerfpp_norm(train)

    ply_path = os.path.join(sparse, "points3D.ply")
    if os.path.exists(ply_path):
        xyz, colors, _ = ply.fetch_point_cloud(ply_path)
    else:
        try:
            xyz, rgb, _ = native.read_points3d_binary(
                os.path.join(sparse, "points3D.bin"))
        except FileNotFoundError:
            xyz, rgb, _ = colmap.read_points3d_text(
                os.path.join(sparse, "points3D.txt"))
        colors = rgb / 255.0
        try:
            ply.store_point_cloud(ply_path, xyz, rgb)
        except OSError:
            pass

    return SceneData(train_cameras=train, test_cameras=test,
                     points=xyz.astype(np.float32),
                     colors=colors.astype(np.float32),
                     cameras_extent=radius, translate=translate,
                     ply_path=ply_path)


def load_scene(path: str, **kwargs) -> SceneData:
    """Dataset-type dispatch (ref Scene.__init__, scene/__init__.py:60-77)."""
    if os.path.exists(os.path.join(path, "sparse")):
        kwargs.pop("white_background", None)
        return load_colmap(path, **kwargs)
    if os.path.exists(os.path.join(path, "transforms_train.json")):
        kwargs.pop("images", None)
        kwargs.pop("llffhold", None)
        return load_blender(path, **kwargs)
    raise ValueError(f"Could not recognize scene type for {path}")

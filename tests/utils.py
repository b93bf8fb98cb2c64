"""Shared test fixtures: random splat scenes + cameras."""
import numpy as np
import jax.numpy as jnp

from gi_gs_tpu.scene.cameras import make_camera
from gi_gs_tpu.utils import math_utils


def random_scene(n=200, seed=0, w=64, h=48, fov=1.0, op_max=0.95):
    """Random Gaussians in front of a fixed camera; returns dict of arrays.

    Opacities stay below op_max so the 0.99 alpha clamp (whose gradient the
    CUDA reference deliberately ignores) is never hit in gradient tests.
    """
    rng = np.random.RandomState(seed)
    cam = make_camera(R=np.eye(3), T=np.zeros(3), fovx=fov, fovy=fov,
                      width=w, height=h)
    z = rng.uniform(1.0, 5.0, (n, 1))
    lim = np.tan(fov / 2) * 0.9
    xy = rng.uniform(-lim, lim, (n, 2)) * z
    xyz = np.concatenate([xy, z], axis=1).astype(np.float32)
    log_scale = rng.uniform(-3.5, -2.0, (n, 3)).astype(np.float32)
    quat = rng.normal(size=(n, 4)).astype(np.float32)
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    opacity = rng.uniform(0.05, op_max, (n, 1)).astype(np.float32)
    scales = jnp.exp(jnp.asarray(log_scale))
    cov3d = math_utils.build_covariance_3d(scales, jnp.asarray(quat))
    feats = rng.uniform(0.0, 1.0, (n, 15)).astype(np.float32)
    return dict(
        cam=cam, xyz=jnp.asarray(xyz), cov3d=cov3d,
        opacity=jnp.asarray(opacity),
        color=jnp.asarray(feats[:, 0:3]),
        normal=jnp.asarray(feats[:, 3:6] * 2.0 - 1.0),
        albedo=jnp.asarray(feats[:, 6:9]),
        roughness=jnp.asarray(feats[:, 9:10]),
        metallic=jnp.asarray(feats[:, 10:11]),
        width=w, height=h)


def oracle_features(scene):
    """[N, 15] feature table in the oracle's ordering: color, normal,
    albedo, rough, metal, depth(placeholder 0 — filled by the oracle
    caller), pos_view(placeholder)."""
    return jnp.concatenate([
        scene["color"], scene["normal"], scene["albedo"],
        scene["roughness"], scene["metallic"]], axis=1)

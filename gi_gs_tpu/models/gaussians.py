"""Capacity-padded Gaussian parameter pytree.

TPU-first replacement for the reference `scene/gaussian_model.py`
GaussianModel: instead of a mutable nn.Module whose tensors are re-allocated
on densify/prune (gaussian_model.py:595-931), parameters live in a fixed
`capacity`-sized functional pytree with an `alive` mask. Densify/clone/
split/prune become pure array transforms (see train/densify.py), so a
single jitted train step serves the whole run.

Raw (pre-activation) parameters, matching ref __init__ (gaussian_model.py:59-80):
  xyz [C,3], features_dc [C,1,3], features_rest [C,K-1,3] (K=(max_sh+1)^2),
  opacity [C,1] (sigmoid), normal [C,3] (L2-normalised), albedo [C,3]
  (sigmoid), roughness [C,1] (sigmoid), metallic [C,1] (sigmoid),
  scaling [C,3] (exp), rotation [C,4] (normalised quat, w-first).
"""
from __future__ import annotations

import functools
from typing import Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import sh as sh_ops
from ..ops.knn import mean_knn_dist2
from ..utils import math_utils


@flax.struct.dataclass
class GaussianParams:
    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    opacity: jnp.ndarray
    normal: jnp.ndarray
    albedo: jnp.ndarray
    roughness: jnp.ndarray
    metallic: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    alive: jnp.ndarray  # [C] bool — capacity padding mask
    active_sh_degree: int = flax.struct.field(pytree_node=False, default=0)
    max_sh_degree: int = flax.struct.field(pytree_node=False, default=3)

    # -- activated views (ref gaussian_model.py:178-266) ---------------------
    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def num_alive(self) -> jnp.ndarray:
        return self.alive.sum()

    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    def get_rotation(self) -> jnp.ndarray:
        return math_utils.normalize(self.rotation)

    def get_opacity(self) -> jnp.ndarray:
        # Dead (padding) slots must not render: force opacity to 0.
        return jax.nn.sigmoid(self.opacity) * self.alive[:, None]

    def get_features(self) -> jnp.ndarray:
        """[C, K, 3] concatenated SH coefficients."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def get_normal(self) -> jnp.ndarray:
        return math_utils.normalize(self.normal)

    def get_albedo(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.albedo)

    def get_roughness(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.roughness)

    def get_metallic(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.metallic)

    def get_covariance(self, scale_modifier: float = 1.0) -> jnp.ndarray:
        return math_utils.build_covariance_3d(
            self.get_scaling(), self.rotation, scale_modifier)

    def one_up_sh_degree(self) -> "GaussianParams":
        if self.active_sh_degree < self.max_sh_degree:
            return self.replace(active_sh_degree=self.active_sh_degree + 1)
        return self

    def colors_from_sh(self, campos: jnp.ndarray) -> jnp.ndarray:
        """Per-Gaussian clamped RGB for the current view."""
        return sh_ops.sh_to_rgb(self.active_sh_degree, self.get_features(),
                                self.xyz, campos)


def create_from_points(points: np.ndarray, colors: np.ndarray,
                       capacity: int, max_sh_degree: int = 3) -> GaussianParams:
    """Initialise from a point cloud, ref `create_from_pcd`
    (gaussian_model.py:272-316):

    * SH DC term from RGB; higher orders zero.
    * log-scale = log(sqrt(mean squared distance to 3 NN)) (simple-knn C2).
    * identity rotation, opacity sigmoid^-1(0.1).
    * normal=(0,0,1), albedo/roughness/metallic raw = 1.0 (pre-sigmoid,
      exactly the reference's raw init values: it initialises the *raw*
      tensors to ones and passes them through sigmoid).
    """
    n = points.shape[0]
    if n > capacity:
        # Deterministic subsample: capacity bounds the whole run; starting
        # from fewer points just means densification does more work.
        print(f"[gi_gs_tpu] init points {n} > capacity {capacity}; "
              f"subsampling", flush=True)
        sel = np.random.RandomState(0).choice(n, capacity, replace=False)
        points = np.asarray(points)[sel]
        colors = np.asarray(colors)[sel]
        n = capacity
    arrays = _init_arrays(jnp.asarray(points, jnp.float32),
                          jnp.asarray(colors, jnp.float32),
                          capacity=capacity, max_sh_degree=max_sh_degree)
    return GaussianParams(**arrays, active_sh_degree=0,
                          max_sh_degree=max_sh_degree)


def grow_params(params: GaussianParams, new_capacity: int) -> GaussianParams:
    """Return params re-padded to a larger capacity (all data preserved,
    new slots dead). TPU-native replacement for the reference's unbounded
    tensor reallocation on densify (gaussian_model.py:664-749): when the
    alive population approaches capacity the caller grows the bucket and
    re-jits, instead of silently dropping clones/splits."""
    cap = params.capacity
    if new_capacity <= cap:
        return params
    m = new_capacity - cap

    def pad(x, fill=0.0):
        extra = jnp.full((m,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, extra], axis=0)

    return params.replace(
        xyz=pad(params.xyz),
        features_dc=pad(params.features_dc),
        features_rest=pad(params.features_rest),
        opacity=pad(params.opacity),
        # Well-conditioned defaults for dead slots — deliberately NOT the
        # _init_arrays fills (init pads albedo/roughness/metallic with 0;
        # here they get raw 1.0, and normal z / rotation w get unit
        # components). Densification overwrites every field of a slot
        # before it goes live, so only numeric conditioning matters.
        normal=pad(params.normal).at[cap:, 2].set(1.0),
        albedo=pad(params.albedo, 1.0),
        roughness=pad(params.roughness, 1.0),
        metallic=pad(params.metallic, 1.0),
        scaling=pad(params.scaling, -10.0),
        rotation=pad(params.rotation).at[cap:, 0].set(1.0),
        alive=pad(params.alive, False),
    )


@functools.partial(jax.jit, static_argnames=("capacity", "max_sh_degree"))
def _init_arrays(pts: jnp.ndarray, colors: jnp.ndarray, capacity: int,
                 max_sh_degree: int):
    """One jitted program for the whole init (KNN + padding): the eager
    form costs ~25 separate remote compiles per run on networked
    backends."""
    n = pts.shape[0]
    K = (max_sh_degree + 1) ** 2
    dist2 = jnp.maximum(mean_knn_dist2(pts), 1e-7)
    log_scales = jnp.log(jnp.sqrt(dist2))[:, None].repeat(3, axis=1)

    def pad(x, fill=0.0):
        shape = (capacity - n,) + x.shape[1:]
        return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)], axis=0)

    feat_dc = sh_ops.rgb_to_sh0(colors)[:, None, :]
    rot = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)

    return dict(
        xyz=pad(pts),
        features_dc=pad(feat_dc),
        features_rest=jnp.zeros((capacity, K - 1, 3), jnp.float32),
        opacity=pad(jnp.full((n, 1), math_utils.inverse_sigmoid(0.1), jnp.float32)),
        normal=pad(jnp.tile(jnp.array([[0.0, 0.0, 1.0]], jnp.float32), (n, 1))),
        albedo=pad(jnp.ones((n, 3), jnp.float32)),
        roughness=pad(jnp.ones((n, 1), jnp.float32)),
        metallic=pad(jnp.ones((n, 1), jnp.float32)),
        scaling=pad(log_scales, fill=-10.0),  # tiny padded splats
        rotation=pad(rot).at[n:, 0].set(1.0),  # valid quats in padding
        alive=jnp.arange(capacity) < n,
    )

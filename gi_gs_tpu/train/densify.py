"""Densification as pure, capacity-padded array transforms.

Functional replacement for the reference's optimizer-surgery densification
(`densify_and_prune` + clone/split/prune, scene/gaussian_model.py:595-945):
instead of re-allocating tensors, clones/splits are written into dead
capacity slots and pruning clears `alive` bits, so the whole schedule runs
inside one jitted update with static shapes.

Semantics preserved from the fork (AbsGS-style dual threshold):
* ratio = fraction of points with ||grad|| >= threshold; Q = (1-ratio)
  quantile of the abs-grad statistic (gaussian_model.py:907-920).
* Both clone and split sample NEW positions from the Gaussian itself
  (this fork samples in clone too, gaussian_model.py:760-765).
* Split divides activated scale by (0.8 * N), N=2.
* Stats and max_radii2D are fully reset after densification
  (densification_postfix, gaussian_model.py:702-706).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..models.gaussians import GaussianParams
from ..utils import math_utils


class DensifyStats(NamedTuple):
    accum: jnp.ndarray         # [C, 1] sum ||ndc grad xy||
    accum_abs: jnp.ndarray     # [C, 1] sum (|gx| + |gy|)
    accum_abs_max: jnp.ndarray # [C, 1] running max of (|gx| + |gy|)
    denom: jnp.ndarray         # [C, 1]
    max_radii2d: jnp.ndarray   # [C]

    @staticmethod
    def zeros(capacity: int) -> "DensifyStats":
        # Distinct arrays (not one shared zeros buffer): the train step
        # donates its state, and XLA rejects donating one buffer twice.
        return DensifyStats(
            jnp.zeros((capacity, 1), jnp.float32),
            jnp.zeros((capacity, 1), jnp.float32),
            jnp.zeros((capacity, 1), jnp.float32),
            jnp.zeros((capacity, 1), jnp.float32),
            jnp.zeros((capacity,), jnp.float32))


def update_stats(stats: DensifyStats, ndc_grad: jnp.ndarray,
                 visibility: jnp.ndarray, radii: jnp.ndarray) -> DensifyStats:
    """Per-iteration accumulation (ref add_densification_stats,
    gaussian_model.py:933-945 + max_radii2D update train.py:495-497)."""
    vis = visibility[:, None].astype(jnp.float32)
    g = ndc_grad[:, :2]
    norm_g = jnp.linalg.norm(g, axis=-1, keepdims=True)
    abs_g = jnp.abs(g[:, :1]) + jnp.abs(g[:, 1:2])
    return DensifyStats(
        accum=stats.accum + vis * norm_g,
        accum_abs=stats.accum_abs + vis * abs_g,
        accum_abs_max=jnp.maximum(stats.accum_abs_max,
                                  jnp.where(vis > 0, abs_g, stats.accum_abs_max)),
        denom=stats.denom + vis,
        max_radii2d=jnp.where(visibility,
                              jnp.maximum(stats.max_radii2d, radii.astype(jnp.float32)),
                              stats.max_radii2d))


def _masked_quantile(values: jnp.ndarray, alive: jnp.ndarray, q: jnp.ndarray):
    """torch.quantile over alive entries only (dead -> NaN, nanquantile)."""
    vals = jnp.where(alive, values, jnp.nan)
    return jnp.nanquantile(vals, q)


def densify_and_prune(key: jax.Array, params: GaussianParams,
                      stats: DensifyStats, max_grad: float,
                      min_opacity: float, extent: float,
                      max_screen_size: Optional[int], percent_dense: float
                      ) -> Tuple[GaussianParams, DensifyStats, jnp.ndarray, jnp.ndarray]:
    """Returns (params', fresh stats, new_slot_mask [C], n_dropped).

    new_slot_mask marks slots whose optimizer moments must be zeroed
    (optim.surgery_new_slots)."""
    cap = params.capacity
    alive = params.alive

    grads = stats.accum / stats.denom
    grads = jnp.where(jnp.isnan(grads), 0.0, grads)[:, 0]        # [C]
    grads_abs = stats.accum_abs / stats.denom
    grads_abs = jnp.where(jnp.isnan(grads_abs), 0.0, grads_abs)[:, 0]

    alive_f = alive.astype(jnp.float32)
    n_alive = jnp.maximum(alive_f.sum(), 1.0)
    ratio = ((grads >= max_grad) & alive).sum() / n_alive
    q_thresh = _masked_quantile(grads_abs, alive, 1.0 - ratio)

    grad_sel = ((grads >= max_grad) | (grads_abs >= q_thresh)) & alive
    scaling = params.get_scaling()
    max_scale = scaling.max(axis=1)
    clone_mask = grad_sel & (max_scale <= percent_dense * extent)
    split_mask = grad_sel & (max_scale > percent_dense * extent)

    n_clone = clone_mask.sum()
    n_split = split_mask.sum()

    clone_src = jnp.nonzero(clone_mask, size=cap, fill_value=cap)[0]
    split_src = jnp.nonzero(split_mask, size=cap, fill_value=cap)[0]
    free_slots = jnp.nonzero(~alive, size=cap, fill_value=cap)[0]
    n_free = (~alive).sum()

    # New-item table: k < n_clone -> clone of clone_src[k];
    # then 2 split replicas per split source.
    k = jnp.arange(cap, dtype=jnp.int32)
    is_clone = k < n_clone
    split_item = k - n_clone                # replica index within splits
    is_split = (split_item >= 0) & (split_item < 2 * n_split)
    src = jnp.where(
        is_clone, clone_src[jnp.minimum(k, cap - 1)],
        split_src[jnp.clip(split_item // 2, 0, cap - 1)])
    # Capacity saturation: a split may only consume its source if BOTH
    # replicas got a free slot — otherwise the source must stay alive
    # (the reference never drops mass; without this, running out of free
    # slots deleted the split sources while their replacements were
    # silently discarded, destroying the scene over successive waves).
    split_fits = (n_clone + 2 * (split_item // 2) + 1) < n_free
    valid = (is_clone & (k < n_free) | is_split & split_fits) & (src < cap)
    # Deferred-or-dropped work: clones that found no free slot are lost for
    # this round; split replicas that found no slot are deferred (their
    # sources stay alive, see split_fits above). Either way a nonzero value
    # means the schedule wanted more capacity than exists — the CLI/gate
    # treat it as the capacity-growth trigger (grow_state + retrace).
    n_dropped = jnp.maximum(n_clone + 2 * n_split - n_free, 0)
    j = jnp.arange(cap, dtype=jnp.int32)
    split_done = jnp.zeros((cap,), bool).at[split_src].set(
        (j < n_split) & ((n_clone + 2 * j + 1) < n_free), mode="drop")
    src_safe = jnp.minimum(src, cap - 1)
    target = jnp.where(valid, free_slots[jnp.minimum(k, cap - 1)], cap)

    # Sampled positions: rot(q_src) @ normal(0, scale_src) + xyz_src for
    # both clones and splits (gaussian_model.py:721-725,760-765).
    noise = jax.random.normal(key, (cap, 3), jnp.float32)
    stds = scaling[src_safe]
    rots = math_utils.quat_to_rotmat(params.get_rotation()[src_safe])
    new_xyz = jnp.einsum("nij,nj->ni", rots, noise * stds) + params.xyz[src_safe]

    # Scaling: clones copy raw; splits get log(scale / 1.6).
    new_scaling = jnp.where(
        is_clone[:, None], params.scaling[src_safe],
        jnp.log(scaling[src_safe] / (0.8 * 2)))

    def place(leaf, new_vals):
        return leaf.at[target].set(new_vals, mode="drop")

    new_params = params.replace(
        xyz=place(params.xyz, new_xyz),
        features_dc=place(params.features_dc, params.features_dc[src_safe]),
        features_rest=place(params.features_rest, params.features_rest[src_safe]),
        opacity=place(params.opacity, params.opacity[src_safe]),
        normal=place(params.normal, params.normal[src_safe]),
        albedo=place(params.albedo, params.albedo[src_safe]),
        roughness=place(params.roughness, params.roughness[src_safe]),
        metallic=place(params.metallic, params.metallic[src_safe]),
        scaling=place(params.scaling, new_scaling),
        rotation=place(params.rotation, params.rotation[src_safe]),
    )

    new_slot_mask = jnp.zeros((cap,), bool).at[target].set(valid, mode="drop")
    alive2 = (alive & ~split_done) | new_slot_mask

    # Final prune (gaussian_model.py:923-928). New slots have zero radii.
    # max_screen_size may be a traced float; +inf disables the size prunes
    # entirely (matching `if max_screen_size:` guarding BOTH conditions).
    opac = jax.nn.sigmoid(new_params.opacity[:, 0])
    radii_stat = jnp.where(new_slot_mask, 0.0, stats.max_radii2d)
    prune = opac < min_opacity
    size_thr = jnp.asarray(jnp.inf if max_screen_size is None else max_screen_size)
    size_enabled = jnp.isfinite(size_thr)
    new_max_scale = jnp.exp(new_params.scaling).max(axis=1)
    prune = prune | (size_enabled & ((radii_stat > size_thr) |
                                     (new_max_scale > 0.1 * extent)))
    alive3 = alive2 & ~prune

    new_params = new_params.replace(alive=alive3)
    return new_params, DensifyStats.zeros(cap), new_slot_mask, n_dropped


def reset_opacity(params: GaussianParams) -> GaussianParams:
    """opacity_new = sigmoid^-1(min(opacity, 0.01))
    (ref reset_opacity, gaussian_model.py:467-472)."""
    op = jax.nn.sigmoid(params.opacity)
    new_raw = math_utils.inverse_sigmoid(jnp.minimum(op, 0.01))
    return params.replace(opacity=new_raw)

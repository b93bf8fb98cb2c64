"""Mean squared distance to the 3 nearest neighbours (scale init).

TPU-native replacement for `submodules/simple-knn` (spatial.cu:15-25,
simple_knn.cu): the reference Morton-sorts points and searches nearby
boxes; here we Morton-sort with `lax.sort` and compare each point against
a +-WINDOW neighbourhood in Morton order — O(N * W) distances, fully
vectorised, no top_k over the full point set (which lowers to a huge sort
on TPU). Like the reference accelerator this is approximate for
adversarial layouts but exact in the overwhelmingly common case where
spatial neighbours are Morton neighbours; it feeds only the initial
log-scale estimate.

An exact O(N^2) path is kept for small N / tests.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _morton_3d(q: jnp.ndarray) -> jnp.ndarray:
    """Interleave 3x10-bit quantised coords -> 30-bit Morton code.
    q: [N, 3] int32 in [0, 1023]."""
    def spread(x):
        x = x & 0x3FF
        x = (x | (x << 16)) & jnp.int32(0x30000FF)
        x = (x | (x << 8)) & jnp.int32(0x300F00F)
        x = (x | (x << 4)) & jnp.int32(0x30C30C3)
        x = (x | (x << 2)) & jnp.int32(0x9249249)
        return x
    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


@functools.partial(jax.jit, static_argnames=("window",))
def mean_knn_dist2_morton(points: jnp.ndarray, window: int = 48) -> jnp.ndarray:
    """points [N, 3] -> [N] elementwise-min over three Morton orderings of
    the windowed 3-NN estimate. Each pass overestimates the true value, so
    the min only improves; three decorrelated orderings (identity,
    half-cell shift, permuted axis interleave) fix most Morton-boundary
    misses."""
    est = _morton_pass(points, window, shift=0.0, perm=(0, 1, 2))
    est = jnp.minimum(est, _morton_pass(points, window, 0.5, (0, 1, 2)))
    est = jnp.minimum(est, _morton_pass(points, window, 0.0, (2, 0, 1)))
    return est


@functools.partial(jax.jit, static_argnames=("window", "shift", "perm"))
def _morton_pass(points: jnp.ndarray, window: int, shift: float,
                 perm) -> jnp.ndarray:
    n = points.shape[0]
    lo = points.min(axis=0)
    hi = points.max(axis=0)
    q = ((points - lo) / jnp.maximum(hi - lo, 1e-9) * 1023.0 + shift
         ).astype(jnp.int32)
    q = q[:, list(perm)]
    code = _morton_3d(jnp.clip(q, 0, 1023))
    _, order = jax.lax.sort((code, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    sorted_pts = points[order]

    # Candidate neighbours: +-window in Morton order (excluding self).
    pad = jnp.full((window, 3), 1e8, points.dtype)
    padded = jnp.concatenate([pad, sorted_pts, pad], axis=0)
    offsets = list(range(-window, 0)) + list(range(1, window + 1))
    # [N, 2W, 3] via static shifted slices
    cands = jnp.stack([padded[window + off: window + off + n]
                       for off in offsets], axis=1)
    d2 = ((cands - sorted_pts[:, None, :]) ** 2).sum(-1)  # [N, 2W]

    # 3 smallest via three masked min passes (k is tiny; avoids top_k and
    # any scatter: the single minimal entry per row is removed with a
    # cumsum-based first-occurrence mask).
    total = jnp.zeros((n,), points.dtype)
    for _ in range(3):
        m = d2.min(axis=1)
        total = total + m
        kill = d2 <= m[:, None]
        first = kill & (jnp.cumsum(kill, axis=1) == 1)
        d2 = jnp.where(first, jnp.inf, d2)
    mean3 = total / 3.0

    inv = jnp.zeros((n,), jnp.int32).at[order].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True)
    return mean3[inv]


@functools.partial(jax.jit, static_argnames=("chunk",))
def mean_knn_dist2_exact(points: jnp.ndarray, chunk: int = 512) -> jnp.ndarray:
    """Exact brute-force path for small N."""
    n = points.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)), constant_values=1e8)
    sq = (points * points).sum(-1)

    def body(carry, start):
        q = jax.lax.dynamic_slice(pts, (start, 0), (chunk, 3))
        qsq = (q * q).sum(-1)
        d2 = qsq[:, None] + sq[None, :] - 2.0 * (
            q @ points.T)
        d2 = jnp.maximum(d2, 0.0)
        total = jnp.zeros((chunk,), points.dtype)
        for k in range(4):  # first pass removes the self-distance
            m = d2.min(axis=1)
            if k > 0:
                total = total + m
            kill = d2 <= m[:, None]
            first = kill & (jnp.cumsum(kill, axis=1) == 1)
            d2 = jnp.where(first, jnp.inf, d2)
        return carry, total / 3.0

    starts = jnp.arange(0, n + pad, chunk)
    _, out = jax.lax.scan(body, 0, starts)
    return out.reshape(-1)[:n]


def mean_knn_dist2(points: jnp.ndarray) -> jnp.ndarray:
    """Exact path up to 256k points (seconds, once at init — the distance
    matmuls ride the MXU and the 3-NN selection is four min-passes, not a
    top_k sort); Morton-window approximation beyond."""
    if points.shape[0] <= (1 << 18):
        return mean_knn_dist2_exact(points, chunk=512)
    return mean_knn_dist2_morton(points)

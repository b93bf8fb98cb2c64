"""Brute-force per-pixel splatting oracle for tests.

Independent of the tiled pipeline: sorts ALL Gaussians globally by view
depth and alpha-composites every one of them per pixel with the exact
CUDA rules (power/alpha cutoffs, 1e-4 transmittance early-out,
forward.cu:351-399). O(N * H * W) — test-size scenes only.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .config import RasterConfig
from .preprocess import preprocess


def rasterize_bruteforce(means3d, cov3d, opacity, features, w2c, full_proj,
                         tanfovx, tanfovy, height, width,
                         cfg: RasterConfig = RasterConfig()):
    """features: [N, F]. Returns (accum [F, H, W], final_T [H, W]).

    Matches the tiled pipeline's pre-background accumulators exactly,
    including the tile-rect coverage test (a Gaussian is only tested
    against pixels of tiles its 3-sigma rect touches, like the CUDA
    binning).
    """
    pre = preprocess(means3d, cov3d, w2c, full_proj, tanfovx, tanfovy,
                     width, height, cfg)
    order = jnp.argsort(jnp.where(pre.valid, pre.depth, jnp.inf))
    xy = pre.means2d[order]
    con = pre.conic[order]
    op = opacity[order, 0] * pre.valid[order]
    feat = features[order]
    rmin = pre.rect_min[order]
    rmax = pre.rect_max[order]
    n = means3d.shape[0]

    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")

    def per_gaussian(carry, i):
        t, acc, done = carry
        dx = xy[i, 0] - xs
        dy = xy[i, 1] - ys
        power = -0.5 * (con[i, 0] * dx * dx + con[i, 2] * dy * dy) \
            - con[i, 1] * dx * dy
        alpha = jnp.minimum(cfg.alpha_clamp, op[i] * jnp.exp(power))
        tile_x = (xs / cfg.tile_w).astype(jnp.int32)
        tile_y = (ys / cfg.tile_h).astype(jnp.int32)
        in_rect = ((tile_x >= rmin[i, 0]) & (tile_x < rmax[i, 0]) &
                   (tile_y >= rmin[i, 1]) & (tile_y < rmax[i, 1]))
        ok = (power <= 0.0) & (alpha >= cfg.alpha_min) & in_rect
        test_t = t * (1.0 - jnp.where(ok, alpha, 0.0))
        saturate = ok & (test_t < cfg.t_min) & ~done
        contrib = ok & (test_t >= cfg.t_min) & ~done
        w = jnp.where(contrib, alpha * t, 0.0)
        acc = acc + feat[i][:, None, None] * w[None]
        t = jnp.where(contrib, test_t, t)
        done = done | saturate
        return (t, acc, done), None

    init = (jnp.ones((height, width)),
            jnp.zeros((features.shape[1], height, width)),
            jnp.zeros((height, width), bool))
    (final_t, acc, _), _ = jax.lax.scan(per_gaussian, init, jnp.arange(n))
    return acc, final_t

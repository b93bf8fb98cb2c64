"""Image metrics and small-window filters, all pure jnp.

Covers the reference's `utils/loss_utils.py` (L1/L2/SSIM), `utils/
image_utils.py` (PSNR, erosion) and the kornia filters it leans on
(median_blur 3x3, bilateral_blur 3x3, morphological erosion 7x7):
`gaussian_renderer/__init__.py:186,199`,
`diff_gaussian_rasterization/__init__.py:478,491,504`, `train.py:136,383`.

All image tensors here are channel-first [C, H, W] like the reference.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(x - y).mean()


def l2_loss(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return ((x - y) ** 2).mean()


def psnr(img: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Per-image PSNR, flattened MSE (ref utils/image_utils.py)."""
    mse = ((img - gt) ** 2).mean()
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


# ---------------------------------------------------------------------------
# SSIM (ref utils/loss_utils.py:41-97: 11x11 gaussian window, sigma 1.5,
# same-padding conv, C1=0.01^2, C2=0.03^2)
# ---------------------------------------------------------------------------

def _gaussian_1d(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.array(
        [math.exp(-((x - window_size // 2) ** 2) / (2 * sigma ** 2)) for x in range(window_size)],
        dtype=np.float32)
    return g / g.sum()


def _same_conv2d_separable(img: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Depthwise 'same' conv of [C, H, W] with the outer product g⊗g
    (zero padding), as two rank-1 passes: the reference's 11x11 window
    (utils/loss_utils.py:41-97) is a gaussian outer product, so the
    separable form is exact and 11x cheaper per pixel."""
    C = img.shape[0]
    k = g.shape[0]
    pad = k // 2
    lhs = img[None]  # [1, C, H, W]
    rhs_h = jnp.broadcast_to(g[None, None, :, None], (C, 1, k, 1))
    rhs_w = jnp.broadcast_to(g[None, None, None, :], (C, 1, 1, k))
    out = jax.lax.conv_general_dilated(
        lhs, rhs_h, window_strides=(1, 1), padding=((pad, pad), (0, 0)),
        feature_group_count=C, dimension_numbers=("NCHW", "OIHW", "NCHW"))
    out = jax.lax.conv_general_dilated(
        out, rhs_w, window_strides=(1, 1), padding=((0, 0), (pad, pad)),
        feature_group_count=C, dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return out[0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """Mean SSIM over [C, H, W] images in [0, 1].

    All five window means (mu1, mu2, E[x^2], E[y^2], E[xy]) ride ONE
    batched separable conv so XLA issues a single fused pair of conv ops
    instead of five 2-D convs."""
    g = jnp.asarray(_gaussian_1d(window_size))
    stack = jnp.concatenate(
        [img1, img2, img1 * img1, img2 * img2, img1 * img2], axis=0)
    C = img1.shape[0]
    m = _same_conv2d_separable(stack, g)
    mu1, mu2 = m[0:C], m[C:2 * C]
    e11, e22, e12 = m[2 * C:3 * C], m[3 * C:4 * C], m[4 * C:5 * C]
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = e11 - mu1_sq
    sigma2_sq = e22 - mu2_sq
    sigma12 = e12 - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return ssim_map.mean()


# ---------------------------------------------------------------------------
# Small-window filters
# ---------------------------------------------------------------------------

def _shift_stack_3x3(img: jnp.ndarray) -> jnp.ndarray:
    """[C, H, W] -> [9, C, H, W] of reflect-padded 3x3 neighbourhoods.

    Matches kornia's default `border_type='reflect'` for
    median_blur/bilateral_blur; for a 3x3 window only the outermost pixel
    ring touches the padding at all, and reflect is exact there too.
    """
    p = jnp.pad(img, ((0, 0), (1, 1), (1, 1)), mode="reflect")
    rows = []
    for dy in range(3):
        for dx in range(3):
            rows.append(p[:, dy:dy + img.shape[1], dx:dx + img.shape[2]])
    return jnp.stack(rows, axis=0)


def _median9(p):
    """Median of 9 same-shaped arrays via Paeth's 19-exchange min/max
    network. Equivalent forward to sorting and taking element 4, but the
    backward is plain selects instead of jnp.sort's permutation scatter
    (~10x cheaper VJP at image scale; on exact ties the subgradient
    routing can differ from a sort-based median, which is immaterial)."""
    p = list(p)

    def ex(i, j):
        a, b = p[i], p[j]
        p[i] = jnp.minimum(a, b)
        p[j] = jnp.maximum(a, b)

    for i, j in ((1, 2), (4, 5), (7, 8), (0, 1), (3, 4), (6, 7), (1, 2),
                 (4, 5), (7, 8), (0, 3), (5, 8), (4, 7), (3, 6), (1, 4),
                 (2, 5), (4, 7), (4, 2), (6, 4), (4, 2)):
        ex(i, j)
    return p[4]


def median_blur_3x3(img: jnp.ndarray) -> jnp.ndarray:
    """3x3 median filter of [C, H, W] (kornia.filters.median_blur)."""
    stack = _shift_stack_3x3(img)  # [9, C, H, W]
    return _median9([stack[i] for i in range(9)])


def bilateral_blur_3x3(img: jnp.ndarray, sigma_color: float = 1.0,
                       sigma_space: tuple[float, float] = (3.0, 3.0)) -> jnp.ndarray:
    """3x3 bilateral filter of [C, H, W].

    kornia.filters.bilateral_blur semantics: color distance is the L2 norm
    over channels of the centre-vs-neighbour difference; spatial kernel is
    an (unnormalised) gaussian on the offset.
    """
    stack = _shift_stack_3x3(img)  # [9, C, H, W]
    centre = img[None]  # [1, C, H, W]
    diff = stack - centre
    color_dist_sq = (diff ** 2).sum(axis=1, keepdims=True)  # [9, 1, H, W]
    color_w = jnp.exp(-0.5 * color_dist_sq / (sigma_color ** 2))
    offs = np.array([(dy - 1, dx - 1) for dy in range(3) for dx in range(3)], np.float32)
    space_w = np.exp(-0.5 * (offs[:, 0] ** 2 / sigma_space[0] ** 2 +
                             offs[:, 1] ** 2 / sigma_space[1] ** 2)).astype(np.float32)
    w = color_w * jnp.asarray(space_w)[:, None, None, None]  # [9, 1, H, W]
    return (stack * w).sum(axis=0) / jnp.maximum(w.sum(axis=0), 1e-8)


def erode(mask: jnp.ndarray, kernel_size: int = 7) -> jnp.ndarray:
    """Min-pool erosion of a [1, H, W] float mask with 'same' padding of 1s
    (kornia.morphology.erosion with an all-ones kernel, ref train.py:134-136)."""
    k = kernel_size
    pad = k // 2
    padded = jnp.pad(mask, ((0, 0), (pad, pad), (pad, pad)), constant_values=1.0)
    return -jax.lax.reduce_window(
        -padded, -jnp.inf, jax.lax.max, (1, k, k), (1, 1, 1),
        [(0, 0), (0, 0), (0, 0)])


def avg_pool2d(img: jnp.ndarray, k: int) -> jnp.ndarray:
    """Non-overlapping average pool of [C, H, W] (F.avg_pool2d)."""
    s = jax.lax.reduce_window(
        img, 0.0, jax.lax.add, (1, k, k), (1, k, k), "VALID")
    return s / float(k * k)

"""Training losses: edge-aware TV terms (ref train.py:83-142)."""
from __future__ import annotations

import jax.numpy as jnp

from ..utils import image_utils


def tv_loss(gt_image: jnp.ndarray, prediction: jnp.ndarray, pad: int = 1,
            step: int = 1) -> jnp.ndarray:
    """Edge-aware total variation (ref get_tv_loss, train.py:83-114).
    gt_image [3, H, W], prediction [C, H, W]."""
    if pad > 1:
        gt_image = image_utils.avg_pool2d(gt_image, pad)
        prediction = image_utils.avg_pool2d(prediction, pad)
    loss = 0.0
    for s in range(1, step + 1):
        rgb_grad_h = jnp.exp(
            -jnp.abs(gt_image[:, s:, :] - gt_image[:, :-s, :]).mean(0, keepdims=True))
        rgb_grad_w = jnp.exp(
            -jnp.abs(gt_image[:, :, s:] - gt_image[:, :, :-s]).mean(0, keepdims=True))
        tv_h = (prediction[:, s:, :] - prediction[:, :-s, :]) ** 2
        tv_w = (prediction[:, :, s:] - prediction[:, :, :-s]) ** 2
        loss = loss + (tv_h * rgb_grad_h).mean() + (tv_w * rgb_grad_w).mean()
    return loss


def masked_tv_loss(mask: jnp.ndarray, gt_image: jnp.ndarray,
                   prediction: jnp.ndarray, erosion: bool = False) -> jnp.ndarray:
    """Masked edge-aware TV (ref get_masked_tv_loss, train.py:117-142).
    mask [1, H, W] bool/float."""
    rgb_grad_h = jnp.exp(
        -jnp.abs(gt_image[:, 1:, :] - gt_image[:, :-1, :]).mean(0, keepdims=True))
    rgb_grad_w = jnp.exp(
        -jnp.abs(gt_image[:, :, 1:] - gt_image[:, :, :-1]).mean(0, keepdims=True))
    tv_h = (prediction[:, 1:, :] - prediction[:, :-1, :]) ** 2
    tv_w = (prediction[:, :, 1:] - prediction[:, :, :-1]) ** 2
    m = mask.astype(jnp.float32)
    if erosion:
        m = image_utils.erode(m, 7)
    mask_h = m[:, 1:, :] * m[:, :-1, :]
    mask_w = m[:, :, 1:] * m[:, :, :-1]
    return (tv_h * rgb_grad_h * mask_h).mean() + (tv_w * rgb_grad_w * mask_w).mean()

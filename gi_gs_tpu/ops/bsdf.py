"""Point-light BSDF primitives, shading-normal preparation, transforms
and HDR image losses — jnp equivalents of the nvdiffrec renderutils op
set (pbr/renderutils/{ops.py, bsdf.py, loss.py}; CUDA kernels in
c_src/bsdf.cu, mesh.cu, loss.cu).

GI-GS's runtime uses only the cubemap prefilter ops (see cubemap.py);
these primitives complete the renderutils surface (the reference ships
and tests them — tests/test_bsdf.py) and are all plainly differentiable
jnp, so the hand-written CUDA backward kernels are subsumed by autodiff.
All tensors are [..., 3] channel-last like the reference.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

NORMAL_THRESHOLD = 0.1
SPECULAR_EPSILON = 1e-4


def _dot(x, y):
    return (x * y).sum(-1, keepdims=True)


def reflect(x, n):
    return 2.0 * _dot(x, n) * n - x


def safe_normalize(x, eps: float = 1e-20):
    n2 = (x * x).sum(-1, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(n2, eps))


# ---------------------------------------------------------------------------
# Shading normal preparation (bsdf.py:29-53)
# ---------------------------------------------------------------------------

def _bend_normal(view_vec, smooth_nrm, geom_nrm, two_sided_shading):
    if two_sided_shading:
        facing = _dot(geom_nrm, view_vec) > 0
        smooth_nrm = jnp.where(facing, smooth_nrm, -smooth_nrm)
        geom_nrm = jnp.where(facing, geom_nrm, -geom_nrm)
    t = jnp.clip(_dot(view_vec, smooth_nrm) / NORMAL_THRESHOLD, 0.0, 1.0)
    return geom_nrm + t * (smooth_nrm - geom_nrm)


def _perturb_normal(perturbed_nrm, smooth_nrm, smooth_tng, opengl):
    smooth_bitang = safe_normalize(jnp.cross(smooth_tng, smooth_nrm))
    sign = -1.0 if opengl else 1.0
    shading = (smooth_tng * perturbed_nrm[..., 0:1]
               + sign * smooth_bitang * perturbed_nrm[..., 1:2]
               + smooth_nrm * jnp.clip(perturbed_nrm[..., 2:3], 0.0, None))
    return safe_normalize(shading)


def prepare_shading_normal(pos, view_pos, perturbed_nrm, smooth_nrm,
                           smooth_tng, geom_nrm, two_sided_shading=True,
                           opengl=True):
    """Final shading normal: tangent-space perturbation + two-sided flip +
    backface bending (ref ops.py prepare_shading_normal:181-227)."""
    if perturbed_nrm is None:
        perturbed_nrm = jnp.asarray([0.0, 0.0, 1.0])
    smooth_nrm = safe_normalize(smooth_nrm)
    smooth_tng = safe_normalize(smooth_tng)
    view_vec = safe_normalize(view_pos - pos)
    shading_nrm = _perturb_normal(
        jnp.broadcast_to(perturbed_nrm, smooth_nrm.shape), smooth_nrm,
        smooth_tng, opengl)
    return _bend_normal(view_vec, shading_nrm, geom_nrm, two_sided_shading)


# ---------------------------------------------------------------------------
# BSDF lobes (bsdf.py:56-160)
# ---------------------------------------------------------------------------

def lambert(nrm, wi):
    """clamp(N.wi)/pi (ref bsdf_lambert)."""
    return jnp.clip(_dot(nrm, wi), 0.0, None) / math.pi


def fresnel_schlick(f0, f90, cos_theta):
    c = jnp.clip(cos_theta, SPECULAR_EPSILON, 1.0 - SPECULAR_EPSILON)
    return f0 + (f90 - f0) * (1.0 - c) ** 5.0


def ndf_ggx(alpha_sqr, cos_theta):
    c = jnp.clip(cos_theta, SPECULAR_EPSILON, 1.0 - SPECULAR_EPSILON)
    d = (c * alpha_sqr - c) * c + 1.0
    return alpha_sqr / (d * d * math.pi)


def lambda_ggx(alpha_sqr, cos_theta):
    c = jnp.clip(cos_theta, SPECULAR_EPSILON, 1.0 - SPECULAR_EPSILON)
    c2 = c * c
    tan2 = (1.0 - c2) / c2
    return 0.5 * (jnp.sqrt(1.0 + alpha_sqr * tan2) - 1.0)


def masking_smith_ggx_correlated(alpha_sqr, cos_theta_i, cos_theta_o):
    return 1.0 / (1.0 + lambda_ggx(alpha_sqr, cos_theta_i) +
                  lambda_ggx(alpha_sqr, cos_theta_o))


def frostbite_diffuse(nrm, wi, wo, linear_roughness):
    """Frostbite normalized Disney diffuse (ref bsdf_frostbite)."""
    wi_dot_n = _dot(wi, nrm)
    wo_dot_n = _dot(wo, nrm)
    h = safe_normalize(wo + wi)
    wi_dot_h = _dot(wi, h)
    energy_bias = 0.5 * linear_roughness
    energy_factor = 1.0 - (0.51 / 1.51) * linear_roughness
    f90 = energy_bias + 2.0 * wi_dot_h * wi_dot_h * linear_roughness
    res = fresnel_schlick(1.0, f90, wi_dot_n) * \
        fresnel_schlick(1.0, f90, wo_dot_n) * energy_factor
    return jnp.where((wi_dot_n > 0.0) & (wo_dot_n > 0.0), res, 0.0)


def phong(nrm, wo, wi, n_exp):
    dp_r = jnp.clip(_dot(reflect(wo, nrm), wi), 0.0, 1.0)
    dp_l = jnp.clip(_dot(nrm, wi), 0.0, 1.0)
    return (dp_r ** n_exp) * dp_l * (n_exp + 2) / (2 * math.pi)


def pbr_specular(col, nrm, wo, wi, alpha, min_roughness=0.08):
    """GGX specular lobe (ref bsdf_pbr_specular)."""
    a = jnp.clip(alpha, min_roughness * min_roughness, 1.0)
    alpha_sqr = a * a
    h = safe_normalize(wo + wi)
    wo_dot_n = _dot(wo, nrm)
    wi_dot_n = _dot(wi, nrm)
    wo_dot_h = _dot(wo, h)
    n_dot_h = _dot(nrm, h)
    D = ndf_ggx(alpha_sqr, n_dot_h)
    G = masking_smith_ggx_correlated(alpha_sqr, wo_dot_n, wi_dot_n)
    F = fresnel_schlick(col, 1.0, wo_dot_h)
    w = F * D * G * 0.25 / jnp.clip(wo_dot_n, SPECULAR_EPSILON, None)
    frontfacing = (wo_dot_n > SPECULAR_EPSILON) & (wi_dot_n > SPECULAR_EPSILON)
    return jnp.where(frontfacing, w, 0.0)


def pbr_bsdf(kd, arm, pos, nrm, view_pos, light_pos, min_roughness=0.08,
             bsdf: str = "lambert"):
    """Full point-light BSDF: diffuse + specular (ref bsdf_pbr)."""
    wo = safe_normalize(view_pos - pos)
    wi = safe_normalize(light_pos - pos)
    spec_str = arm[..., 0:1]
    roughness = arm[..., 1:2]
    metallic = arm[..., 2:3]
    ks = (0.04 * (1.0 - metallic) + kd * metallic) * (1.0 - spec_str)
    kd_eff = kd * (1.0 - metallic)
    if bsdf == "frostbite":
        diffuse = kd_eff * frostbite_diffuse(nrm, wi, wo, roughness)
    else:
        diffuse = kd_eff * lambert(nrm, wi)
    specular = pbr_specular(ks, nrm, wo, wi, roughness * roughness,
                            min_roughness=min_roughness)
    return diffuse + specular


# ---------------------------------------------------------------------------
# Transforms (ref ops.py xfm_points/xfm_vectors, c_src/mesh.cu)
# ---------------------------------------------------------------------------

def xfm_points(points, matrix):
    """[B, N, 3] x [B, 4, 4] -> homogeneous [B, N, 4]."""
    ones = jnp.ones(points.shape[:-1] + (1,), points.dtype)
    hom = jnp.concatenate([points, ones], axis=-1)
    return jnp.einsum("bnk,bjk->bnj", hom, matrix)


def xfm_vectors(vectors, matrix):
    """[B, N, 3] x [B, 4, 4] -> rotated [B, N, 3] (w = 0)."""
    return jnp.einsum("bnk,bjk->bnj", vectors, matrix[..., :3, :3])


# ---------------------------------------------------------------------------
# HDR image losses (ref loss.py, c_src/loss.cu fused tonemap+loss)
# ---------------------------------------------------------------------------

def _tonemap_srgb(f):
    return jnp.where(f > 0.0031308,
                     jnp.power(jnp.clip(f, 0.0031308, None), 1.0 / 2.4) * 1.055 - 0.055,
                     12.92 * f)


def image_loss(img, target, loss: str = "l1", tonemapper: str = "none"):
    """Fused tonemap + loss (ref image_loss_fn)."""
    if tonemapper == "log_srgb":
        img = _tonemap_srgb(jnp.log(jnp.clip(img, 0.0, 65535.0) + 1.0))
        target = _tonemap_srgb(jnp.log(jnp.clip(target, 0.0, 65535.0) + 1.0))
    if loss == "mse":
        return ((img - target) ** 2).mean()
    if loss == "smape":
        return (jnp.abs(img - target) /
                (jnp.abs(img) + jnp.abs(target) + 0.01)).mean()
    if loss == "relmse":
        return (((img - target) ** 2) /
                (img * img + target * target + 0.1)).mean()
    return jnp.abs(img - target).mean()

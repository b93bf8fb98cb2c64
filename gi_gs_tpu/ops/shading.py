"""Deferred split-sum PBR shading (ref pbr/shade.py pbr_shading) and the
environment-BRDF lookup table.

The reference ships a baked `brdf_256_256.bin` LUT (pbr/shade.py:96-101);
we *generate* the same split-sum LUT (Karis 2013) by GGX importance-
sampled integration at first use and cache it — numerically equivalent,
no asset copying.
"""
from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import light as light_mod
from ..utils.math_utils import aces_film, linear_to_srgb
from . import cubemap as cm


# ---------------------------------------------------------------------------
# Environment BRDF LUT
# ---------------------------------------------------------------------------

def _hammersley(n: int) -> np.ndarray:
    i = np.arange(n, dtype=np.uint32)
    bits = i.copy()
    bits = (bits << np.uint32(16)) | (bits >> np.uint32(16))
    bits = ((bits & np.uint32(0x55555555)) << np.uint32(1)) | \
           ((bits & np.uint32(0xAAAAAAAA)) >> np.uint32(1))
    bits = ((bits & np.uint32(0x33333333)) << np.uint32(2)) | \
           ((bits & np.uint32(0xCCCCCCCC)) >> np.uint32(2))
    bits = ((bits & np.uint32(0x0F0F0F0F)) << np.uint32(4)) | \
           ((bits & np.uint32(0xF0F0F0F0)) >> np.uint32(4))
    bits = ((bits & np.uint32(0x00FF00FF)) << np.uint32(8)) | \
           ((bits & np.uint32(0xFF00FF00)) >> np.uint32(8))
    return np.stack([i / n, bits * 2.3283064365386963e-10], axis=-1)


@functools.lru_cache(maxsize=2)
def _brdf_lut_np(res: int = 256, samples: int = 4096) -> np.ndarray:
    """[res, res, 2] split-sum env-BRDF: rows = roughness, cols = NoV
    (matching the layout of the reference's brdf_256_256.bin as consumed
    at pbr/shade.py:159-166).

    The visibility term is the HEIGHT-CORRELATED Smith GGX
    (V = 0.5 / (NoL·sqrt(NoV²(1-α²)+α²) + NoV·sqrt(NoL²(1-α²)+α²)),
    α = roughness²), integrand 4·V·VoH·NoL/NoH over GGX importance
    samples: this reproduces the shipped reference binary to MC noise
    (max |err| 0.0064 at 4096 samples, tests/test_shading.py
    test_brdf_lut_matches_reference_binary), where the separable
    Schlick-GGX k=α/2 form deviates by up to 0.35 at grazing angles."""
    xi = _hammersley(samples)  # [S, 2]
    nov = (np.arange(res) + 0.5) / res
    rough = (np.arange(res) + 0.5) / res

    out = np.zeros((res, res, 2), np.float32)
    for yi, r in enumerate(rough):
        a = r * r
        a2 = a * a
        phi = 2.0 * np.pi * xi[:, 0]
        cos_t = np.sqrt((1.0 - xi[:, 1]) / (1.0 + (a2 - 1.0) * xi[:, 1]))
        sin_t = np.sqrt(np.maximum(1.0 - cos_t ** 2, 0.0))
        hx = np.cos(phi) * sin_t
        hz = cos_t  # [S]
        v = np.stack([np.sqrt(1.0 - nov ** 2), np.zeros_like(nov), nov], -1)  # [R, 3]
        vdh = (v[:, None, 0] * hx[None] + v[:, None, 2] * hz[None])  # [R, S]
        lz = 2.0 * vdh * hz[None] - v[:, None, 2]
        valid = lz > 0
        nol = np.clip(lz, 0.0, 1.0)
        noh = np.clip(hz[None], 0.0, 1.0)
        voh = np.clip(vdh, 0.0, 1.0)
        NoV = nov[:, None]
        lam_v = NoV * np.sqrt(nol ** 2 * (1.0 - a2) + a2)
        lam_l = nol * np.sqrt(NoV ** 2 * (1.0 - a2) + a2)
        vis = 0.5 / np.maximum(lam_v + lam_l, 1e-8)
        g_vis = np.where(valid & (noh > 0),
                         4.0 * vis * voh * nol / np.maximum(noh, 1e-8), 0.0)
        fc = (1.0 - voh) ** 5
        out[yi, :, 0] = ((1.0 - fc) * g_vis).sum(1) / samples
        out[yi, :, 1] = (fc * g_vis).sum(1) / samples
    return out


def get_brdf_lut(res: int = 256, samples: int = 4096) -> jax.Array:
    """Device LUT view of the numpy cache. The numpy layer is what is
    lru_cached: caching a jax array poisons later programs when the
    first call happens inside a trace/shard_map (mesh-pinned avals,
    tracer leakage)."""
    return jnp.asarray(_brdf_lut_np(res, samples))


def sample_brdf_lut(lut: jnp.ndarray, nov: jnp.ndarray,
                    roughness: jnp.ndarray) -> jnp.ndarray:
    """Bilinear clamp lookup: lut [R, R, 2], nov/roughness [..., 1] in
    [0,1] -> [..., 2] (dr.texture clamp boundary semantics)."""
    R = lut.shape[0]
    u = jnp.clip(nov[..., 0] * R - 0.5, 0.0, R - 1)
    v = jnp.clip(roughness[..., 0] * R - 0.5, 0.0, R - 1)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    u1 = jnp.minimum(u0 + 1, R - 1)
    v1 = jnp.minimum(v0 + 1, R - 1)
    du = (u - u0)[..., None]
    dv = (v - v0)[..., None]
    flat = lut.reshape(-1, 2)
    f = lambda vv, uu: flat[(vv * R + uu).astype(jnp.int32)]
    return (f(v0, u0) * (1 - du) * (1 - dv) + f(v0, u1) * du * (1 - dv) +
            f(v1, u0) * (1 - du) * dv + f(v1, u1) * du * dv)


# ---------------------------------------------------------------------------
# Shading
# ---------------------------------------------------------------------------

# Axis permutation between the rasterizer frame and the cubemap frame
# (pbr/shade.py:134-138).
_TRANSFORM = np.array([[0.0, -1.0, 0.0],
                       [0.0, 0.0, 1.0],
                       [-1.0, 0.0, 0.0]], np.float32)


def saturate_dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip((a * b).sum(-1, keepdims=True), 1e-4, 1.0)


def env_brdf_approx(roughness: jnp.ndarray, nov: jnp.ndarray) -> jnp.ndarray:
    """Analytic split-sum env-BRDF (Lazarov 2013) — ref envBRDF_approx
    (pbr/shade.py:14-24). roughness/nov: [..., 1]; returns [..., 2]."""
    c0 = jnp.asarray([-1.0, -0.0275, -0.572, 0.022])
    c1 = jnp.asarray([1.0, 0.0425, 1.04, -0.04])
    c2 = jnp.asarray([-1.04, 1.04])
    r = roughness * c0 + c1
    a004 = jnp.minimum(r[..., 0:1] ** 2, jnp.exp2(-9.28 * nov)) * r[..., 0:1] \
        + r[..., 1:2]
    return jnp.clip(a004 * c2 + r[..., 2:4], 0.0, 1.0)


def _trilinear_specular(specular, dirs, mip):
    """Per-pixel fractional-mip cubemap lookup over the prefiltered stack
    (dr.texture linear-mipmap-linear with mip_level_bias,
    pbr/shade.py:173-181).

    trilinear(mip) = (1-frac)*S_lo + frac*S_{lo+1}: only the TWO adjacent
    levels contribute, so the stack is flattened into one [T_total, 3]
    array and each pixel gathers its 8 bilinear taps from the two levels
    it actually uses — sampling every level densely (the naive form)
    costs 4L gathers forward and, worse, L full scatter-adds backward."""
    L = len(specular)
    # Seamless: each level is halo-padded once (cm.pad_cubemap), so the
    # flat stack holds (R_l+2)^2 faces and edge taps blend across faces.
    padded = [cm.pad_cubemap(s) for s in specular]
    ress = np.array([s.shape[1] for s in specular], np.int64)
    exts = ress + 2
    offs = np.concatenate([[0], np.cumsum(6 * exts * exts)]).astype(np.int32)
    flat = jnp.concatenate([s.reshape(-1, 3) for s in padded], axis=0)
    ress_j = jnp.asarray(ress.astype(np.int32))
    offs_j = jnp.asarray(offs[:-1])

    mip = jnp.clip(mip[..., 0], 0.0, L - 1)
    lo = jnp.floor(mip)
    frac = (mip - lo)[..., None]
    lo_i = lo.astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, L - 1)

    face, fx, fy = cm.dir_to_face_uv(dirs)

    def sample_level(lvl):
        R = ress_j[lvl]                       # per-pixel int32
        Rf = R.astype(jnp.float32)
        E = R + 2
        base = offs_j[lvl] + face * E * E
        u = (fx + 1.0) * 0.5 * Rf - 0.5
        v = (fy + 1.0) * 0.5 * Rf - 0.5
        u0 = jnp.clip(jnp.floor(u), -1, Rf - 1)
        v0 = jnp.clip(jnp.floor(v), -1, Rf - 1)
        du = jnp.clip(u - u0, 0.0, 1.0)[..., None]
        dv = jnp.clip(v - v0, 0.0, 1.0)[..., None]

        def fetch(vv, uu):
            idx = base + (vv.astype(jnp.int32) + 1) * E + \
                uu.astype(jnp.int32) + 1
            return cm.take_rows3(flat, idx)

        return (fetch(v0, u0) * (1 - du) * (1 - dv) +
                fetch(v0, u0 + 1) * du * (1 - dv) +
                fetch(v0 + 1, u0) * (1 - du) * dv +
                fetch(v0 + 1, u0 + 1) * du * dv)

    return sample_level(lo_i) * (1.0 - frac) + sample_level(hi_i) * frac


# ---------------------------------------------------------------------------
# Channels-first fast path
# ---------------------------------------------------------------------------
#
# The channel-last oracle above mirrors the reference's array convention
# (pbr/shade.py works on [H, W, C]); on TPU that convention is hostile:
# XLA assigns conflicting layouts around every gather and inserts ~23
# full-image [H, W, 3] transposes/copies per call (~40 ms at 800x800 on
# v5e — measured r5). The fast path below computes the SAME arithmetic on
# flat per-channel [P] rows with quad-packed tables (one row gather per
# bilinear lookup), taking channels-FIRST [C, H, W] images — the
# renderer's native layout, so the trainer needs no transposes at all.

def _frame_rows(T, x, y, z):
    """Apply the 3x3 frame permutation to per-channel rows."""
    return (T[0, 0] * x + T[0, 1] * y + T[0, 2] * z,
            T[1, 0] * x + T[1, 1] * y + T[1, 2] * z,
            T[2, 0] * x + T[2, 1] * y + T[2, 2] * z)


@functools.lru_cache(maxsize=2)
def _brdf_lut_quad(res: int = 256, samples: int = 4096) -> np.ndarray:
    """[res*res, 8] quad table of the env-BRDF LUT with edge-clamp
    padding: row (v0, u0) holds the 2x2 footprint of both channels
    (t00.xy | t01.xy | t10.xy | t11.xy), u0/v0 in [0, res-1].

    NUMPY cache (device conversion at use sites): caching a jax array
    that gets closed over inside shard_map'd programs pins the creation
    context's mesh on its aval and later programs with a different mesh
    reject it."""
    lut = _brdf_lut_np(res, samples)                       # [R, R, 2]
    p = np.pad(lut, ((0, 1), (0, 1), (0, 0)), mode="edge")
    q = np.concatenate([p[:-1, :-1], p[:-1, 1:], p[1:, :-1], p[1:, 1:]],
                       axis=-1)
    return q.reshape(-1, 8)


def _sample_brdf_lut_flat(nov, roughness, res: int = 256):
    """Flat bilinear LUT lookup: nov/roughness [P] -> (fg0, fg1) [P]."""
    quad = jnp.asarray(_brdf_lut_quad(res))
    u = jnp.clip(nov * res - 0.5, 0.0, res - 1)
    v = jnp.clip(roughness * res - 0.5, 0.0, res - 1)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    du = u - u0
    dv = v - v0
    idx = (v0.astype(jnp.int32) * res + u0.astype(jnp.int32))
    Q = cm.take_rows(quad, idx)                            # [P, 8]
    w00 = (1 - du) * (1 - dv)
    w01 = du * (1 - dv)
    w10 = (1 - du) * dv
    w11 = du * dv

    def ch(c):
        return (Q[:, c] * w00 + Q[:, 2 + c] * w01 +
                Q[:, 4 + c] * w10 + Q[:, 6 + c] * w11)

    return ch(0), ch(1)


def _trilinear_specular_flat(specular, dx, dy, dz, mip):
    """Flat per-channel trilinear specular lookup (see
    _trilinear_specular): direction rows + fractional mip [P] ->
    (r, g, b) [P]. One quad-row gather per adjacent level."""
    L = len(specular)
    quads = [cm.quad_pack(cm.pad_cubemap(s)) for s in specular]
    ress = np.array([s.shape[1] for s in specular], np.int64)
    sizes = 6 * (ress + 1) * (ress + 1)
    offs = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int32)
    flatq = jnp.concatenate(quads, axis=0)                 # [Tq, 12]
    ress_j = jnp.asarray(ress.astype(np.int32))
    offs_j = jnp.asarray(offs[:-1])

    mip = jnp.clip(mip, 0.0, L - 1)
    lo = jnp.floor(mip)
    frac = mip - lo
    lo_i = lo.astype(jnp.int32)
    hi_i = jnp.minimum(lo_i + 1, L - 1)
    face, fx, fy = cm.dir_to_face_uv_flat(dx, dy, dz)

    def sample_level(lvl):
        R = ress_j[lvl]
        Rf = R.astype(jnp.float32)
        E1 = R + 1
        u = (fx + 1.0) * 0.5 * Rf - 0.5
        v = (fy + 1.0) * 0.5 * Rf - 0.5
        u0 = jnp.clip(jnp.floor(u), -1, Rf - 1)
        v0 = jnp.clip(jnp.floor(v), -1, Rf - 1)
        du = jnp.clip(u - u0, 0.0, 1.0)
        dv = jnp.clip(v - v0, 0.0, 1.0)
        idx = offs_j[lvl] + face * E1 * E1 + \
            (v0.astype(jnp.int32) + 1) * E1 + (u0.astype(jnp.int32) + 1)
        Q = cm.take_rows(flatq, idx)
        w00 = (1 - du) * (1 - dv)
        w01 = du * (1 - dv)
        w10 = (1 - du) * dv
        w11 = du * dv
        return tuple(Q[:, c] * w00 + Q[:, 3 + c] * w01 +
                     Q[:, 6 + c] * w10 + Q[:, 9 + c] * w11
                     for c in range(3))

    slo = sample_level(lo_i)
    shi = sample_level(hi_i)
    return tuple(a * (1.0 - frac) + b * frac for a, b in zip(slo, shi))


def pbr_shading_chw(light: light_mod.CubemapLight,
                    normals: jnp.ndarray,      # [3, H, W] world
                    view_dirs: jnp.ndarray,    # [3, H, W]
                    albedo: jnp.ndarray,       # [3, H, W]
                    roughness: jnp.ndarray,    # [1, H, W]
                    mask: jnp.ndarray,         # [1, H, W] bool
                    brdf_lut=None,
                    tone: bool = False,
                    gamma: bool = False,
                    occlusion: Optional[jnp.ndarray] = None,  # [1, H, W]
                    metallic: Optional[jnp.ndarray] = None,
                    background: Optional[jnp.ndarray] = None
                    ) -> Dict[str, jnp.ndarray]:
    """Channels-first pbr_shading (same math as the channel-last oracle,
    parity-tested by tests/test_shading.py). brdf_lut is ignored — the
    quad-packed LUT is derived from the same get_brdf_lut cache."""
    C, H, W = normals.shape
    P = H * W
    T = jnp.asarray(_TRANSFORM)
    flat = lambda img: img.reshape(img.shape[0], P)
    nx, ny, nz = flat(normals)
    vx, vy, vz = flat(view_dirs)
    ar, ag, ab = flat(albedo)
    rough = flat(roughness)[0]
    occ = None if occlusion is None else flat(occlusion)[0]

    ndv = nx * vx + ny * vy + nz * vz
    ndv_pos = 2.0 * jnp.clip(ndv, 0.0, None)
    rx, ry, rz = (ndv_pos * nx - vx, ndv_pos * ny - vy, ndv_pos * nz - vz)

    # Cubemap-frame transforms (pbr/shade.py:134-138).
    ncx, ncy, ncz = _frame_rows(T, nx, ny, nz)
    vcx, vcy, vcz = _frame_rows(T, vx, vy, vz)
    rcx, rcy, rcz = _frame_rows(T, rx, ry, rz)

    dr, dg, db = cm.sample_cubemap_flat(light.diffuse, ncx, ncy, ncz)
    if occ is not None:
        dr, dg, db = dr * occ, dg * occ, db * occ
    diff_r, diff_g, diff_b = dr * ar, dg * ag, db * ab

    nov = jnp.clip(ncx * vcx + ncy * vcy + ncz * vcz, 1e-4, 1.0)
    fg0, fg1 = _sample_brdf_lut_flat(nov, rough)

    miplevel = light_mod.get_mip(rough, len(light.specular))
    sr, sg, sb = _trilinear_specular_flat(light.specular, rcx, rcy, rcz,
                                          miplevel)

    if metallic is None:
        f0r = f0g = f0b = jnp.full((P,), 0.04, jnp.float32)
    else:
        m = flat(metallic)[0]
        f0r = (1.0 - m) * 0.04 + ar * m
        f0g = (1.0 - m) * 0.04 + ag * m
        f0b = (1.0 - m) * 0.04 + ab * m
    spec_r = sr * (f0r * fg0 + fg1)
    spec_g = sg * (f0g * fg0 + fg1)
    spec_b = sb * (f0b * fg0 + fg1)

    def assemble(r, g, b):
        return jnp.stack([r, g, b], axis=0).reshape(3, H, W)

    diffuse_rgb = assemble(diff_r, diff_g, diff_b)
    specular_rgb = assemble(spec_r, spec_g, spec_b)
    diffuse_light = assemble(dr, dg, db)
    render_rgb = diffuse_rgb + specular_rgb
    if tone:
        render_rgb = aces_film(render_rgb)
    else:
        render_rgb = jnp.clip(render_rgb, 0.0, 1.0)
    if gamma:
        render_rgb = linear_to_srgb(render_rgb)
        diffuse_rgb = linear_to_srgb(diffuse_rgb)
        specular_rgb = linear_to_srgb(specular_rgb)

    if background is None:
        background = jnp.zeros_like(render_rgb)
    render_rgb = jnp.where(mask, render_rgb, background)

    return {"render_rgb": render_rgb, "diffuse_rgb": diffuse_rgb,
            "specular_rgb": specular_rgb, "diffuse_light": diffuse_light}


def pbr_shading(light: light_mod.CubemapLight,
                normals: jnp.ndarray,      # [H, W, 3] world
                view_dirs: jnp.ndarray,    # [H, W, 3]
                albedo: jnp.ndarray,       # [H, W, 3]
                roughness: jnp.ndarray,    # [H, W, 1]
                mask: jnp.ndarray,         # [H, W, 1] bool
                brdf_lut: jnp.ndarray,
                tone: bool = False,
                gamma: bool = False,
                occlusion: Optional[jnp.ndarray] = None,  # [H, W, 1]
                metallic: Optional[jnp.ndarray] = None,
                background: Optional[jnp.ndarray] = None) -> Dict[str, jnp.ndarray]:
    """ref pbr_shading (pbr/shade.py:104-237). All images channel-last."""
    if background is None:
        background = jnp.zeros_like(normals)

    T = jnp.asarray(_TRANSFORM)
    ref_dirs = 2.0 * jnp.clip((normals * view_dirs).sum(-1, keepdims=True),
                              0.0, None) * normals - view_dirs

    diffuse_light = cm.sample_cubemap(light.diffuse, normals @ T.T)
    if occlusion is not None:
        diffuse_light = diffuse_light * occlusion
    diffuse_rgb = diffuse_light * albedo

    nov = saturate_dot(normals @ T.T, view_dirs @ T.T)
    fg = sample_brdf_lut(brdf_lut, nov, roughness)          # [H, W, 2]

    miplevel = light_mod.get_mip(roughness, len(light.specular))
    spec = _trilinear_specular(light.specular, ref_dirs @ T.T, miplevel)

    if metallic is None:
        f0 = jnp.ones_like(albedo) * 0.04
    else:
        f0 = (1.0 - metallic) * 0.04 + albedo * metallic
    reflectance = f0 * fg[..., 0:1] + fg[..., 1:2]
    specular_rgb = spec * reflectance

    render_rgb = diffuse_rgb + specular_rgb
    if tone:
        render_rgb = aces_film(render_rgb)
    else:
        render_rgb = jnp.clip(render_rgb, 0.0, 1.0)
    if gamma:
        render_rgb = linear_to_srgb(render_rgb)
        diffuse_rgb = linear_to_srgb(diffuse_rgb)
        specular_rgb = linear_to_srgb(specular_rgb)

    render_rgb = jnp.where(mask, render_rgb, background)

    return {"render_rgb": render_rgb, "diffuse_rgb": diffuse_rgb,
            "specular_rgb": specular_rgb, "diffuse_light": diffuse_light}

"""Cubemap sampling + diffuse/GGX prefiltering — TPU-native replacement
for nvdiffrast `dr.texture(boundary_mode="cube")` lookups and the
nvdiffrec renderutils cubemap kernels (pbr/renderutils/c_src/cubemap.cu).

Key observation driving the design: the reference prefilter kernels
(DiffuseCubemapFwdKernel, SpecularCubemapFwdKernel) are *linear* in the
cubemap texels with weights that depend only on (resolution, roughness,
cutoff) — all static. So on TPU the prefilter becomes a precomputed
linear operator:

* diffuse + low-res specular levels: one dense [S, S] matrix per level
  (S = 6R^2) — a single MXU matmul per build, exact to the reference
  integral.
* high-res specular levels: a static-weight *patch convolution* on
  halo-padded faces: each output texel integrates a PxP neighbourhood in
  padded face coordinates, where halo texels are resolved to their true
  neighbour-face texels and weighted by their exact directions/areas.
  This captures every in-cone pair within the patch (the GGX cone at
  high-res levels spans only a few texels); energy outside the patch is
  excluded from both numerator and the wsum normaliser, so the result
  stays normalised exactly like the reference's cutoff does.

All paths are differentiable by construction (matmul / conv transposes),
which reproduces the CUDA backward kernels' semantics (same weights,
scatter-free).
"""
from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Geometry helpers (cubemap.cu:17-60 conventions)
# ---------------------------------------------------------------------------

def texel_dirs(res: int) -> np.ndarray:
    """[6, R, R, 3] unit directions at texel centres (cubemap.cu:32-46)."""
    idx = (np.arange(res) + 0.5) / res * 2.0 - 1.0
    fy, fx = np.meshgrid(idx, idx, indexing="ij")
    one = np.ones_like(fx)
    faces = [
        np.stack([one, -fy, -fx], -1),
        np.stack([-one, -fy, fx], -1),
        np.stack([fx, one, fy], -1),
        np.stack([fx, -one, -fy], -1),
        np.stack([fx, -fy, one], -1),
        np.stack([-fx, -fy, -one], -1),
    ]
    d = np.stack(faces, 0)
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


def texel_areas(res: int) -> np.ndarray:
    """[R, R] solid angles (pixel_area, cubemap.cu:17-30)."""
    if res == 1:
        return np.ones((1, 1), np.float32)
    H = res // 2
    x = np.abs(np.arange(res) - H)
    dx = np.arctan((x + 1) / H) - np.arctan(x / H)
    return (dx[None, :] * dx[:, None]).astype(np.float32)


@jax.custom_vjp
def take_rows3(flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """flat [T, 3] gathered at idx [...] -> [..., 3], with a backward that
    scatter-adds each channel SEPARATELY: XLA TPU scatter with [N, 3] row
    updates runs ~10x slower than three scalar-update scatters (measured
    12 vs 120 Mrow/s on v5e), and every texture-gradient in the PBR stack
    funnels through this transpose."""
    return flat[idx]


def _take_rows3_fwd(flat, idx):
    return flat[idx], (idx, flat.shape[0])


def _take_rows3_bwd(res, g):
    idx, T = res
    idx_f = idx.reshape(-1)
    g_f = g.reshape(-1, 3)
    cols = [jnp.zeros((T,), g.dtype).at[idx_f].add(g_f[:, c])
            for c in range(3)]
    return jnp.stack(cols, axis=-1), None


take_rows3.defvjp(_take_rows3_fwd, _take_rows3_bwd)


@jax.custom_vjp
def take_rows(flat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """flat [T, C] gathered at idx [...] -> [..., C]; generalisation of
    take_rows3 to arbitrary width with the same per-column scatter
    backward (TPU row-update scatters run ~10x slower than scalar-update
    scatters — see take_rows3)."""
    return flat[idx]


def _take_rows_fwd(flat, idx):
    return flat[idx], (idx, flat.shape)


def _take_rows_bwd(res, g):
    idx, (T, C) = res
    idx_f = idx.reshape(-1)
    g_f = g.reshape(-1, C)
    cols = [jnp.zeros((T,), g.dtype).at[idx_f].add(g_f[:, c])
            for c in range(C)]
    return jnp.stack(cols, axis=-1), None


take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


def dir_to_face_uv_flat(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Component-wise dir -> (face, fx, fy in [-1, 1]). The flat form is
    the layout-friendly one on TPU: [P]-shaped rows avoid the [..., 3]
    minor-dim-3 stacks whose slices trigger layout-conversion copies."""
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    is_z = ~(is_x | is_y)
    face = jnp.where(is_x, jnp.where(x >= 0, 0, 1),
                     jnp.where(is_y, jnp.where(y >= 0, 2, 3),
                               jnp.where(z >= 0, 4, 5)))
    major = jnp.where(is_x, ax, jnp.where(is_y, ay, az))
    major = jnp.maximum(major, 1e-20)
    # Inverses of the face constructors above.
    fx = jnp.where(
        is_x, jnp.where(x >= 0, -z, z),
        jnp.where(is_y, x, jnp.where(z >= 0, x, -x))) / major
    fy = jnp.where(
        is_x, -y, jnp.where(is_y, jnp.where(y >= 0, z, -z), -y)) / major
    return face, fx, fy


def dir_to_face_uv(dirs: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """dirs [..., 3] -> (face [...], fx [...], fy [...]) in [-1, 1]."""
    return dir_to_face_uv_flat(dirs[..., 0], dirs[..., 1], dirs[..., 2])


@functools.lru_cache(maxsize=8)
def _edge_index_map(res: int) -> np.ndarray:
    """[6, res+2, res+2] int32 NUMPY (device conversion at use sites —
    caching a jax array here would leak tracers when first touched inside
    a transform): extended face positions (1-texel halo) resolved to the
    nearest TRUE texel across the cube edge — the halo construction of
    _patch_tables at h=1. Interior maps to itself."""
    idx = (np.arange(-1, res + 1) + 0.5) / res * 2.0 - 1.0
    fy, fx = np.meshgrid(idx, idx, indexing="ij")
    one = np.ones_like(fx)
    face_dirs = [
        np.stack([one, -fy, -fx], -1), np.stack([-one, -fy, fx], -1),
        np.stack([fx, one, fy], -1), np.stack([fx, -one, -fy], -1),
        np.stack([fx, -fy, one], -1), np.stack([-fx, -fy, -one], -1)]
    ext = np.stack(face_dirs, 0)
    ext = ext / np.linalg.norm(ext, axis=-1, keepdims=True)
    fc, fxx, fyy = _dir_to_face_uv_np(ext)
    uu = np.clip(((fxx + 1) * 0.5 * res - 0.5).round(), 0, res - 1)
    vv = np.clip(((fyy + 1) * 0.5 * res - 0.5).round(), 0, res - 1)
    return (fc * res * res + vv * res + uu).astype(np.int32)


def pad_cubemap(cubemap: jnp.ndarray) -> jnp.ndarray:
    """[6, R, R, C] -> [6, R+2, R+2, C] with a 1-texel cross-face halo:
    bilinear taps on the padded faces blend into the neighbour face at
    seams, emulating nvdiffrast's `boundary_mode="cube"` seamless
    filtering (pbr/shade.py:142-181) instead of edge clamping. One tiny
    static border gather per call — zero per-pixel cost."""
    R = cubemap.shape[1]
    flat = cubemap.reshape(-1, cubemap.shape[-1])
    emap = jnp.asarray(_edge_index_map(R))
    gather = take_rows3 if cubemap.shape[-1] == 3 else (lambda f, i: f[i])
    top = gather(flat, emap[:, 0:1, :])        # [6, 1, R+2, C]
    bot = gather(flat, emap[:, R + 1:, :])
    left = gather(flat, emap[:, 1:R + 1, 0:1])
    right = gather(flat, emap[:, 1:R + 1, R + 1:])
    mid = jnp.concatenate([left, cubemap, right], axis=2)
    return jnp.concatenate([top, mid, bot], axis=1)


def quad_pack(padded: jnp.ndarray) -> jnp.ndarray:
    """[6, E, E, C] halo-padded faces -> [6*(E-1)*(E-1), 4C] quad table:
    row (f, v0, u0) holds the 2x2 bilinear footprint
    (t00 | t01 | t10 | t11), each C channels. Built by slice-stacking
    (differentiable, streaming — no gathers), so a bilinear lookup
    becomes ONE row gather instead of four: TPU gather cost is per-index
    (~independent of row width up to ~a cache line), so this quarters
    the dominant cost of every texture lookup."""
    q = jnp.concatenate([
        padded[:, :-1, :-1], padded[:, :-1, 1:],
        padded[:, 1:, :-1], padded[:, 1:, 1:]], axis=-1)
    return q.reshape(-1, q.shape[-1])


def sample_cubemap_flat(cubemap: jnp.ndarray, dx, dy, dz,
                        quad: jnp.ndarray | None = None):
    """Seamless bilinear cubemap lookup in flat per-channel form:
    cubemap [6, R, R, 3], direction components [P] -> (r, g, b) [P].
    Same taps/weights as sample_cubemap(seamless=True); `quad` optionally
    supplies a precomputed quad_pack(pad_cubemap(cubemap)) table."""
    R = cubemap.shape[1]
    if quad is None:
        quad = quad_pack(pad_cubemap(cubemap))
    face, fx, fy = dir_to_face_uv_flat(dx, dy, dz)
    u = (fx + 1.0) * 0.5 * R - 0.5
    v = (fy + 1.0) * 0.5 * R - 0.5
    u0 = jnp.clip(jnp.floor(u), -1, R - 1)
    v0 = jnp.clip(jnp.floor(v), -1, R - 1)
    du = jnp.clip(u - u0, 0.0, 1.0)
    dv = jnp.clip(v - v0, 0.0, 1.0)
    E1 = R + 1
    idx = face * E1 * E1 + (v0.astype(jnp.int32) + 1) * E1 + \
        (u0.astype(jnp.int32) + 1)
    Q = take_rows(quad, idx)                       # [P, 12]
    w00 = (1 - du) * (1 - dv)
    w01 = du * (1 - dv)
    w10 = (1 - du) * dv
    w11 = du * dv

    def ch(c):
        return (Q[:, c] * w00 + Q[:, 3 + c] * w01 +
                Q[:, 6 + c] * w10 + Q[:, 9 + c] * w11)

    return ch(0), ch(1), ch(2)


def sample_cubemap(cubemap: jnp.ndarray, dirs: jnp.ndarray,
                   seamless: bool = True) -> jnp.ndarray:
    """Bilinear cubemap lookup: cubemap [6, R, R, C], dirs [..., 3].

    seamless=True (default) blends across face edges through a 1-texel
    cross-face halo (nvdiffrast `boundary_mode="cube"` emulation; the
    halo texel is the nearest neighbour-face texel rather than
    nvdiffrast's symmetric edge weighting — sub-texel difference confined
    to the seam ring, bounded by tests/test_cubemap.py). seamless=False
    clamps at face edges."""
    R = cubemap.shape[1]
    face, fx, fy = dir_to_face_uv(dirs)
    u = (fx + 1.0) * 0.5 * R - 0.5
    v = (fy + 1.0) * 0.5 * R - 0.5
    if seamless and R >= 2:
        padded = pad_cubemap(cubemap)
        u0 = jnp.clip(jnp.floor(u), -1, R - 1)
        v0 = jnp.clip(jnp.floor(v), -1, R - 1)
        u1, v1 = u0 + 1, v0 + 1
        du = jnp.clip(u - u0, 0.0, 1.0)
        dv = jnp.clip(v - v0, 0.0, 1.0)
        flat = padded.reshape(-1, padded.shape[-1])
        E = R + 2
        base = face * E * E

        def fetch(vv, uu):
            idx = base + (vv.astype(jnp.int32) + 1) * E + \
                uu.astype(jnp.int32) + 1
            if padded.shape[-1] == 3:
                return take_rows3(flat, idx)
            return flat[idx]
    else:
        u0 = jnp.clip(jnp.floor(u), 0, R - 1)
        v0 = jnp.clip(jnp.floor(v), 0, R - 1)
        u1 = jnp.clip(u0 + 1, 0, R - 1)
        v1 = jnp.clip(v0 + 1, 0, R - 1)
        du = jnp.clip(u - u0, 0.0, 1.0)
        dv = jnp.clip(v - v0, 0.0, 1.0)
        flat = cubemap.reshape(-1, cubemap.shape[-1])
        base = face * R * R

        def fetch(vv, uu):
            idx = base + vv.astype(jnp.int32) * R + uu.astype(jnp.int32)
            if cubemap.shape[-1] == 3:
                return take_rows3(flat, idx)
            return flat[idx]

    c00 = fetch(v0, u0)
    c01 = fetch(v0, u1)
    c10 = fetch(v1, u0)
    c11 = fetch(v1, u1)
    du = du[..., None]
    dv = dv[..., None]
    return (c00 * (1 - du) * (1 - dv) + c01 * du * (1 - dv) +
            c10 * (1 - du) * dv + c11 * du * dv)


# ---------------------------------------------------------------------------
# Mip chain (pbr/light.py:54-79 cubemap_mip)
# ---------------------------------------------------------------------------

@jax.custom_vjp
def cubemap_mip(cubemap: jnp.ndarray) -> jnp.ndarray:
    """2x2 average-pool per face (reshape-mean form: the strided-slice
    form cost ~7 ms for the 256->16 chain on v5e — four relayouts per
    level). Backward replicates the reference's bilinear-redistribution
    (dr.texture of 0.25*dout at fine-texel dirs, pbr/light.py:62-79)
    instead of the avgpool transpose."""
    c = cubemap
    R = c.shape[1]
    c = c.reshape(6, R // 2, 2, R // 2, 2, c.shape[-1])
    return 0.25 * (c[:, :, 0, :, 0] + c[:, :, 0, :, 1] +
                   c[:, :, 1, :, 0] + c[:, :, 1, :, 1])


def _mip_fwd(cubemap):
    return cubemap_mip(cubemap), cubemap.shape[1]


def _mip_bwd(res, dout):
    dirs = jnp.asarray(texel_dirs(res))  # fine-level dirs [6, R, R, 3]
    grad = sample_cubemap(dout * 0.25, dirs)
    return (grad,)


cubemap_mip.defvjp(_mip_fwd, _mip_bwd)


# ---------------------------------------------------------------------------
# Prefilter weight construction (static, cached per (res, roughness))
# ---------------------------------------------------------------------------

def _ndf_ggx_np(alpha_sqr, cos_theta):
    c = np.clip(cos_theta, 0.0, 1.0)
    d = (c * alpha_sqr - c) * c + 1.0
    return alpha_sqr / (d * d * np.pi)


@functools.lru_cache(maxsize=32)
def ndf_cutoff(roughness: float, cutoff: float = 0.99) -> float:
    """costheta bound retaining `cutoff` of the NDF — exact replication of
    __ndfBounds' quirky un-sin-weighted cumulative (renderutils/ops.py:
    428-443)."""
    n = 1000000
    cos_t = np.cos(np.linspace(0, np.pi / 2.0, n))
    D = np.cumsum(_ndf_ggx_np(roughness ** 4, cos_t))
    idx = int(np.argmax(D >= D[-1] * cutoff))
    return float(cos_t[idx])


@functools.lru_cache(maxsize=8)
def diffuse_matrix(res: int) -> jax.Array:
    """[S, S] dense operator: out = M @ texels
    (DiffuseCubemapFwdKernel, cubemap.cu:110-139)."""
    dirs = texel_dirs(res).reshape(-1, 3)
    areas = np.tile(texel_areas(res)[None], (6, 1, 1)).reshape(-1)
    cos = np.clip(dirs @ dirs.T, 0.0, 0.999)
    M = cos * (areas[None, :] / np.pi)
    return jnp.asarray(M.astype(np.float32))


def diffuse_cubemap(cubemap: jnp.ndarray) -> jnp.ndarray:
    """cubemap [6, R, R, 3] -> cosine-integrated irradiance [6, R, R, 3]."""
    R = cubemap.shape[1]
    M = diffuse_matrix(R)
    flat = cubemap.reshape(-1, 3)
    out = jnp.einsum("os,sc->oc", M, flat,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(cubemap.shape)


def _specular_weights_np(res: int, roughness: float, cutoff: float):
    """Full [S, S] specular weights (for the dense path / tests)."""
    cos_cut = ndf_cutoff(roughness, cutoff)
    dirs = texel_dirs(res).reshape(-1, 3)
    areas = np.tile(texel_areas(res)[None], (6, 1, 1)).reshape(-1)
    alpha_sqr = roughness ** 4
    dots = dirs @ dirs.T  # cos between out (VNR) and src (L)
    # H = normalize(L + VNR); VNR.H = sqrt((1+cos)/2) for unit vectors.
    vnr_dot_h = np.sqrt(np.clip((1.0 + dots) * 0.5, 0.0, 1.0))
    w = np.clip(dots, 0.0, None) * _ndf_ggx_np(alpha_sqr, vnr_dot_h) * \
        (areas[None, :] / 4.0)
    w = np.where(dots >= cos_cut, w, 0.0)
    return w.astype(np.float32)


@functools.lru_cache(maxsize=16)
def specular_matrix(res: int, roughness: float, cutoff: float = 0.99) -> jax.Array:
    """Dense normalised operator for res <= 32."""
    w = _specular_weights_np(res, roughness, cutoff)
    wsum = np.maximum(w.sum(axis=1, keepdims=True), 1e-20)
    return jnp.asarray(w / wsum)


# -- patch-conv path for high-res levels ------------------------------------

@functools.lru_cache(maxsize=16)
def _patch_tables(res: int, roughness: float, cutoff: float):
    """Static tables for the halo patch convolution.

    Returns (halo h, src index map [6,(R+2h)^2] int32,
    weights [6, P*P, R, R] f32 normalised) with P = 2h+1.
    """
    cos_cut = ndf_cutoff(roughness, cutoff)
    theta = math.acos(min(cos_cut, 1.0))
    # Texel angular pitch at face centre ~ 2/res radians; edge texels are
    # denser angularly, so pad the radius generously (x1.6 + 2).
    h = int(math.ceil(theta / (2.0 / res) * 1.6)) + 2
    h = min(h, res // 2)
    P = 2 * h + 1

    # Extended face-local grid with halo, mapped to true texel indices.
    idx = (np.arange(-h, res + h) + 0.5) / res * 2.0 - 1.0
    fy, fx = np.meshgrid(idx, idx, indexing="ij")
    one = np.ones_like(fx)
    face_dirs = [
        np.stack([one, -fy, -fx], -1), np.stack([-one, -fy, fx], -1),
        np.stack([fx, one, fy], -1), np.stack([fx, -one, -fy], -1),
        np.stack([fx, -fy, one], -1), np.stack([-fx, -fy, -one], -1)]
    ext_dirs = np.stack(face_dirs, 0)  # [6, R+2h, R+2h, 3] unnormalised
    ext_dirs_u = ext_dirs / np.linalg.norm(ext_dirs, axis=-1, keepdims=True)

    # Resolve each extended position to its nearest true texel.
    fc, fxx, fyy = _dir_to_face_uv_np(ext_dirs_u)
    uu = np.clip(((fxx + 1) * 0.5 * res - 0.5).round(), 0, res - 1).astype(np.int64)
    vv = np.clip(((fyy + 1) * 0.5 * res - 0.5).round(), 0, res - 1).astype(np.int64)
    src_idx = (fc * res * res + vv * res + uu).astype(np.int32)  # [6, R+2h, R+2h]

    # Exact per-pair weights from true source texel dirs/areas.
    dirs_flat = texel_dirs(res).reshape(-1, 3)
    areas_flat = np.tile(texel_areas(res)[None], (6, 1, 1)).reshape(-1)
    src_dir = dirs_flat[src_idx]          # [6, R+2h, R+2h, 3]
    src_area = areas_flat[src_idx]

    out_dir = texel_dirs(res)             # [6, R, R, 3]
    alpha_sqr = roughness ** 4

    W = np.zeros((6, P * P, res, res), np.float32)
    for dy in range(P):
        for dx in range(P):
            sd = src_dir[:, dy:dy + res, dx:dx + res]      # [6, R, R, 3]
            sa = src_area[:, dy:dy + res, dx:dx + res]
            dots = np.einsum("frcx,frcx->frc", out_dir, sd)
            vnr_dot_h = np.sqrt(np.clip((1.0 + dots) * 0.5, 0.0, 1.0))
            w = np.clip(dots, 0.0, None) * _ndf_ggx_np(alpha_sqr, vnr_dot_h) * sa / 4.0
            W[:, dy * P + dx] = np.where(dots >= cos_cut, w, 0.0)
    wsum = np.maximum(W.sum(axis=1, keepdims=True), 1e-20)
    W = W / wsum
    return h, jnp.asarray(src_idx.reshape(6, -1)), jnp.asarray(W)


def _dir_to_face_uv_np(dirs: np.ndarray):
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    is_x = (ax >= ay) & (ax >= az)
    is_y = (~is_x) & (ay >= az)
    face = np.where(is_x, np.where(x >= 0, 0, 1),
                    np.where(is_y, np.where(y >= 0, 2, 3),
                             np.where(z >= 0, 4, 5)))
    major = np.maximum(np.where(is_x, ax, np.where(is_y, ay, az)), 1e-20)
    fx = np.where(is_x, np.where(x >= 0, -z, z),
                  np.where(is_y, x, np.where(z >= 0, x, -x))) / major
    fy = np.where(is_x, -y, np.where(is_y, np.where(y >= 0, z, -z), -y)) / major
    return face, fx, fy


def specular_cubemap(cubemap: jnp.ndarray, roughness: float,
                     cutoff: float = 0.99, dense_max_res: int = 32
                     ) -> jnp.ndarray:
    """GGX prefilter of one level (SpecularCubemapFwd + /wsum,
    cubemap.cu:246-298, renderutils/ops.py:445-460)."""
    R = cubemap.shape[1]
    if R <= dense_max_res:
        M = specular_matrix(R, float(roughness), float(cutoff))
        out = jnp.einsum("os,sc->oc", M, cubemap.reshape(-1, 3),
                         preferred_element_type=jnp.float32,
                         precision=jax.lax.Precision.HIGHEST)
        return out.reshape(cubemap.shape)

    h, src_idx, W = _patch_tables(R, float(roughness), float(cutoff))
    return _specular_apply_patch(cubemap, src_idx, W, h)


def _specular_apply_dense(cubemap: jnp.ndarray, M: jnp.ndarray) -> jnp.ndarray:
    out = jnp.einsum("os,sc->oc", M, cubemap.reshape(-1, 3),
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(cubemap.shape)


def _apply_patch_ref(cubemap: jnp.ndarray, src_idx: jnp.ndarray,
                     W: jnp.ndarray, h: int) -> jnp.ndarray:
    """jnp oracle for the patch filter: fori accumulation of shifted
    elementwise products (one dependent dynamic-slice load per offset —
    ~14x off the HBM roofline; kept as the test reference for the Pallas
    kernels in pallas_patch.py)."""
    R = cubemap.shape[1]
    P = 2 * h + 1
    flat = cubemap.reshape(-1, 3)
    padded = flat[src_idx.reshape(-1)].reshape(6, R + 2 * h, R + 2 * h, 3)

    def body(p, acc):
        dy = p // P
        dx = p - dy * P
        win = jax.lax.dynamic_slice(padded, (0, dy, dx, 0), (6, R, R, 3))
        wp = jax.lax.dynamic_slice(W, (0, p, 0, 0), (6, 1, R, R))
        return acc + win * wp.transpose(0, 2, 3, 1)

    return jax.lax.fori_loop(0, P * P, body,
                             jnp.zeros((6, R, R, 3), jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _specular_apply_patch(cubemap: jnp.ndarray, src_idx: jnp.ndarray,
                          W: jnp.ndarray, h: int) -> jnp.ndarray:
    """Locally-connected halo filter out[f,y,x] = sum_p W[f,p,y,x] *
    padded[f, y+dy, x+dx] (p = dy*P+dx), via the Pallas streaming kernels
    (pallas_patch.py; interpret mode on CPU). Hand VJP: W/src_idx are
    constant tables, so the backward is the transpose correlation into
    the halo-padded layout followed by a segment-sum over the halo map —
    without it JAX would save per-offset residuals."""
    from .pallas_patch import patch_apply_fwd
    R = cubemap.shape[1]
    P = 2 * h + 1
    E = R + 2 * h
    flat = cubemap.reshape(-1, 3)
    # The halo map is the identity on each face's interior, so only the
    # four border strips are gathered (~10x fewer rows than gathering the
    # whole padded face; XLA TPU gather runs ~120 Mrow/s).
    si = src_idx.reshape(6, E, E)
    top = take_rows3(flat, si[:, :h, :])
    bot = take_rows3(flat, si[:, h + R:, :])
    left = take_rows3(flat, si[:, h:h + R, :h])
    right = take_rows3(flat, si[:, h:h + R, h + R:])
    mid = jnp.concatenate([left, cubemap, right], axis=2)
    padded = jnp.concatenate([top, mid, bot], axis=1).transpose(0, 3, 1, 2)
    out = patch_apply_fwd(W, padded, R, P, h)
    return out.transpose(0, 2, 3, 1)


def _sap_fwd(cubemap, src_idx, W, h):
    return _specular_apply_patch(cubemap, src_idx, W, h), \
        (cubemap.shape, src_idx, W)


def _sap_bwd(h, res, g):
    from .pallas_patch import patch_apply_bwd
    shape, src_idx, W = res
    R = shape[1]
    P = 2 * h + 1

    padded_bar = patch_apply_bwd(W, g.transpose(0, 3, 1, 2), R, P, h)
    padded_bar = padded_bar.transpose(0, 2, 3, 1)
    # The halo map is the identity on each face's interior (an extended
    # position that IS a real texel resolves to itself), so only the 2h
    # border ring needs the scatter — ~3-4x fewer scattered rows.
    core = padded_bar[:, h:h + R, h:h + R, :].reshape(-1, 3)
    E = R + 2 * h
    ey, ex = np.meshgrid(np.arange(E), np.arange(E), indexing="ij")
    border = ((ey < h) | (ey >= h + R) | (ex < h) | (ex >= h + R)).reshape(-1)
    bpos = jnp.asarray(np.nonzero(np.tile(border, 6))[0].astype(np.int32))
    bsrc = src_idx.reshape(-1)[bpos]
    bvals = padded_bar.reshape(-1, 3)[bpos]
    flat_bar = core + jax.ops.segment_sum(bvals, bsrc,
                                          num_segments=6 * R * R)
    return flat_bar.reshape(shape), None, None


_specular_apply_patch.defvjp(_sap_fwd, _sap_bwd)


def build_prefilter_tables(base_res: int, min_res: int = 16,
                           min_roughness: float = 0.08,
                           max_roughness: float = 0.5, cutoff: float = 0.99,
                           dense_max_res: int = 32):
    """Host-side construction of every level's static prefilter operator.

    Returns (spec, arrays): `spec` is a hashable static descriptor
    (('dense',) or ('patch', h) per level + diffuse), `arrays` a flat
    tuple of device arrays. Pass `arrays` as ARGUMENTS into jitted code
    (embedding the multi-hundred-MB tables as HLO constants blows past
    compiler request limits).
    """
    levels = []
    r = base_res
    while r > min_res:
        levels.append(r)
        r //= 2
    levels.append(r)
    num = len(levels)
    if num < 3:
        roughs = [1.0] * num  # degenerate chains: treat all as max rough
    else:
        roughs = [(i / (num - 2)) * (max_roughness - min_roughness)
                  + min_roughness for i in range(num - 1)] + [1.0]

    spec = []
    arrays = []
    for res, rough in zip(levels, roughs):
        if res <= dense_max_res:
            spec.append(("dense",))
            arrays.append(specular_matrix(res, float(rough), float(cutoff)))
        else:
            h, src_idx, W = _patch_tables(res, float(rough), float(cutoff))
            spec.append(("patch", h))
            arrays.append(src_idx)
            arrays.append(W)
    arrays.append(diffuse_matrix(levels[-1]))
    return tuple(spec), tuple(arrays)


def build_specular_mips_packed(base: jnp.ndarray, spec, arrays,
                               min_res: int = 16):
    """build_specular_mips with externally-supplied static tables (see
    build_prefilter_tables). Returns (specular list, diffuse)."""
    levels = [base]
    while levels[-1].shape[1] > min_res:
        levels.append(cubemap_mip(levels[-1]))
    out = []
    ai = 0
    for lvl, sp in zip(levels, spec):
        if sp[0] == "dense":
            out.append(_specular_apply_dense(lvl, arrays[ai]))
            ai += 1
        else:
            out.append(_specular_apply_patch(lvl, arrays[ai], arrays[ai + 1],
                                             sp[1]))
            ai += 2
    # diffuse uses the cosine matrix (last array), applied to the coarsest
    # *unfiltered* mip level like the reference (light.py:163).
    diffuse = _specular_apply_dense(levels[-1], arrays[ai])
    return out, diffuse


def build_specular_mips(base: jnp.ndarray, min_res: int = 16,
                        min_roughness: float = 0.08,
                        max_roughness: float = 0.5,
                        cutoff: float = 0.99) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
    """Reference CubemapLight.build_mips (pbr/light.py:154-170): mip chain
    by avg-pool, diffuse irradiance from the coarsest level, GGX prefilter
    per level with linearly spaced roughness, last level at 1.0.

    Returns (specular mip list, diffuse [6, r, r, 3])."""
    levels = [base]
    while levels[-1].shape[1] > min_res:
        levels.append(cubemap_mip(levels[-1]))
    diffuse = diffuse_cubemap(levels[-1])
    num = len(levels)
    out = []
    for idx in range(num - 1):
        r = (idx / (num - 2)) * (max_roughness - min_roughness) + min_roughness
        out.append(specular_cubemap(levels[idx], r, cutoff))
    out.append(specular_cubemap(levels[-1], 1.0, cutoff))
    return out, diffuse

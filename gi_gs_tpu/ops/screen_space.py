"""Screen-space operators: depth->normal, SSAO, SSR indirect diffuse.

jnp equivalents of the reference CUDA kernels `depthmapToNormalCUDA`
(forward.cu:914-1032), `SSAOCUDA` (forward.cu:635-724) and `SSRCUDA`
(forward.cu:726-909), with their exact sampling pattern, break semantics
and (non-)gradient behaviour:

* SSAO runs outside autograd in the reference (GaussianRasterizer.forward
  chains it under no_grad) -> fully stop_gradient'ed here.
* SSR's only gradient path is d(color)/d(albedo) = abd, the forward-
  cached coefficient (diff_gaussian_rasterization/__init__.py:666-673);
  expressed here as `color = stop_gradient(gd) * albedo`, which yields the
  identical VJP without a custom rule.

The phi/theta direction grids replicate the CUDA float32 accumulation
loops (`for(phi=0; phi<2pi; phi+=delta*pi)`) bit-for-bit by simulating
float32 accumulation at trace time (delta is static).
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class GIParams(NamedTuple):
    """Screen-space GI knobs (train.py:850-855 defaults).

    backend selects the ray-march implementation (see pallas_gi.py):
      "pallas"       — block-coherent Pallas kernel (fast; fetch offsets
                       quantised per 8x128 pixel block, hit tests exact);
      "pallas_exact" — offset-bucketed serve-loop Pallas kernel, exact
                       CUDA semantics, data-adaptive cost;
      "jnp"          — the XLA-gather oracle (exact, slowest on TPU).
    """
    radius: float = 0.8
    bias: float = 0.01
    thick: float = 0.05
    delta: float = 0.0625
    step: int = 16
    start: int = 8
    backend: str = "pallas"


# ---------------------------------------------------------------------------
# depth -> normal + view positions
# ---------------------------------------------------------------------------

def depth_to_normal(depth: jnp.ndarray, w2c: jnp.ndarray, fx, fy
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """depth: [H, W] (median-blurred) -> (normal_world [3,H,W],
    depth_pos [3,H,W] view-space positions).

    Replicates depthmapToNormalCUDA: border pixels (1px) produce zero
    depth_pos and normals; pixels whose 5x5 neighbourhood touches the
    border or contains depth < 0.01 produce zero normals; the normal is
    the average of 6 normalised cross products over the 8-neighbour ring,
    rotated to world by the inverse view rotation.
    """
    H, W = depth.shape
    cx, cy = W / 2.0, H / 2.0
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ys = jnp.arange(H, dtype=jnp.float32)[:, None]

    def position(px, py, d):
        return jnp.stack([(px - cx) / fx * d, (py - cy) / fy * d, d], axis=0)

    interior1 = ((xs > 0) & (xs < W - 1) & (ys > 0) & (ys < H - 1))  # [H, W]
    pos = position(xs, ys, depth) * interior1[None]  # border writes skipped

    # 5x5 validity: all neighbours in-bounds and depth >= 0.01
    valid_depth = (depth >= 0.01).astype(jnp.float32)
    pad5 = jnp.pad(valid_depth, 2, constant_values=0.0)
    window_ok = jax.lax.reduce_window(
        pad5, 1.0, jax.lax.min, (5, 5), (1, 1), "VALID") > 0.5
    ok = interior1 & window_ok & (depth >= 0.01)

    def shifted_pos(dx, dy):
        d = jnp.pad(depth, 1, constant_values=0.0)[
            1 + dy: 1 + dy + H, 1 + dx: 1 + dx + W]
        return position(xs + dx, ys + dy, d)

    # Ring: aa = up, bb = right, cc = down, dd = left, ab/bc/cd/da corners
    p_aa = shifted_pos(0, -1)
    p_bb = shifted_pos(1, 0)
    p_cc = shifted_pos(0, 1)
    p_dd = shifted_pos(-1, 0)
    p_ab = shifted_pos(1, -1)
    p_bc = shifted_pos(1, 1)
    p_cd = shifted_pos(-1, 1)
    p_da = shifted_pos(-1, -1)

    def cross(u, v):
        return jnp.stack([
            u[1] * v[2] - u[2] * v[1],
            u[2] * v[0] - u[0] * v[2],
            u[0] * v[1] - u[1] * v[0]], axis=0)

    def unit(v):
        n = jnp.sqrt((v * v).sum(0, keepdims=True))
        return v / jnp.maximum(n, 1e-20)

    e_a = p_da - p_ab
    e_b = p_ab - p_bc
    e_c = p_bc - p_cd
    e_d = p_cd - p_da
    e_ac = p_cc - p_aa
    e_bd = p_dd - p_bb
    e_cdab = p_ab - p_cd
    e_bcad = p_da - p_bc

    normal = (unit(cross(e_a, e_d)) + unit(cross(e_d, e_c)) +
              unit(cross(e_c, e_b)) + unit(cross(e_b, e_a)) +
              unit(cross(e_ac, e_bd)) + unit(cross(e_bcad, e_cdab))) / 6.0

    # world = R^T @ n (c2w rotation; forward.cu:1022-1024)
    n_world = jnp.einsum("ji,jhw->ihw", w2c[:3, :3], normal)
    n_world = n_world * ok[None]
    return n_world, pos


# ---------------------------------------------------------------------------
# Ray-march direction grids (CUDA float32 loop replication)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def march_directions(delta: float):
    """Simulate the f32 phi/theta accumulation loops; returns numpy arrays
    (phis [Np], thetas [Nt]) of float32."""
    sample_delta = np.float32(delta) * np.float32(math.pi)
    two_pi = np.float32(2.0) * np.float32(math.pi)
    half_pi = np.float32(0.5) * np.float32(math.pi)
    phis = []
    phi = np.float32(0.0)
    while phi < two_pi:
        phis.append(phi)
        phi = np.float32(phi + sample_delta)
    thetas = []
    theta = np.float32(0.0)
    t_step = np.float32(sample_delta * np.float32(0.5))
    while theta <= half_pi:
        thetas.append(theta)
        theta = np.float32(theta + t_step)
    return np.array(phis, np.float32), np.array(thetas, np.float32)


def _tbn(normal: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gram-Schmidt TBN from the fixed up vector (forward.cu:661-675).
    normal: [3, H, W] (normalised)."""
    up = jnp.array([0.0, 1.0, 0.0])[:, None, None]
    rndot = normal[1:2]  # dot(up, n)
    tang = up - normal * rndot
    tang = tang / jnp.maximum(jnp.sqrt((tang * tang).sum(0, keepdims=True)), 1e-20)
    bitan = jnp.stack([
        normal[1] * tang[2] - normal[2] * tang[1],
        normal[2] * tang[0] - normal[0] * tang[2],
        normal[0] * tang[1] - normal[1] * tang[0]], axis=0)
    bitan = bitan / jnp.maximum(jnp.sqrt((bitan * bitan).sum(0, keepdims=True)), 1e-20)
    return tang, bitan, normal


def _round_cuda(x):
    """roundf: half away from zero."""
    return jnp.trunc(x + jnp.where(x >= 0, 0.5, -0.5))


def _march(pos, sample_vec, value_img, depth_img, fx, fy, p: GIParams):
    """Shared ray march for one direction batch.

    pos: [3, H, W]; sample_vec: [B, 3, H, W]; value_img: [C, H, W] or None
    (values accumulated at the hit pixel); depth_img: [H, W] (the z-buffer,
    i.e. out_pos channel 2).

    Returns hit [B, H, W] bool and value-at-hit [B, C, H, W] (zeros if no
    hit or value_img None). Exact CUDA semantics: march j = start..step-1,
    first out-of-bounds breaks, first hit breaks.
    """
    H, W = depth_img.shape
    cx, cy = W / 2.0, H / 2.0
    z_scale = (1.0 + pos[2] / 100.0) ** 2 * (p.radius / p.step)  # [H, W]

    B = sample_vec.shape[0]
    C = 0 if value_img is None else value_img.shape[0]
    hit = jnp.zeros((B, H, W), bool)
    dead = jnp.zeros((B, H, W), bool)
    val = jnp.zeros((B, max(C, 1), H, W), jnp.float32)

    flat_depth = depth_img.reshape(-1)
    flat_val = None if value_img is None else value_img.reshape(C, -1)

    for j in range(p.start, p.step):
        sp = pos[None] + sample_vec * (j * z_scale)[None, None]  # [B,3,H,W]
        zz = sp[:, 2] + 1e-7
        ix = _round_cuda(sp[:, 0] / zz * fx + cx)
        iy = _round_cuda(sp[:, 1] / zz * fy + cy)
        oob = (ix < 0) | (ix > W - 1) | (iy < 0) | (iy > H - 1)
        lin = (jnp.clip(iy, 0, H - 1) * W + jnp.clip(ix, 0, W - 1)).astype(jnp.int32)
        sample_depth = flat_depth[lin]  # [B, H, W]
        is_hit = (sample_depth <= sp[:, 2] + p.bias) & \
                 (sample_depth >= sp[:, 2] - p.thick)
        new_dead = dead | oob
        new_hit = ~new_dead & ~hit & is_hit
        if flat_val is not None:
            gathered = flat_val[:, lin.reshape(-1)].reshape(C, B, H, W)
            val = val + jnp.where(new_hit[:, None], gathered.transpose(1, 0, 2, 3), 0.0)
        hit = hit | new_hit
        dead = new_dead | hit  # a hit also stops the march
    return hit, val


def _direction_table(p: GIParams, batch: int = 16):
    """Static (tangent-space dirs [Nb, B, 3], weights cos*sin [Nb, B])
    over the phi x theta grid, padded to whole batches (pad weight 0 and
    a +z dir whose hits are ignored via the zero weight; SSR's
    per-direction nrSamples counts only real directions)."""
    phis, thetas = march_directions(p.delta)
    dirs, ws = [], []
    for ph in phis:
        for th in thetas:
            v = np.array([math.sin(th) * math.cos(ph),
                          math.sin(th) * math.sin(ph),
                          math.cos(th)], np.float32)
            dirs.append(v / max(np.linalg.norm(v), 1e-20))
            ws.append(np.float32(math.cos(th) * math.sin(th)))
    n_real = len(dirs)
    pad = (-n_real) % batch
    for _ in range(pad):
        dirs.append(np.array([0, 0, 1], np.float32))
        ws.append(np.float32(0.0))
    d = np.stack(dirs).reshape(-1, batch, 3)
    w = np.array(ws, np.float32).reshape(-1, batch)
    return d, w, n_real  # numpy (static) — callers convert as needed


def _tangent_to_view(d, tang, bitan, nrm):
    """[B, 3] tangent dirs -> [B, 3, H, W] view-space sample vectors."""
    return (d[:, 0, None, None, None] * tang[None] +
            d[:, 1, None, None, None] * bitan[None] +
            d[:, 2, None, None, None] * nrm[None])


def ssao(normal_view: jnp.ndarray, pos: jnp.ndarray, fx, fy,
         p: GIParams) -> jnp.ndarray:
    """Screen-space ambient occlusion [1, H, W] (SSAOCUDA). No gradients
    (the reference runs it under no_grad). The direction grid is scanned
    in batches (one traced body) so the graph stays small."""
    if p.backend.startswith("pallas"):
        from . import pallas_gi
        mode = "exact" if p.backend == "pallas_exact" else "coherent"
        return pallas_gi.ssao_pallas(normal_view, pos, fx, fy, p, mode=mode)
    normal_view = jax.lax.stop_gradient(normal_view)
    pos = jax.lax.stop_gradient(pos)
    nrm = _unit3(normal_view)
    tang, bitan, nrm3 = _tbn(nrm)
    H, W = pos.shape[1:]
    dirs_np, ws_np, _ = _direction_table(p)
    nr = float(ws_np.sum())
    dirs, ws = jnp.asarray(dirs_np), jnp.asarray(ws_np)

    def body(occ, batch):
        d, w = batch
        sv = _tangent_to_view(d, tang, bitan, nrm3)
        hit, _ = _march(pos, sv, None, pos[2], fx, fy, p)
        return occ + (hit * w[:, None, None]).sum(0), None

    occ, _ = jax.lax.scan(body, jnp.zeros((H, W)), (dirs, ws))
    if nr > 0:
        out = jnp.clip(1.0 - occ / nr, 0.0, 1.0)
    else:
        out = jnp.ones((H, W))
    return jax.lax.stop_gradient(out[None])


def _unit3(v):
    n = jnp.sqrt((v * v).sum(0, keepdims=True))
    return v / jnp.maximum(n, 1e-20)


def fresnel_schlick(cos_theta, f0):
    """ssr.h:13-16."""
    return f0 + (1.0 - f0) * jnp.power(
        jnp.clip(1.0 - cos_theta, 1e-6, 1.0), 5.0)


def ssr(normal_view: jnp.ndarray, pos: jnp.ndarray, rgb: jnp.ndarray,
        albedo: jnp.ndarray, roughness: jnp.ndarray, metallic: jnp.ndarray,
        f0: jnp.ndarray, fx, fy, p: GIParams
        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One-bounce screen-space indirect diffuse (SSRCUDA).

    All inputs [C, H, W]. Returns (color, abd), both [3, H, W], with the
    reference gradient semantics: d(color)/d(albedo) = abd, all other
    gradients zero.
    """
    if p.backend.startswith("pallas"):
        from . import pallas_gi
        mode = "exact" if p.backend == "pallas_exact" else "coherent"
        return pallas_gi.ssr_pallas(normal_view, pos, rgb, albedo,
                                    roughness, metallic, f0, fx, fy, p,
                                    mode=mode)
    sg = jax.lax.stop_gradient
    normal_view, pos, rgb = sg(normal_view), sg(pos), sg(rgb)
    f0, roughness, metallic = sg(f0), sg(roughness), sg(metallic)

    nrm = _unit3(normal_view)
    H, W = pos.shape[1:]
    v_dir = _unit3(-pos)
    n_dot_v = jnp.maximum((nrm * v_dir).sum(0, keepdims=True), 1e-7)
    fr = fresnel_schlick(n_dot_v, f0)  # [3, H, W]
    k_d = (1.0 - fr) * (1.0 - metallic)

    tang, bitan, nrm3 = _tbn(nrm)
    dirs_np, ws_np, n_real = _direction_table(p)
    dirs, ws = jnp.asarray(dirs_np), jnp.asarray(ws_np)

    def body(diff, batch):
        d, w = batch
        sv = _tangent_to_view(d, tang, bitan, nrm3)
        _, val = _march(pos, sv, rgb, pos[2], fx, fy, p)  # [B, 3, H, W]
        return diff + (val * w[:, None, None, None]).sum(0), None

    diffuse, _ = jax.lax.scan(body, jnp.zeros((3, H, W)), (dirs, ws))
    nr = n_real
    if nr > 0:
        gd = math.pi * diffuse / nr * k_d
        color = sg(gd) * albedo
    else:
        gd = jnp.full((3, H, W), 1e-7)
        color = jnp.broadcast_to(gd, albedo.shape) + 0.0 * albedo
    return color, sg(gd)

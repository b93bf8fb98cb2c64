"""Learnable cubemap environment light (ref pbr/light.py CubemapLight).

Functional: the parameter is a bare [6, R, R, 3] array owned by the train
state; `build_mips` produces the prefiltered pyramid each step exactly
like the reference (mip chain -> diffuse irradiance at the coarsest level
-> per-level GGX prefilter with linearly spaced roughness).
"""
from __future__ import annotations

import functools
import math
import os
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import cubemap as cm

LIGHT_MIN_RES = 16
MIN_ROUGHNESS = 0.08
MAX_ROUGHNESS = 0.5


class CubemapLight(NamedTuple):
    """Prefiltered light: specular mip stack + diffuse irradiance."""
    specular: Tuple[jnp.ndarray, ...]   # len L, [6, R_i, R_i, 3]
    diffuse: jnp.ndarray                # [6, 16, 16, 3]


def build_mips(base: jnp.ndarray, cutoff: float = 0.99) -> CubemapLight:
    spec, diff = cm.build_specular_mips(
        base, min_res=LIGHT_MIN_RES, min_roughness=MIN_ROUGHNESS,
        max_roughness=MAX_ROUGHNESS, cutoff=cutoff)
    return CubemapLight(specular=tuple(spec), diffuse=diff)


def build_prefilter_tables(base_res: int, cutoff: float = 0.99):
    """Static prefilter operators for `build_mips_packed`. The arrays must
    be passed as *arguments* into jitted code (hundreds of MB of static
    weights as HLO constants exceed compiler request limits)."""
    return cm.build_prefilter_tables(
        base_res, min_res=LIGHT_MIN_RES, min_roughness=MIN_ROUGHNESS,
        max_roughness=MAX_ROUGHNESS, cutoff=cutoff)


def build_mips_packed(base: jnp.ndarray, spec, arrays) -> CubemapLight:
    s, d = cm.build_specular_mips_packed(base, spec, arrays,
                                         min_res=LIGHT_MIN_RES)
    return CubemapLight(specular=tuple(s), diffuse=d)


def get_mip(roughness: jnp.ndarray, num_levels: int) -> jnp.ndarray:
    """Roughness -> fractional mip level (pbr/light.py:142-152)."""
    lo = (jnp.clip(roughness, MIN_ROUGHNESS, MAX_ROUGHNESS) - MIN_ROUGHNESS) \
        / (MAX_ROUGHNESS - MIN_ROUGHNESS) * (num_levels - 2)
    hi = (jnp.clip(roughness, MAX_ROUGHNESS, 1.0) - MAX_ROUGHNESS) \
        / (1.0 - MAX_ROUGHNESS) + num_levels - 2
    return jnp.where(roughness < MAX_ROUGHNESS, lo, hi)


def envmap_dirs(res: List[int] = (512, 1024)) -> jnp.ndarray:
    """Lat-long direction grid (ref get_envmap_dirs, train.py:145-156)."""
    gy, gx = jnp.meshgrid(
        jnp.linspace(0.0 + 1.0 / res[0], 1.0 - 1.0 / res[0], res[0]),
        jnp.linspace(-1.0 + 1.0 / res[1], 1.0 - 1.0 / res[1], res[1]),
        indexing="ij")
    sintheta, costheta = jnp.sin(gy * jnp.pi), jnp.cos(gy * jnp.pi)
    sinphi, cosphi = jnp.sin(gx * jnp.pi), jnp.cos(gx * jnp.pi)
    return jnp.stack((sintheta * sinphi, costheta, -sintheta * cosphi), axis=-1)


def export_envmap(base: jnp.ndarray, res: List[int] = (512, 1024)) -> jnp.ndarray:
    """Cubemap -> lat-long image [H, W, 3]
    (ref CubemapLight.export_envmap, pbr/light.py:172-208)."""
    return cm.sample_cubemap(base, envmap_dirs(res))


def export_envmap_np(base, res: List[int] = (512, 1024)) -> np.ndarray:
    """Host-side export via the static seamless tap tables
    (_latlong_struct): same bilinear rule as export_envmap, pure numpy.
    Used where eager device ops are unreliable (axon backend) or no
    accelerator is wanted for a tiny image."""
    base = np.asarray(base)
    R = base.shape[1]
    tap_idx, tap_w, _, _ = _latlong_struct(R, res[0], res[1])
    flat = base.reshape(-1, 3)
    out = (flat[tap_idx] * tap_w[..., None]).sum(axis=1)
    return out.reshape(res[0], res[1], 3).astype(np.float32)


@functools.lru_cache(maxsize=4)
def _latlong_struct(res_cube: int, h: int, w: int):
    """Static tap structure (numpy) for sampling the lat-long grid from a
    [6, R, R, 3] cubemap with the seamless bilinear rule: tap texel ids
    [HW, 4] + weights [HW, 4], plus the sorted-by-texel permutation and
    segment bounds that make the TRANSPOSE a gather+cumsum instead of a
    scatter (the lat-long dirs are FIXED, so everything here is
    trace-time constant; XLA TPU scatter runs ~3x slower than this)."""
    R = res_cube
    gy, gx = np.meshgrid(
        np.linspace(0.0 + 1.0 / h, 1.0 - 1.0 / h, h),
        np.linspace(-1.0 + 1.0 / w, 1.0 - 1.0 / w, w), indexing="ij")
    st, ct = np.sin(gy * np.pi), np.cos(gy * np.pi)
    sp, cp = np.sin(gx * np.pi), np.cos(gx * np.pi)
    dirs = np.stack((st * sp, ct, -st * cp), axis=-1).reshape(-1, 3)

    face, fx, fy = cm._dir_to_face_uv_np(dirs.astype(np.float32))
    u = (fx + 1.0) * 0.5 * R - 0.5
    v = (fy + 1.0) * 0.5 * R - 0.5
    u0 = np.clip(np.floor(u), -1, R - 1)
    v0 = np.clip(np.floor(v), -1, R - 1)
    du = np.clip(u - u0, 0.0, 1.0)
    dv = np.clip(v - v0, 0.0, 1.0)
    emap = cm._edge_index_map(R).reshape(6, -1)
    E = R + 2

    idxs, ws = [], []
    for (vv, uu, wgt) in [(v0, u0, (1 - du) * (1 - dv)),
                          (v0, u0 + 1, du * (1 - dv)),
                          (v0 + 1, u0, (1 - du) * dv),
                          (v0 + 1, u0 + 1, du * dv)]:
        pidx = (vv.astype(np.int64) + 1) * E + uu.astype(np.int64) + 1
        idxs.append(emap[face, pidx])
        ws.append(wgt.astype(np.float32))
    tap_idx = np.stack(idxs, -1).astype(np.int32)     # [HW, 4]
    tap_w = np.stack(ws, -1)                          # [HW, 4]
    flat_idx = tap_idx.reshape(-1)
    order = np.argsort(flat_idx, kind="stable").astype(np.int32)
    bounds = np.searchsorted(flat_idx[order],
                             np.arange(6 * R * R + 1)).astype(np.int32)
    return tap_idx, tap_w, order, bounds


def make_latlong_sampler(res_cube: int, res: List[int] = (512, 1024)):
    """Returns f(base [6,R,R,3]) -> [H, W, 3] equal to
    sample_cubemap(base, envmap_dirs(res)) but with a custom VJP that
    reduces the transpose by static-permutation gather + cumsum segments
    (no scatter). Used by the per-step env-TV loss (train.py:409-416)."""
    h, w = res
    tap_idx_np, tap_w_np, order_np, bounds_np = _latlong_struct(
        res_cube, h, w)

    @jax.custom_vjp
    def sample(base):
        flat = base.reshape(-1, 3)
        taps = cm.take_rows3(flat, jnp.asarray(tap_idx_np))  # [HW, 4, 3]
        return (taps * jnp.asarray(tap_w_np)[..., None]).sum(1) \
            .reshape(h, w, 3)

    def fwd(base):
        return sample(base), base.shape

    def bwd(shape, g):
        T = shape[0] * shape[1] * shape[2]
        tapg = g.reshape(-1, 1, 3) * jnp.asarray(tap_w_np)[..., None]
        srt = tapg.reshape(-1, 3)[jnp.asarray(order_np)]
        csum = jnp.concatenate(
            [jnp.zeros((1, 3), jnp.float32),
             jnp.cumsum(srt, axis=0, dtype=jnp.float32)], axis=0)
        b = jnp.asarray(bounds_np)
        seg = csum[b[1:]] - csum[b[:-1]]
        return (seg.reshape(shape),)

    sample.defvjp(fwd, bwd)
    return sample


def latlong_to_cubemap(latlong: jnp.ndarray, res: int) -> jnp.ndarray:
    """HDRI lat-long [H, W, 3] -> cubemap [6, res, res, 3]
    (ref render.py latlong_to_cubemap:64-83)."""
    dirs = jnp.asarray(cm.texel_dirs(res))  # [6, R, R, 3]
    # Inverse of the envmap_dirs parameterisation.
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    theta = jnp.arccos(jnp.clip(y, -1.0, 1.0))          # gy * pi
    phi = jnp.arctan2(x, -z)                             # gx * pi
    H, W = latlong.shape[:2]
    v = theta / jnp.pi * H - 0.5
    u = (phi / jnp.pi + 1.0) * 0.5 * W - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.clip(jnp.floor(v), 0, H - 1)
    du, dv = u - u0, jnp.clip(v - v0, 0.0, 1.0)
    u0w = (u0.astype(jnp.int32)) % W
    u1 = (u0.astype(jnp.int32) + 1) % W
    v0i = v0.astype(jnp.int32)
    v1 = jnp.clip(v0i + 1, 0, H - 1)
    flat = latlong.reshape(-1, latlong.shape[-1])
    c00 = flat[v0i * W + u0w]
    c01 = flat[v0i * W + u1]
    c10 = flat[v1 * W + u0w]
    c11 = flat[v1 * W + u1]
    du, dv = du[..., None], dv[..., None]
    return (c00 * (1 - du) * (1 - dv) + c01 * du * (1 - dv) +
            c10 * (1 - du) * dv + c11 * du * dv)


def split_envmap_loss(base: jnp.ndarray, gt_envmap: jnp.ndarray
                      ) -> Tuple[float, float]:
    """Fork diagnostic (pbr/light.py:119-134): MSE of the exported
    lat-long's upper/lower halves against the upper half of a GT envmap.
    gt_envmap: [H, W, 3] (the fork resizes its HDRI to 1024x512)."""
    exported = export_envmap(base, (gt_envmap.shape[0], gt_envmap.shape[1]))
    h_half = exported.shape[0] // 2
    gt_upper = gt_envmap[:h_half]
    upper = float(((exported[:h_half] - gt_upper) ** 2).mean())
    lower = float(((exported[h_half:] - gt_upper) ** 2).mean())
    return upper, lower


def load_hdr(path: str) -> np.ndarray:
    """Radiance .hdr/.exr -> [H, W, 3] float RGB (ref read_hdr,
    render.py:32-45 uses cv2).

    Backend order: cv2 -> imageio -> pure-python Radiance RGBE decoder
    (_read_radiance_hdr below, .hdr only), so the relight CLI works in
    environments without opencv. Parity of the fallback against cv2 is
    pinned by tests/test_cubemap.py::test_load_hdr_fallback_parity."""
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if img is not None:
            return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32)
    except ImportError:
        pass
    try:
        import imageio.v3 as iio
    except ImportError:
        iio = None
    if iio is not None:
        try:
            return np.asarray(iio.imread(path), np.float32)[..., :3]
        except Exception as e:
            # Only .hdr has a further fallback; for other formats report
            # the real decode failure instead of "no imageio available".
            if not path.lower().endswith(".hdr"):
                raise RuntimeError(
                    f"imageio failed to decode {path}") from e
    if path.lower().endswith(".hdr"):
        return _read_radiance_hdr(path)
    raise RuntimeError(
        f"cannot decode {path}: no cv2/imageio available and the built-in "
        "decoder handles Radiance .hdr only")


def _read_radiance_hdr(path: str) -> np.ndarray:
    """Minimal Radiance RGBE (.hdr) decoder: header, '-Y H +X W' resolution
    line, then per-scanline data with new-style RLE (2,2,hi,lo marker) or
    flat RGBE. Exposure/colorcorr headers are ignored like cv2 does."""
    with open(path, "rb") as f:
        magic = f.readline()
        if not magic.startswith(b"#?"):
            raise ValueError(f"{path}: not a Radiance HDR file")
        while True:
            line = f.readline()
            if line in (b"\n", b"\r\n", b""):
                break
        res = f.readline().split()
        if len(res) != 4 or res[0] != b"-Y" or res[2] != b"+X":
            raise ValueError(f"{path}: unsupported resolution line {res}")
        h, w = int(res[1]), int(res[3])
        data = np.frombuffer(f.read(), np.uint8)

    rgbe = np.zeros((h, w, 4), np.uint8)
    pos = 0
    for y in range(h):
        if pos + 4 <= data.size and data[pos] == 2 and data[pos + 1] == 2 \
                and (int(data[pos + 2]) << 8 | int(data[pos + 3])) == w:
            pos += 4  # new-style RLE scanline, per-component
            for c in range(4):
                x = 0
                while x < w:
                    count = int(data[pos]); pos += 1
                    if count > 128:       # run
                        rgbe[y, x:x + count - 128, c] = data[pos]
                        pos += 1
                        x += count - 128
                    else:                 # literal
                        rgbe[y, x:x + count, c] = data[pos:pos + count]
                        pos += count
                        x += count
        else:                             # flat scanline
            if pos + 4 * w > data.size:
                raise ValueError(
                    f"{path}: truncated scanline {y} (old-style RLE "
                    "files are not supported by the built-in decoder)")
            row = data[pos:pos + 4 * w].reshape(w, 4)
            rgbe[y] = row
            pos += 4 * w

    if pos != data.size:
        # A clean decode consumes the buffer exactly; leftovers mean the
        # scanline structure was misparsed (e.g. old-style (0,0,0,count)
        # RLE read as flat data).
        raise ValueError(
            f"{path}: {data.size - pos} trailing bytes after decode — "
            "unsupported scanline encoding (old-style RLE?)")

    exp = rgbe[..., 3].astype(np.int32)
    scale = np.where(exp == 0, 0.0,
                     np.ldexp(1.0, exp - 136)).astype(np.float32)
    # mantissa * 2^(e-136), matching cv2/stb (Radiance's own convention
    # adds +0.5 to the mantissa; the reference decodes via cv2).
    return rgbe[..., :3].astype(np.float32) * scale[..., None]

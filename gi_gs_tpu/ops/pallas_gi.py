"""Pallas TPU kernels for the screen-space GI ray march (SSAO + SSR).

Exact-semantics replacements for the jnp reference implementations in
screen_space.py (themselves verified against a numpy transliteration of
the CUDA kernels `SSAOCUDA` forward.cu:635-724 and `SSRCUDA`
forward.cu:726-909 in tests/test_screen_space.py).

Why not gathers: the march samples the z-buffer at per-(pixel, dir,
step) data-dependent coordinates — 800x800 x 512 dirs x 8 steps ~ 2.6G
random lookups per call. XLA's TPU gather measures ~0.05 G/s and the
Mosaic `tpu.dynamic_gather` lane-gather ~3.9 G elem/s on v5e, both far
from the VPU's elementwise rate; a per-sample-gather design is capped at
seconds per call.

The kernel instead turns gathers into *uniform vector loads*:

  offset-bucketed slab fetch. For one (8 x 128 pixel block, direction,
  march step), every sample's screen coordinate is written as
  (pixel + offset). The integer offsets (dy, dx) are grouped by exact
  value with a data-dependent while loop: each iteration min-reduces the
  packed offset key of the still-unserved samples, fetches ONE [8, 128]
  slab of the margin-padded z table at that uniform offset (a 2-D
  dynamic slice — no gathers), and serves every sample sharing the
  offset with a masked compare. Smooth depth/normal fields produce few
  distinct offsets per block (a fronto-parallel plane produces exactly
  one), so the cost adapts to the scene; the result is EXACT for any
  offset distribution because the loop runs until all samples are
  served.

The full z table (and for SSR the direct-RGB table) stays resident in
VMEM across the grid: [816, 1152] f32 ~ 3.8 MB at 800x800, with an
8-row/128-lane margin so every slab slice is in-bounds without
clamping. SSR keeps RGB as bf16 ([3] x 3.8/2 MB) to stay inside VMEM;
the indirect-diffuse accumulation itself is f32 (documented deviation:
the CUDA kernel reads f32 RGB; bf16 texels bound the relative error of
the *additive* indirect term by ~0.4%).

March semantics replicated exactly (see screen_space._march):
 * j in [start, step); first out-of-bounds sample kills the ray
   *before* the depth test; first hit accumulates and kills the ray.
 * roundf (half away from zero) pixel snapping, +1e-7 on the projected
   z, hit iff z - thick <= sample <= z + bias.
 * directions from the simulated f32 phi/theta accumulation loops
   (march_directions); zero-weight (theta=0) directions are skipped —
   their contribution is zero in both kernels — while SSR's nrSamples
   normalisation still counts them (handled by the host-side wrapper).
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .screen_space import GIParams, march_directions

BH = 16    # pixel block height (sublanes; 16 halves the block count and
           # cuts the aligned-superset overfetch from 4.0 to 3.0 table
           # elements per pixel vs BH=8)
BW = 128   # pixel block width (lanes)
ROW_M = 16     # top margin of the z/rgb tables (covers dy >= -(BH-1))
SUP_R = BH + 8  # aligned slab superset rows (BH + sublane alignment)
COL_M = 128    # left margin (covers dx >= -(BW-1))
_KOFF = 2048   # offset bias for key packing; |dy|,|dx| < 2048 always
               # (image dims are bounded by the table budget well below it)


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _table_dims(h: int, w: int) -> Tuple[int, int]:
    """Margin-padded table dims. Slab starts ROW_M + iy - i (iy < h,
    i < BH) stay in [1, ROW_M + h - 1]; Mosaic only allows (8, 128)-
    aligned vector loads, so the kernel loads an aligned [SUP_R, 256]
    superset and rotates — the table needs that much headroom past the
    largest aligned start."""
    ht = _round_up(ROW_M + h, 8) + SUP_R
    wt = _round_up(COL_M + w, 128) + 256
    return ht, wt


def _direction_table(p: GIParams) -> Tuple[np.ndarray, float, int]:
    """[Nd, 4] (dx, dy, dz, w=cos*sin) over the phi x theta grid with
    zero-weight rows dropped; returns (table, sum_w, total_dir_count
    including the dropped theta=0 rows — SSR's nrSamples)."""
    phis, thetas = march_directions(p.delta)
    rows = []
    total = 0
    for ph in phis:
        for th in thetas:
            total += 1
            w = float(math.cos(th) * math.sin(th))
            if w == 0.0:
                continue
            v = np.array([math.sin(th) * math.cos(ph),
                          math.sin(th) * math.sin(ph),
                          math.cos(th)], np.float32)
            v = v / max(np.linalg.norm(v), 1e-20)
            rows.append([v[0], v[1], v[2], np.float32(w)])
    if not rows:  # degenerate delta: keep one zero-weight row so Nd >= 1
        rows.append([0.0, 0.0, 1.0, 0.0])
    tab = np.asarray(rows, np.float32)
    return tab, float(tab[:, 3].sum()), total


def _round_cuda(x):
    return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))


def _kernel(dirs_ref, fxy_ref, z_ref, rgb_ref, nrm_ref, pos_ref,
            occ_ref, dif_ref, *, h: int, w: int, p: GIParams,
            n_dirs: int, with_rgb: bool):
    """One pixel block: full hemisphere march against the resident z
    table. occ_ref [BH, BW] = sum_d w_d * hit_d; dif_ref [3, BH, BW] =
    sum_d w_d * rgb_at_hit_d (SSR only)."""
    by = pl.program_id(0)
    bx = pl.program_id(1)
    fx = fxy_ref[0]
    fy = fxy_ref[1]
    cx, cy = w / 2.0, h / 2.0

    lane = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 0)
    px_i = bx * BW + lane
    py_i = by * BH + sub

    def unit3(x, y, z):
        n = jnp.sqrt(x * x + y * y + z * z)
        n = jnp.maximum(n, 1e-20)
        return x / n, y / n, z / n

    nx, ny, nz = unit3(nrm_ref[0], nrm_ref[1], nrm_ref[2])
    # Gram-Schmidt TBN from up = (0, 1, 0) (forward.cu:661-675)
    tx0, ty0, tz0 = -nx * ny, 1.0 - ny * ny, -nz * ny
    tx, ty, tz = unit3(tx0, ty0, tz0)
    bx0 = ny * tz - nz * ty
    by0 = nz * tx - nx * tz
    bz0 = nx * ty - ny * tx
    bxv, byv, bzv = unit3(bx0, by0, bz0)

    posx = pos_ref[0]
    posy = pos_ref[1]
    posz = pos_ref[2]
    zsc = (1.0 + posz / 100.0) ** 2 * (p.radius / p.step)

    fcast = jnp.float32
    # Masks are carried through the while loops as int32: Mosaic cannot
    # yield vector<i1> loop state.
    zero_m = jnp.zeros((BH, BW), jnp.int32)

    def dir_body(d, carry):
        occ, dif = carry
        ddx = dirs_ref[d, 0]
        ddy = dirs_ref[d, 1]
        ddz = dirs_ref[d, 2]
        wgt = dirs_ref[d, 3]
        svx = ddx * tx + ddy * bxv + ddz * nx
        svy = ddx * ty + ddy * byv + ddz * ny
        svz = ddx * tz + ddy * bzv + ddz * nz

        def j_cond(st):
            j, hit, dead, _ = st
            return jnp.logical_and(j < p.step,
                                   jnp.logical_not(jnp.all((hit | dead) != 0)))

        def j_body(st):
            j, hit_i, dead_i, dif_d = st
            hit = hit_i != 0
            dead = dead_i != 0
            t = fcast(j) * zsc
            spx = posx + svx * t
            spy = posy + svy * t
            spz = posz + svz * t
            zz = spz + 1e-7
            ixf = _round_cuda(spx / zz * fx + cx)
            iyf = _round_cuda(spy / zz * fy + cy)
            oob = ((ixf < 0) | (ixf > w - 1) | (iyf < 0) | (iyf > h - 1))
            active = jnp.logical_not(hit | dead)
            dead2 = dead | (active & oob)
            need = active & jnp.logical_not(oob)
            # Clip BEFORE int cast: inf/NaN -> int32 is undefined; clipped
            # garbage rows are masked by `need` anyway.
            ix = jnp.clip(ixf, 0, w - 1).astype(jnp.int32)
            iy = jnp.clip(iyf, 0, h - 1).astype(jnp.int32)
            key = (iy - py_i + _KOFF) * (2 * _KOFF) + (ix - px_i + _KOFF)
            bigk = jnp.int32(2 ** 30)

            def s_cond(st2):
                rem = st2[0]
                return jnp.any(rem != 0)

            def s_body(st2):
                rem_i, hit2_i, dif2 = st2
                rem = rem_i != 0
                kmin = jnp.min(jnp.where(rem, key, bigk))
                dy0 = kmin // (2 * _KOFF) - _KOFF
                dx0 = kmin % (2 * _KOFF) - _KOFF
                rs = ROW_M + by * BH + dy0
                cs = COL_M + bx * BW + dx0
                # Mosaic vector loads must be (8, 128)-aligned: load the
                # aligned [SUP_R, 256] superset and rotate the wanted
                # (rs, cs) corner to the origin (roll(x, s)[i] = x[i-s]).
                ra = (rs // 8) * 8
                ca = (cs // 128) * 128

                def slab_at(ref3, c):
                    if c is None:
                        big = z_ref[pl.ds(ra, SUP_R), pl.ds(ca, 256)]
                    else:
                        big = ref3[c, pl.ds(ra, SUP_R), pl.ds(ca, 256)]
                    big = pltpu.roll(big, (SUP_R - (rs - ra)) % SUP_R, 0)
                    big = pltpu.roll(big, (256 - (cs - ca)) % 256, 1)
                    return big[0:BH, 0:BW]

                slab = slab_at(None, None)
                mine = rem & (key == kmin)
                is_hit = (slab <= spz + p.bias) & (slab >= spz - p.thick)
                new_hit = mine & is_hit
                if with_rgb:
                    add = jnp.where(new_hit, wgt, 0.0)
                    r, g, b = _unpack_rgb(slab_at(rgb_ref, 0), fxy_ref[2])
                    dif2 = (dif2[0] + add * r, dif2[1] + add * g,
                            dif2[2] + add * b)
                rem2 = rem & jnp.logical_not(mine)
                hit3 = hit2_i | new_hit.astype(jnp.int32)
                return rem2.astype(jnp.int32), hit3, dif2

            _, hit3_i, dif_d3 = jax.lax.while_loop(
                s_cond, s_body, (need.astype(jnp.int32), hit_i, dif_d))
            return j + 1, hit3_i, dead2.astype(jnp.int32), dif_d3

        zero3 = (jnp.zeros((BH, BW), jnp.float32),) * 3
        _, hit_i, _, dif_d = jax.lax.while_loop(
            j_cond, j_body, (jnp.int32(p.start), zero_m, zero_m, zero3))
        occ = occ + jnp.where(hit_i != 0, wgt, 0.0)
        if with_rgb:
            dif = (dif[0] + dif_d[0], dif[1] + dif_d[1], dif[2] + dif_d[2])
        return occ, dif

    zero3 = (jnp.zeros((BH, BW), jnp.float32),) * 3
    occ, dif = jax.lax.fori_loop(
        0, n_dirs, dir_body, (jnp.zeros((BH, BW), jnp.float32), zero3))
    occ_ref[...] = occ
    if with_rgb:
        dif_ref[0] = dif[0]
        dif_ref[1] = dif[1]
        dif_ref[2] = dif[2]


_DIR_UNROLL = 4  # directions per fori iteration in the coherent kernel
                 # (amortises the ~310-cycle Mosaic loop overhead)


def _kernel_coherent(dirs_ref, fxy_ref, offs_ref, z_ref, rgb_ref, nrm_ref,
                     pos_ref, occ_ref, dif_ref, *, h: int, w: int,
                     p: GIParams, n_dirs: int, with_rgb: bool, ht: int,
                     wt: int):
    """Block-coherent fast path (GIParams.backend == "pallas").

    Approximation: per (pixel block, direction, march step) the fetched
    texel offset is computed once from the BLOCK-CENTRE pixel's geometry
    and applied uniformly — every pixel reads z[pixel + offset_centre]
    instead of z[pixel + offset_pixel]. The hit test itself stays exact
    per pixel (each pixel's own marched depth spz). The positional error
    equals the within-block variation of the offset field, which on
    smooth G-buffers is comparable to the +-0.5 px rounding the CUDA
    march already applies; tests/test_pallas_gi.py bounds the occlusion
    error against the exact kernel. Measured ~50x faster than the exact
    serve-loop kernel at full sampling: every inner loop is unrolled and
    there is no data-dependent control flow at all (Mosaic loop
    iterations cost ~310 cycles, so per-(dir, step) while-loops dominate
    any adaptive scheme).

    The centre offsets arrive PRECOMPUTED per (block, dir, step) in
    `offs_ref` (packed (dy+K)*(2K)+(dx+K) int32, built vectorized by
    _centre_offset_table): computing them in-kernel put a ~40-op scalar
    dependency chain in front of every slab fetch."""
    by = pl.program_id(0)
    bx = pl.program_id(1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 0)
    px_i = bx * BW + lane
    py_i = by * BH + sub

    def unit3(x, y, z):
        n = jnp.maximum(jnp.sqrt(x * x + y * y + z * z), 1e-20)
        return x / n, y / n, z / n

    # per-pixel TBN z-rows (only svz is needed per pixel: the exact
    # per-pixel quantity in the hit test is the marched depth spz)
    nx, ny, nz = unit3(nrm_ref[0], nrm_ref[1], nrm_ref[2])
    tx0, ty0, tz0 = -nx * ny, 1.0 - ny * ny, -nz * ny
    tx, ty, tz = unit3(tx0, ty0, tz0)
    bz0 = nx * ty - ny * tx
    bx0 = ny * tz - nz * ty
    by0 = nz * tx - nx * tz
    _, _, bzv = unit3(bx0, by0, bz0)

    posz = pos_ref[2]
    zsc = (1.0 + posz / 100.0) ** 2 * (p.radius / p.step)

    def dir_once(d, occ, dif):
        ddx = dirs_ref[d, 0]
        ddy = dirs_ref[d, 1]
        ddz = dirs_ref[d, 2]
        wgt = dirs_ref[d, 3]
        svz = ddx * tz + ddy * bzv + ddz * nz          # [BH, BW]

        hit = jnp.zeros((BH, BW), jnp.bool_)
        dead = jnp.zeros((BH, BW), jnp.bool_)
        dif_d = (jnp.zeros((BH, BW), jnp.float32),) * 3
        for j in range(p.start, p.step):
            key = offs_ref[0, 0, d, j - p.start]
            dyc_i = key // (2 * _KOFF) - _KOFF
            dxc_i = key % (2 * _KOFF) - _KOFF
            rs = jnp.clip(ROW_M + by * BH + dyc_i, 0, ht - SUP_R)
            cs = jnp.clip(COL_M + bx * BW + dxc_i, 0, wt - 256)
            ra = (rs // 8) * 8
            ca = (cs // 128) * 128

            def slab_at(ref3, c):
                if c is None:
                    big = z_ref[pl.ds(ra, SUP_R), pl.ds(ca, 256)]
                else:
                    big = ref3[c, pl.ds(ra, SUP_R), pl.ds(ca, 256)]
                big = pltpu.roll(big, (SUP_R - (rs - ra)) % SUP_R, 0)
                big = pltpu.roll(big, (256 - (cs - ca)) % 256, 1)
                return big[0:BH, 0:BW]

            ix_u = px_i + dxc_i
            iy_u = py_i + dyc_i
            oob = ((ix_u < 0) | (ix_u > w - 1) | (iy_u < 0) | (iy_u > h - 1))
            active = jnp.logical_not(hit | dead)
            dead = dead | (active & oob)
            alive = active & jnp.logical_not(oob)
            spz_p = posz + svz * (jnp.float32(j) * zsc)
            slab = slab_at(None, None)
            is_hit = (slab <= spz_p + p.bias) & (slab >= spz_p - p.thick)
            new_hit = alive & is_hit
            hit = hit | new_hit
            if with_rgb:
                add = jnp.where(new_hit, wgt, 0.0)
                r, g, b = _unpack_rgb(slab_at(rgb_ref, 0), fxy_ref[2])
                dif_d = (dif_d[0] + add * r, dif_d[1] + add * g,
                         dif_d[2] + add * b)
        occ = occ + jnp.where(hit, wgt, 0.0)
        if with_rgb:
            dif = (dif[0] + dif_d[0], dif[1] + dif_d[1], dif[2] + dif_d[2])
        return occ, dif

    n_iter = n_dirs // _DIR_UNROLL

    def dir_body(i, carry):
        occ, dif = carry
        for u in range(_DIR_UNROLL):
            occ, dif = dir_once(i * _DIR_UNROLL + u, occ, dif)
        return occ, dif

    zero3 = (jnp.zeros((BH, BW), jnp.float32),) * 3
    occ, dif = jax.lax.fori_loop(
        0, n_iter, dir_body, (jnp.zeros((BH, BW), jnp.float32), zero3))
    occ_ref[...] = occ
    if with_rgb:
        dif_ref[0] = dif[0]
        dif_ref[1] = dif[1]
        dif_ref[2] = dif[2]


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _centre_offset_table(nrm_p, pos_p, dirs, fx, fy, h, w, p: GIParams,
                         grid) -> jnp.ndarray:
    """Precompute the block-centre fetch offsets of the coherent kernel,
    vectorized over (block, dir, step): returns packed int32
    [nby, nbx, nd, nsteps] with key = (dy+K)*(2K)+(dx+K). Same f32 math
    and operation order as the former in-kernel scalar chain."""
    nby, nbx = grid
    ci, cj = BH // 2, BW // 2
    cx, cy = w / 2.0, h / 2.0
    nc = nrm_p[:, ci::BH, cj::BW][:, :nby, :nbx]     # [3, nby, nbx]
    pc = pos_p[:, ci::BH, cj::BW][:, :nby, :nbx]

    def unit3(x, y, z):
        n = jnp.maximum(jnp.sqrt(x * x + y * y + z * z), 1e-20)
        return x / n, y / n, z / n

    ncx, ncy, ncz = unit3(nc[0], nc[1], nc[2])
    tcx, tcy, tcz = unit3(-ncx * ncy, 1.0 - ncy * ncy, -ncz * ncy)
    bcx = ncy * tcz - ncz * tcy
    bcy = ncz * tcx - ncx * tcz
    bcz = ncx * tcy - ncy * tcx
    bcx, bcy, bcz = unit3(bcx, bcy, bcz)
    pcx, pcy, pcz = pc[0], pc[1], pc[2]
    zsc_c = (1.0 + pcz / 100.0) ** 2 * (p.radius / p.step)  # [nby, nbx]
    px_c = (jnp.arange(nbx, dtype=jnp.float32) * BW + cj)[None, :]
    py_c = (jnp.arange(nby, dtype=jnp.float32) * BH + ci)[:, None]

    d = dirs  # [nd, 4]
    e = lambda a: a[None, None, :]          # [1, 1, nd]
    b = lambda a: a[:, :, None]             # [nby, nbx, 1]
    scx = e(d[:, 0]) * b(tcx) + e(d[:, 1]) * b(bcx) + e(d[:, 2]) * b(ncx)
    scy = e(d[:, 0]) * b(tcy) + e(d[:, 1]) * b(bcy) + e(d[:, 2]) * b(ncy)
    scz = e(d[:, 0]) * b(tcz) + e(d[:, 1]) * b(bcz) + e(d[:, 2]) * b(ncz)

    def rnd(x):
        return jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))

    keys = []
    for j in range(p.start, p.step):
        tc = jnp.float32(j) * b(zsc_c)
        spx = b(pcx) + scx * tc
        spy = b(pcy) + scy * tc
        spz = b(pcz) + scz * tc
        zz = spz + 1e-7
        dxc = rnd(spx / zz * fx + cx) - px_c[..., None]
        dyc = rnd(spy / zz * fy + cy) - py_c[..., None]
        dxi = jnp.clip(dxc, -_KOFF + 1, _KOFF - 1).astype(jnp.int32)
        dyi = jnp.clip(dyc, -_KOFF + 1, _KOFF - 1).astype(jnp.int32)
        keys.append((dyi + _KOFF) * (2 * _KOFF) + (dxi + _KOFF))
    if not keys:  # degenerate start >= step: empty march, table unread
        return jnp.zeros((nby, nbx, dirs.shape[0], 1), jnp.int32)
    return jnp.stack(keys, axis=-1)  # [nby, nbx, nd, nsteps]


def _build_tables(pos_z, rgb, h, w):
    """z table f32 plus the RGB table packed into ONE [1, ht, wt] f32
    word per texel: 11-11-10 fixed point (r:21..31, g:10..20, b:0..9)
    normalised by the image max (returned as `scale`). One slab fetch
    instead of the previous two (bf16-pair + f32 b) — the dominant cost
    of a fetch is the two dynamic rolls on the aligned [SUP_R, 256]
    superset, so fewer slabs is a direct win. Quantisation bounds the
    additive indirect term by ~2.4e-4 * max (r/g) / 4.9e-4 * max (b) per
    texel — ABSOLUTE in the image max: tighter than the previous bf16
    rounding (~0.4% relative) for bounded dynamic range, but on HDR
    direct-light inputs a texel at 0.1% of a 1000x-brighter peak loses
    ~24% of its own value (relative error scales with max/value). The
    indirect term stays bounded by the same absolute ~2.4e-4*max either
    way, which is what quality depends on; tests/test_pallas_gi.py
    bounds the end-to-end error incl. an HDR input case."""
    ht, wt = _table_dims(h, w)
    ztab = jnp.zeros((ht, wt), jnp.float32)
    ztab = jax.lax.dynamic_update_slice(ztab, pos_z, (ROW_M, COL_M))
    if rgb is None:
        rgbtab = jnp.zeros((1, 8, 128), jnp.float32)  # unused placeholder
        scale = jnp.float32(1.0)
    else:
        scale = jnp.maximum(jnp.max(rgb), 1e-8)
        q = jnp.clip(rgb / scale, 0.0, 1.0)
        qr = jnp.round(q[0] * 2047.0).astype(jnp.int32)
        qg = jnp.round(q[1] * 2047.0).astype(jnp.int32)
        qb = jnp.round(q[2] * 1023.0).astype(jnp.int32)
        word = jax.lax.bitcast_convert_type(
            (qr << 21) | (qg << 10) | qb, jnp.float32)
        rgbtab = jnp.zeros((1, ht, wt), jnp.float32)
        rgbtab = jax.lax.dynamic_update_slice(
            rgbtab, word[None], (0, ROW_M, COL_M))
    return ztab, rgbtab, scale


def _unpack_rgb(slab, scale):
    """Inverse of the _build_tables packing: f32 word -> (r, g, b) f32.
    Arithmetic right shifts sign-extend, but the field masks drop the
    extended bits, so plain int32 ops are exact."""
    w_i = jax.lax.bitcast_convert_type(slab, jnp.int32)
    r = ((w_i >> 21) & 2047).astype(jnp.float32) * (scale / 2047.0)
    g = ((w_i >> 10) & 2047).astype(jnp.float32) * (scale / 2047.0)
    b = (w_i & 1023).astype(jnp.float32) * (scale / 1023.0)
    return r, g, b


@functools.partial(jax.jit,
                   static_argnames=("p", "with_rgb", "interpret", "mode"))
def _march_pallas(normal_view, pos, rgb, fx, fy, p: GIParams,
                  with_rgb: bool, interpret: bool, mode: str = "coherent"):
    h, w = pos.shape[1:]
    hp, wp = _round_up(h, BH), _round_up(w, BW)
    tab_np, sum_w, n_total = _direction_table(p)
    if mode == "coherent":
        pad = (-len(tab_np)) % _DIR_UNROLL  # zero-weight fill rows
        if pad:
            fill = np.repeat(np.asarray([[0.0, 0.0, 1.0, 0.0]], np.float32),
                             pad, 0)
            tab_np = np.concatenate([tab_np, fill], 0)
    dirs = jnp.asarray(tab_np)
    nd = dirs.shape[0]

    ztab, rgbtab, rgb_scale = _build_tables(pos[2], rgb, h, w)
    nrm_p = jnp.pad(normal_view, ((0, 0), (0, hp - h), (0, wp - w)))
    pos_p = jnp.pad(pos, ((0, 0), (0, hp - h), (0, wp - w)))
    fxy = jnp.stack([jnp.float32(fx), jnp.float32(fy), rgb_scale])
    grid = (hp // BH, wp // BW)

    # index maps receive (grid indices..., *scalar-prefetch refs)
    full = lambda i, j, *_: (0, 0)
    full3 = lambda i, j, *_: (0, 0, 0)
    blk = lambda i, j, *_: (0, i, j)

    if mode == "coherent":
        kernel = functools.partial(_kernel_coherent, h=h, w=w, p=p,
                                   n_dirs=nd, with_rgb=with_rgb,
                                   ht=ztab.shape[0], wt=ztab.shape[1])
        offs = _centre_offset_table(nrm_p, pos_p, dirs, fx, fy, h, w, p,
                                    grid)
        extra_in = [offs]
        extra_specs = [pl.BlockSpec((1, 1) + offs.shape[2:],
                                    lambda i, j, *_: (i, j, 0, 0))]
    else:
        kernel = functools.partial(_kernel, h=h, w=w, p=p, n_dirs=nd,
                                   with_rgb=with_rgb)
        extra_in = []
        extra_specs = []

    occ, dif = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=extra_specs + [
                pl.BlockSpec(ztab.shape, full),
                pl.BlockSpec(rgbtab.shape, full3),
                pl.BlockSpec((3, BH, BW), blk),
                pl.BlockSpec((3, BH, BW), blk),
            ],
            out_specs=[
                pl.BlockSpec((BH, BW), lambda i, j, *_: (i, j)),
                pl.BlockSpec((3, BH, BW), blk),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((3, hp, wp), jnp.float32),
        ],
        interpret=interpret,
    )(dirs, fxy, *extra_in, ztab, rgbtab, nrm_p, pos_p)
    return occ[:h, :w], dif[:, :h, :w]


def ssao_pallas(normal_view: jnp.ndarray, pos: jnp.ndarray, fx, fy,
                p: GIParams, interpret: bool | None = None,
                mode: str = "coherent") -> jnp.ndarray:
    """Drop-in for screen_space.ssao (same output, no gradients)."""
    sg = jax.lax.stop_gradient
    normal_view, pos = sg(normal_view), sg(pos)
    if interpret is None:
        interpret = _use_interpret()
    occ, _ = _march_pallas(normal_view, pos, None, fx, fy, p,
                           with_rgb=False, interpret=interpret, mode=mode)
    _, sum_w, _ = _direction_table(p)
    if sum_w > 0:
        out = jnp.clip(1.0 - occ / sum_w, 0.0, 1.0)
    else:
        out = jnp.ones_like(occ)
    return sg(out[None])


def ssr_pallas(normal_view: jnp.ndarray, pos: jnp.ndarray, rgb: jnp.ndarray,
               albedo: jnp.ndarray, roughness: jnp.ndarray,
               metallic: jnp.ndarray, f0: jnp.ndarray, fx, fy,
               p: GIParams, interpret: bool | None = None,
               mode: str = "coherent") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in for screen_space.ssr: returns (color, gd) with the
    reference gradient semantics d(color)/d(albedo) = gd."""
    from .screen_space import _tbn, _unit3, fresnel_schlick
    sg = jax.lax.stop_gradient
    normal_view, pos, rgb = sg(normal_view), sg(pos), sg(rgb)
    f0, roughness, metallic = sg(f0), sg(roughness), sg(metallic)
    if interpret is None:
        interpret = _use_interpret()

    nrm = _unit3(normal_view)
    v_dir = _unit3(-pos)
    n_dot_v = jnp.maximum((nrm * v_dir).sum(0, keepdims=True), 1e-7)
    fr = fresnel_schlick(n_dot_v, f0)
    k_d = (1.0 - fr) * (1.0 - metallic)

    _, dif = _march_pallas(normal_view, pos, rgb, fx, fy, p,
                           with_rgb=True, interpret=interpret, mode=mode)
    _, _, n_total = _direction_table(p)
    if n_total > 0:
        gd = math.pi * dif / n_total * k_d
        color = sg(gd) * albedo
    else:
        gd = jnp.full_like(albedo, 1e-7)
        color = jnp.broadcast_to(gd, albedo.shape) + 0.0 * albedo
    return color, sg(gd)

"""Pallas ragged (gaussian, tile) instance expansion.

Replaces the XLA expansion inside `bin_and_sort` (the TPU analog of
`duplicateWithKeys`, rasterizer_impl.cu:70-112). The XLA path costs a
marker scatter + a [cap]-length cumsum + one [cap]-row table gather;
TPU gathers run at ~12 ns/row regardless of row width, which makes that
trio ~16 ms at lego-800 scale. This kernel exploits the structure the
gather cannot: the owning-gaussian index per instance is MONOTONE, so a
block of 128 consecutive instances touches at most 128 consecutive rows
of the per-gaussian table — one contiguous DMA window per block, and the
row selection becomes a one-hot matmul on the MXU.

Key ideas
  * Every gaussian emits max(tiles_touched, 1) instances: culled ones
    contribute a single sentinel-tile "dummy" so consecutive instance
    blocks span <= blocksize table rows (the DMA window bound). Dummies
    sort to the sentinel region with the capacity overflow; tile lists
    and composited images are unchanged.
  * Per 128-instance sub-block: a step matrix S[i, j] = (offs[i] <= j)
    gives the owning row r[j] = sum_i S[i, j] - 1, and the one-hot
    row-select matrix is the difference of adjacent S rows — a single
    [16, 128] @ [128, 128] bf16 MXU matmul selects every per-gaussian
    column for all 128 instances at once.
  * Exactness through bf16: integer columns are pre-split so every
    value is <= 255 (bf16-exact); depth is carried as four 8-bit chunks
    of its f32 bit pattern and reassembled in int32 (bit-exact, so the
    depth sort order matches the CUDA radix-sort semantics,
    rasterizer_impl.cu:609-617). The alpha-cull columns (mean/conic/
    opacity) are bf16 with a conservative threshold slack — the cull
    only ever drops instances whose per-pixel alpha test
    (forward.cu:537-541) would reject them everywhere, so the image is
    bit-identical; borderline instances are kept.
  * Run starts (for the cell index within a rect) come from a log-shift
    max-scan over the lane dimension, with scalar carries across grid
    steps (the sequential TPU grid makes scratch persistent).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import RasterConfig

# Instances per grid step (4 sub-blocks of 128) and DMA window rows.
SUB = 128
SUBS_PER_STEP = 4
STEP = SUB * SUBS_PER_STEP
WROWS = SUB + 8          # window rows: sub spans <= 128 gaussians, +1 for
                         # the S diff, rounded to a sublane multiple
NCOL = 16                # used table columns (see _table_columns)
NCOL_PAD = 128           # stored lane width: Mosaic requires DMA slices
                         # 128-aligned along the minor dimension

# The bf16-rounded cull inputs perturb the closed-form max-alpha by a
# small relative factor; the cull threshold is divided by this slack so
# the cull stays strictly conservative (never drops an instance whose
# true max alpha reaches alpha_min). Validated by
# tests/test_pallas_expand.py against the exact-arithmetic cull.
CULL_SLACK = 1.5


def _rnd_bf16(v: jnp.ndarray) -> jnp.ndarray:
    """Round f32 to the nearest bf16-representable value (stays f32)."""
    return v.astype(jnp.bfloat16).astype(jnp.float32)


def _expand_kernel(gsub_ref, meta_ref, table_ref,
                   tile_ref, depth_ref, gid_ref,
                   bufs, sems, carry,
                   *, num_steps: int, tx_tiles: int, num_tiles: int,
                   tile_w: int, tile_h: int, alpha_min: float):
    k = pl.program_id(0)
    slot = jax.lax.rem(k, 2)

    def start_dmas(sl, kk):
        for s in range(SUBS_PER_STEP):
            g0 = gsub_ref[kk * SUBS_PER_STEP + s]
            pltpu.make_async_copy(
                table_ref.at[pl.ds(g0, WROWS), :],
                bufs.at[sl, s], sems.at[sl, s]).start()

    @pl.when(k == 0)
    def _():
        start_dmas(0, 0)
        carry[0] = -1          # gid carry: no previous instance
        carry[1] = 0           # run-start carry

    @pl.when(k + 1 < num_steps)
    def _():
        start_dmas(jax.lax.rem(k + 1, 2), k + 1)

    total = meta_ref[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, STEP), 1)
    jvec_step = k * STEP + lane                              # [1, STEP]

    sels, rs, g0s = [], [], []
    for s in range(SUBS_PER_STEP):
        pltpu.make_async_copy(table_ref.at[pl.ds(0, WROWS), :],
                              bufs.at[slot, s], sems.at[slot, s]).wait()
        W = bufs[slot, s]                                    # [WROWS, 128]
        g0 = gsub_ref[k * SUBS_PER_STEP + s]
        jbase = (k * SUBS_PER_STEP + s) * SUB
        jv = jbase + jax.lax.broadcasted_iota(jnp.int32, (1, SUB), 1)
        # Step matrix over the 129 offsets bounding this sub-block's
        # gaussians; offsets are exact integers stored in f32.
        offs = W[0:SUB + 1, 0:1]                             # [129, 1]
        S = (offs <= jv.astype(jnp.float32)).astype(jnp.float32)
        r = jnp.sum(S, axis=0, keepdims=True)                # [1, SUB]
        onehot = (S[0:SUB] - S[1:SUB + 1]).astype(jnp.bfloat16)
        # Contract the gaussian-row (sublane) dims of both operands:
        # sel[c, j] = sum_i W[i, c] * onehot[i, j]. Mosaic feeds the MXU
        # in this orientation natively (no explicit transpose).
        sel = jax.lax.dot_general(
            W[0:SUB, 0:NCOL].astype(jnp.bfloat16), onehot,
            (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)              # [16, SUB]
        sels.append(sel)
        rs.append(r)
        g0s.append(jnp.full((1, SUB), g0, jnp.int32))

    sel = jnp.concatenate(sels, axis=1)                      # [16, STEP]
    r = jnp.concatenate(rs, axis=1)                          # [1, STEP]
    gid = (jnp.concatenate(g0s, axis=1) +
           r.astype(jnp.int32) - 1)                          # [1, STEP]

    # Run starts -> cell index within the owning gaussian's rect. The
    # max-scan is over lanes; scalar carries stitch runs across sub-block
    # and grid-step boundaries.
    gid_prev = jnp.where(lane == 0, carry[0],
                         pltpu.roll(gid, 1, axis=1))
    runstart = gid != gid_prev
    startpos = jnp.where(runstart, jvec_step, -1)
    shift = 1
    while shift < STEP:
        rolled = jnp.where(lane >= shift,
                           pltpu.roll(startpos, shift, axis=1), -1)
        startpos = jnp.maximum(startpos, rolled)
        shift *= 2
    jstar = jnp.maximum(startpos, carry[1])
    local = (jvec_step - jstar).astype(jnp.float32)

    carry[0] = gid[0, STEP - 1]
    carry[1] = jstar[0, STEP - 1]

    # Unpack the selected columns (bf16-exact by construction). All
    # per-instance quantities are [1, STEP] lane vectors.
    row = lambda i: sel[i:i + 1]
    rmin_x, rmin_y, rw = row(1), row(2), row(3)
    rw_safe = jnp.maximum(rw, 1.0)
    dy = jnp.floor((local + 0.5) / rw_safe)
    dx = local - dy * rw_safe
    tile_xf = rmin_x + dx
    tile_yf = rmin_y + dy
    tile = (tile_yf * tx_tiles + tile_xf).astype(jnp.int32)

    d0 = row(4).astype(jnp.int32)
    d1 = row(5).astype(jnp.int32)
    d2 = row(6).astype(jnp.int32)
    d3 = row(7).astype(jnp.int32)
    depth_bits = d0 | (d1 << 8) | (d2 << 16) | (d3 << 24)
    depth = jax.lax.bitcast_convert_type(depth_bits, jnp.float32)

    # Conservative per-tile alpha cull (same closed-form face maximisation
    # as the XLA path; inputs bf16-rounded, threshold slacked).
    mx = row(8) + row(9)
    my = row(10) + row(11)
    cxx, cxy, cyy, op = row(12), row(13), row(14), row(15)
    x0 = tile_xf * tile_w
    y0 = tile_yf * tile_h
    a0, a1 = mx - (x0 + tile_w - 1), mx - x0
    b0, b1 = my - (y0 + tile_h - 1), my - y0
    cxx_s = jnp.where(jnp.abs(cxx) > 1e-12, cxx, 1e-12)
    cyy_s = jnp.where(jnp.abs(cyy) > 1e-12, cyy, 1e-12)

    def power(dx_, dy_):
        return -0.5 * (cxx * dx_ * dx_ + cyy * dy_ * dy_) - cxy * dx_ * dy_

    fmax = jnp.maximum(
        jnp.maximum(power(a0, jnp.clip(-cxy * a0 / cyy_s, b0, b1)),
                    power(a1, jnp.clip(-cxy * a1 / cyy_s, b0, b1))),
        jnp.maximum(power(jnp.clip(-cxy * b0 / cxx_s, a0, a1), b0),
                    power(jnp.clip(-cxy * b1 / cxx_s, a0, a1), b1)))
    inside = (a0 <= 0) & (0 <= a1) & (b0 <= 0) & (0 <= b1)
    fmax = jnp.where(inside, 0.0, fmax)
    psd = (cxx > 0) & (cyy > 0) & (cxx * cyy - cxy * cxy > 0)
    keep = ~psd | (op * jnp.exp(fmax) >= alpha_min / CULL_SLACK)

    valid = (jvec_step < total) & (rw >= 1.0) & keep
    tile_ref[...] = jnp.where(valid, tile, num_tiles)
    depth_ref[...] = jnp.where(jvec_step < total, depth, jnp.inf)
    gid_ref[...] = jnp.clip(gid, 0, None)


PACK_ROWS = 8        # [PACK_ROWS, 128] input blocks -> 1024 rows per step


def _pack_rows_kernel(*refs):
    """Transpose-pack L 1-D columns into a row-major [*, 128] table.

    XLA materializes this table at ~15 GB/s (a 16-way transpose-pattern
    fusion plus per-column layout-conversion copies, ~10 ms at lego
    scale); here each step reads L [PACK_ROWS, 128] column blocks and
    writes the [PACK_ROWS*128, 128] row block via 128x small transposes,
    streaming at HBM bandwidth."""
    ins, out_ref = refs[:-1], refs[-1]
    L = len(ins)
    zpad = jnp.zeros((128, NCOL_PAD - L), jnp.float32)
    for i in range(PACK_ROWS):
        blk = jnp.concatenate([r[i:i + 1, :] for r in ins], axis=0)  # [L,128]
        out_ref[i * 128:(i + 1) * 128, :] = jnp.concatenate(
            [jax.lax.transpose(blk, (1, 0)), zpad], axis=1)


def pack_rows(cols, interpret: bool = False) -> jnp.ndarray:
    """cols: L 1-D f32 arrays of equal length n (n % (128*PACK_ROWS) == 0);
    returns the [n, 128] row-major table with table[:, c] == cols[c]."""
    n = cols[0].shape[0]
    blk = n // (128 * PACK_ROWS)
    assert n % (128 * PACK_ROWS) == 0
    ins = [c.reshape(-1, 128) for c in cols]
    spec = pl.BlockSpec((PACK_ROWS, 128), lambda k: (k, 0))
    return pl.pallas_call(
        _pack_rows_kernel,
        out_shape=jax.ShapeDtypeStruct((n, NCOL_PAD), jnp.float32),
        grid=(blk,),
        in_specs=[spec] * len(cols),
        out_specs=pl.BlockSpec((PACK_ROWS * 128, NCOL_PAD),
                               lambda k: (k, 0)),
        interpret=interpret,
    )(*ins)


def _table_columns(pre, counts, offsets, n_tab: int):
    """The 16 per-gaussian table columns as padded 1-D f32 arrays
    (all values bf16-exact; see the kernel unpack for the layout):
    0 offs (1e9 in the padding), 1 rect_min_x, 2 rect_min_y, 3 rect_w
    (0 for non-emitting gaussians), 4-7 depth f32-bit chunks, 8-11
    mean2d hi/lo splits, 12-14 conic, 15 opacity."""
    n = pre.depth.shape[0]
    fl = pre.flat
    pad = lambda v, fill: jnp.concatenate(
        [v, jnp.full((n_tab - n,), fill, jnp.float32)])
    bits = jax.lax.bitcast_convert_type(pre.depth, jnp.int32)
    chunks = [((bits >> (8 * i)) & 0xFF).astype(jnp.float32)
              for i in range(4)]
    mxh = _rnd_bf16(fl.px)
    myh = _rnd_bf16(fl.py)
    rw = jnp.where(counts > 0, fl.rmax_x - fl.rmin_x, 0)
    cols = [
        pad(offsets[:-1].astype(jnp.float32), 1e9),
        pad(fl.rmin_x.astype(jnp.float32), 0),
        pad(fl.rmin_y.astype(jnp.float32), 0),
        pad(rw.astype(jnp.float32), 0),
        *[pad(c, 0) for c in chunks],
        pad(mxh, 0), pad(_rnd_bf16(fl.px - mxh), 0),
        pad(myh, 0), pad(_rnd_bf16(fl.py - myh), 0),
        pad(_rnd_bf16(fl.cxx), 0), pad(_rnd_bf16(fl.cxy), 0),
        pad(_rnd_bf16(fl.cyy), 0), pad(_rnd_bf16(pre.opacity), 0),
    ]
    return cols


@functools.partial(jax.jit, static_argnames=("height", "width", "cfg",
                                             "interpret"))
def expand_pallas(pre, height: int, width: int, cfg: RasterConfig,
                  interpret: bool = False):
    """Returns (tile [cap], depth [cap], gid [cap], offsets [N+1], total).

    tile == num_tiles marks sentinel rows (beyond `total`, dummies of
    culled gaussians, or alpha-culled instances); offsets are the
    per-gaussian instance segment bounds INCLUDING the one-dummy-per-
    culled-gaussian convention (counts' = max(tiles_touched, 1))."""
    ty_tiles, tx_tiles = cfg.grid(height, width)
    num_tiles = ty_tiles * tx_tiles
    cap = cfg.cap_instances
    cap_pad = -(-cap // STEP) * STEP   # kernel granularity; sliced below
    n = pre.depth.shape[0]

    counts = pre.tiles_touched
    counts1 = jnp.maximum(counts, 1)
    cum = jnp.cumsum(counts1)
    offsets = jnp.concatenate([jnp.zeros((1,), cum.dtype), cum])  # [N+1]
    total = cum[-1].astype(jnp.int32)

    n_tab = -(-(n + WROWS) // (128 * PACK_ROWS)) * (128 * PACK_ROWS)
    table = pack_rows(_table_columns(pre, counts, offsets, n_tab),
                      interpret=interpret)                   # [n_tab, 128]

    num_steps = cap_pad // STEP
    probes = jnp.arange(num_steps * SUBS_PER_STEP, dtype=jnp.int32) * SUB
    gsub = (jnp.searchsorted(offsets, probes, side="right") - 1) \
        .astype(jnp.int32)
    gsub = jnp.clip(gsub, 0, n)
    meta = total[None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_steps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, STEP), lambda k, *_: (0, k)),
            pl.BlockSpec((1, STEP), lambda k, *_: (0, k)),
            pl.BlockSpec((1, STEP), lambda k, *_: (0, k)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, SUBS_PER_STEP, WROWS, NCOL_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA((2, SUBS_PER_STEP)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _expand_kernel, num_steps=num_steps, tx_tiles=tx_tiles,
        num_tiles=num_tiles, tile_w=cfg.tile_w, tile_h=cfg.tile_h,
        alpha_min=cfg.alpha_min)
    tile, depth, gid = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((1, cap_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, cap_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, cap_pad), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(gsub, meta, table)
    gid = jnp.minimum(gid[0, :cap], n - 1)
    return tile[0, :cap], depth[0, :cap], gid, offsets.astype(jnp.int32), total

"""Pallas TPU kernels for tile compositing (forward + backward).

The production fast path replacing the jnp `composite` reference
implementation (same semantics, see composite.py): the grid runs one
program per pixel tile, each with its *own* per-tile trip count — unlike
the jnp while_loop, no lock-step waste on the max-populated tile — and
instance attributes stream from HBM as contiguous chunks (the instance
table is pre-gathered into sorted order, so chunk loads are pure DMA,
no gathers inside the kernel).

Per chunk of K instances the kernel computes alpha for all P pixels of
the tile (VPU, [K, P] vectors), resolves the transmittance recurrence
with a Hillis-Steele cumulative product over the K sublanes (log2 K
shifted multiplies via pltpu.roll), and accumulates all CH G-buffer
channels with one [CH, K] x [K, P] MXU matmul.

Instance-table row layout (columns, padded to 32 for tile alignment):
  0:2 means2d | 2:5 conic | 5 opacity | 6:9 color | 9:21 aux features
  (matches composite.py TABLE_DIM = 21; 21:32 zero padding)

Mosaic requires the last two block dims to be (8k, 128k)-aligned, so the
per-tile outputs are packed into one [T, CH_PAD=24, P] tensor:
rows 0:16 = accumulated channels, row 16 = final transmittance.

The backward kernel replays forward (suffix = total - prefix) and writes
per-instance gradient rows [cap, 32] back to HBM at the tile's contiguous
range — each tile owns its rows, so there are no write conflicts and no
atomics anywhere.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .config import RasterConfig
from .composite import NUM_CH, TABLE_DIM, _COUPLED, NORMAL_CH

ROW = 128      # padded instance-row width. Mosaic tiles HBM arrays with
               # 128-lane granularity and rejects narrower DMA slices
               # (tried 32: "Slice shape along dimension 1 must be aligned
               # to tiling (128)"), so the row pad stays at 128.
CH_PAD = 24    # packed output rows: 0:16 accum, 16 final_T,
               # 17:21 peak depth/pos (peak=True only), 21:24 pad
FINAL_T_ROW = NUM_CH
PEAK_ROWS = slice(17, 21)  # argmax-weight depth + view pos (forward.cu:577)


def _cumprod_sublanes(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inclusive cumulative product along axis 0 (K sublanes) via
    Hillis-Steele doubling with pltpu.roll; K must be a power of two."""
    assert (k & (k - 1)) == 0, "chunk must be a power of two"
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    d = 1
    while d < k:
        shifted = pltpu.roll(x, d, 0)
        x = x * jnp.where(row >= d, shifted, 1.0)
        d *= 2
    return x


def _cumsum_sublanes(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Inclusive cumulative sum along axis 0 via Hillis-Steele."""
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    d = 1
    while d < k:
        shifted = pltpu.roll(x, d, 0)
        x = x + jnp.where(row >= d, shifted, 0.0)
        d *= 2
    return x


def _tile_pixels(t, grid_x, cfg: RasterConfig):
    """Pixel coordinates of (global) tile t as (1, P) float rows."""
    trow = t // grid_x
    tcol = t - trow * grid_x
    p = jax.lax.broadcasted_iota(jnp.int32, (1, cfg.pixels_per_tile), 1)
    ly = p // cfg.tile_w
    lx = p - ly * cfg.tile_w
    px = (tcol * cfg.tile_w + lx).astype(jnp.float32)
    py = (trow * cfg.tile_h + ly).astype(jnp.float32)
    return px, py


def _chunk_alpha(inst, valid, px, py, cfg: RasterConfig):
    """inst: [K, ROW] VMEM rows; px/py: (1, P). Returns per-chunk
    (a, pass_mask, G, dx, dy) of shape [K, P] (forward.cu:529-547)."""
    dx = inst[:, 0:1] - px          # [K, P]
    dy = inst[:, 1:2] - py
    cxx, cxy, cyy = inst[:, 2:3], inst[:, 3:4], inst[:, 4:5]
    power = -0.5 * (cxx * dx * dx + cyy * dy * dy) - cxy * dx * dy
    G = jnp.exp(power)
    alpha = jnp.minimum(cfg.alpha_clamp, inst[:, 5:6] * G)
    pass_mask = (power <= 0.0) & (alpha >= cfg.alpha_min) & valid
    a = jnp.where(pass_mask, alpha, 0.0)
    return a, pass_mask, G, dx, dy


def _features_from_rows(inst):
    """[K, ROW] -> [K, CH]: color(3) | ones | aux(12)."""
    ones = jnp.ones_like(inst[:, 0:1])
    return jnp.concatenate([inst[:, 6:9], ones, inst[:, 9:21]], axis=1)


def _coupled_feature(inst, ch):
    """Coupled channel ch of the feature vector: color0..2 then ones."""
    if ch < 3:
        return inst[:, 6 + ch:7 + ch]
    return jnp.ones_like(inst[:, 0:1])


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(tile_start, tile_count, meta_ref, inst_hbm, out_ref,
                inst_vmem, sem, *, cfg: RasterConfig, peak: bool = False):
    t = pl.program_id(0)
    K = cfg.chunk
    P = cfg.pixels_per_tile
    start = tile_start[t]
    count = tile_count[t]
    px, py = _tile_pixels(t + meta_ref[1], meta_ref[0], cfg)
    cap = inst_hbm.shape[0]

    out_ref[0] = jnp.zeros((CH_PAD, P), jnp.float32)
    n_chunks = (count + K - 1) // K
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)

    def dma(c, slot):
        off = jnp.minimum(start + c * K, cap - K)
        return pltpu.make_async_copy(
            inst_hbm.at[pl.ds(off, K)], inst_vmem.at[slot], sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    def body(state):
        c, t_cur, done, max_w, pk = state
        slot = jax.lax.rem(c, 2)
        # Prefetch the next chunk while this one computes.
        @pl.when(c + 1 < n_chunks)
        def _():
            dma(c + 1, 1 - slot).start()
        dma(c, slot).wait()
        inst = inst_vmem[slot]
        valid = (c * K + row_idx) < count
        a, pass_mask, _, _, _ = _chunk_alpha(inst, valid, px, py, cfg)
        cp = _cumprod_sublanes(1.0 - a, K)
        t_incl = t_cur * cp
        # exclusive cumprod: shift down one sublane, top row = 1
        t_prev = t_cur * jnp.where(row_idx == 0, 1.0, pltpu.roll(cp, 1, 0))
        contrib = pass_mask & (t_incl >= cfg.t_min) & ~(done > 0.5)
        w = jnp.where(contrib, a * t_prev, 0.0)          # [K, P]
        f = _features_from_rows(inst)                     # [K, CH]
        out_ref[0, :NUM_CH] += jax.lax.dot_general(
            f, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)          # [CH, P]
        if peak:
            # Argmax-weight ("peak") depth/pos (forward.cu:577-583):
            # CUDA updates on strictly-greater weight in order, so the
            # FIRST chunk max wins ties (inclusive-cumsum == 1 selects the
            # first maximal sublane), then strictly-greater across chunks.
            m = jnp.max(w, axis=0, keepdims=True)               # [1, P]
            is_m = (w == m) & (m > 0.0)
            firsts = is_m & (_cumsum_sublanes(
                is_m.astype(jnp.float32), K) <= 1.0)
            sel = jnp.where(firsts, 1.0, 0.0)                   # [K, P]
            pk_cand = jax.lax.dot_general(
                inst[:, 17:21], sel, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)            # [4, P]
            upd = m > max_w
            pk = jnp.where(upd, pk_cand, pk)
            max_w = jnp.where(upd, m, max_w)
        t_new = jnp.minimum(
            jnp.min(jnp.where(contrib, t_incl, jnp.inf), axis=0,
                    keepdims=True), t_cur)
        done_new = jnp.maximum(
            done, jnp.max(jnp.where(pass_mask & (t_incl < cfg.t_min),
                                    1.0, 0.0), axis=0, keepdims=True))
        return c + 1, t_new, done_new, max_w, pk

    # Early exit when every pixel of the tile is saturated (the CUDA
    # block-wide done vote, forward.cu:506-508).
    def cond(state):
        c, _, done = state[0], state[1], state[2]
        return (c < n_chunks) & (jnp.min(done) < 0.5)

    c_end, t_final, _, _, pk_final = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.ones((1, P), jnp.float32),
         jnp.zeros((1, P), jnp.float32),
         jnp.zeros((1, P), jnp.float32),
         jnp.zeros((4, P), jnp.float32)))
    # Drain the prefetch that an early exit leaves in flight.
    @pl.when(c_end < n_chunks)
    def _():
        dma(c_end, jax.lax.rem(c_end, 2)).wait()
    out_ref[0, FINAL_T_ROW:FINAL_T_ROW + 1] = t_final
    if peak:
        out_ref[0, PEAK_ROWS] = pk_final


@functools.partial(jax.jit, static_argnames=("cfg", "grid", "interpret",
                                             "peak"))
def composite_fwd_pallas(inst_table: jnp.ndarray, tile_start: jnp.ndarray,
                         tile_count: jnp.ndarray, cfg: RasterConfig,
                         grid: Tuple[int, int], interpret: bool = False,
                         tile_base=None, peak: bool = False):
    """inst_table: [cap, ROW] pre-gathered sorted instance rows.
    Returns packed [T, CH_PAD, P] (rows 0:16 accum, 16 final_T; with
    peak=True rows 17:21 carry argmax-weight depth + view pos)."""
    T = tile_start.shape[0]
    P = cfg.pixels_per_tile
    K = cfg.chunk
    if tile_base is None:
        tile_base = jnp.zeros((), jnp.int32)
    meta = jnp.stack([jnp.int32(grid[1]), tile_base.astype(jnp.int32)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, CH_PAD, P), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, K, ROW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, cfg=cfg, peak=peak),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, CH_PAD, P), jnp.float32),
        interpret=interpret,
    )(tile_start, tile_count, meta, inst_table)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_kernel(tile_start, tile_count, meta_ref, inst_hbm, cot_ref,
                fwd_ref, grads_hbm, inst_vmem, grow_vmem, sem_in, sem_out,
                *, cfg: RasterConfig, image_hw: Tuple[int, int]):
    t = pl.program_id(0)
    K = cfg.chunk
    P = cfg.pixels_per_tile
    H, W = image_hw
    start = tile_start[t]
    count = tile_count[t]
    px, py = _tile_pixels(t + meta_ref[1], meta_ref[0], cfg)

    g = cot_ref[0, :NUM_CH]                              # [CH, P]
    # Border-pixel normal-cotangent zeroing (backward.cu:497-501).
    inside = ((px > 0) & (px < W - 1) & (py > 0) & (py < H - 1))
    g = jnp.concatenate([
        g[:NORMAL_CH.start],
        g[NORMAL_CH.start:NORMAL_CH.stop] * inside.astype(jnp.float32),
        g[NORMAL_CH.stop:]], axis=0)
    gt = cot_ref[0, FINAL_T_ROW:FINAL_T_ROW + 1]         # [1, P]
    a_tot = fwd_ref[0, :_COUPLED]                        # [4, P]
    tfin = fwd_ref[0, FINAL_T_ROW:FINAL_T_ROW + 1]       # [1, P]
    gc = g[:_COUPLED]                                    # [4, P]
    # Per-tile constant of the collapsed alpha-gradient (see body):
    # gA[p] = sum_ch g[ch, p] * a_tot[ch, p].
    gA = jnp.sum(gc * a_tot, axis=0, keepdims=True)      # [1, P]

    n_chunks = (count + K - 1) // K
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)

    def dma_in(c, slot):
        off = start + c * K
        return pltpu.make_async_copy(inst_hbm.at[pl.ds(off, K)],
                                     inst_vmem.at[slot], sem_in.at[slot])

    def dma_out(c, slot):
        off = start + c * K
        return pltpu.make_async_copy(grow_vmem.at[slot],
                                     grads_hbm.at[pl.ds(off, K)],
                                     sem_out.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        dma_in(0, 0).start()

    def body(state):
        c, t_cur, done, gprefix = state
        slot = jax.lax.rem(c, 2)
        @pl.when(c + 1 < n_chunks)
        def _():
            dma_in(c + 1, 1 - slot).start()
        dma_in(c, slot).wait()
        inst = inst_vmem[slot]
        valid = (c * K + row_idx) < count
        a, pass_mask, G, dx, dy = _chunk_alpha(inst, valid, px, py, cfg)
        cp = _cumprod_sublanes(1.0 - a, K)
        t_incl = t_cur * cp
        t_prev = t_cur * jnp.where(row_idx == 0, 1.0, pltpu.roll(cp, 1, 0))
        contrib = pass_mask & (t_incl >= cfg.t_min) & ~(done > 0.5)
        w = jnp.where(contrib, a * t_prev, 0.0)          # [K, P]

        # All-channel feature grads: [K, P] x [CH, P]^T -> [K, CH] (MXU).
        dfeat = jax.lax.dot_general(
            w, g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

        # Alpha gradient, all 4 coupled channels collapsed into ONE
        # cumsum: with gF[k,p] = sum_ch F[ch,k] g[ch,p] (an MXU matmul),
        #   d_alpha = sum_ch g_ch (f_ch t_prev - suffix_ch / (1-a))
        #           = t_prev gF - recip (gA - gprefix - cumsum_k(w gF))
        # because the channel sum commutes with the running prefix sum
        # (suffix_ch = a_tot_ch - prefix_incl_ch, backward.cu:570-594).
        F = jnp.concatenate([inst[:, 6:9],
                             jnp.ones((K, 1), jnp.float32)], axis=1)  # [K,4]
        gF = jax.lax.dot_general(
            F, gc, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)         # [K, P]
        wgF = w * gF
        S = gprefix + _cumsum_sublanes(wgF, K)           # [K, P]
        one_minus = jnp.where(contrib, 1.0 - a, 1.0)
        recip = 1.0 / one_minus
        d_alpha = t_prev * gF - recip * (gA - S) - gt * (tfin * recip)
        d_alpha = jnp.where(contrib, d_alpha, 0.0)
        gprefix_new = S[K - 1:K]

        op = inst[:, 5:6]
        d_G = op * d_alpha                    # CUDA quirk: no clamp gating
        h = d_G * G                           # dL/dG * G
        cxx, cxy, cyy = inst[:, 2:3], inst[:, 3:4], inst[:, 4:5]
        d_op = jnp.sum(G * d_alpha, axis=1, keepdims=True)
        # Geometry grads via moments of h: each is a polynomial in
        # (dx, dy) with per-instance coefficients, so sum the monomial
        # moments once and combine scalars outside the reduction.
        hdx = h * dx
        hdy = h * dy
        m1x = jnp.sum(hdx, axis=1, keepdims=True)
        m1y = jnp.sum(hdy, axis=1, keepdims=True)
        m2xx = jnp.sum(hdx * dx, axis=1, keepdims=True)
        m2xy = jnp.sum(hdx * dy, axis=1, keepdims=True)
        m2yy = jnp.sum(hdy * dy, axis=1, keepdims=True)
        d_mx = -(cxx * m1x + cxy * m1y)
        d_my = -(cyy * m1y + cxy * m1x)
        d_cxx = -0.5 * m2xx
        d_cxy = -m2xy
        d_cyy = -0.5 * m2yy

        g_row = jnp.concatenate([
            d_mx, d_my, d_cxx, d_cxy, d_cyy, d_op,
            dfeat[:, 0:3], dfeat[:, 4:16],
            jnp.zeros((K, ROW - TABLE_DIM), jnp.float32)], axis=1)
        g_row = jnp.where(valid, g_row, 0.0)
        # Double-buffered output: wait for the copy issued two chunks ago
        # before overwriting its slot, then fire and forget.
        @pl.when(c >= 2)
        def _():
            dma_out(c - 2, slot).wait()
        grow_vmem[slot] = g_row
        dma_out(c, slot).start()

        t_new = jnp.minimum(
            jnp.min(jnp.where(contrib, t_incl, jnp.inf), axis=0,
                    keepdims=True), t_cur)
        done_new = jnp.maximum(
            done, jnp.max(jnp.where(pass_mask & (t_incl < cfg.t_min),
                                    1.0, 0.0), axis=0, keepdims=True))
        return c + 1, t_new, done_new, gprefix_new

    def cond(state):
        c, _, done = state[0], state[1], state[2]
        return (c < n_chunks) & (jnp.min(done) < 0.5)

    zero = jnp.zeros((1, P), jnp.float32)
    end_state = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.ones((1, P), jnp.float32), zero, zero))
    c_end = end_state[0]

    @pl.when(c_end < n_chunks)
    def _():
        dma_in(c_end, jax.lax.rem(c_end, 2)).wait()

    # Drain the up-to-two gradient-row copies still in flight.
    @pl.when(c_end >= 2)
    def _():
        dma_out(c_end - 2, jax.lax.rem(c_end, 2)).wait()
    @pl.when(c_end >= 1)
    def _():
        dma_out(c_end - 1, jax.lax.rem(c_end - 1, 2)).wait()

    # Early exit skipped the remaining chunks: their instances received no
    # contribution (all pixels saturated), so their gradient rows are
    # zero — but the HBM buffer is uninitialised; zero-fill the tail.
    grow_vmem[0] = jnp.zeros((K, ROW), jnp.float32)

    def zfill(c, _):
        out = pltpu.make_async_copy(
            grow_vmem.at[0], grads_hbm.at[pl.ds(start + c * K, K)],
            sem_out.at[0])
        out.start()
        out.wait()
        return 0

    jax.lax.fori_loop(c_end, n_chunks, zfill, 0)


@functools.partial(jax.jit, static_argnames=("cfg", "grid", "image_hw",
                                             "interpret"))
def composite_bwd_pallas(inst_table, tile_start, tile_count, cot_packed,
                         fwd_packed, cfg: RasterConfig,
                         grid: Tuple[int, int], image_hw: Tuple[int, int],
                         interpret: bool = False, tile_base=None):
    """Per-sorted-instance gradient rows [cap, ROW].

    cot_packed/fwd_packed: [T, CH_PAD, P] cotangents / forward outputs in
    the packed layout. The output buffer has a K-row spill pad (a tile's
    last partial chunk writes K full rows; later tiles rewrite any rows
    spilled into their range — the grid is sequential)."""
    T = tile_start.shape[0]
    P = cfg.pixels_per_tile
    K = cfg.chunk
    cap = inst_table.shape[0]  # already includes the K spill rows
    if tile_base is None:
        tile_base = jnp.zeros((), jnp.int32)
    meta = jnp.stack([jnp.int32(grid[1]), tile_base.astype(jnp.int32)])
    inst_padded = inst_table  # pre-padded by _pack_instances (K spill rows)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, CH_PAD, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH_PAD, P), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, K, ROW), jnp.float32),
            pltpu.VMEM((2, K, ROW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    grads = pl.pallas_call(
        functools.partial(_bwd_kernel, cfg=cfg, image_hw=image_hw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cap, ROW), jnp.float32),
        interpret=interpret,
    )(tile_start, tile_count, meta, inst_padded, cot_packed, fwd_packed)
    return grads[:cap - K]


# ---------------------------------------------------------------------------
# custom_vjp wrapper — drop-in replacement for composite.composite
# ---------------------------------------------------------------------------

def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


def _pack_instances(table, ids, chunk: int):
    """Gather the [N, TABLE_DIM] attribute table into sorted-instance order,
    padded to ROW columns and `chunk` spill rows (so a tile's last partial
    chunk can read/write K full rows without clamping). One gather, no
    second full-size copy."""
    ids_p = jnp.concatenate([ids, jnp.zeros((chunk,), ids.dtype)])
    return jnp.pad(table, ((0, 0), (0, ROW - TABLE_DIM)))[ids_p]


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def composite_pallas(table, ids, tile_start, tile_count, inst_tile, inv_perm,
                     offsets, seg_gaussian, cfg: RasterConfig, grid,
                     image_hw, tile_base=None):
    """Pallas-kernel version of composite.composite (same contract:
    returns (accum [T, CH, P], final_t [T, P]))."""
    inst = _pack_instances(table, ids, cfg.chunk)
    packed = composite_fwd_pallas(inst, tile_start, tile_count, cfg, grid,
                                  interpret=_use_interpret(),
                                  tile_base=tile_base)
    return packed[:, :NUM_CH], packed[:, FINAL_T_ROW]


def _cp_fwd(table, ids, tile_start, tile_count, inst_tile, inv_perm, offsets,
            seg_gaussian, cfg, grid, image_hw, tile_base=None):
    inst = _pack_instances(table, ids, cfg.chunk)
    packed = composite_fwd_pallas(inst, tile_start, tile_count, cfg, grid,
                                  interpret=_use_interpret(),
                                  tile_base=tile_base)
    res = (inst, tile_start, tile_count, inst_tile, inv_perm, offsets,
           seg_gaussian, tile_base, packed)
    return (packed[:, :NUM_CH], packed[:, FINAL_T_ROW]), res


def _cp_bwd(cfg, grid, image_hw, res, cots):
    from .composite import reduce_sorted_instance_grads
    (inst, tile_start, tile_count, inst_tile, inv_perm, offsets,
     seg_gaussian, tile_base, packed) = res
    g_acc, g_t = cots
    T = tile_start.shape[0]
    P = cfg.pixels_per_tile
    cot_packed = jnp.concatenate([
        g_acc, g_t[:, None, :],
        jnp.zeros((T, CH_PAD - NUM_CH - 1, P), jnp.float32)], axis=1)
    rows = composite_bwd_pallas(inst, tile_start, tile_count, cot_packed,
                                packed, cfg, grid, image_hw,
                                interpret=_use_interpret(),
                                tile_base=tile_base)
    # The kernel only writes rows inside each tile's (possibly
    # cap_tile-truncated) range; everything else in the output buffer is
    # uninitialised — mask before reducing. inst_tile holds GLOBAL tile
    # ids; this shard owns [tile_base, tile_base + T).
    cap = inst.shape[0] - cfg.chunk
    s = jnp.arange(cap, dtype=jnp.int32)
    base = 0 if tile_base is None else tile_base
    t_local = inst_tile - base
    t = jnp.clip(t_local, 0, T - 1)
    j = s - tile_start[t]
    written = ((t_local >= 0) & (t_local < T) & (j >= 0) &
               (j < tile_count[t]))
    rows = jnp.where(written[:, None], rows[:, :TABLE_DIM], 0.0)
    d_table = reduce_sorted_instance_grads(rows, inv_perm, offsets,
                                           seg_gaussian)
    return (d_table, None, None, None, None, None, None, None, None)


composite_pallas.defvjp(_cp_fwd, _cp_bwd)

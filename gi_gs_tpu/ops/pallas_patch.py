"""Pallas TPU kernels for the cubemap GGX-prefilter patch convolution.

The prefilter at high-res mip levels is a locally-connected filter with a
static per-(face, offset, texel) weight table W [6, P^2, R, R] built by
cubemap._patch_tables (exact reference weights, cubemap.cu:246-350). The
tables total ~1.3 GB at base 256, so one application is HBM-bound at
~1.7 ms; the jnp fori_loop forms (cubemap._specular_apply_patch/_sap_bwd)
measure 27/144 ms because XLA issues one dependent dynamic-slice load per
offset with no DMA pipelining. These kernels stream W in multi-offset
blocks (double-buffered by the Pallas grid machinery) against a
VMEM-resident halo-padded face and run at the HBM roofline.

Forward:   out[f, c, y, x]      = sum_p W[f, p, y, x] * pad[f, c, y+dy, x+dx]
Backward:  pad_bar[f, c, y+dy, x+dx] += g[f, c, y, x] * W[f, p, y, x]
(p = dy * P + dx; W is a constant table — no gradient.)

The dynamic (dy, dx) window is realised with pltpu.roll on the
sublane/lane axes (Mosaic only allows aligned vector slices); the roll
work is O(face size) per offset, ~3x the multiply-adds — still far under
the DMA bound.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


def _fwd_kernel(w_ref, pad_ref, out_ref, *, R: int, P: int,
                Er: int, Ec: int):
    """Grid step = one dy-row of offsets (W block [1, P, R, R]): dy equals
    the grid index, so ONE dynamic row-roll per step; the P dx offsets
    are STATIC slice starts. Dynamic pltpu.roll lowers to log-stage
    selects (~8 ops/elem — it dominated the first version of this kernel
    at 39 GB/s); static slices are plain shifts."""
    dy = pl.program_id(1)

    @pl.when(dy == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    big = pad_ref[0]                      # [3, Er, Ec]
    rolled = pltpu.roll(big, (Er - dy % Er) % Er, 1)  # rows shifted by dy

    acc = jnp.zeros((3, R, R), jnp.float32)
    for u in range(P):
        win = rolled[:, :R, u:u + R]
        acc = acc + win * w_ref[0, u][None]
    out_ref[...] = out_ref[...] + acc[None]


def _bwd_kernel(w_ref, g_ref, out_ref, *, R: int, P: int,
                Er: int, Ec: int):
    """Transpose of _fwd_kernel with the same static-dx structure: the P
    static-x placements accumulate into a local [3, Er - ?]-wide buffer,
    then one dynamic row-roll lands the whole row block at dy."""
    dy = pl.program_id(1)

    @pl.when(dy == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    g = g_ref[0]                          # [3, R, R]
    acc = jnp.zeros((3, Er, Ec), jnp.float32)
    for u in range(P):
        c = g * w_ref[0, u][None]
        acc = acc + jnp.pad(c, ((0, 0), (0, Er - R), (u, Ec - R - u)))
    # Place the row block at dy: dy <= 2h and R + 2h <= Er, so content
    # never wraps (trailing alignment rows are zero).
    acc = pltpu.roll(acc, dy % Er, 1)
    out_ref[...] = out_ref[...] + acc[None]


def _vmem_limit(R: int, P: int, Er: int, Ec: int) -> int:
    """Scoped-VMEM budget derived from the actual working set: the
    double-buffered W row block (2 x P·R·R), the halo face + output blocks
    (double-buffered), and ~2x for roll temporaries. Clamped to
    [16 MB, 128 MB] so the kernel compiles across TPU generations instead
    of assuming v5e's 128 MB (smaller parts get a truthful request the
    compiler can still reject with a clear OOM)."""
    need = 4 * (2 * P * R * R + 2 * 3 * Er * Ec + 2 * 3 * R * R)
    # 6x headroom: Mosaic's stack accounting adds roll temporaries and
    # alignment padding well beyond the raw buffers (measured 33.3 MB
    # actual vs 11.9 MB raw at R=256/P=15, and 28.8 MB vs 6.9 MB at
    # R=128/P=41 — 2x and 3x factors both failed to compile by <2 MB).
    need = int(need * 6.0)
    return max(16 * 1024 * 1024, min(need, 128 * 1024 * 1024))


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


@functools.partial(jax.jit, static_argnames=("R", "P", "h", "interpret"))
def patch_apply_fwd(W: jnp.ndarray, padded: jnp.ndarray, R: int, P: int,
                    h: int, interpret: bool | None = None) -> jnp.ndarray:
    """W [6, P^2, R, R]; padded [6, 3, E, E] (E = R + 2h) -> [6, 3, R, R]."""
    if interpret is None:
        interpret = _use_interpret()
    E = R + 2 * h
    Er = _round_up(E, 8)
    Ec = _round_up(E, 128)
    pad_in = jnp.pad(padded, ((0, 0), (0, 0), (0, Er - E), (0, Ec - E)))

    kernel = functools.partial(_fwd_kernel, R=R, P=P, Er=Er, Ec=Ec)
    out = pl.pallas_call(
        kernel,
        grid=(6, P),
        in_specs=[
            pl.BlockSpec((1, P, R, R), lambda f, dy: (f, dy, 0, 0)),
            pl.BlockSpec((1, 3, Er, Ec), lambda f, dy: (f, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, R, R), lambda f, dy: (f, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((6, 3, R, R), jnp.float32),
        # At R=256 the double-buffered W row block (2 x 3.9 MB) plus the
        # halo face, output and roll temporaries exceed the default 16 MB
        # scoped-vmem budget; request what the working set actually needs.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(R, P, Er, Ec)),
        interpret=interpret,
    )(W, pad_in)
    return out


@functools.partial(jax.jit, static_argnames=("R", "P", "h", "interpret"))
def patch_apply_bwd(W: jnp.ndarray, g: jnp.ndarray, R: int, P: int,
                    h: int, interpret: bool | None = None) -> jnp.ndarray:
    """Transpose: W [6, P^2, R, R]; g [6, 3, R, R] -> padded_bar
    [6, 3, E, E]."""
    if interpret is None:
        interpret = _use_interpret()
    E = R + 2 * h
    Er = _round_up(E, 8)
    Ec = _round_up(E, 128)

    kernel = functools.partial(_bwd_kernel, R=R, P=P, Er=Er, Ec=Ec)
    out = pl.pallas_call(
        kernel,
        grid=(6, P),
        in_specs=[
            pl.BlockSpec((1, P, R, R), lambda f, dy: (f, dy, 0, 0)),
            pl.BlockSpec((1, 3, R, R), lambda f, dy: (f, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, Er, Ec), lambda f, dy: (f, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((6, 3, Er, Ec), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(R, P, Er, Ec)),
        interpret=interpret,
    )(W, g)
    return out[:, :, :E, :E]

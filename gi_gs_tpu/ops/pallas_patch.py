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


def _block_p(R: int) -> int:
    """Offsets per W block: ~1 MB of W per DMA."""
    return max(1, (1 << 20) // (R * R * 4))


def _fwd_kernel(w_ref, pad_ref, out_ref, *, R: int, P: int, pb: int,
                Er: int, Ec: int):
    pi = pl.program_id(1)

    @pl.when(pi == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    big = pad_ref[0]                      # [3, Er, Ec]

    def body(u, acc):
        p = pi * pb + u
        dy = p // P
        dx = p - dy * P
        rolled = pltpu.roll(big, (Er - dy % Er) % Er, 1)
        rolled = pltpu.roll(rolled, (Ec - dx % Ec) % Ec, 2)
        win = rolled[:, :R, :R]
        return acc + win * w_ref[0, u][None]

    acc = jax.lax.fori_loop(0, pb, body,
                            jnp.zeros((3, R, R), jnp.float32))
    out_ref[...] = out_ref[...] + acc[None]


def _bwd_kernel(w_ref, g_ref, out_ref, *, R: int, P: int, pb: int,
                Er: int, Ec: int):
    pi = pl.program_id(1)

    @pl.when(pi == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    g = g_ref[0]                          # [3, R, R]

    def body(u, acc):
        p = pi * pb + u
        dy = p // P
        dx = p - dy * P
        c = g * w_ref[0, u][None]
        cpad = jnp.pad(c, ((0, 0), (0, Er - R), (0, Ec - R)))
        # Place at (dy, dx): dy, dx <= 2h and R + 2h <= Er/Ec, so the
        # roll never wraps content (zero-weight padding rows may wrap,
        # contributing exact zeros).
        cpad = pltpu.roll(cpad, dy % Er, 1)
        cpad = pltpu.roll(cpad, dx % Ec, 2)
        return acc + cpad

    acc = jax.lax.fori_loop(0, pb, body,
                            jnp.zeros((3, Er, Ec), jnp.float32))
    out_ref[...] = out_ref[...] + acc[None]


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
    pb = _block_p(R)
    n_blocks = -(-P * P // pb)
    Wp = jnp.pad(W, ((0, 0), (0, n_blocks * pb - P * P), (0, 0), (0, 0)))

    kernel = functools.partial(_fwd_kernel, R=R, P=P, pb=pb, Er=Er, Ec=Ec)
    out = pl.pallas_call(
        kernel,
        grid=(6, n_blocks),
        in_specs=[
            pl.BlockSpec((1, pb, R, R), lambda f, p: (f, p, 0, 0)),
            pl.BlockSpec((1, 3, Er, Ec), lambda f, p: (f, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, R, R), lambda f, p: (f, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((6, 3, R, R), jnp.float32),
        interpret=interpret,
    )(Wp, pad_in)
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
    pb = _block_p(R)
    n_blocks = -(-P * P // pb)
    Wp = jnp.pad(W, ((0, 0), (0, n_blocks * pb - P * P), (0, 0), (0, 0)))

    kernel = functools.partial(_bwd_kernel, R=R, P=P, pb=pb, Er=Er, Ec=Ec)
    out = pl.pallas_call(
        kernel,
        grid=(6, n_blocks),
        in_specs=[
            pl.BlockSpec((1, pb, R, R), lambda f, p: (f, p, 0, 0)),
            pl.BlockSpec((1, 3, R, R), lambda f, p: (f, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 3, Er, Ec), lambda f, p: (f, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((6, 3, Er, Ec), jnp.float32),
        interpret=interpret,
    )(Wp, g)
    return out[:, :, :E, :E]

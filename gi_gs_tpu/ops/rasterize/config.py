"""Static configuration for the TPU rasterizer.

All sizes here are compile-time constants: the TPU pipeline replaces the
reference's dynamic buffer sizing (the `num_rendered` device->host sync at
rasterizer_impl.cu:589) with fixed capacities + overflow counters.
"""
from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    """Rasterizer compile-time parameters.

    tile_h x tile_w: pixel tile shape — tile_h * tile_w must be a
    multiple of 128 (the f32 lane count). The CUDA reference uses 16x16
    threads (config.h:15-17); on TPU (16, 64) measured fastest at lego
    scale: small tiles waste less splat-pixel compute (a median splat
    covers ~3 px), big tiles shrink the (gaussian, tile) instance list
    (sort/pack/reduce traffic); v5e measurements put the optimum
    between (16, 64) and (16, 32). (16, 128) with chunk 64 exceeds the
    16 MB VMEM budget in the backward kernel.

    cap_instances: capacity of the (gaussian, tile) instance list — the
    analog of the CUDA `num_rendered` buffer, statically sized.
    cap_tile: max instances composited per tile (front-to-back order;
    instances beyond this are dropped — they are the most occluded ones).
    chunk: instances processed per compositing step; the weighted
    accumulation of a chunk is a [F, chunk] @ [chunk, P] matmul on the
    MXU, and each chunk step costs one HBM->VMEM DMA round — large
    chunks amortize the per-step latency (the forward is latency-bound).
    """
    tile_h: int = 16
    tile_w: int = 64
    cap_instances: int = 1 << 21
    cap_tile: int = 4096
    chunk: int = 64
    # Pallas kernel path for the compositing fwd/bwd (interpret mode is
    # selected automatically on CPU). The jnp path remains the oracle.
    use_pallas: bool = True
    # Instance-expansion backend for bin_and_sort: "pallas" (monotone-
    # window DMA + one-hot MXU select, pallas_expand.py) or "xla"
    # (marker scatter + cumsum + row gather — the exact-arithmetic
    # oracle). Both produce identical composited images; the pallas
    # alpha-cull is conservatively slacked for its bf16 inputs.
    expand_backend: str = "pallas"

    # Frustum / numeric constants (cuda_rasterizer semantics)
    near: float = 0.2            # auxiliary.h:166
    lowpass: float = 0.3         # forward.cu:119-120
    alpha_clamp: float = 0.99    # forward.cu:369
    alpha_min: float = 1.0 / 255.0
    t_min: float = 1e-4          # forward.cu:374

    def grid(self, height: int, width: int) -> tuple[int, int]:
        ty = -(-height // self.tile_h)
        tx = -(-width // self.tile_w)
        return ty, tx

    @property
    def pixels_per_tile(self) -> int:
        return self.tile_h * self.tile_w

    @property
    def chunks_per_tile(self) -> int:
        return self.cap_tile // self.chunk

"""gi_gs_tpu — a TPU-native inverse-rendering framework on 3D Gaussian Splatting.

A ground-up JAX/XLA/Pallas re-design of the capabilities of GI-GS
(Global Illumination decomposition on Gaussian Splatting, ICLR 2025):

* differentiable tile-binned Gaussian splatting emitting a full G-buffer
  (color, opacity, depth, world/view normals, view-space position, albedo,
  roughness, metallic),
* deferred split-sum PBR shading against a learnable cubemap environment
  light with diffuse/GGX prefiltered mips,
* screen-space ambient occlusion and one-bounce indirect diffuse (SSR),
* two-phase training with densification, checkpointing and evaluation
  (novel-view synthesis, albedo, normal MAE, relighting).

Design stance (TPU-first, not a port):
* static shapes everywhere: Gaussian arrays are capacity-padded with alive
  masks instead of reallocating (ref densify reallocates tensors),
* sort + segment-reduce instead of atomics (TPU has no scatter-atomics),
* compositing expressed as chunked cumulative products + matmul
  accumulation so the MXU does the heavy lifting,
* `shard_map` over a device mesh for scale-out (tiles sharded across
  chips, parameter grads psum-reduced over ICI).
"""

__version__ = "0.1.0"

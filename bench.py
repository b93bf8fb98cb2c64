#!/usr/bin/env python
"""Benchmark: train-step throughput at the lego config scale (800x800,
~200k Gaussians) on the available accelerator.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N,
   "extra": {...}}

The primary metric is the phase-1 (photometric) step, compared against a
nominal 7 train-iters/s for the reference CUDA implementation on a
datacenter GPU at this configuration (the reference publishes no
numbers, BASELINE.md; typical 3DGS-with-G-buffer throughput). `extra`
carries:
  * phase2_iters_per_s — the FULL pipeline step (deferred PBR + SSAO +
    SSR --indirect at the reference defaults delta=0.0625/step=16/
    start=8, the paper's headline configuration),
  * a per-stage timing/roofline table (ms, of_roofline where a
    bytes/flops estimate is meaningful, rays/s, splats/s),
  * on-TPU parity checks of the Pallas kernels vs their jnp oracles.
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

_T0 = time.time()


def _log(msg: str) -> None:
    print(f"[bench +{time.time() - _T0:6.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: the bench compiles ~10 programs
    (both phase steps + the stage table); cold that is >10 min wall,
    cached it is seconds. The cache key covers HLO + compile flags +
    runtime version, so entries invalidate themselves when the code or
    toolchain changes."""
    import jax
    cache_dir = os.environ.get(
        "GI_GS_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     ".jax_cache"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


H = W = 800
N = 200_000
CAP = 1 << 18
PEAK_BW = 800e9          # v5e HBM
PEAK_VPU = 0.94e9 * 8 * 128 * 2  # f32 FMA lanes


def build_scene():
    import jax.numpy as jnp
    from gi_gs_tpu.config import (Config, ModelConfig, OptimizationConfig,
                                  TrainConfig)
    from gi_gs_tpu.models.gaussians import create_from_points
    from gi_gs_tpu.ops.rasterize import RasterConfig
    from gi_gs_tpu.ops.screen_space import GIParams
    from gi_gs_tpu.scene.cameras import make_camera
    from gi_gs_tpu.train import trainer

    rng = np.random.RandomState(0)
    pts = rng.uniform(-1.0, 1.0, (N, 3)).astype(np.float32)
    pts[:, 2] = pts[:, 2] * 0.8 + 3.0
    colors = rng.uniform(0.0, 1.0, (N, 3)).astype(np.float32)
    params = create_from_points(pts, colors, capacity=CAP)

    cfg = Config()
    cfg.model = ModelConfig(capacity=CAP)
    cfg.opt = OptimizationConfig(densify_from_iter=10**9)
    cfg.train = TrainConfig(indirect=True)
    cfg.raster = RasterConfig()
    cfg.gi = GIParams()  # reference GI defaults, pallas coherent backend

    cam = make_camera(R=np.eye(3), T=np.zeros(3), fovx=0.8, fovy=0.8,
                      width=W, height=H)
    cap_i = trainer.probe_cap_instances(cfg, params, [cam])
    cfg.raster = dataclasses.replace(cfg.raster, cap_instances=cap_i)
    image = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    alpha = jnp.ones((1, H, W), jnp.float32)
    bg = jnp.zeros(3)
    return cfg, params, cam, image, alpha, bg, rng


def time_steps(step, state, cam, image, alpha, bg, iters=10):
    import jax.numpy as jnp
    state, aux = step(state, cam, image, alpha, bg, jnp.int32(1))
    _ = float(aux.loss)  # fence (block_until_ready unreliable on axon)
    t0 = time.perf_counter()
    for i in range(iters):
        state, aux = step(state, cam, image, alpha, bg, jnp.int32(2 + i))
    loss = float(aux.loss)
    dt = (time.perf_counter() - t0) / iters
    return dt, loss


def stage_table(cfg, params, cam, rng, out_of_time=lambda: False):
    """Per-stage timings with coarse roofline estimates. `out_of_time`
    is consulted between stages; once true, remaining stages are skipped
    (reported with ms = -1) so the bench always lands inside the driver
    budget."""
    import jax
    import jax.numpy as jnp
    from gi_gs_tpu.ops.rasterize.preprocess import preprocess
    from gi_gs_tpu.ops.rasterize.binning import bin_and_sort
    from gi_gs_tpu.ops.rasterize.pallas_composite import (_pack_instances,
                                                          composite_pallas)
    from gi_gs_tpu.ops import pallas_gi
    from gi_gs_tpu.models.light import build_mips_packed, build_prefilter_tables
    from gi_gs_tpu.ops.shading import pbr_shading, get_brdf_lut
    from gi_gs_tpu.utils.profiling import StageTimes

    rc = cfg.raster
    grid = rc.grid(H, W)
    p = params
    cov3d = jax.jit(lambda q: q.get_covariance(1.0))(p)
    opacity = jax.jit(lambda q: q.get_opacity())(p)

    st = StageTimes()
    skipped = []

    def measure(name, fn, *args):
        if out_of_time():
            skipped.append(name)
            return None
        out = st.measure(name, fn, *args)
        _log(f"stage {name}: {st.times[name] * 1e3:.1f} ms")
        return out

    pre_f = jax.jit(lambda m, c, o: preprocess(
        m, c, cam.w2c, cam.full_proj, cam.tanfovx, cam.tanfovy, W, H, rc,
        opacity=o))
    pre = measure("preprocess", pre_f, p.xyz, cov3d, opacity)
    b = None
    if pre is not None:
        bin_f = jax.jit(lambda pr: bin_and_sort(pr, H, W, rc))
        b = measure("binning", bin_f, pre)
    n_inst = int(np.asarray(b.tile_count).sum()) if b is not None else 0

    if b is not None:
        zeros3 = jnp.zeros((CAP, 3))
        zeros1 = jnp.zeros((CAP, 1))
        table = jnp.concatenate([
            pre.means2d, pre.conic, opacity, zeros3 + 0.5, zeros3, zeros3,
            zeros1, zeros1, pre.depth[:, None], pre.pos_view], axis=1)

        comp = jax.jit(lambda t: composite_pallas(
            t, b.ids, b.tile_start, b.tile_count, b.inst_tile, b.inv_perm,
            b.offsets, b.seg_gaussian, rc, grid, (H, W)))
        measure("composite_fwd", comp, table)

        def comp_loss(t):
            acc, ft = composite_pallas(
                t, b.ids, b.tile_start, b.tile_count, b.inst_tile, b.inv_perm,
                b.offsets, b.seg_gaussian, rc, grid, (H, W))
            return (acc ** 2).sum() + (ft ** 2).sum()
        measure("composite_fwd_bwd", jax.jit(jax.grad(comp_loss)), table)
    else:
        skipped += ["composite_fwd", "composite_fwd_bwd"]

    # screen-space GI at reference defaults (coherent kernel)
    nv = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    dp = jnp.asarray((rng.rand(3, H, W) * 2 + 1).astype(np.float32))
    rgb = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    gi = cfg.gi
    measure("ssao", jax.jit(lambda a, b_: pallas_gi.ssao_pallas(
        a, b_, cam.fx, cam.fy, gi)), nv, dp)
    alb = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
    r1 = jnp.asarray(rng.rand(1, H, W).astype(np.float32))
    f0 = jnp.asarray(rng.rand(3, H, W).astype(np.float32) * 0.2)
    measure("ssr", jax.jit(lambda *a: pallas_gi.ssr_pallas(
        *a, cam.fx, cam.fy, gi)), nv, dp, rgb, alb, r1, r1, f0)

    # PBR stack
    R = cfg.train.light_base_res
    spec, arrays = build_prefilter_tables(R)
    base = jnp.asarray(rng.rand(6, R, R, 3).astype(np.float32))
    light = measure("build_mips", jax.jit(
        lambda bb, t: build_mips_packed(bb, spec, t)), base, arrays)
    if light is not None:
        brdf = get_brdf_lut()
        nrm_hw = jnp.asarray(rng.randn(H, W, 3).astype(np.float32))
        nrm_hw = nrm_hw / jnp.linalg.norm(nrm_hw, axis=-1, keepdims=True)
        alb_hw = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
        rough_hw = jnp.asarray(rng.rand(H, W, 1).astype(np.float32))
        mask = jnp.ones((H, W, 1), bool)
        occ1 = jnp.ones((H, W, 1), jnp.float32)
        measure("pbr_shading", jax.jit(lambda l, a_, r_: pbr_shading(
            light=l, normals=nrm_hw, view_dirs=nrm_hw, albedo=a_, roughness=r_,
            mask=mask, brdf_lut=brdf, tone=False, gamma=False, occlusion=occ1,
            metallic=None)), light, alb_hw, rough_hw)
    else:
        skipped.append("pbr_shading")

    # work estimates (coarse, documented): bytes dominate everywhere
    px_per_tile = rc.pixels_per_tile
    pairs = n_inst * px_per_tile
    cap_i = rc.cap_instances
    from gi_gs_tpu.ops.pallas_gi import _direction_table
    nd = len(_direction_table(gi)[0])
    n_samples = H * W * nd * (gi.step - gi.start)
    work = {
        "preprocess": {"flops": CAP * 250, "bytes": CAP * 4 * 60},
        "binning": {"bytes": cap_i * 4 * 4 * 2 * 8},   # ~8 sort passes
        "composite_fwd": {"flops": pairs * 72, "bytes": n_inst * 128 * 4},
        "composite_fwd_bwd": {"flops": pairs * 200,
                              "bytes": n_inst * 128 * 4 * 3},
        "ssao": {"flops": n_samples * 14,
                 "bytes": n_samples / 1024 * 16 * 256 * 4},
        "ssr": {"flops": n_samples * 20,
                "bytes": n_samples / 1024 * 3 * 16 * 256 * 4},
        "build_mips": {"bytes": int(sum(a.nbytes for a in arrays))},
        "pbr_shading": {"bytes": H * W * 4 * 40},
    }
    table_out = st.report(work, peak_flops=PEAK_VPU, peak_bw=PEAK_BW)
    for k in table_out:
        table_out[k] = {kk: round(vv, 3) for kk, vv in table_out[k].items()}
    for k in skipped:
        table_out[k] = {"ms": -1.0, "skipped_for_budget": True}
    return table_out, n_inst


def tpu_parity(cfg, rng):
    """On-device Pallas-vs-oracle checks (VMEM/Mosaic numerics are not
    covered by the CPU interpret-mode CI tests)."""
    import jax.numpy as jnp
    from gi_gs_tpu.ops import pallas_gi, screen_space
    from gi_gs_tpu.ops.screen_space import GIParams
    gi = GIParams(delta=0.25, step=4, start=2, backend="jnp")
    h, w = 16, 144
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    z = 2.5 + 0.4 * np.sin(xs / 11.0) + 0.3 * np.cos(ys / 7.0)
    fx = fy = 0.9 * w
    pos = np.stack([(xs - w / 2) / fx * z, (ys - h / 2) / fy * z, z], 0)
    n = rng.randn(3, h, w).astype(np.float32)
    n /= np.linalg.norm(n, axis=0, keepdims=True)
    n, pos = jnp.asarray(n), jnp.asarray(pos.astype(np.float32))
    ref = screen_space.ssao(n, pos, fx, fy, gi)
    out = pallas_gi.ssao_pallas(n, pos, fx, fy, gi, mode="exact")
    return {"ssao_exact_vs_oracle_maxdiff":
            float(np.abs(np.asarray(out) - np.asarray(ref)).max())}


def main():
    _enable_compile_cache()
    import concurrent.futures as cf

    import jax
    import jax.numpy as jnp
    from gi_gs_tpu.train import trainer
    from gi_gs_tpu.train.optim import build_optimizer, build_light_optimizer

    # Wall-clock budget: optional sections (stage table, parity) are
    # skipped once their share is spent so the driver always records a
    # result. Remote-compile latency on the tunneled backend is highly
    # variable, so nothing optional is allowed to starve the phase steps.
    budget = float(os.environ.get("GI_GS_BENCH_BUDGET", "540"))

    def spent_over(frac: float) -> bool:
        return (time.time() - _T0) > budget * frac

    _log(f"devices: {jax.devices()}")
    cfg, params, cam, image, alpha, bg, rng = build_scene()
    _log("scene built")
    state = trainer.make_train_state(cfg, params, spatial_lr_scale=1.0)
    tx = build_optimizer(cfg.opt, 1.0)
    ltx = build_light_optimizer(cfg.opt)

    # The phase steps are the two monster compiles: lower + compile them
    # in background threads (the remote compile service handles programs
    # concurrently) while the stage table / parity checks run on-device.
    step1 = trainer.make_phase1_step(cfg, cameras_extent=3.0, tx=tx)
    step2 = trainer.make_phase2_step(cfg, cameras_extent=3.0, tx=tx, ltx=ltx)
    args1 = (state, cam, image, alpha, bg, jnp.int32(1))
    args2 = args1 + (step2.light_arrays,)
    pool = cf.ThreadPoolExecutor(2)
    fut1 = pool.submit(lambda: step1.lower(*args1).compile())
    fut2 = pool.submit(lambda: step2.jitted.lower(*args2).compile())

    # Stage table + parity run BEFORE the phase steps execute: the phase
    # steps donate their input state (trainer.py donate_argnums=(0,)),
    # and `params` aliases the buffers inside it — using them after a
    # donating call raises "Array has been deleted" (the round-2
    # driver-bench failure).
    stages, n_inst = stage_table(cfg, params, cam, rng,
                                 out_of_time=lambda: spent_over(0.55))
    _log("stage table done")
    if spent_over(0.8):
        parity = {"skipped_for_budget": True}
    else:
        parity = tpu_parity(cfg, rng)
    _log("tpu parity done")

    compiled1 = fut1.result()
    _log("phase1 compiled")
    compiled2 = fut2.result()
    _log("phase2 compiled")
    pool.shutdown()

    dt1, loss1 = time_steps(compiled1, jax.tree.map(jnp.copy, state),
                            cam, image, alpha, bg)
    _log(f"phase1 {1.0 / dt1:.2f} it/s")

    def step2_run(st, *a):
        return compiled2(st, *a, step2.light_arrays)

    dt2, loss2 = time_steps(step2_run, state, cam, image, alpha, bg, iters=5)
    _log(f"phase2 {1.0 / dt2:.2f} it/s")

    gi_ms = (stages.get("ssao", {}).get("ms", 0.0) +
             stages.get("ssr", {}).get("ms", 0.0))
    result = {
        "metric": "train_iters_per_s_lego800_fwd_bwd",
        "value": round(1.0 / dt1, 4),
        "unit": "iter/s",
        "vs_baseline": round(1.0 / dt1 / 7.0, 4),
        "extra": {
            "phase2_iters_per_s": round(1.0 / dt2, 4),
            "phase2_gi_fraction": round(max(gi_ms, 0.0) / 1e3 / dt2, 3),
            "rays_per_s": round(H * W / dt1, 1),
            "splats_per_s": round(n_inst / dt1, 1),
            "n_gaussians": N,
            "n_instances": n_inst,
            "resolution": [H, W],
            "device": str(jax.devices()[0]),
            "loss_finite": bool(np.isfinite(loss1) and np.isfinite(loss2)),
            "stages": stages,
            "tpu_parity": parity,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

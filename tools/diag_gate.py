"""Bisect the phase-1 quality-gate regression (VERDICT r3 item 1).

Variants (same scene/views/losses as tools/quality_gate.py):
  nodens   — densification and opacity reset disabled: pure optimization
             from the degraded init. Isolates the optimizer/losses.
  dens     — densification ON, opacity reset OFF.
  full     — densification + opacity resets (the gate's real schedule).
  nonormal — like nodens but photometric loss only.

Each prints held-out PSNR + densify-pressure stats (ratio of alive points
whose mean NDC grad exceeds the 0.0002 threshold) every 500 iters.

Run: python tools/diag_gate.py [variant ...] [--iters N]
"""
import dataclasses
import sys
import time

import numpy as np

sys.path.insert(0, ".")

_T0 = time.time()


def log(m):
    print(f"[diag +{time.time() - _T0:6.1f}s] {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from gi_gs_tpu.models.gaussians import create_from_points
    from gi_gs_tpu.renderer import render
    from gi_gs_tpu.train import trainer
    from gi_gs_tpu.train.optim import build_optimizer
    from gi_gs_tpu.ops.rasterize.pipeline import bucket_cap_instances
    from tools.quality_gate import (_build_cfg, _psnr, _split_ring,
                                    make_gt_scene, ring_cameras)

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    iters = 3000
    for a in sys.argv[1:]:
        if a.startswith("--iters"):
            iters = int(a.split("=")[1])
    variants = args or ["nodens", "dens", "full", "nonormal"]

    size, capacity = 128, 1 << 17
    n_train, n_test = 64, 8
    cfg0 = _build_cfg(size, capacity, 64)
    gt = make_gt_scene(n=800, seed=0, capacity=capacity)
    train_cams, test_cams = _split_ring(ring_cameras(n_train + n_test, size),
                                        n_test)
    bg = jnp.zeros(3)

    render_fn = jax.jit(lambda p, c, cap_i: None)  # placeholder

    def make_render(cfg):
        return jax.jit(lambda p, c: jnp.clip(render(
            c, p, bg, cfg.raster, cfg.gi, derive_normal=False,
            compute_occlusion=False)["render"], 0.0, 1.0))

    cap_i = trainer.probe_cap_instances(cfg0, gt, train_cams)
    cfg0.raster = dataclasses.replace(cfg0.raster, cap_instances=cap_i)
    rf = make_render(cfg0)
    gt_train = [rf(gt, c) for c in train_cams]
    gt_test = [rf(gt, c) for c in test_cams]
    log(f"GT rendered ({n_train}+{n_test} @ {size}px)")

    rng0 = np.random.RandomState(1)
    pts0 = np.asarray(gt.xyz[:800])
    keep = rng0.rand(800) < 0.6
    pts = pts0[keep] + rng0.normal(scale=0.04, size=(keep.sum(), 3)) \
        .astype(np.float32)
    cols = np.full((len(pts), 3), 0.5, np.float32)

    def run(variant):
        import copy
        cfg = copy.deepcopy(cfg0)
        if variant in ("nodens", "nonormal"):
            cfg.opt = dataclasses.replace(cfg.opt, densify_from_iter=10**9)
        if variant in ("nodens", "dens", "nonormal"):
            cfg.opt = dataclasses.replace(cfg.opt,
                                          opacity_reset_interval=10**9)
        if variant == "nonormal":
            cfg.train = dataclasses.replace(
                cfg.train, normal_tv_weight=0.0)

        params = create_from_points(pts, cols, capacity=capacity)
        state = trainer.make_train_state(cfg, params, spatial_lr_scale=1.0)
        tx = build_optimizer(cfg.opt, 1.0)

        normal_w = 0.0 if variant == "nonormal" else 1.0
        # monkey-patchable normal weight: reuse phase1 but via losses scale
        step = trainer.make_phase1_step(cfg, cameras_extent=1.5, tx=tx,
                                        normal_weight=normal_w)
        alphas = jnp.ones((1, size, size), jnp.float32)
        rng = np.random.RandomState(2)
        order = []
        for it in range(1, iters + 1):
            if it % 1000 == 0:
                state = state._replace(
                    params=state.params.one_up_sh_degree())
            if not order:
                order = list(rng.permutation(len(train_cams)))
            vi = int(order.pop())
            state, aux = step(state, train_cams[vi], gt_train[vi], alphas,
                              bg, jnp.int32(it))
            if it % 100 == 0:
                ovf = int(aux.overflow)
                if ovf > 0:
                    cfg.raster = dataclasses.replace(
                        cfg.raster, cap_instances=bucket_cap_instances(
                            cfg.raster.cap_instances + ovf, headroom=1.3))
                    step = trainer.make_phase1_step(
                        cfg, cameras_extent=1.5, tx=tx,
                        normal_weight=normal_w)
                mtc = int(aux.max_tile_count)
                if mtc > cfg.raster.cap_tile:
                    ch = cfg.raster.chunk
                    cfg.raster = dataclasses.replace(
                        cfg.raster,
                        cap_tile=-(-int(mtc * 1.3) // ch) * ch)
                    step = trainer.make_phase1_step(
                        cfg, cameras_extent=1.5, tx=tx,
                        normal_weight=normal_w)
            if it % 500 == 0 or it == 1:
                g = np.asarray(state.stats.accum / np.maximum(
                    np.asarray(state.stats.denom), 1))[:, 0]
                alive = np.asarray(state.params.alive)
                ratio = float((g[alive] >= cfg.opt.densify_grad_threshold)
                              .mean()) if alive.any() else 0.0
                rf2 = make_render(cfg)
                tp = float(np.mean([_psnr(rf2(state.params, c), g2)
                                    for c, g2 in zip(test_cams, gt_test)]))
                log(f"{variant} it {it}: loss {float(aux.loss):.4f} "
                    f"l1 {float(aux.l1):.4f} "
                    f"nl {float(aux.normal_loss):.4f} "
                    f"TEST {tp:.2f} alive {int(alive.sum())} "
                    f"grad_ratio {ratio:.3f}")
        return tp

    results = {}
    for v in variants:
        log(f"=== variant {v} ===")
        results[v] = run(v)
    log(f"RESULTS: {results}")


if __name__ == "__main__":
    main()

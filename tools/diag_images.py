"""Where does the phase-1 gate error live? Runs a short cap15-style fit,
then splits per-test-view squared error into regions: object interior
(GT opacity ~1, eroded), silhouette band (dilated edge), background.
Also dumps the worst view's render/GT/err as .npz for inspection.

Run: python tools/diag_images.py [iters]
"""
import sys
import dataclasses
import json
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tools.quality_gate import (make_gt_scene, ring_cameras, _build_cfg,
                                    _split_ring)
    from gi_gs_tpu.renderer import render
    from gi_gs_tpu.train import trainer
    from gi_gs_tpu.train.optim import build_optimizer
    from gi_gs_tpu.models.gaussians import create_from_points
    from gi_gs_tpu.ops.rasterize.pipeline import bucket_cap_instances

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    size, capacity, max_capacity = 128, 16384, 1 << 15
    t0 = time.time()

    def log(m):
        print(f"[diagimg +{time.time() - t0:6.1f}s] {m}", flush=True)

    cfg = _build_cfg(size, capacity, 64, white_background=True)
    cfg.opt = dataclasses.replace(cfg.opt, densify_until_iter=iters // 2)
    gt = make_gt_scene(n=800, seed=0, capacity=capacity)
    train_cams, test_cams = _split_ring(ring_cameras(136, size), 8)
    bg = jnp.ones(3)

    cap_i = trainer.probe_cap_instances(cfg, gt, train_cams)
    cfg.raster = dataclasses.replace(cfg.raster, cap_instances=cap_i)

    def make_rf():
        return jax.jit(lambda p, c: render(
            c, p, bg, cfg.raster, cfg.gi, derive_normal=False,
            compute_occlusion=False))

    rf = make_rf()
    gt_res = [rf(gt, c) for c in train_cams]
    gt_train = [jnp.clip(r["render"], 0, 1) for r in gt_res]
    gt_test_res = [rf(gt, c) for c in test_cams]
    gt_test = [np.asarray(jnp.clip(r["render"], 0, 1)) for r in gt_test_res]
    gt_op = [np.asarray(r["opacity_map"][0]) for r in gt_test_res]
    log("GT rendered")

    rng = np.random.RandomState(1)
    pts = (rng.random((10_000, 3)).astype(np.float32) * 2.6 - 1.3)
    cols = rng.random((10_000, 3)).astype(np.float32)
    params = create_from_points(pts, cols, capacity=capacity)
    du = iters // 2
    lr_fn = lambda s: jnp.where(s <= du, 1.0, 0.3)
    tx = build_optimizer(cfg.opt, 1.0, lr_scale_fn=lr_fn)
    state = trainer.make_train_state(cfg, params, spatial_lr_scale=1.0,
                                     tx=tx)
    step = trainer.make_phase1_step(cfg, cameras_extent=1.5, tx=tx)
    alphas = jnp.ones((1, size, size), jnp.float32)
    order = []
    for it in range(1, iters + 1):
        if it % 1000 == 0:
            state = state._replace(params=state.params.one_up_sh_degree())
        if not order:
            order = list(rng.permutation(len(train_cams)))
        vi = int(order.pop())
        state, aux = step(state, train_cams[vi], gt_train[vi], alphas, bg,
                          jnp.int32(it))
        if it % 100 == 0 or it == 1:
            changed = False
            if int(aux.overflow) > 0:
                cfg.raster = dataclasses.replace(
                    cfg.raster, cap_instances=bucket_cap_instances(
                        cfg.raster.cap_instances + int(aux.overflow),
                        headroom=1.3))
                changed = True
            mtc = int(aux.max_tile_count)
            if mtc > cfg.raster.cap_tile:
                ch = cfg.raster.chunk
                cfg.raster = dataclasses.replace(
                    cfg.raster, cap_tile=-(-int(mtc * 1.3) // ch) * ch)
                changed = True
            if changed:
                step = trainer.make_phase1_step(cfg, cameras_extent=1.5,
                                                tx=tx)
                rf = make_rf()
            alive = int(np.asarray(state.params.alive.sum()))
            dropped = int(aux.densify_dropped)
            cap = state.params.capacity
            if (dropped > 0 or alive > 0.92 * cap) and \
                    it < cfg.opt.densify_until_iter and cap < max_capacity:
                state = trainer.grow_state(state, min(cap * 2, max_capacity))
                log(f"it {it}: capacity {cap} -> {state.params.capacity}")
        if it % 1000 == 0:
            log(f"it {it}: loss {float(aux.loss):.4f} "
                f"psnr {float(aux.psnr):.2f}")

    # Region analysis on test views
    from scipy import ndimage
    rows = []
    worst = (1e9, None)
    for k, (c, g, op) in enumerate(zip(test_cams, gt_test, gt_op)):
        pred = np.asarray(jnp.clip(rf(state.params, c)["render"], 0, 1))
        err2 = ((pred - g) ** 2).mean(axis=0)          # [H, W]
        obj = op > 0.5
        interior = ndimage.binary_erosion(obj, iterations=3)
        band = ndimage.binary_dilation(obj, iterations=3) & ~interior
        bgm = ~(interior | band)

        def psnr_of(m):
            if m.sum() == 0:
                return None
            return round(float(10 * np.log10(
                1.0 / max(err2[m].mean(), 1e-10))), 2)

        row = {"view": k, "full": psnr_of(np.ones_like(obj)),
               "interior": psnr_of(interior), "band": psnr_of(band),
               "background": psnr_of(bgm),
               "share_interior": round(float(
                   err2[interior].sum() / err2.sum()), 3),
               "share_band": round(float(err2[band].sum() / err2.sum()), 3),
               "share_bg": round(float(err2[bgm].sum() / err2.sum()), 3)}
        rows.append(row)
        full_psnr = row["full"]
        if full_psnr < worst[0]:
            worst = (full_psnr, (pred, g, err2))
        log(json.dumps(row))

    np.savez("tools/diag_images_worst.npz", pred=worst[1][0], gt=worst[1][1],
             err2=worst[1][2])
    with open("tools/diag_images.json", "w") as f:
        json.dump(rows, f, indent=1)
    log("done")


if __name__ == "__main__":
    main()

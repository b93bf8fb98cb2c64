"""Decay isolation: start AT the GT scene (perfect init), densification
and opacity resets disabled, and run pure refinement under ablated loss /
LR variants. QUALITY_r04 + exp_phase1_refine.json show held-out PSNR
*decays monotonically* during refinement (26 -> 15.5 dB over 7k iters at
128px with a frozen population) — something in the continued optimization
degrades a converged scene. This pins which term/LR drives it.

Run: python tools/diag_decay.py [iters]
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
                                    _split_ring, _psnr)
    from gi_gs_tpu.renderer import render
    from gi_gs_tpu.train import trainer
    from gi_gs_tpu.train.optim import build_optimizer

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    size, cap, n = 128, 4096, 800
    t0 = time.time()

    def log(m):
        print(f"[diag +{time.time() - t0:6.1f}s] {m}", flush=True)

    base_cfg = _build_cfg(size, cap, 64, white_background=True)
    gt = make_gt_scene(n=n, seed=0, capacity=cap)
    train_cams, test_cams = _split_ring(ring_cameras(136, size), 8)
    bg = jnp.ones(3)

    cap_i = trainer.probe_cap_instances(base_cfg, gt, train_cams)
    base_cfg.raster = dataclasses.replace(base_cfg.raster,
                                          cap_instances=cap_i)
    rf = jax.jit(lambda p, c: jnp.clip(render(
        c, p, bg, base_cfg.raster, base_cfg.gi, derive_normal=False,
        compute_occlusion=False)["render"], 0, 1))
    gt_train = [rf(gt, c) for c in train_cams]
    gt_test = [rf(gt, c) for c in test_cams]
    log("GT rendered")

    def run(name, normal_weight=1.0, normal_tv_weight=None, lr_scale=None,
            group_scales=None, sh_up=True):
        cfg = _build_cfg(size, cap, 64, white_background=True)
        cfg.raster = base_cfg.raster
        # no densify, no resets
        o = cfg.opt
        o = dataclasses.replace(o, densify_from_iter=10 ** 9,
                                densify_until_iter=0)
        if lr_scale is not None:
            o = dataclasses.replace(
                o, position_lr_init=o.position_lr_init * lr_scale,
                position_lr_final=o.position_lr_final * lr_scale,
                feature_lr=o.feature_lr * lr_scale,
                opacity_lr=o.opacity_lr * lr_scale,
                scaling_lr=o.scaling_lr * lr_scale,
                rotation_lr=o.rotation_lr * lr_scale)
        if group_scales:
            o = dataclasses.replace(o, **{
                k: getattr(o, k) * v for k, v in group_scales.items()})
        cfg.opt = o
        if normal_tv_weight is not None:
            cfg.train = dataclasses.replace(
                cfg.train, normal_tv_weight=normal_tv_weight)

        params = jax.tree.map(jnp.copy, gt)
        state = trainer.make_train_state(cfg, params, spatial_lr_scale=1.0)
        tx = build_optimizer(cfg.opt, 1.0)
        step = trainer.make_phase1_step(cfg, cameras_extent=1.5, tx=tx,
                                        normal_weight=normal_weight)
        alphas = jnp.ones((1, size, size), jnp.float32)
        rng = np.random.RandomState(7)
        order = []
        traj = []
        for it in range(1, iters + 1):
            if sh_up and it % 1000 == 0:
                state = state._replace(
                    params=state.params.one_up_sh_degree())
            if not order:
                order = list(rng.permutation(len(train_cams)))
            vi = int(order.pop())
            state, aux = step(state, train_cams[vi], gt_train[vi], alphas,
                              bg, jnp.int32(it))
            if it % 250 == 0 or it == 1:
                ps = [_psnr(rf(state.params, c), g)
                      for c, g in zip(test_cams, gt_test)]
                traj.append((it, round(float(np.mean(ps)), 2)))
                log(f"{name} it {it}: test {traj[-1][1]:.2f} "
                    f"(train-loss {float(aux.loss):.4f})")
        return traj

    results = {}
    variants = [
        ("baseline", dict()),
        ("no_normal", dict(normal_weight=0.0)),
        ("no_normal_no_tv", dict(normal_weight=0.0, normal_tv_weight=0.0)),
        ("lr_0.3", dict(lr_scale=0.3)),
        ("lr_0.1", dict(lr_scale=0.1)),
        ("scaling_lr_0.1", dict(group_scales={"scaling_lr": 0.1})),
        ("opacity_lr_0.1", dict(group_scales={"opacity_lr": 0.1})),
        ("xyz_lr_0.1", dict(group_scales={"position_lr_init": 0.1,
                                          "position_lr_final": 0.1})),
    ]
    for name, kw in variants:
        results[name] = run(name, **kw)
        with open("tools/diag_decay.json", "w") as f:
            json.dump(results, f, indent=1)
    log("done")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()

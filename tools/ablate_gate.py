"""Scratch: ablate phase-1 quality-gate losses to find the convergence
bottleneck (run on TPU; see round-3 notes)."""
import sys, dataclasses
sys.path.insert(0, '.')
import numpy as np, jax, jax.numpy as jnp
from tools.quality_gate import make_gt_scene, ring_cameras, _build_cfg, _split_ring, _psnr
from gi_gs_tpu.renderer import render
from gi_gs_tpu.train import trainer
from gi_gs_tpu.train.optim import build_optimizer, trainable_view
from gi_gs_tpu.models.gaussians import create_from_points
from gi_gs_tpu.utils import image_utils
from gi_gs_tpu.train import losses

size = 64
cap = 4096
n = 400
cfg = _build_cfg(size, cap, 64)
gt = make_gt_scene(n=n, seed=0, capacity=cap)
train_cams, test_cams = _split_ring(ring_cameras(15, size), 3)
bg = jnp.zeros(3)
cap_i = trainer.probe_cap_instances(cfg, gt, train_cams)
cfg.raster = dataclasses.replace(cfg.raster, cap_instances=cap_i)
rf = jax.jit(lambda p, c: jnp.clip(render(
    c, p, bg, cfg.raster, cfg.gi, derive_normal=False,
    compute_occlusion=False)["render"], 0, 1))
gt_train = [rf(gt, c) for c in train_cams]
gt_test = [rf(gt, c) for c in test_cams]

rng = np.random.RandomState(1)
pts0 = np.asarray(gt.xyz[:n])
keep = rng.rand(n) < 0.6
pts = pts0[keep] + rng.normal(scale=0.04, size=(keep.sum(), 3)).astype(np.float32)


def run(variant, iters=800):
    params = create_from_points(pts, np.full((len(pts), 3), 0.5, np.float32),
                                capacity=cap)
    state = trainer.make_train_state(cfg, params, spatial_lr_scale=1.0)
    tx = build_optimizer(cfg.opt, 1.0)

    def step(state, camera, image, iteration):
        def loss_fn(view, ndc):
            p = state.params.replace(**view)
            res = render(camera, p, bg, cfg.raster, cfg.gi,
                         derive_normal=(variant == "full"),
                         compute_occlusion=False, ndc_offset=ndc)
            l1 = image_utils.l1_loss(res["render"], image)
            loss = 0.8 * l1 + 0.2 * (1.0 - image_utils.ssim(res["render"], image))
            if variant == "l1only":
                loss = l1
            if variant == "full":
                nl = trainer._masked_l1(res["normal_map"],
                                        res["normal_map_from_depth"],
                                        res["normal_from_depth_mask"])
                loss = loss + nl + losses.tv_loss(image, res["normal_map"],
                                                  pad=1, step=1)
            return loss, {"visibility": res["visibility_filter"],
                          "radii": res["radii"], "render": res["render"]}
        ndc = jnp.zeros((state.params.capacity, 2), jnp.float32)
        (loss, aux), (g, ng) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                trainable_view(state.params), ndc)
        ns, _ = trainer._apply_schedule_updates(
            cfg, state, state.params, g, ng, aux, iteration, tx, 1.5)
        return ns, loss

    stepj = jax.jit(step, donate_argnums=(0,))
    order = []
    rr = np.random.RandomState(7)
    for it in range(1, iters + 1):
        if not order:
            order = list(rr.permutation(len(train_cams)))
        vi = int(order.pop())
        state, loss = stepj(state, train_cams[vi], gt_train[vi], jnp.int32(it))
        if it % 200 == 0:
            tp = [_psnr(rf(state.params, c), g)
                  for c, g in zip(test_cams, gt_test)]
            print(f"  {variant} it {it}: loss {float(loss):.4f} "
                  f"test_psnr {np.mean(tp):.2f}", flush=True)
    ps = [_psnr(rf(state.params, c), g) for c, g in zip(test_cams, gt_test)]
    print(variant, "test_psnr", float(np.mean(ps)), "alive",
          int(np.asarray(state.params.alive.sum())), flush=True)


if __name__ == "__main__":
    for v in sys.argv[1:] or ["l1only", "photo", "full"]:
        run(v)

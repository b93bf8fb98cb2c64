"""Decompose phase-1 train-step time at bench scale."""
import sys, time, numpy as np, jax, jax.numpy as jnp

from gi_gs_tpu.config import Config, ModelConfig, OptimizationConfig, TrainConfig
from gi_gs_tpu.models.gaussians import create_from_points
from gi_gs_tpu.ops.rasterize import RasterConfig
from gi_gs_tpu.ops.rasterize.preprocess import preprocess
from gi_gs_tpu.ops.rasterize.binning import bin_and_sort
from gi_gs_tpu.ops.rasterize.pipeline import rasterize
from gi_gs_tpu.ops.screen_space import GIParams
from gi_gs_tpu.renderer import render
from gi_gs_tpu.scene.cameras import make_camera
from gi_gs_tpu.train import trainer
from gi_gs_tpu.train.optim import build_optimizer
from gi_gs_tpu.utils import image_utils

H = W = 800
N = 200_000
CAP = 1 << 18
rng = np.random.RandomState(0)
pts = rng.uniform(-1.0, 1.0, (N, 3)).astype(np.float32)
pts[:, 2] = pts[:, 2] * 0.8 + 3.0
colors = rng.uniform(0.0, 1.0, (N, 3)).astype(np.float32)
params = create_from_points(pts, colors, capacity=CAP)

cfg = Config()
cfg.model = ModelConfig(capacity=CAP)
cfg.opt = OptimizationConfig(densify_from_iter=10**9)
cfg.train = TrainConfig()
cfg.raster = RasterConfig(tile_h=8, tile_w=128, cap_instances=983040,
                          cap_tile=4096, chunk=32)
cfg.gi = GIParams()
rc = cfg.raster

cam = make_camera(R=np.eye(3), T=np.zeros(3), fovx=0.8, fovy=0.8,
                  width=W, height=H)
image = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
alpha = jnp.ones((1, H, W), jnp.float32)
bg = jnp.zeros(3)

state = trainer.make_train_state(cfg, params, spatial_lr_scale=1.0)
tx = build_optimizer(cfg.opt, 1.0)


def fence(o):
    # block_until_ready does not reliably fence on axon; a (tiny) host
    # transfer does. One element of one leaf fences the whole executable.
    l = jax.tree.leaves(o)[0]
    _ = np.asarray(l.reshape(-1)[0])


def timeit(name, f, *a, n=5):
    jf = jax.jit(f)
    t0 = time.time(); o = jf(*a); fence(o)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(n):
        o = jf(*a)
    fence(o)
    print(f"{name:34s} compile {c:6.1f}s   run {(time.time()-t0)/n*1000:8.2f} ms", flush=True)
    return o


p = state.params
w2c = jnp.asarray(cam.w2c)
fp = jnp.asarray(cam.full_proj)
which = sys.argv[1] if len(sys.argv) > 1 else "all"

if which in ("all", "step"):
    step = trainer.make_phase1_step(cfg, cameras_extent=3.0, tx=tx)
    it = jnp.int32(1)
    t0 = time.time(); s2, aux = step(state, cam, image, alpha, bg, it); fence(aux)
    print(f"{'phase1 step':34s} compile {time.time()-t0:6.1f}s", flush=True)
    t0 = time.time()
    for _ in range(5):
        s2, aux = step(s2, cam, image, alpha, bg, it)
    print("loss:", float(np.asarray(aux.loss)))
    print(f"{'phase1 step run':34s}                 {(time.time()-t0)/5*1000:8.2f} ms", flush=True)

if which in ("all", "parts"):
    params = create_from_points(pts, colors, capacity=CAP)  # fresh (donation)
    state = trainer.make_train_state(cfg, params, spatial_lr_scale=1.0)
    p = state.params

if which in ("all", "parts"):
    cov3d = p.get_covariance(1.0)
    color = p.colors_from_sh(cam.cam_pos)
    opacity, normal = p.get_opacity(), p.get_normal()
    albedo, rough, metal = p.get_albedo(), p.get_roughness(), p.get_metallic()

    def pre_fn(m, c):
        return preprocess(m, c, w2c, fp, cam.tanfovx, cam.tanfovy, W, H, rc)
    pre = timeit("preprocess fwd", pre_fn, p.xyz, cov3d)

    def bin_fn(m, c):
        pr = preprocess(m, c, w2c, fp, cam.tanfovx, cam.tanfovy, W, H, rc)
        return bin_and_sort(pr, H, W, rc)
    b = timeit("preprocess+bin_and_sort", bin_fn, p.xyz, cov3d)
    print("   max_tile_count:", int(b.max_tile_count), "overflow:", int(b.overflow),
          "total instances:", int((b.tile_count).sum()))

    def rast_fn(xyz, c3, o, col, nr, al, ro, me):
        out = rasterize(xyz, c3, o, col, nr, al, ro, me, w2c, fp,
                        cam.tanfovx, cam.tanfovy, H, W, bg, rc)
        return out.color, out.opacity, out.depth
    timeit("rasterize fwd", rast_fn, p.xyz, cov3d, opacity, color, normal,
           albedo, rough, metal)

    def rast_grad(xyz, c3, o, col, nr, al, ro, me):
        def f(*a):
            out = rasterize(*a, w2c, fp, cam.tanfovx, cam.tanfovy, H, W, bg, rc)
            return (out.color.sum() + out.depth.sum() + out.normal.sum()
                    + out.albedo.sum())
        return jax.grad(f, argnums=(0, 1, 2, 3, 4, 5, 6, 7))(
            xyz, c3, o, col, nr, al, ro, me)
    timeit("rasterize fwd+bwd", rast_grad, p.xyz, cov3d, opacity, color,
           normal, albedo, rough, metal)

    def render_fwd(xyz):
        pp = p.replace(xyz=xyz)
        res = render(cam, pp, bg, rc, cfg.gi, derive_normal=True,
                     compute_occlusion=False)
        return res["render"]
    timeit("render() fwd (no SSAO)", render_fwd, p.xyz)

    gt = image
    def loss_only(img):
        l1 = image_utils.l1_loss(img, gt)
        return (1.0 - 0.2) * l1 + 0.2 * (1.0 - image_utils.ssim(img, gt))
    timeit("l1+ssim fwd+bwd", lambda x: jax.grad(loss_only)(x), image)

if which in ("all", "lossfn", "parts"):
    # Full phase-1 loss_fn fwd+bwd (no optimizer/densify) — isolates the
    # render+loss graph from the schedule updates.
    from gi_gs_tpu.train.optim import trainable_view
    from gi_gs_tpu.train import losses
    from gi_gs_tpu.train.trainer import _gt_image, _masked_l1
    st = trainer.make_train_state(cfg, params, spatial_lr_scale=1.0)

    def full_loss_grad(view, ndc_zeros):
        def loss_fn(view, ndc_zeros):
            pp = st.params.replace(**view)
            res = render(cam, pp, bg, cfg.raster, cfg.gi,
                         derive_normal=True, compute_occlusion=False,
                         ndc_offset=ndc_zeros)
            gt = _gt_image(image, alpha, bg)
            l1 = image_utils.l1_loss(res["render"], gt)
            loss = 0.8 * l1 + 0.2 * (1.0 - image_utils.ssim(res["render"], gt))
            normal_loss = _masked_l1(res["normal_map"],
                                     res["normal_map_from_depth"],
                                     res["normal_from_depth_mask"])
            loss = loss + normal_loss
            loss = loss + cfg.train.normal_tv_weight * losses.tv_loss(
                gt, res["normal_map"], pad=1, step=1)
            return loss
        return jax.value_and_grad(loss_fn, argnums=(0, 1))(view, ndc_zeros)

    ndc = jnp.zeros((st.params.capacity, 2), jnp.float32)
    if "full" in sys.argv[2:]:
        timeit("phase1 loss_fn fwd+bwd", full_loss_grad,
               trainable_view(st.params), ndc)

    def make_grad(terms):
        def loss_fn(view, ndc_zeros):
            pp = st.params.replace(**view)
            res = render(cam, pp, bg, cfg.raster, cfg.gi,
                         derive_normal=True, compute_occlusion=False,
                         ndc_offset=ndc_zeros)
            gt = _gt_image(image, alpha, bg)
            loss = image_utils.l1_loss(res["render"], gt)
            if "ssim" in terms:
                loss = loss + 0.2 * (1.0 - image_utils.ssim(res["render"], gt))
            if "normal" in terms:
                loss = loss + _masked_l1(res["normal_map"],
                                         res["normal_map_from_depth"],
                                         res["normal_from_depth_mask"])
            if "tv" in terms:
                loss = loss + cfg.train.normal_tv_weight * losses.tv_loss(
                    gt, res["normal_map"], pad=1, step=1)
            return loss
        return lambda v, n: jax.value_and_grad(loss_fn, argnums=(0, 1))(v, n)

    sel = sys.argv[2:] or ["ssim", "normal", "tv"]
    for terms in [(t,) for t in sel]:
        timeit(f"render+l1+{'+'.join(terms)} fwd+bwd", make_grad(terms),
               trainable_view(st.params), ndc)

    def render_l1_grad(view, ndc_zeros):
        def loss_fn(view, ndc_zeros):
            pp = st.params.replace(**view)
            res = render(cam, pp, bg, cfg.raster, cfg.gi,
                         derive_normal=True, compute_occlusion=False,
                         ndc_offset=ndc_zeros)
            return image_utils.l1_loss(res["render"], _gt_image(image, alpha, bg))
        return jax.value_and_grad(loss_fn, argnums=(0, 1))(view, ndc_zeros)
    if "l1only" in sys.argv[2:]:
        timeit("render+l1-only fwd+bwd", render_l1_grad,
               trainable_view(st.params), ndc)

"""Phase-2 step cost decomposition on the real TPU.

Times every phase-2 component as a standalone fwd and (where the step
differentiates it) fwd+bwd program with amortized fencing, so the sum can
be compared against the full step time. All programs are compiled in
parallel threads (remote-compile latency hiding). Run from the repo root:

    python tools/profile_phase2.py
"""
import concurrent.futures as cf
import sys
import time

import numpy as np

sys.path.insert(0, ".")

_T0 = time.time()


def log(m):
    print(f"+{time.time() - _T0:6.1f}s {m}", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import bench
    from gi_gs_tpu.models.light import (build_mips_packed,
                                        build_prefilter_tables)
    from gi_gs_tpu.ops import pallas_gi, screen_space
    from gi_gs_tpu.ops.shading import pbr_shading, get_brdf_lut
    from gi_gs_tpu.train import trainer
    from gi_gs_tpu.train.optim import build_optimizer, build_light_optimizer
    from gi_gs_tpu.utils import image_utils, math_utils
    from gi_gs_tpu.utils.profiling import time_fn

    H = W = 800
    R = 256
    rng = np.random.RandomState(0)
    log(f"devices: {jax.devices()}")

    def rnd(*shape):
        return jnp.asarray(rng.rand(*shape).astype(np.float32))

    gi = screen_space.GIParams()
    nv = rnd(3, H, W)
    dp = jnp.asarray((rng.rand(3, H, W) * 2 + 1).astype(np.float32))
    rgb = rnd(3, H, W)
    alb = rnd(3, H, W)
    r1 = rnd(1, H, W)
    f0 = rnd(3, H, W) * 0.2
    fx = fy = 900.0

    spec, arrays = build_prefilter_tables(R)
    base = rnd(6, R, R, 3)
    brdf = get_brdf_lut()
    nrm_hw = jnp.asarray(rng.randn(H, W, 3).astype(np.float32))
    nrm_hw = nrm_hw / jnp.linalg.norm(nrm_hw, axis=-1, keepdims=True)
    alb_hw = rnd(H, W, 3)
    rough_hw = rnd(H, W, 1)
    mask = jnp.ones((H, W, 1), bool)
    occ1 = jnp.ones((H, W, 1), jnp.float32)

    light0 = jax.jit(lambda b, t: build_mips_packed(b, spec, t))(base, arrays)

    progs = {}

    def add(name, f, *args):
        progs[name] = (jax.jit(f), args)

    add("ssao", lambda a, b: pallas_gi.ssao_pallas(a, b, fx, fy, gi), nv, dp)
    add("ssr", lambda *a: pallas_gi.ssr_pallas(*a, fx, fy, gi),
        nv, dp, rgb, alb, r1, r1, f0)
    add("build_mips_fwd", lambda b, t: build_mips_packed(b, spec, t),
        base, arrays)

    def mips_loss(b, t):
        lt = build_mips_packed(b, spec, t)
        return sum((s ** 2).sum() for s in lt.specular) + (lt.diffuse ** 2).sum()
    add("build_mips_fwd_bwd", jax.grad(mips_loss), base, arrays)

    def pbr_f(l, a_, r_):
        return pbr_shading(light=l, normals=nrm_hw, view_dirs=nrm_hw,
                           albedo=a_, roughness=r_, mask=mask, brdf_lut=brdf,
                           tone=False, gamma=False, occlusion=occ1,
                           metallic=None)
    add("pbr_fwd", pbr_f, light0, alb_hw, rough_hw)

    def pbr_loss(l, a_, r_):
        return (pbr_f(l, a_, r_)["render_rgb"] ** 2).sum()
    add("pbr_fwd_bwd", jax.grad(pbr_loss, argnums=(0, 1, 2)),
        light0, alb_hw, rough_hw)
    add("pbr_bwd_light", jax.grad(pbr_loss, argnums=(0,)),
        light0, alb_hw, rough_hw)
    add("pbr_bwd_ar", jax.grad(pbr_loss, argnums=(1, 2)),
        light0, alb_hw, rough_hw)
    add("pbr_bwd_alb", jax.grad(pbr_loss, argnums=(1,)),
        light0, alb_hw, rough_hw)

    add("env_tv_fwd", trainer.env_tv_loss, base)
    add("env_tv_fwd_bwd", jax.grad(trainer.env_tv_loss), base)

    add("median3", image_utils.median_blur_3x3, rgb)
    add("bilateral3", image_utils.bilateral_blur_3x3, rgb)
    add("ssim_fwd_bwd",
        jax.grad(lambda a, b: image_utils.ssim(a, b)), rgb, alb)
    add("srgb_roundtrip",
        lambda x: math_utils.linear_to_srgb(math_utils.srgb_to_linear(x)), rgb)

    def dtn(d):
        w2c = jnp.eye(4)
        df = image_utils.median_blur_3x3(d)[0]
        return screen_space.depth_to_normal(df, w2c, fx, fy)
    add("depth_to_normal", dtn, r1)

    only = sys.argv[1:] if len(sys.argv) > 1 else None
    if only:
        progs = {k: v for k, v in progs.items() if k in only}
    log(f"compiling {len(progs)} programs (4 at a time)")

    def comp(k, f, a):
        t = time.time()
        c = f.lower(*a).compile()
        log(f"compiled {k} in {time.time() - t:.1f}s")
        return k, c

    with cf.ThreadPoolExecutor(4) as ex:
        futs = [ex.submit(comp, k, f, a) for k, (f, a) in progs.items()]
        compiled = dict(f.result() for f in futs)
    log("all compiled")

    for k, (_, args) in progs.items():
        dt, _ = time_fn(compiled[k], *args, iters=5, warmup=1)
        log(f"{k:>20}: {dt * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()

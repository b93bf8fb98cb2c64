"""Generate the committed golden fixtures under tests/fixtures/.

VERDICT r4 #6: the kernel parity story rests on in-repo oracles (the
numpy transliterations of the CUDA loops + the brute-force jnp
rasterizer). Freezing the oracle outputs as committed .npz files makes a
silent oracle+kernel co-regression impossible: tests/test_goldens.py
asserts BOTH the oracle and the production kernels against these files.

Regenerate (CPU, deterministic): JAX_PLATFORMS=cpu python tools/make_goldens.py
Only regenerate when a deliberate semantic change is made; the diff of
this file + the npz should travel together. See PARITY.md for the
protocol to capture CUDA-reference fixtures on a GPU machine.
"""
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax

# The axon TPU plugin overrides JAX_PLATFORMS env vars; goldens must be
# CPU-deterministic so the fixture files are reproducible anywhere.
jax.config.update("jax_platforms", "cpu")

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures")


def rasterize_golden():
    import jax.numpy as jnp
    from gi_gs_tpu.ops.rasterize import RasterConfig
    from gi_gs_tpu.ops.rasterize.preprocess import preprocess
    from gi_gs_tpu.ops.rasterize.reference import rasterize_bruteforce
    from utils import random_scene
    import jax

    scene = random_scene(n=300, seed=0)
    cfg = RasterConfig(tile_h=8, tile_w=32, cap_instances=1 << 14,
                       cap_tile=512, chunk=8)
    cam, w, h = scene["cam"], scene["width"], scene["height"]
    pre = preprocess(scene["xyz"], scene["cov3d"], cam.w2c, cam.full_proj,
                     cam.tanfovx, cam.tanfovy, w, h, cfg)
    feats = jnp.concatenate([
        scene["color"], jnp.ones_like(scene["roughness"]), scene["normal"],
        scene["albedo"], scene["roughness"], scene["metallic"],
        pre.depth[:, None], pre.pos_view], axis=1)

    def loss(op, feats):
        acc, final_t = rasterize_bruteforce(
            scene["xyz"], scene["cov3d"], op, feats, cam.w2c,
            cam.full_proj, cam.tanfovx, cam.tanfovy, h, w, cfg)
        return (acc ** 2).sum() + (final_t ** 2).sum(), (acc, final_t)

    (_, (acc, final_t)), (d_op, d_feats) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(scene["opacity"], feats)
    np.savez_compressed(
        os.path.join(OUT, "golden_rasterize.npz"),
        accum=np.asarray(acc), final_t=np.asarray(final_t),
        d_opacity=np.asarray(d_op), d_features=np.asarray(d_feats))
    print("golden_rasterize:", np.asarray(acc).shape)


def screen_space_golden():
    import jax.numpy as jnp
    from gi_gs_tpu.ops import screen_space
    from gi_gs_tpu.ops.screen_space import GIParams
    from test_screen_space import make_buffers, numpy_ssao

    h, w = 24, 32
    normal, pos, fx, fy = make_buffers(h=h, w=w, seed=3)
    p = GIParams(radius=0.8, bias=0.01, thick=0.05, delta=0.25,
                 step=4, start=2, backend="jnp")
    # The numpy transliteration of SSAOCUDA is the anchor; assert the jnp
    # oracle against it before freezing (pixel-boundary rounding may flip
    # rare hits — same tolerance as test_ssao_matches_numpy_oracle).
    ao_np = numpy_ssao(normal, pos, fx, fy, p)
    ao = np.asarray(screen_space.ssao(
        jnp.asarray(normal), jnp.asarray(pos), fx, fy, p))[0]
    assert (np.abs(ao - ao_np) > 1e-4).mean() < 0.02

    rng = np.random.RandomState(5)
    rgb = jnp.asarray(rng.rand(3, h, w).astype(np.float32))
    albedo = jnp.asarray(rng.rand(3, h, w).astype(np.float32))
    rough = jnp.ones((1, h, w), np.float32) * 0.4
    metal = jnp.zeros((1, h, w), np.float32)
    f0 = jnp.ones((3, h, w), np.float32) * 0.04
    color, abd = screen_space.ssr(
        jnp.asarray(normal), jnp.asarray(pos), rgb, albedo, rough, metal,
        f0, fx, fy, p)
    nrm_w, dpos = screen_space.depth_to_normal(
        jnp.asarray(pos[2]), jnp.eye(4), fx, fy)
    np.savez_compressed(
        os.path.join(OUT, "golden_screen_space.npz"),
        ao=ao, ssr_color=np.asarray(color), ssr_abd=np.asarray(abd),
        d2n_normal=np.asarray(nrm_w), d2n_pos=np.asarray(dpos),
        normal=normal, pos=pos, rgb=np.asarray(rgb),
        albedo=np.asarray(albedo), fx=fx, fy=fy)
    print("golden_screen_space:", ao.shape)


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    rasterize_golden()
    screen_space_golden()

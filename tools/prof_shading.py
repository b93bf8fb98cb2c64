"""Dissect the pbr_shading fwd+bwd stage (BENCH r3: 44 ms @ 345x
roofline): time each texture path separately, fwd and vjp-to-texels.

Run on TPU: python tools/prof_shading.py [H W light_res]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timeit(f, *args, n=20):
    f(*args)  # compile
    # axon: block_until_ready doesn't fence; transfer a scalar instead.
    t0 = time.time()
    for _ in range(n):
        out = f(*args)
    leaf = out[0] if isinstance(out, tuple) else out
    float(np.asarray(leaf).ravel()[0])
    return (time.time() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from gi_gs_tpu.models import light as light_mod
    from gi_gs_tpu.ops import cubemap as cm
    from gi_gs_tpu.ops.shading import (_trilinear_specular, get_brdf_lut,
                                       pbr_shading, sample_brdf_lut,
                                       saturate_dot)

    H = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 800
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 256

    rng = np.random.RandomState(0)
    base = jnp.asarray(rng.rand(6, R, R, 3).astype(np.float32))
    spec_struct, arrays = light_mod.build_prefilter_tables(R)
    light = jax.jit(lambda b, t: light_mod.build_mips_packed(
        b, spec_struct, t))(base, arrays)
    light = jax.tree.map(jax.block_until_ready, light)

    nrm = rng.standard_normal((H, W, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    vd = rng.standard_normal((H, W, 3)).astype(np.float32)
    vd /= np.linalg.norm(vd, axis=-1, keepdims=True)
    nrm_j, vd_j = jnp.asarray(nrm), jnp.asarray(vd)
    alb = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    rough = jnp.asarray(rng.rand(H, W, 1).astype(np.float32))
    mask = jnp.ones((H, W, 1), bool)
    occ = jnp.asarray(rng.rand(H, W, 1).astype(np.float32))
    lut = get_brdf_lut()

    L = len(light.specular)
    mip = jnp.asarray(
        rng.rand(H, W, 1).astype(np.float32)) * (L - 1)

    # --- individual paths -------------------------------------------------
    f_diff = jax.jit(lambda d, n: cm.sample_cubemap(d, n).sum())
    print(f"diffuse fwd        : {timeit(f_diff, light.diffuse, nrm_j):7.2f} ms")
    g_diff = jax.jit(jax.grad(lambda d: cm.sample_cubemap(d, nrm_j).sum()))
    print(f"diffuse fwd+bwd    : {timeit(g_diff, light.diffuse):7.2f} ms")

    f_lut = jax.jit(lambda r: sample_brdf_lut(
        lut, saturate_dot(nrm_j, vd_j), r).sum())
    print(f"lut fwd            : {timeit(f_lut, rough):7.2f} ms")
    g_lut = jax.jit(jax.grad(lambda r: sample_brdf_lut(
        lut, saturate_dot(nrm_j, vd_j), r).sum()))
    print(f"lut fwd+bwd(rough) : {timeit(g_lut, rough):7.2f} ms")

    f_spec = jax.jit(lambda s, d: _trilinear_specular(s, d, mip).sum())
    print(f"specular fwd       : {timeit(f_spec, light.specular, nrm_j):7.2f} ms")
    g_spec = jax.jit(jax.grad(
        lambda s: _trilinear_specular(s, nrm_j, mip).sum()))
    print(f"specular fwd+bwd   : {timeit(g_spec, light.specular):7.2f} ms")

    # --- whole pbr_shading, grads to (albedo, rough, light) --------------
    def full(albedo, roughness, lt):
        out = pbr_shading(lt, nrm_j, vd_j, albedo, roughness, mask, lut,
                          occlusion=occ)
        return out["render_rgb"].sum()

    f_full = jax.jit(full)
    print(f"pbr fwd            : {timeit(f_full, alb, rough, light):7.2f} ms")
    g_full = jax.jit(jax.grad(full, argnums=(0, 1, 2)))
    print(f"pbr fwd+bwd        : {timeit(g_full, alb, rough, light):7.2f} ms")

    # grads only to (albedo, rough), light stop-grad (phase-2 uses light
    # grads though — this isolates the texel-scatter share)
    def full_sg(albedo, roughness):
        lt = jax.tree.map(jax.lax.stop_gradient, light)
        return full(albedo, roughness, lt)
    g_sg = jax.jit(jax.grad(full_sg, argnums=(0, 1)))
    print(f"pbr fwd+bwd nolight: {timeit(g_sg, alb, rough):7.2f} ms")


if __name__ == "__main__":
    main()

import sys, time, numpy as np, jax, jax.numpy as jnp
which = sys.argv[1] if len(sys.argv) > 1 else "ssao"
from gi_gs_tpu.ops import screen_space
from gi_gs_tpu.ops.screen_space import GIParams

H = W = 800
rng = np.random.RandomState(0)
nrm = jnp.asarray(rng.normal(size=(3, H, W)).astype(np.float32))
pos = jnp.asarray(np.abs(rng.normal(size=(3, H, W))).astype(np.float32) + 1.0)
rgb = jnp.asarray(rng.rand(3, H, W).astype(np.float32))
gi = GIParams()  # delta 0.0625, step 16, start 8
fx = fy = 755.0

def fence(x):
    _ = np.asarray(jax.tree.leaves(x)[0].ravel()[0])

if which == "ssao":
    f = jax.jit(lambda n, p: screen_space.ssao(n, p, fx, fy, gi))
    t0=time.time(); out = f(nrm, pos); fence(out); print("ssao compile", round(time.time()-t0,1), flush=True)
    t0=time.time()
    for _ in range(3): out = f(nrm, pos); fence(out)
    print("ssao run:", round((time.time()-t0)/3*1000,1), "ms", flush=True)
elif which == "ssr":
    alb = rgb; rough = rgb[:1]; metal = rgb[:1]; f0 = jnp.ones_like(alb)*0.04
    f = jax.jit(lambda n, p, c: screen_space.ssr(n, p, c, alb, rough, metal, f0, fx, fy, gi)[0])
    t0=time.time(); out = f(nrm, pos, rgb); fence(out); print("ssr compile", round(time.time()-t0,1), flush=True)
    t0=time.time()
    for _ in range(3): out = f(nrm, pos, rgb); fence(out)
    print("ssr run:", round((time.time()-t0)/3*1000,1), "ms", flush=True)
elif which == "mips":
    from gi_gs_tpu.models.light import build_mips_packed, build_prefilter_tables
    spec, arrays = build_prefilter_tables(256)
    base = jnp.asarray(rng.rand(6, 256, 256, 3).astype(np.float32))
    def build_mips(b, arrs=None):
        return build_mips_packed(b, spec, arrs)
    f = jax.jit(lambda b, arrs: build_mips(b, arrs).specular[0])
    t0=time.time(); out = f(base, arrays); fence(out); print("mips compile", round(time.time()-t0,1), flush=True)
    t0=time.time()
    for _ in range(3): out = f(base, arrays); fence(out)
    print("build_mips fwd run:", round((time.time()-t0)/3*1000,1), "ms", flush=True)
    g = jax.jit(jax.grad(lambda b, arrs: sum(x.sum() for x in build_mips(b, arrs).specular) + build_mips(b, arrs).diffuse.sum(), argnums=0))
    t0=time.time(); out = g(base, arrays); fence(out); print("mips grad compile", round(time.time()-t0,1), flush=True)
    t0=time.time()
    for _ in range(3): out = g(base, arrays); fence(out)
    print("build_mips fwd+bwd run:", round((time.time()-t0)/3*1000,1), "ms", flush=True)

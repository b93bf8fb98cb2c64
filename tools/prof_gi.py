import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np, jax, jax.numpy as jnp
from gi_gs_tpu.ops import pallas_gi, screen_space
from gi_gs_tpu.ops.screen_space import GIParams

def fence(x): _ = np.asarray(x.reshape(-1)[0])

H = W = 800
import sys as _s
GI = GIParams(backend=_s.argv[1] if len(_s.argv)>1 else 'pallas')
rng = np.random.RandomState(0)
ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
z = 2.5 + 0.4*np.sin(xs/11.0) + 0.3*np.cos(ys/7.0) + 0.05*rng.rand(H,W).astype(np.float32)
z[:, W//2:] += 0.8
fx = fy = 0.9 * W
px = (xs - W/2)/fx*z; py = (ys - H/2)/fy*z
pos = jnp.asarray(np.stack([px, py, z], 0).astype(np.float32))
n = rng.randn(3, H, W).astype(np.float32); n[2] -= 1.5
n /= np.linalg.norm(n, axis=0, keepdims=True)
n = jnp.asarray(n)
rgb = jnp.asarray(rng.rand(3, H, W).astype(np.float32))

mode = 'exact' if GI.backend=='pallas_exact' else 'coherent'
f = jax.jit(lambda a, b: pallas_gi.ssao_pallas(a, b, fx, fy, GI, mode=mode))
t0 = time.time(); o = f(n, pos); fence(o); print("ssao compile+first", round(time.time()-t0,1), "s", flush=True)
t0 = time.time()
for _ in range(3): o = f(n, pos)
fence(o)
print(f"ssao: {(time.time()-t0)/3*1e3:.1f} ms", flush=True)

alb = jnp.asarray(rng.rand(3,H,W).astype(np.float32))
r1 = jnp.asarray(rng.rand(1,H,W).astype(np.float32))
f0m = jnp.asarray(rng.rand(3,H,W).astype(np.float32)*0.2)
g = jax.jit(lambda *a: pallas_gi.ssr_pallas(*a, fx, fy, GI, mode=mode))
t0 = time.time(); c, gd = g(n, pos, rgb, alb, r1, r1, f0m); fence(c); print("ssr compile+first", round(time.time()-t0,1), "s", flush=True)
t0 = time.time()
for _ in range(3): c, gd = g(n, pos, rgb, alb, r1, r1, f0m)
fence(c)
print(f"ssr: {(time.time()-t0)/3*1e3:.1f} ms", flush=True)

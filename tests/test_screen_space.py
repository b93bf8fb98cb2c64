"""Screen-space ops vs a direct numpy transliteration of the CUDA loops
(forward.cu:635-909,914-1032) on tiny images."""
import math

import numpy as np
import jax.numpy as jnp

from gi_gs_tpu.ops import screen_space
from gi_gs_tpu.ops.screen_space import GIParams, march_directions

GI = GIParams(radius=0.8, bias=0.01, thick=0.05, delta=0.25, step=4, start=2,
              backend="jnp")  # these tests pin the jnp oracle to the CUDA
                              # loops; pallas-vs-oracle lives in test_pallas_gi


def numpy_march_dirs(delta):
    phis, thetas = march_directions(delta)
    return [(float(p), float(t)) for p in phis for t in thetas]


def numpy_tbn(n):
    up = np.array([0.0, 1.0, 0.0])
    rndot = n[1]
    unt = up - n * rndot
    t = unt / max(np.linalg.norm(unt), 1e-20)
    b = np.cross(n, t)
    b = b / max(np.linalg.norm(b), 1e-20)
    return t, b


def numpy_ssao(normal, pos, fx, fy, p: GIParams):
    """Direct loop transliteration of SSAOCUDA."""
    _, H, W = pos.shape
    cx, cy = W / 2.0, H / 2.0
    out = np.ones((H, W))
    dirs = numpy_march_dirs(p.delta)
    for y in range(H):
        for x in range(W):
            n = normal[:, y, x]
            n = n / max(np.linalg.norm(n), 1e-20)
            t, b = numpy_tbn(n)
            P = pos[:, y, x]
            occ, nr = 0.0, 0.0
            for phi, th in dirs:
                ts = np.array([math.sin(th) * math.cos(phi),
                               math.sin(th) * math.sin(phi), math.cos(th)])
                ts = ts / max(np.linalg.norm(ts), 1e-20)
                sv = ts[0] * t + ts[1] * b + ts[2] * n
                nr += math.cos(th) * math.sin(th)
                for j in range(p.start, p.step):
                    sp = P + sv * j * (1 + P[2] / 100) ** 2 * p.radius / p.step
                    z = sp[2] + 1e-7
                    ix = int(np.trunc(sp[0] / z * fx + cx + (0.5 if sp[0] / z * fx + cx >= 0 else -0.5)))
                    iy = int(np.trunc(sp[1] / z * fy + cy + (0.5 if sp[1] / z * fy + cy >= 0 else -0.5)))
                    if ix < 0 or ix > W - 1 or iy < 0 or iy > H - 1:
                        break
                    sd = pos[2, iy, ix]
                    if sd <= sp[2] + p.bias and sd >= sp[2] - p.thick:
                        occ += math.cos(th) * math.sin(th)
                        break
            if nr > 0:
                out[y, x] = max(0.0, min(1.0, 1.0 - occ / nr))
    return out


def make_buffers(h=12, w=16, seed=0):
    rng = np.random.RandomState(seed)
    normal = rng.normal(size=(3, h, w)).astype(np.float32)
    depth = rng.uniform(1.0, 3.0, (h, w)).astype(np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    fx = fy = 20.0
    pos = np.stack([(xs - w / 2) / fx * depth, (ys - h / 2) / fy * depth,
                    depth]).astype(np.float32)
    return normal, pos, fx, fy


def test_ssao_matches_numpy_oracle():
    normal, pos, fx, fy = make_buffers()
    ours = np.asarray(screen_space.ssao(
        jnp.asarray(normal), jnp.asarray(pos), fx, fy, GI))[0]
    ref = numpy_ssao(normal, pos, fx, fy, GI)
    mismatch = np.abs(ours - ref) > 1e-4
    # rounding at pixel-boundary samples may flip a rare hit
    assert mismatch.mean() < 0.02, mismatch.mean()


def test_ssr_basic_properties():
    normal, pos, fx, fy = make_buffers(seed=1)
    rng = np.random.RandomState(2)
    rgb = rng.rand(3, 12, 16).astype(np.float32)
    albedo = rng.rand(3, 12, 16).astype(np.float32)
    rough = rng.rand(1, 12, 16).astype(np.float32)
    metal = np.zeros((1, 12, 16), np.float32)
    f0 = np.full((3, 12, 16), 0.04, np.float32)
    color, abd = screen_space.ssr(
        jnp.asarray(normal), jnp.asarray(pos), jnp.asarray(rgb),
        jnp.asarray(albedo), jnp.asarray(rough), jnp.asarray(metal),
        jnp.asarray(f0), fx, fy, GI)
    color, abd = np.asarray(color), np.asarray(abd)
    assert np.isfinite(color).all() and np.isfinite(abd).all()
    # color == abd * albedo where any indirect light was found
    np.testing.assert_allclose(color, abd * albedo, rtol=1e-5, atol=1e-6)
    # gradient semantics: d(color)/d(albedo) == abd
    import jax
    g = jax.grad(lambda a: screen_space.ssr(
        jnp.asarray(normal), jnp.asarray(pos), jnp.asarray(rgb), a,
        jnp.asarray(rough), jnp.asarray(metal), jnp.asarray(f0),
        fx, fy, GI)[0].sum())(jnp.asarray(albedo))
    np.testing.assert_allclose(np.asarray(g), abd, rtol=1e-5, atol=1e-6)


def test_depth_to_normal_flat_plane():
    """A fronto-parallel plane must produce normals ~ -z (view space
    normal (0,0,-1) rotated to world by identity)."""
    h = w = 16
    depth = jnp.full((h, w), 2.0)
    w2c = jnp.eye(4)
    n, pos = screen_space.depth_to_normal(depth, w2c, 20.0, 20.0)
    n, pos = np.asarray(n), np.asarray(pos)
    interior = n[:, 3:-3, 3:-3]
    nz = interior[2]
    # The CUDA 6-normal average has cancelling cross-product orientations
    # (4x -z, 2x +z) -> raw magnitude 1/3 towards the camera; the render()
    # wrapper normalises afterwards.
    assert (np.abs(nz + 1.0 / 3.0) < 1e-3).all(), nz
    assert (np.abs(interior[:2]) < 1e-4).all()
    # positions: z == depth on interior
    assert np.allclose(pos[2, 1:-1, 1:-1], 2.0)

"""Pallas SSAO/SSR kernels vs the jnp oracle (screen_space.ssao/ssr,
itself verified against a numpy CUDA transliteration in
test_screen_space.py). Runs in interpret mode on the CPU conftest."""
import numpy as np
import jax
import jax.numpy as jnp

from gi_gs_tpu.ops import pallas_gi, screen_space
from gi_gs_tpu.ops.screen_space import GIParams

GI = GIParams(radius=0.8, bias=0.01, thick=0.05, delta=0.25, step=4, start=2,
              backend="jnp")  # oracle path for the reference values


def _scene(h, w, seed=0):
    """Smooth-ish depth field + unit normals, like a rendered G-buffer."""
    rng = np.random.RandomState(seed)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    z = 2.5 + 0.4 * np.sin(xs / 11.0) + 0.3 * np.cos(ys / 7.0)
    z += 0.05 * rng.rand(h, w).astype(np.float32)
    # a hard depth edge to exercise offset diversity
    z[:, w // 2:] += 0.8
    fx = fy = 0.9 * w
    cx, cy = w / 2.0, h / 2.0
    px = (xs - cx) / fx * z
    py = (ys - cy) / fy * z
    pos = np.stack([px, py, z], 0).astype(np.float32)
    n = rng.randn(3, h, w).astype(np.float32)
    n[2] -= 1.5
    n /= np.linalg.norm(n, axis=0, keepdims=True)
    # a few background pixels (zero normal/pos) like real G-buffers
    n[:, :2, :3] = 0.0
    pos[:, :2, :3] = 0.0
    return jnp.asarray(n), jnp.asarray(pos), fx, fy


def _smooth_scene(h, w):
    """Geometric normals from a smooth position field (a realistic
    converged G-buffer — the regime the coherent kernel targets)."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    z = 2.5 + 0.4 * np.sin(xs / 40.0) + 0.3 * np.cos(ys / 30.0)
    fx = fy = 0.9 * w
    px = (xs - w / 2) / fx * z
    py = (ys - h / 2) / fy * z
    pos = np.stack([px, py, z], 0).astype(np.float32)
    dx = np.gradient(pos, axis=2)
    dy = np.gradient(pos, axis=1)
    n = np.cross(dy.transpose(1, 2, 0), dx.transpose(1, 2, 0)).transpose(2, 0, 1)
    n = (n / np.maximum(np.linalg.norm(n, axis=0, keepdims=True), 1e-8))
    return jnp.asarray(n.astype(np.float32)), jnp.asarray(pos), fx, fy


def test_ssao_pallas_exact_matches_oracle():
    n, pos, fx, fy = _scene(16, 144)
    ref = screen_space.ssao(n, pos, fx, fy, GI)
    out = pallas_gi.ssao_pallas(n, pos, fx, fy, GI, mode="exact")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ssao_pallas_coherent_close_on_smooth_scene():
    n, pos, fx, fy = _smooth_scene(32, 256)
    exact = pallas_gi.ssao_pallas(n, pos, fx, fy, GI, mode="exact")
    fast = pallas_gi.ssao_pallas(n, pos, fx, fy, GI, mode="coherent")
    diff = np.abs(np.asarray(fast) - np.asarray(exact))
    assert diff.mean() < 0.02, diff.mean()
    assert np.percentile(diff, 99) < 0.15, np.percentile(diff, 99)


def test_ssr_pallas_matches_oracle():
    n, pos, fx, fy = _scene(16, 144, seed=1)
    rng = np.random.RandomState(2)
    rgb = jnp.asarray(rng.rand(3, 16, 144).astype(np.float32))
    albedo = jnp.asarray(rng.rand(3, 16, 144).astype(np.float32))
    rough = jnp.asarray(rng.rand(1, 16, 144).astype(np.float32))
    metal = jnp.asarray(rng.rand(1, 16, 144).astype(np.float32))
    f0 = jnp.asarray(rng.rand(3, 16, 144).astype(np.float32) * 0.2)
    ref_c, ref_gd = screen_space.ssr(n, pos, rgb, albedo, rough, metal, f0,
                                     fx, fy, GI)
    out_c, out_gd = pallas_gi.ssr_pallas(n, pos, rgb, albedo, rough, metal,
                                         f0, fx, fy, GI, mode="exact")
    # bf16 RGB texels in the kernel bound the error of the indirect term
    np.testing.assert_allclose(np.asarray(out_gd), np.asarray(ref_gd),
                               rtol=5e-3, atol=5e-3)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(ref_c),
                               rtol=5e-3, atol=5e-3)


def test_ssr_pallas_albedo_gradient_identity():
    n, pos, fx, fy = _scene(8, 128, seed=3)
    rng = np.random.RandomState(4)
    rgb = jnp.asarray(rng.rand(3, 8, 128).astype(np.float32))
    albedo = jnp.asarray(rng.rand(3, 8, 128).astype(np.float32))
    rough = jnp.asarray(rng.rand(1, 8, 128).astype(np.float32))
    metal = jnp.asarray(rng.rand(1, 8, 128).astype(np.float32))
    f0 = jnp.asarray(rng.rand(3, 8, 128).astype(np.float32) * 0.2)

    def f(a):
        c, _ = pallas_gi.ssr_pallas(n, pos, rgb, a, rough, metal, f0,
                                    fx, fy, GI)
        return c.sum()

    g = jax.grad(f)(albedo)
    _, gd = pallas_gi.ssr_pallas(n, pos, rgb, albedo, rough, metal, f0,
                                 fx, fy, GI)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gd), rtol=1e-6,
                               atol=1e-6)


def test_ssr_pallas_hdr_rgb_bounded():
    """HDR direct-light input: the 11-11-10 packing quantises ABSOLUTE in
    the image max (see _build_tables docstring), so with one pixel 1000x
    brighter than the rest the indirect term must still match the oracle
    within ~quantum * max accumulated over the march (dark texels lose
    relative precision, but the additive indirect error stays bounded)."""
    n, pos, fx, fy = _scene(16, 144, seed=7)
    rng = np.random.RandomState(8)
    rgb_np = rng.rand(3, 16, 144).astype(np.float32) * 0.05
    rgb_np[:, 9, 70] = 50.0          # single bright peak (1000x the field)
    rgb = jnp.asarray(rgb_np)
    albedo = jnp.asarray(rng.rand(3, 16, 144).astype(np.float32))
    rough = jnp.asarray(rng.rand(1, 16, 144).astype(np.float32))
    metal = jnp.asarray(rng.rand(1, 16, 144).astype(np.float32))
    f0 = jnp.asarray(rng.rand(3, 16, 144).astype(np.float32) * 0.2)
    ref_c, _ = screen_space.ssr(n, pos, rgb, albedo, rough, metal, f0,
                                fx, fy, GI)
    out_c, _ = pallas_gi.ssr_pallas(n, pos, rgb, albedo, rough, metal,
                                    f0, fx, fy, GI, mode="exact")
    # Bound: per-texel quantum 4.9e-4 * max(=50) ~ 0.025, averaged over
    # the march's accumulated samples; allow a small multiple.
    err = np.abs(np.asarray(out_c) - np.asarray(ref_c)).max()
    assert err <= 0.1, err

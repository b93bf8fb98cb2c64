"""Cubemap ops: sampling inverses, mip chain, prefilter parity."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gi_gs_tpu.ops import cubemap as cm
from gi_gs_tpu.models import light as light_mod


def test_dir_to_face_uv_roundtrip():
    res = 16
    dirs = cm.texel_dirs(res)  # [6, R, R, 3]
    face, fx, fy = cm.dir_to_face_uv(jnp.asarray(dirs))
    exp_face = np.arange(6)[:, None, None] * np.ones((1, res, res))
    np.testing.assert_array_equal(np.asarray(face), exp_face)
    idx = (np.arange(res) + 0.5) / res * 2 - 1
    gy, gx = np.meshgrid(idx, idx, indexing="ij")
    np.testing.assert_allclose(np.asarray(fx)[0], gx, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fy)[0], gy, atol=1e-6)


def test_sample_cubemap_at_texel_centres():
    rng = np.random.RandomState(0)
    tex = jnp.asarray(rng.rand(6, 8, 8, 3).astype(np.float32))
    dirs = jnp.asarray(cm.texel_dirs(8))
    out = cm.sample_cubemap(tex, dirs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(tex), atol=1e-5)


def test_mip_chain_and_backward():
    rng = np.random.RandomState(1)
    tex = jnp.asarray(rng.rand(6, 16, 16, 3).astype(np.float32))
    down = cm.cubemap_mip(tex)
    assert down.shape == (6, 8, 8, 3)
    expect = 0.25 * (np.asarray(tex)[:, 0::2, 0::2] + np.asarray(tex)[:, 1::2, 0::2]
                     + np.asarray(tex)[:, 0::2, 1::2] + np.asarray(tex)[:, 1::2, 1::2])
    np.testing.assert_allclose(np.asarray(down), expect, atol=1e-6)
    g = jax.grad(lambda t: cm.cubemap_mip(t).sum())(tex)
    # bilinear redistribution of 0.25 * ones ~= 0.25 everywhere
    np.testing.assert_allclose(np.asarray(g), 0.25, atol=1e-5)


def test_diffuse_matrix_constant_map():
    """A constant-radiance environment integrates to ~constant irradiance
    with value = sum of cos-weighted areas / pi ~ 1."""
    tex = jnp.ones((6, 16, 16, 3), jnp.float32)
    out = cm.diffuse_cubemap(tex)
    v = np.asarray(out)
    # 16^2 texel quadrature is coarse at face corners; ~5% uniformity.
    assert np.abs(v - v.mean()).max() / v.mean() < 0.05
    assert 0.9 < v.mean() < 1.15


@pytest.mark.slow
def test_specular_patch_matches_dense():
    """Patch-conv path vs exact dense operator at res 32."""
    rng = np.random.RandomState(2)
    tex = jnp.asarray(rng.rand(6, 32, 32, 3).astype(np.float32))
    # Edge/corner halo texels can be double-counted or missed by the
    # nearest-texel halo resolution; interior is exact. Wider cones touch
    # more halo -> looser tolerance at rough 0.3 (at production scales the
    # patch/face ratio is comparable; a few % on mid-rough specular mips).
    for rough, tol95 in ((0.15, 0.02), (0.3, 0.05)):
        dense = cm.specular_cubemap(tex, rough, dense_max_res=32)
        patch = cm.specular_cubemap(tex, rough, dense_max_res=8)
        d, p = np.asarray(dense), np.asarray(patch)
        err = np.abs(d - p) / (np.abs(d) + 1e-3)
        assert np.quantile(err, 0.95) < tol95, \
            f"rough={rough}: p95 rel err {np.quantile(err, 0.95)}"
        assert np.quantile(err, 0.99) < 2.5 * tol95, \
            f"rough={rough}: p99 rel err {np.quantile(err, 0.99)}"


def test_build_mips_shapes():
    base = jnp.ones((6, 64, 64, 3), jnp.float32) * 0.5
    light = light_mod.build_mips(base)
    assert [s.shape[1] for s in light.specular] == [64, 32, 16]
    assert light.diffuse.shape == (6, 16, 16, 3)
    assert np.isfinite(np.asarray(light.specular[0])).all()


def test_latlong_roundtrip():
    """Cubemap -> latlong -> cubemap approximately identity for smooth maps."""
    dirs = cm.texel_dirs(16)
    smooth = jnp.asarray((dirs[..., 2:3] * 0.5 + 0.5) *
                         np.ones((1, 1, 1, 3)), jnp.float32)
    latlong = light_mod.export_envmap(smooth, (64, 128))
    back = light_mod.latlong_to_cubemap(latlong, 16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(smooth), atol=0.05)


def test_trilinear_specular_matches_dense_sum():
    """The 2-adjacent-level flat-stack gather equals the naive all-level
    weighted sum (the original formulation), values AND roughness/texture
    gradients."""
    from gi_gs_tpu.ops import shading

    rng = np.random.RandomState(5)
    specular = tuple(jnp.asarray(rng.rand(6, r, r, 3).astype(np.float32))
                     for r in (32, 16, 8))
    dirs = rng.randn(37, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dirs = jnp.asarray(dirs)
    mip = jnp.asarray(rng.rand(37, 1).astype(np.float32) * 2.4)

    def dense(specular, mip):
        L = len(specular)
        m = jnp.clip(mip[..., 0], 0.0, L - 1)
        lo = jnp.floor(m)
        frac = (m - lo)[..., None]
        out = jnp.zeros(dirs.shape[:-1] + (3,), jnp.float32)
        for lvl in range(L):
            w = (jnp.where(lo == lvl, 1.0 - frac[..., 0], 0.0) +
                 jnp.where(lo == lvl - 1, frac[..., 0], 0.0))[..., None]
            out = out + w * cm.sample_cubemap(specular[lvl], dirs)
        return out

    a = shading._trilinear_specular(specular, dirs, mip)
    b = dense(specular, mip)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)

    def loss_new(spec, m):
        return (shading._trilinear_specular(spec, dirs, m) ** 2).sum()

    def loss_old(spec, m):
        return (dense(spec, m) ** 2).sum()

    ga = jax.grad(loss_new, argnums=(0, 1))(specular, mip)
    gb = jax.grad(loss_old, argnums=(0, 1))(specular, mip)
    for x, y in zip(jax.tree.leaves(ga), jax.tree.leaves(gb)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-4, atol=1e-6)


def test_patch_kernels_match_ref():
    """Pallas patch-conv fwd/bwd (interpret on CPU) vs the jnp fori oracle."""
    from gi_gs_tpu.ops.cubemap import (_apply_patch_ref, _patch_tables,
                                       _specular_apply_patch)

    rng = np.random.RandomState(7)
    R = 64
    h, src_idx, W = _patch_tables(R, 0.15, 0.99)
    cmap = jnp.asarray(rng.rand(6, R, R, 3).astype(np.float32))

    out = _specular_apply_patch(cmap, src_idx, W, h)
    ref = _apply_patch_ref(cmap, src_idx, W, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)

    g = jnp.asarray(rng.randn(6, R, R, 3).astype(np.float32))

    def loss(c, fn):
        return (fn(c, src_idx, W, h) * g).sum()

    g_pallas = jax.grad(lambda c: loss(c, _specular_apply_patch))(cmap)
    g_ref = jax.grad(lambda c: loss(c, _apply_patch_ref))(cmap)
    np.testing.assert_allclose(np.asarray(g_pallas), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


def test_seamless_vs_clamp_quantified():
    """Seamless (cross-face halo) vs the old edge-clamp sampling:
    identical away from seams, bounded sub-texel difference on the seam
    ring, and continuity across the seam (VERDICT r2 item 9; nvdiffrast
    boundary_mode='cube', /root/reference/pbr/shade.py:142-181)."""
    rng = np.random.RandomState(11)
    R = 32
    cmap = jnp.asarray(rng.rand(6, R, R, 3).astype(np.float32))

    # Random dirs: interior (away from any face edge) must match exactly.
    d = rng.randn(4096, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    s = np.asarray(cm.sample_cubemap(cmap, jnp.asarray(d), seamless=True))
    c = np.asarray(cm.sample_cubemap(cmap, jnp.asarray(d), seamless=False))
    _, fx, fy = cm.dir_to_face_uv(jnp.asarray(d))
    interior = (np.abs(np.asarray(fx)) < 1.0 - 1.5 / R) & \
               (np.abs(np.asarray(fy)) < 1.0 - 1.5 / R)
    assert interior.sum() > 2000
    np.testing.assert_allclose(s[interior], c[interior], rtol=1e-6)

    # Seam ring: difference is bounded by the local texel contrast.
    diff = np.abs(s - c).max(-1)
    assert diff[~interior].max() < 1.0  # bounded by value range
    assert np.median(diff[~interior]) < 0.25

    # Continuity: walking across an edge, seamless steps stay small while
    # clamp jumps at the crossing.
    t = np.linspace(-0.15, 0.15, 201, dtype=np.float32)
    walk = np.stack([np.ones_like(t), t * 2.0, 0.3 * np.ones_like(t)], -1)
    walk /= np.linalg.norm(walk, axis=1, keepdims=True)
    sv = np.asarray(cm.sample_cubemap(cmap, jnp.asarray(walk),
                                      seamless=True))
    steps = np.abs(np.diff(sv, axis=0)).max()
    # max per-sample step bounded by bilinear smoothness of the halo path
    assert steps < 0.35, steps


def test_static_latlong_sampler_matches_dynamic():
    """make_latlong_sampler (static taps + scatter-free VJP) vs the
    dynamic seamless sample_cubemap path: values and cubemap gradients."""
    rng = np.random.RandomState(13)
    R = 16
    base = jnp.asarray(rng.rand(6, R, R, 3).astype(np.float32))
    res = (32, 64)
    f = light_mod.make_latlong_sampler(R, res)
    a = f(base)
    b = cm.sample_cubemap(base, light_mod.envmap_dirs(res))
    # f64 (numpy) vs f32 (jnp) direction grids: ~1e-6 weight noise
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-4, atol=5e-6)
    g = jnp.asarray(rng.randn(*res, 3).astype(np.float32))
    ga = jax.grad(lambda x: (f(x) * g).sum())(base)
    gb = jax.grad(lambda x: (cm.sample_cubemap(
        x, light_mod.envmap_dirs(res)) * g).sum())(base)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-3, atol=1e-4)


def test_load_hdr_fallback_parity(tmp_path):
    """Pure-python Radiance RGBE decoder vs cv2 (the reference's reader,
    render.py:32-45): exact match — both use mantissa * 2^(e-136)."""
    cv2 = pytest.importorskip("cv2")
    from gi_gs_tpu.models.light import _read_radiance_hdr, load_hdr
    rng = np.random.RandomState(0)
    img = (rng.rand(32, 64, 3).astype(np.float32) * 4.0) ** 2
    img[4:8, 4:8] = 0.0          # zero block exercises exp==0
    img[10, :] = 3.7             # constant row exercises RLE runs
    p = str(tmp_path / "e.hdr")
    cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    via_cv2 = load_hdr(p)
    via_py = _read_radiance_hdr(p)
    np.testing.assert_array_equal(via_py, via_cv2)

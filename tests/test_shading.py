"""Parity of the generated split-sum env-BRDF LUT against the binary the
reference ships (/root/reference/pbr/brdf_256_256.bin, loaded at
pbr/shade.py:96-101 and sampled for every phase-2 specular pixel at
shade.py:159-166).

The binary is read directly from the read-only reference checkout as a
numeric fixture — it is NOT vendored into this repo. The test is skipped
if the checkout is absent (e.g. when the repo is used standalone)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, ".")

REF_LUT = "/root/reference/pbr/brdf_256_256.bin"


@pytest.mark.skipif(not os.path.exists(REF_LUT),
                    reason="reference checkout not available")
def test_brdf_lut_matches_reference_binary():
    from gi_gs_tpu.ops.shading import get_brdf_lut
    ref = np.fromfile(REF_LUT, dtype=np.float32).reshape(256, 256, 2)
    ours = np.asarray(get_brdf_lut())
    err = np.abs(ours - ref)
    # Residual is Monte-Carlo noise of the 4096-sample GGX integration:
    # measured max 0.0064 / mean 2.7e-4 (16384 samples halves it again;
    # the *wrong* separable Schlick-GGX visibility is off by up to 0.35).
    assert err.max() < 0.01, f"max LUT error {err.max():.4f}"
    assert err.mean() < 1e-3, f"mean LUT error {err.mean():.5f}"


def test_brdf_lut_basic_properties():
    """Sanity bounds that hold regardless of the reference checkout:
    scale+bias in [0,1], bias→0 at NoV→1 row end, smooth in roughness."""
    from gi_gs_tpu.ops.shading import get_brdf_lut
    lut = np.asarray(get_brdf_lut())
    assert lut.shape == (256, 256, 2)
    assert np.isfinite(lut).all()
    assert lut.min() >= 0.0 and lut.max() <= 1.0 + 2e-4  # MC noise headroom
    # At NoV ~ 1 (last column) the Fresnel-weighted bias term vanishes.
    assert lut[:, -1, 1].max() < 0.02
    # Roughness rows vary smoothly (no MC spikes between adjacent rows).
    assert np.abs(np.diff(lut, axis=0)).max() < 0.05


@pytest.mark.slow
def test_pbr_shading_chw_matches_oracle():
    """The channels-first fast path (flat rows + quad-packed tables) must
    reproduce the channel-last oracle exactly (same taps and weights,
    reassociated arithmetic)."""
    import jax
    import jax.numpy as jnp
    from gi_gs_tpu.models import light as light_mod
    from gi_gs_tpu.ops.shading import pbr_shading, pbr_shading_chw, get_brdf_lut

    H, W, R = 24, 32, 32
    rng = np.random.RandomState(0)
    spec_struct, arrays = light_mod.build_prefilter_tables(R)
    base = jnp.asarray(rng.rand(6, R, R, 3).astype(np.float32))
    light = light_mod.build_mips_packed(base, spec_struct, arrays)

    nrm = rng.standard_normal((H, W, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    vd = rng.standard_normal((H, W, 3)).astype(np.float32)
    vd /= np.linalg.norm(vd, axis=-1, keepdims=True)
    alb = rng.rand(H, W, 3).astype(np.float32)
    rough = rng.rand(H, W, 1).astype(np.float32)
    occ = rng.rand(H, W, 1).astype(np.float32)
    metal = rng.rand(H, W, 1).astype(np.float32)
    mask = rng.rand(H, W, 1) > 0.3
    lut = get_brdf_lut()

    ref = pbr_shading(light, jnp.asarray(nrm), jnp.asarray(vd),
                      jnp.asarray(alb), jnp.asarray(rough),
                      jnp.asarray(mask), lut, occlusion=jnp.asarray(occ),
                      metallic=jnp.asarray(metal))
    chw = lambda a: jnp.asarray(np.moveaxis(a, -1, 0))
    fast = pbr_shading_chw(light, chw(nrm), chw(vd), chw(alb), chw(rough),
                           chw(np.asarray(mask)), occlusion=chw(occ),
                           metallic=chw(metal))
    for k in ("render_rgb", "diffuse_rgb", "specular_rgb", "diffuse_light"):
        np.testing.assert_allclose(
            np.asarray(fast[k]), np.moveaxis(np.asarray(ref[k]), -1, 0),
            atol=2e-6, rtol=1e-5, err_msg=k)

    # Gradients to the light texels agree too (the training path).
    def loss_ref(cube):
        lt = light_mod.build_mips_packed(cube, spec_struct, arrays)
        out = pbr_shading(lt, jnp.asarray(nrm), jnp.asarray(vd),
                          jnp.asarray(alb), jnp.asarray(rough),
                          jnp.asarray(mask), lut,
                          occlusion=jnp.asarray(occ))
        return (out["render_rgb"] ** 2).sum()

    def loss_fast(cube):
        lt = light_mod.build_mips_packed(cube, spec_struct, arrays)
        out = pbr_shading_chw(lt, chw(nrm), chw(vd), chw(alb), chw(rough),
                              chw(np.asarray(mask)), occlusion=chw(occ))
        return (out["render_rgb"] ** 2).sum()

    g1 = jax.grad(loss_ref)(base)
    g2 = jax.grad(loss_fast)(base)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                               atol=5e-5, rtol=1e-3)

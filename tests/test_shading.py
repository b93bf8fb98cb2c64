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

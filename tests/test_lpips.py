"""VGG-LPIPS metric: shapes, determinism, metric axioms on random weights,
and weight-loader round-trips (the pretrained weights themselves are not
available offline — see gi_gs_tpu/utils/lpips.py)."""
import numpy as np
import pytest

from gi_gs_tpu.utils import lpips as lpips_mod


@pytest.fixture(scope="module")
def weights():
    return lpips_mod.random_lpips_weights(seed=3)


def test_lpips_basic(weights):
    rng = np.random.RandomState(0)
    a = rng.rand(3, 64, 64).astype(np.float32)
    b = rng.rand(3, 64, 64).astype(np.float32)
    d_ab = lpips_mod.lpips(a, b, weights)
    d_ab2 = lpips_mod.lpips(a, b, weights)
    assert np.isfinite(d_ab)
    assert d_ab == d_ab2, "not deterministic"
    assert d_ab > 0.0
    # identity -> 0 (squared-diff form)
    assert lpips_mod.lpips(a, a, weights) == pytest.approx(0.0, abs=1e-9)
    # symmetric
    assert lpips_mod.lpips(b, a, weights) == pytest.approx(d_ab, rel=1e-5)


def test_lpips_npz_roundtrip(tmp_path, weights):
    path = str(tmp_path / "w.npz")
    np.savez(path, **weights)
    loaded = lpips_mod.load_lpips_weights(path)
    assert set(loaded) == set(weights)
    rng = np.random.RandomState(1)
    a = rng.rand(3, 32, 32).astype(np.float32)
    b = rng.rand(3, 32, 32).astype(np.float32)
    assert lpips_mod.lpips(a, b, loaded) == pytest.approx(
        lpips_mod.lpips(a, b, weights), rel=1e-6)
    assert lpips_mod.maybe_load(path) is not None
    assert lpips_mod.maybe_load("") is None
    assert lpips_mod.maybe_load("/nonexistent/w.npz") is None


def test_lpips_torch_loader(tmp_path, weights):
    torch = pytest.importorskip("torch")
    # Build an lpips-package-style state dict from the random weights and
    # check the loader maps it back to the canonical layout.
    slices = {0: (0, 2), 1: (2, 4), 2: (4, 7), 3: (7, 10), 4: (10, 13)}
    # torchvision features indices of the 13 convs
    feat_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    sd = {}
    for s, (lo, hi) in slices.items():
        for i in range(lo, hi):
            sd[f"net.slice{s + 1}.{feat_idx[i]}.weight"] = \
                torch.from_numpy(weights[f"conv{i}_w"])
            sd[f"net.slice{s + 1}.{feat_idx[i]}.bias"] = \
                torch.from_numpy(weights[f"conv{i}_b"])
    for j in range(5):
        sd[f"lin{j}.model.1.weight"] = torch.from_numpy(
            weights[f"lin{j}_w"].reshape(1, -1, 1, 1))
    path = str(tmp_path / "w.pt")
    torch.save(sd, path)
    loaded = lpips_mod.load_lpips_weights(path)
    for k in weights:
        np.testing.assert_allclose(loaded[k], weights[k], rtol=1e-6)

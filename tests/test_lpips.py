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


def test_lpips_numeric_fixture(weights):
    """Committed numeric fixture: expected values were computed by an
    INDEPENDENT torch implementation of the lpips algorithm (see
    test_lpips_torch_cross_implementation, which regenerates the same
    numbers live). Guards the full pipeline — scaling layer, VGG conv
    stack, unit-normalisation, linear heads, spatial averaging."""
    import os
    fx = dict(np.load(os.path.join(os.path.dirname(__file__), "fixtures",
                                   "lpips_expected.npz")))
    assert int(fx["weight_seed"]) == 3
    for k in range(3):
        got = lpips_mod.lpips(fx[f"img_a{k}"], fx[f"img_b{k}"], weights)
        assert got == pytest.approx(float(fx["expected"][k]), abs=5e-5), \
            f"pair {k}: {got} vs fixture {fx['expected'][k]}"


def test_lpips_torch_cross_implementation(weights):
    """Independent torch re-implementation of the lpips-package forward
    (lpips/lpips.py LPIPS.forward with net='vgg'): scaling layer constants,
    torchvision VGG16 feature slices, normalize_tensor, 1x1 linear heads,
    spatial mean, layer sum. Must agree with the jnp implementation to
    float32 conv-accumulation tolerance."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def torch_lpips(a, b, w):
        def feats(x):
            x = (2 * x - 1 - SHIFT) / SCALE
            out, conv = [], 0
            for v in lpips_mod._VGG_CFG:
                if v == "M":
                    x = F.max_pool2d(x, 2, 2)
                    continue
                x = F.relu(F.conv2d(
                    x, torch.from_numpy(w[f"conv{conv}_w"]),
                    torch.from_numpy(w[f"conv{conv}_b"]), padding=1))
                if conv in lpips_mod._TAPS:
                    out.append(x)
                conv += 1
            return out

        fa = feats(torch.from_numpy(a)[None])
        fb = feats(torch.from_numpy(b)[None])
        total = 0.0
        for j, (x, y) in enumerate(zip(fa, fb)):
            nx = x / torch.sqrt((x * x).sum(1, keepdim=True) + 1e-10)
            ny = y / torch.sqrt((y * y).sum(1, keepdim=True) + 1e-10)
            d = (nx - ny) ** 2
            lw = torch.from_numpy(w[f"lin{j}_w"]).view(1, -1, 1, 1)
            total = total + (d * lw).sum(1).mean()
        return float(total)

    rng = np.random.RandomState(11)
    a = rng.rand(3, 40, 40).astype(np.float32)
    b = np.clip(a + rng.normal(scale=0.15, size=a.shape), 0, 1) \
        .astype(np.float32)
    tv = torch_lpips(a, b, weights)
    jv = lpips_mod.lpips(a, b, weights)
    assert jv == pytest.approx(tv, abs=5e-5)


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


def test_lpips_torchvision_format_loader(tmp_path, weights):
    """Second supported .pth layout: {"vgg": torchvision vgg16 state_dict,
    "lin": lpips linear-head state_dict} — the path a user takes when they
    have torchvision weights but not the lpips package's bundled file."""
    torch = pytest.importorskip("torch")
    feat_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    vgg = {}
    for i, f in enumerate(feat_idx):
        vgg[f"features.{f}.weight"] = torch.from_numpy(weights[f"conv{i}_w"])
        vgg[f"features.{f}.bias"] = torch.from_numpy(weights[f"conv{i}_b"])
    # classifier keys present in a real torchvision state dict are ignored
    vgg["classifier.0.weight"] = torch.zeros(2, 2)
    lin = {f"lins.{j}.model.1.weight": torch.from_numpy(
        weights[f"lin{j}_w"].reshape(1, -1, 1, 1)) for j in range(5)}
    path = str(tmp_path / "w_tv.pth")
    torch.save({"vgg": vgg, "lin": lin}, path)
    loaded = lpips_mod.load_lpips_weights(path)
    for k in weights:
        np.testing.assert_allclose(loaded[k], weights[k], rtol=1e-6)
    rng = np.random.RandomState(2)
    a = rng.rand(3, 32, 32).astype(np.float32)
    b = rng.rand(3, 32, 32).astype(np.float32)
    assert lpips_mod.lpips(a, b, loaded) == pytest.approx(
        lpips_mod.lpips(a, b, weights), rel=1e-5)

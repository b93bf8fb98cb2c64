"""LPIPS (VGG16 variant) in pure jnp with externally-loaded weights.

The reference computes LPIPS via the `lpips` pip package
(/root/reference/render.py:19,200,381,617; /root/reference/train.py:597),
whose pretrained VGG16 + linear-head weights are downloaded at runtime.
This environment is offline, so the metric is only computed when the user
supplies a weights file via `--lpips_weights`; otherwise eval JSONs report
null (exactly like round-2, but now the metric implementation exists and
is exercised by tests on random weights).

Accepted weight formats:
  * .npz with arrays `conv{i}_w` [Cout, Cin, kh, kw], `conv{i}_b` [Cout]
    for i in 0..12 (the 13 VGG16 convs, torchvision layout) and
    `lin{j}_w` [C_j] for j in 0..4 (the LPIPS 1x1 heads, squeezed).
  * torch checkpoint (.pt/.pth) of either the `lpips.LPIPS(net='vgg')`
    module state dict (keys `net.slice*.*.weight` / `lin*.model.1.weight`)
    or a dict {"vgg": torchvision_vgg16_state_dict, "lin": lpips_state_dict}.

The computation follows the lpips package exactly: inputs in [0, 1] are
mapped to [-1, 1], normalised by the fixed shift/scale, passed through
VGG16 features, the activations after relu1_2, relu2_2, relu3_3, relu4_3,
relu5_3 are channel-unit-normalised, squared differences are weighted by
the linear heads and spatially averaged, and the five layer scores sum.
Numeric parity of this pipeline is pinned by tests/test_lpips.py: an
independent torch implementation of the same algorithm and a committed
fixture (tests/fixtures/lpips_expected.npz) agree with this module to
float32 tolerance on fixed weights.

To export real weights on a machine that has them:

    python -c "import lpips, torch; m = lpips.LPIPS(net='vgg'); \
               torch.save(m.state_dict(), 'lpips_vgg.pth')"

then pass `--lpips_weights lpips_vgg.pth` to the eval CLIs (the
`net.slice*` / `lin*.model.1.weight` keys are mapped by
load_lpips_weights below).
"""
from __future__ import annotations

import functools
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# torchvision VGG16 `features` conv indices and the layer boundaries after
# which LPIPS taps activations (relu indices 3, 8, 15, 22, 29).
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512]
_TAPS = (1, 3, 6, 9, 12)   # conv counter values AFTER which we tap (0-based:
                           # tap after the 2nd, 4th, 7th, 10th, 13th conv)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, np.float32)


def load_lpips_weights(path: str) -> Dict[str, np.ndarray]:
    """Load LPIPS weights into the canonical dict (see module docstring)."""
    if path.endswith(".npz"):
        data = dict(np.load(path))
        return {k: np.asarray(v, np.float32) for k, v in data.items()}

    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    out: Dict[str, np.ndarray] = {}
    if any(k.startswith("net.slice") for k in obj):
        # lpips.LPIPS state dict: net.sliceN.<features_idx>.weight
        conv_items: List[Tuple[int, str]] = []
        for k in obj:
            if k.startswith("net.slice") and k.endswith(".weight"):
                conv_items.append((int(k.split(".")[2]), k))
        conv_items.sort()
        for i, (_, k) in enumerate(conv_items):
            out[f"conv{i}_w"] = _to_np(obj[k])
            out[f"conv{i}_b"] = _to_np(obj[k[:-len("weight")] + "bias"])
        for j in range(5):
            out[f"lin{j}_w"] = _to_np(
                obj[f"lin{j}.model.1.weight"]).reshape(-1)
    elif "vgg" in obj and "lin" in obj:
        vgg, lin = obj["vgg"], obj["lin"]
        conv_idx = [i for i, v in enumerate(_VGG_CFG) if v != "M"]
        # torchvision features indices: convs at 0,2,5,7,10,12,14,17,...
        feat_idx = []
        fi = 0
        for v in _VGG_CFG:
            if v == "M":
                fi += 1
            else:
                feat_idx.append(fi)
                fi += 2
        for i, f in enumerate(feat_idx):
            out[f"conv{i}_w"] = _to_np(vgg[f"features.{f}.weight"])
            out[f"conv{i}_b"] = _to_np(vgg[f"features.{f}.bias"])
        for j in range(5):
            key = f"lin{j}.model.1.weight" if f"lin{j}.model.1.weight" in lin \
                else f"lins.{j}.model.1.weight"
            out[f"lin{j}_w"] = _to_np(lin[key]).reshape(-1)
    else:
        raise ValueError(f"unrecognised LPIPS weight format in {path}: "
                         f"keys {sorted(obj)[:5]}...")
    return out


def random_lpips_weights(seed: int = 0) -> Dict[str, np.ndarray]:
    """Correctly-shaped random weights (for tests)."""
    rng = np.random.RandomState(seed)
    out = {}
    cin = 3
    i = 0
    taps = []
    for v in _VGG_CFG:
        if v == "M":
            continue
        out[f"conv{i}_w"] = rng.randn(v, cin, 3, 3).astype(np.float32) * 0.05
        out[f"conv{i}_b"] = rng.randn(v).astype(np.float32) * 0.01
        cin = v
        i += 1
    for j, tap in enumerate(_TAPS):
        c = [v for v in _VGG_CFG if v != "M"][tap]
        out[f"lin{j}_w"] = np.abs(rng.randn(c).astype(np.float32)) * 0.1
    return out


def _vgg_features(x: jnp.ndarray, w: Dict[str, jnp.ndarray]):
    """x: [N, 3, H, W] normalised. Returns the 5 tapped activations."""
    feats = []
    conv = 0
    for v in _VGG_CFG:
        if v == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                "VALID")
            continue
        x = jax.lax.conv_general_dilated(
            x, w[f"conv{conv}_w"], (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = x + w[f"conv{conv}_b"][None, :, None, None]
        x = jax.nn.relu(x)
        if conv in _TAPS:
            feats.append(x)
        conv += 1
    return feats


@functools.partial(jax.jit, static_argnames=())
def _lpips_jit(img0: jnp.ndarray, img1: jnp.ndarray, w) -> jnp.ndarray:
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]

    def prep(im):
        im = im[None] if im.ndim == 3 else im
        return (2.0 * im - 1.0 - shift) / scale

    f0 = _vgg_features(prep(img0), w)
    f1 = _vgg_features(prep(img1), w)
    total = jnp.float32(0.0)
    for j, (a, b) in enumerate(zip(f0, f1)):
        na = a * jax.lax.rsqrt((a * a).sum(1, keepdims=True) + 1e-10)
        nb = b * jax.lax.rsqrt((b * b).sum(1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2
        lw = w[f"lin{j}_w"][None, :, None, None]
        total = total + (d * lw).sum(1).mean()
    return total


def lpips(img0, img1, weights: Dict[str, np.ndarray]) -> float:
    """LPIPS distance between two [3, H, W] images in [0, 1]."""
    w = {k: jnp.asarray(v) for k, v in weights.items()}
    return float(_lpips_jit(jnp.asarray(img0), jnp.asarray(img1), w))


def maybe_load(path: Optional[str]) -> Optional[Dict[str, np.ndarray]]:
    """Weights if `path` names an existing file, else None (metric -> null)."""
    if path and os.path.exists(path):
        return load_lpips_weights(path)
    return None

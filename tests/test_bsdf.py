"""BSDF primitives vs the reference's pure-PyTorch implementations —
the generalisation of the reference's own dual-path parity strategy
(pbr/renderutils/tests/test_bsdf.py compares CUDA vs torch; here we
compare our jnp ops vs the same torch reference, outputs AND grads)."""
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

sys.path.insert(0, "/root/reference/pbr/renderutils")
import bsdf as ref_bsdf  # noqa: E402  (reference torch implementation)

from gi_gs_tpu.ops import bsdf as our  # noqa: E402


def rnd(shape, seed):
    return np.random.RandomState(seed).uniform(-1, 1, shape).astype(np.float32)


def t(x):
    return torch.tensor(x, requires_grad=True)


def check(ours_val, ref_val, tol=1e-5):
    np.testing.assert_allclose(np.asarray(ours_val),
                               ref_val.detach().numpy(), rtol=tol, atol=tol)


def test_lambert():
    nrm, wi = rnd((4, 5, 3), 0), rnd((4, 5, 3), 1)
    check(our.lambert(jnp.asarray(nrm), jnp.asarray(wi)),
          ref_bsdf.bsdf_lambert(torch.tensor(nrm), torch.tensor(wi)))


def test_frostbite():
    nrm = rnd((4, 5, 3), 0)
    wi = rnd((4, 5, 3), 1)
    wo = rnd((4, 5, 3), 2)
    r = np.random.RandomState(3).uniform(0, 1, (4, 5, 1)).astype(np.float32)
    check(our.frostbite_diffuse(*map(jnp.asarray, (nrm, wi, wo, r))),
          ref_bsdf.bsdf_frostbite(*map(torch.tensor, (nrm, wi, wo, r))))


def test_ggx_parts():
    a = np.random.RandomState(0).uniform(0.01, 1, (8, 1)).astype(np.float32)
    c = np.random.RandomState(1).uniform(-1, 1, (8, 1)).astype(np.float32)
    check(our.ndf_ggx(jnp.asarray(a), jnp.asarray(c)),
          ref_bsdf.bsdf_ndf_ggx(torch.tensor(a), torch.tensor(c)))
    check(our.lambda_ggx(jnp.asarray(a), jnp.asarray(c)),
          ref_bsdf.bsdf_lambda_ggx(torch.tensor(a), torch.tensor(c)))


def test_pbr_bsdf_fwd_and_grad():
    kd = np.random.RandomState(0).uniform(0, 1, (2, 6, 3)).astype(np.float32)
    arm = np.random.RandomState(1).uniform(0.05, 1, (2, 6, 3)).astype(np.float32)
    pos = rnd((2, 6, 3), 2)
    nrm_raw = rnd((2, 6, 3), 3)
    view_pos = rnd((1, 1, 3), 4) + 2.0
    light_pos = rnd((1, 1, 3), 5) + 2.0

    for mode in ("lambert", "frostbite"):
        tk, ta, tp, tn = t(kd), t(arm), t(pos), t(nrm_raw)
        ref = ref_bsdf.bsdf_pbr(tk, ta, tp, tn, torch.tensor(view_pos),
                                torch.tensor(light_pos), 0.08,
                                0 if mode == "lambert" else 1)
        ref.sum().backward()

        def f(kd_, arm_, pos_, nrm_):
            return our.pbr_bsdf(kd_, arm_, pos_, nrm_,
                                jnp.asarray(view_pos), jnp.asarray(light_pos),
                                0.08, mode).sum()

        val, grads = jax.value_and_grad(f, argnums=(0, 1, 2, 3))(
            *map(jnp.asarray, (kd, arm, pos, nrm_raw)))
        # NOTE: reference bsdf_pbr uses raw (unnormalised) nrm in lobes
        np.testing.assert_allclose(float(val), float(ref.sum()), rtol=1e-4)
        for g, tref in zip(grads, (tk, ta, tp, tn)):
            np.testing.assert_allclose(np.asarray(g), tref.grad.numpy(),
                                       rtol=1e-3, atol=1e-4)


def test_prepare_shading_normal():
    pos = rnd((2, 6, 3), 0)
    view_pos = rnd((1, 1, 3), 1) * 3
    pn = rnd((2, 6, 3), 2)
    sn = rnd((2, 6, 3), 3)
    st = rnd((2, 6, 3), 4)
    gn = rnd((2, 6, 3), 5)
    for two_sided in (True, False):
        for opengl in (True, False):
            ref = ref_bsdf.bsdf_prepare_shading_normal(
                *map(torch.tensor, (pos, view_pos, pn, sn, st, gn)),
                two_sided, opengl)
            ours = our.prepare_shading_normal(
                *map(jnp.asarray, (pos, view_pos, pn, sn, st, gn)),
                two_sided, opengl)
            check(ours, ref, tol=1e-4)


def test_xfm_and_loss():
    pts = rnd((2, 7, 3), 0)
    mtx = rnd((2, 4, 4), 1)
    ref_pts = torch.matmul(
        torch.nn.functional.pad(torch.tensor(pts), (0, 1), value=1.0),
        torch.transpose(torch.tensor(mtx), 1, 2))
    np.testing.assert_allclose(
        np.asarray(our.xfm_points(jnp.asarray(pts), jnp.asarray(mtx))),
        ref_pts.numpy(), rtol=1e-5, atol=1e-5)

    img = np.random.RandomState(2).uniform(0, 10, (2, 8, 8, 3)).astype(np.float32)
    tgt = np.random.RandomState(3).uniform(0, 10, (2, 8, 8, 3)).astype(np.float32)
    sys.path.insert(0, "/root/reference/pbr/renderutils")
    import loss as ref_loss
    for l in ("l1", "mse", "smape", "relmse"):
        for tm in ("none", "log_srgb"):
            ref = ref_loss.image_loss_fn(torch.tensor(img), torch.tensor(tgt), l, tm)
            ours = our.image_loss(jnp.asarray(img), jnp.asarray(tgt), l, tm)
            np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5,
                                       err_msg=f"{l}/{tm}")

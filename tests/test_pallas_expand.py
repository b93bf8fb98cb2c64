"""Pallas instance-expansion kernel vs the XLA oracle (binning backends).

Invariants (see pallas_expand.py):
  * offsets / segment structure identical,
  * on every row the XLA backend keeps, the Pallas backend produces the
    SAME tile, gid and BIT-EXACT depth,
  * rows only the Pallas backend keeps are exactly XLA's alpha-culled
    instances (the bf16 cull is conservatively slacked),
  * the composited image through the full pipeline is identical.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gi_gs_tpu.ops.rasterize import RasterConfig
from gi_gs_tpu.ops.rasterize.binning import _expand_xla, bin_and_sort
from gi_gs_tpu.ops.rasterize.pallas_expand import expand_pallas
from gi_gs_tpu.ops.rasterize.pipeline import rasterize
from gi_gs_tpu.ops.rasterize.preprocess import preprocess

from utils import random_scene

CFG = RasterConfig(tile_h=8, tile_w=32, cap_instances=1 << 14,
                   cap_tile=512, chunk=8)


def _pre(scene, cfg, with_opacity=True):
    cam, w, h = scene["cam"], scene["width"], scene["height"]
    return preprocess(scene["xyz"], scene["cov3d"], cam.w2c, cam.full_proj,
                      cam.tanfovx, cam.tanfovy, w, h, cfg,
                      opacity=scene["opacity"] if with_opacity else None)


@pytest.mark.parametrize("seed,n", [(0, 300), (1, 300), (2, 50), (3, 700)])
def test_expand_matches_xla(seed, n):
    scene = random_scene(n=n, seed=seed)
    cfg = CFG
    pre = _pre(scene, cfg)
    h, w = scene["height"], scene["width"]
    num_tiles = int(np.prod(cfg.grid(h, w)))

    tp, dp, gp, op_, totp = jax.jit(
        lambda p: expand_pallas(p, h, w, cfg, interpret=True))(pre)
    tx, dx, gx, ox, totx = jax.jit(
        lambda p: _expand_xla(p, h, w, cfg))(pre)

    np.testing.assert_array_equal(np.asarray(op_), np.asarray(ox))
    assert int(totp) == int(totx)

    tp, dp, gp = np.asarray(tp), np.asarray(dp), np.asarray(gp)
    tx, dx, gx = np.asarray(tx), np.asarray(dx), np.asarray(gx)
    keep_x = tx < num_tiles
    keep_p = tp < num_tiles
    # Conservative cull: pallas keeps a superset of XLA's rows.
    assert not np.any(keep_x & ~keep_p)
    np.testing.assert_array_equal(tp[keep_x], tx[keep_x])
    np.testing.assert_array_equal(gp[keep_x], gx[keep_x])
    # Depth is carried bit-exactly through the bf16 chunk split.
    np.testing.assert_array_equal(
        dp[keep_x].view(np.int32), dx[keep_x].view(np.int32))
    # Extra pallas-kept rows were alpha-culled borderline cases, not
    # structural rows (they still belong to a real in-range instance).
    extra = keep_p & ~keep_x
    total = int(totx)
    assert np.all(np.nonzero(extra)[0] < total)


def test_expand_no_opacity_and_dummies():
    """Without opacity the cull runs at op=1; culled gaussians emit one
    sentinel dummy each so offsets stay strictly increasing."""
    scene = random_scene(n=150, seed=5)
    cfg = CFG
    pre = _pre(scene, cfg, with_opacity=False)
    h, w = scene["height"], scene["width"]
    tp, dp, gp, offs, tot = jax.jit(
        lambda p: expand_pallas(p, h, w, cfg, interpret=True))(pre)
    offs = np.asarray(offs)
    assert np.all(np.diff(offs) >= 1)
    counts = np.asarray(pre.tiles_touched)
    assert int(tot) == int(np.maximum(counts, 1).sum())
    # Dummy rows of culled gaussians carry the sentinel tile.
    num_tiles = int(np.prod(cfg.grid(h, w)))
    tp = np.asarray(tp)
    for g in np.nonzero(counts == 0)[0][:20]:
        assert tp[offs[g]] == num_tiles


def test_pipeline_image_identical_across_backends():
    """The full rasterize() output must match between expansion backends
    up to fp re-association: the extra conservatively-kept instances are
    rejected by the per-pixel alpha test so they contribute exactly 0,
    but their presence shifts the composite's chunk boundaries (different
    summation grouping -> ~1e-7 differences)."""
    scene = random_scene(n=400, seed=7)
    cam, w, h = scene["cam"], scene["width"], scene["height"]

    def run(eb):
        cfg = RasterConfig(tile_h=8, tile_w=32, cap_instances=1 << 14,
                           cap_tile=512, chunk=8, use_pallas=False,
                           expand_backend=eb)
        return rasterize(
            scene["xyz"], scene["cov3d"], scene["opacity"], scene["color"],
            scene["normal"], scene["albedo"], scene["roughness"],
            scene["metallic"], cam.w2c, cam.full_proj, cam.tanfovx,
            cam.tanfovy, h, w, jnp.zeros(3), cfg)

    a = run("pallas")
    b = run("xla")
    np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(a.normal), np.asarray(b.normal),
                               atol=1e-5)


def test_overflow_counts_dummies():
    """Capacity overflow accounts for dummy rows (capacity growth must
    provision them)."""
    scene = random_scene(n=300, seed=0)
    cfg = RasterConfig(tile_h=8, tile_w=32, cap_instances=1 << 9,
                       cap_tile=512, chunk=8, expand_backend="xla")
    pre = _pre(scene, cfg)
    h, w = scene["height"], scene["width"]
    b = bin_and_sort(pre, h, w, cfg)
    counts = np.asarray(pre.tiles_touched)
    total_p = int(np.maximum(counts, 1).sum())
    assert int(b.overflow) == max(total_p - cfg.cap_instances, 0)
    assert int(b.num_instances) == int(counts.sum())

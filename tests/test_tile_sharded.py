"""Tile-sharded composite (parallel/tile_sharded.py) vs the single-device
Pallas path: forward image and per-gaussian gradients must agree on an
8-virtual-device CPU mesh, including a tile count that does not divide the
mesh (window padding)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm3dgs_slam_tpu.ops.binning import build_bins
from mm3dgs_slam_tpu.ops.pallas_composite import CHUNK, composite_tiles_pallas
from mm3dgs_slam_tpu.ops.render import RenderSettings, project_for_pose
from mm3dgs_slam_tpu.parallel.mesh import make_mesh
from mm3dgs_slam_tpu.parallel.tile_sharded import composite_tiles_sharded

from utils import random_scene, small_camera

POSE = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)


def _setup(h=80, w=64):
    cam = small_camera(h=h, w=w, f=60.0)  # 5x4 = 20 tiles (8 shards pad)
    scene = random_scene(jax.random.PRNGKey(2), 300, cam)
    rs = RenderSettings(cam=cam, use_pallas=True, bin_d1=8, bin_big_frac=4,
                        max_tiles_per_gaussian=32)
    proj = project_for_pose(scene, POSE, rs)
    bg = jnp.zeros((6,), jnp.float32)
    return cam, rs, proj, bg


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_forward_matches_single_device():
    cam, rs, proj, bg = _setup()
    bins = build_bins(proj, cam, 0, rs.max_tiles_per_gaussian, align=CHUNK,
                      d1=rs.bin_d1, big_frac=rs.bin_big_frac)
    img_ref = composite_tiles_pallas(proj, bins, cam, bg, interpret=True)
    mesh = make_mesh(8)
    img_sh = composite_tiles_sharded(proj, cam, bg, mesh, rs, interpret=True)
    np.testing.assert_allclose(np.asarray(img_sh), np.asarray(img_ref),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_gradients_match_single_device():
    cam, rs, proj, bg = _setup()
    tgt = jnp.ones((6, cam.height, cam.width), jnp.float32) * 0.25

    def rebuild(packed):
        return proj._replace(
            xy=packed[:, 0:2], conic=packed[:, 2:5], opacity=packed[:, 5],
            feat=packed[:, 6:12], packed=packed,
        )

    def loss_single(packed):
        p = rebuild(packed)
        bins = build_bins(p, cam, 0, rs.max_tiles_per_gaussian, align=CHUNK,
                          d1=rs.bin_d1, big_frac=rs.bin_big_frac)
        img = composite_tiles_pallas(p, bins, cam, bg, interpret=True)
        return jnp.sum(jnp.abs(img - tgt))

    def loss_sharded(packed):
        img = composite_tiles_sharded(rebuild(packed), cam, bg, make_mesh(8),
                                      rs, interpret=True)
        return jnp.sum(jnp.abs(img - tgt))

    l1, g1 = jax.value_and_grad(loss_single)(proj.packed)
    l8, g8 = jax.value_and_grad(loss_sharded)(proj.packed)
    assert np.allclose(float(l8), float(l1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g8), np.asarray(g1),
                               atol=5e-4, rtol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_cached_window_bins_match_inline():
    """build_window_bins + composite(bins=...) must equal the inline-binning
    sharded path (and therefore the single-device path) in fwd and grad."""
    from mm3dgs_slam_tpu.parallel.tile_sharded import build_window_bins

    cam, rs, proj, bg = _setup()
    mesh = make_mesh(8)
    wbins = build_window_bins(proj, cam, mesh, rs)

    img_inline = composite_tiles_sharded(proj, cam, bg, mesh, rs,
                                         interpret=True)
    img_cached = composite_tiles_sharded(proj, cam, bg, mesh, rs,
                                         interpret=True, bins=wbins)
    np.testing.assert_allclose(np.asarray(img_cached),
                               np.asarray(img_inline), atol=1e-6)

    tgt = jnp.full((6, cam.height, cam.width), 0.25, jnp.float32)

    def loss(packed):
        p = proj._replace(xy=packed[:, 0:2], conic=packed[:, 2:5],
                          opacity=packed[:, 5], feat=packed[:, 6:12],
                          packed=packed)
        img = composite_tiles_sharded(p, cam, bg, mesh, rs, interpret=True,
                                      bins=wbins)
        return jnp.sum(jnp.abs(img - tgt))

    gc = jax.grad(loss)(proj.packed)
    assert bool(jnp.all(jnp.isfinite(gc)))

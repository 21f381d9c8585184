"""Tile-layout tracking loss == image-layout tracking loss.

tracking_loss_tiles (slam/tracker.py) evaluates every tracking loss term in
the compositor's native channel-major [n_tiles, C, PIX] layout to skip the
per-iteration image assembly. This must be a pure re-layout: with the SAME rendered
values, the loss must match tracking_loss bit-for-near (fp summation order
only). The kernel itself is covered by tests/test_pallas.py; here
render_tiles is stubbed with a to_tiles() re-layout of the image-path
render, isolating the mask/valid/crop algebra — including a camera whose
size is NOT a multiple of the 16-pixel tile edge (the padding pixels must
be excluded by tile_pixel_valid)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import mm3dgs_slam_tpu.slam.tracker as tracker_mod
from mm3dgs_slam_tpu.ops.render import (RenderSettings, render,
                                        tile_pixel_valid, to_tiles)
from mm3dgs_slam_tpu.slam.tracker import (TrackSettings, tracking_loss,
                                          tracking_loss_tiles)

from utils import random_scene, small_camera

IDENTITY = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)


def _assembled_to_out6(out):
    """Rebuild the [T, PIX, 6] tile tensor from a render() dict."""
    img6 = jnp.concatenate([out["render"], out["depth"]], axis=0)
    return None, img6


@pytest.mark.parametrize("hw", [(64, 80), (52, 70)])  # second: crop padding
@pytest.mark.parametrize("method,est", [("vigs", False), ("vigs", True),
                                        ("splatam", False)])
def test_tiles_loss_matches_image_loss(hw, method, est, monkeypatch):
    cam = small_camera(h=hw[0], w=hw[1], f=70.0)
    g = random_scene(jax.random.PRNGKey(3), 900, cam)
    rs = RenderSettings(cam=cam, pair_cap=1 << 16, max_per_tile=512,
                        chunk=16, max_tiles_per_gaussian=128)
    pose = jnp.array([0.999, 0.02, -0.01, 0.0, 0.01, -0.02, 0.03],
                     jnp.float32)
    pose = pose / jnp.linalg.norm(pose[:4])  # keep q unit-ish (loss only)

    out = render(g, IDENTITY, rs)
    gt_color = out["render"]
    gt_depth = out["depth"][0] / jnp.maximum(out["depth"][1], 1e-6)
    est_depth = 1.0 / (gt_depth + 0.5)

    ts = TrackSettings(
        rs=rs, iters=1, method=method, use_gt_depth=not est,
        use_depth_estimate_loss=True, pearson_weight=0.05,
        use_imu_loss=True, imu_T_weight=0.3, imu_q_weight=0.2,
    )

    ref = tracking_loss(g, pose, gt_color, gt_depth, est_depth, IDENTITY, ts)

    # stub render_tiles: re-layout the image-path render of the SAME pose
    out_p = render(g, pose, rs)
    img6_p = jnp.concatenate([out_p["render"], out_p["depth"]], axis=0)
    out6_t = to_tiles(img6_p, cam)
    monkeypatch.setattr(tracker_mod, "render_tiles",
                        lambda *a, **k: out6_t)

    tiled = tracking_loss_tiles(
        g, pose, to_tiles(gt_color, cam), to_tiles(gt_depth, cam),
        to_tiles(est_depth, cam), tile_pixel_valid(cam), IDENTITY, ts,
        bins=None,
    )
    np.testing.assert_allclose(np.asarray(tiled), np.asarray(ref),
                               rtol=2e-5, atol=2e-6)


def test_to_tiles_roundtrip_and_valid():
    cam = small_camera(h=52, w=70)
    img = jnp.arange(3 * 52 * 70, dtype=jnp.float32).reshape(3, 52, 70)
    t = to_tiles(img, cam)
    valid = tile_pixel_valid(cam)
    assert t.shape == (cam.n_tiles, 3, 256)
    assert int(valid.sum()) == 52 * 70
    # assemble back (the compositor's assembly) and compare
    ty, tx = cam.tiles_y, cam.tiles_x
    back = t.reshape(ty, tx, 3, 16, 16).transpose(2, 0, 3, 1, 4)
    back = back.reshape(3, ty * 16, tx * 16)[:, :52, :70]
    np.testing.assert_array_equal(np.asarray(back), np.asarray(img))

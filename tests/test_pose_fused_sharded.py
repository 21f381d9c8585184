"""Mesh-compatible fused pose tracking backward (round-5 VERDICT item 5):
render_tiles_pose_sharded's dq/dT on an 8-virtual-device CPU mesh must
match the single-chip fused path (ops/render.render_tiles_pose) — per-window
fused-kernel partials, summed per shard and psum'ed, vs one global kernel.
Differences are pure fp reassociation of the [16] sums.

Also locks the tracker gating: _pose_fused_static no longer requires
mesh is None, and _track_bins builds the table-free PoseWindowBins for it.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm3dgs_slam_tpu.ops.binning import build_bins
from mm3dgs_slam_tpu.ops.pallas_composite import CHUNK
from mm3dgs_slam_tpu.ops.render import (RenderSettings, project_for_pose,
                                        render_tiles_pose, tile_pixel_valid)
from mm3dgs_slam_tpu.parallel.mesh import make_mesh
from mm3dgs_slam_tpu.parallel.tile_sharded import (
    PoseWindowBins, build_window_bins_pose, render_tiles_pose_sharded)

from utils import random_scene, small_camera

POSE = jnp.array([1.0, 0.01, -0.02, 0.005, 0.03, -0.01, 0.02], jnp.float32)


def _setup(h=80, w=64, n=300):
    cam = small_camera(h=h, w=w, f=60.0)  # 5x4 = 20 tiles (8 shards pad)
    g = random_scene(jax.random.PRNGKey(4), n, cam)
    rs = RenderSettings(cam=cam, use_pallas=True, bin_d1=8, bin_big_frac=4,
                        max_tiles_per_gaussian=32)
    return cam, rs, g


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fused_pose_sharded_matches_single_chip():
    cam, rs, g = _setup()
    q0, T0 = POSE[:4] / jnp.linalg.norm(POSE[:4]), POSE[4:]
    pose = jnp.concatenate([q0, T0])
    proj = project_for_pose(g, pose, rs)
    valid = tile_pixel_valid(cam)

    # single-chip fused reference (table-free bins, same as the tracker's)
    bins1 = build_bins(proj, cam, 0, rs.max_tiles_per_gaussian, align=CHUNK,
                       d1=rs.bin_d1, big_frac=rs.bin_big_frac,
                       reverse_tables=False)

    def loss_single(q, T):
        out = render_tiles_pose(g, q, T, rs, bins1, nc=5, interpret=True)
        return jnp.sum(jnp.abs(out) * valid[:, None, :])

    mesh = make_mesh(8)
    binsw = build_window_bins_pose(proj, cam, mesh, rs)
    assert isinstance(binsw, PoseWindowBins)
    assert not bool(jnp.any(binsw.overflow))

    def loss_sharded(q, T):
        out = render_tiles_pose_sharded(g, q, T, rs, binsw, mesh, nc=5,
                                        interpret=True)
        return jnp.sum(jnp.abs(out) * valid[:, None, :])

    l1, (gq1, gt1) = jax.value_and_grad(loss_single, argnums=(0, 1))(q0, T0)
    l2, (gq2, gt2) = jax.value_and_grad(loss_sharded, argnums=(0, 1))(q0, T0)

    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for a, b, name in ((gq2, gq1, "dq"), (gt2, gt1, "dT")):
        a, b = np.asarray(a), np.asarray(b)
        s = max(np.abs(b).max(), 1e-8)
        assert np.abs(a - b).max() < 1e-4 * s, (
            f"{name}: {np.abs(a - b).max() / s:.2e} of max")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_tracker_gate_is_mesh_compatible():
    from mm3dgs_slam_tpu.slam.tracker import TrackSettings, _pose_fused_static

    cam, rs, _ = _setup()
    mesh = make_mesh(8)
    ts = TrackSettings(rs=rs, iters=1, mesh=mesh, pose_kernel=True,
                       track_tiles=True)
    assert _pose_fused_static(ts), (
        "fused pose gate must accept mesh-mode tracking (round-5 item 5)")
    assert not _pose_fused_static(ts._replace(pose_kernel=False))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_track_bins_builds_pose_window_bins_under_mesh():
    from mm3dgs_slam_tpu.slam.tracker import TrackSettings, _track_bins

    cam, rs, g = _setup()
    mesh = make_mesh(8)
    ts = TrackSettings(rs=rs, iters=1, mesh=mesh)
    bins = _track_bins(g, POSE, ts)
    assert isinstance(bins, PoseWindowBins)
    assert bins.tile_start.shape[0] % 8 == 0  # tpb-padded window grid

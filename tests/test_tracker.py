"""Tracker convergence: recover a known jittered pose on a synthetic map."""
import jax
import jax.numpy as jnp
import numpy as np

from mm3dgs_slam_tpu.ops.render import RenderSettings, render
from mm3dgs_slam_tpu.slam.tracker import TrackSettings, track_frame

from utils import random_scene, small_camera

IDENTITY_POSE = jnp.array([1.0, 0, 0, 0, 0, 0, 0], dtype=jnp.float32)


def test_tracker_recovers_jittered_pose():
    cam = small_camera(h=64, w=80, f=70.0)
    # dense, mostly-opaque scene: well-conditioned photometric tracking
    g = random_scene(jax.random.PRNGKey(11), 1200, cam, depth_range=(1.5, 5.0))
    g = g._replace(
        opacity=jnp.clip(g.opacity + 0.7, 0.7, 0.98),
        scales=jnp.clip(g.scales * 2.0, 0.02, 0.2),
    )
    rs = RenderSettings(cam=cam, pair_cap=1 << 17, max_per_tile=1024, chunk=16,
                        max_tiles_per_gaussian=128)

    gt_pose = IDENTITY_POSE
    out = render(g, gt_pose, rs)
    gt_color = out["render"]
    gt_depth = out["depth"][0] / jnp.maximum(out["depth"][1], 1e-6)

    jitter = jnp.array([1.0, 0.004, -0.006, 0.005, 0.02, -0.015, 0.01], jnp.float32)

    ts = TrackSettings(
        rs=rs, iters=100, method="vigs", use_gt_depth=True,
        use_depth_estimate_loss=False, pearson_weight=0.0,
        position_lr=0.002, rotation_lr=0.002,
    )
    pose, loss, overflow = track_frame(g, jitter, gt_color, gt_depth,
                                       jnp.zeros_like(gt_depth), ts)
    pose = np.asarray(pose)
    assert not bool(overflow)

    t_err0 = np.linalg.norm(np.asarray(jitter)[4:])
    t_err = np.linalg.norm(pose[4:] - np.asarray(gt_pose)[4:])
    q = pose[:4] / np.linalg.norm(pose[:4])
    ang_err = 2 * np.arccos(min(abs(q[0]), 1.0))
    print("t_err", t_err0, "->", t_err, "ang", ang_err, "loss", float(loss))
    assert t_err < 0.1 * t_err0
    assert ang_err < 0.005
    assert float(loss) < 0.01

#!/usr/bin/env python
"""Headline benchmark: tracking+mapping frames/second on TPU.

Measures the reference's iteration budget (100 tracking + 150 mapping Adam
iterations per frame, configs/TUM.yml:32,44) at TUM resolution (640x480) on
a realistic map size, end to end (render + loss + backward + optimizer),
and reports frames/second. vs_baseline is against the BASELINE.json
north-star of 30 FPS real-time tracking+mapping on one v5e chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

N_GAUSSIANS = 1 << 17      # ~131k live Gaussians (typical mapped-room scale)
H, W = 480, 640
TRACK_ITERS = 100
MAP_ITERS = 150
BASELINE_FPS = 30.0        # north-star target (BASELINE.json)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_scene
    from mm3dgs_slam_tpu.models import gaussians as G
    from mm3dgs_slam_tpu.ops.camera import Camera
    from mm3dgs_slam_tpu.ops.render import RenderSettings, render
    from mm3dgs_slam_tpu.slam.map_opt import MapCarry, MapOptSettings, optimize_map
    from mm3dgs_slam_tpu.slam.tracker import TrackSettings, track_frame

    m, _ = _build_scene(N_GAUSSIANS, cam_hw=(H, W))
    cam = Camera(height=H, width=W, fx=517.3, fy=516.5, cx=318.6, cy=255.3)
    # rebuild scene against the TUM camera
    m, cam = _build_scene(N_GAUSSIANS, cam_hw=(H, W))
    adam = G.init_adam(m)
    rs = RenderSettings(cam=cam, pair_cap=1 << 21, max_per_tile=1024, chunk=32,
                        max_tiles_per_gaussian=64)

    pose = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)
    out = render(m.activated(), pose, rs)
    gt_color = jnp.clip(out["render"], 0, 1)
    gt_depth = out["depth"][0] / jnp.maximum(out["depth"][1], 1e-6)
    jax.block_until_ready(gt_color)

    # --- tracking ------------------------------------------------------
    ts = TrackSettings(rs=rs, iters=TRACK_ITERS, method="vigs",
                       use_gt_depth=True, position_lr=0.001, rotation_lr=0.003)
    jitter = pose.at[4].add(0.01)
    p, _ = track_frame(m.activated(), jitter, gt_color, gt_depth,
                       jnp.zeros_like(gt_depth), ts)
    jax.block_until_ready(p)  # compile
    t0 = time.perf_counter()
    p, _ = track_frame(m.activated(), jitter, gt_color, gt_depth,
                       jnp.zeros_like(gt_depth), ts)
    jax.block_until_ready(p)
    track_s = time.perf_counter() - t0

    # --- mapping -------------------------------------------------------
    hyper = G.MapOptHyper(lr_xyz=1e-4, lr_features_dc=2.5e-3,
                          lr_features_rest=1.25e-4, lr_scaling=1e-3,
                          lr_rotation=1e-3, lr_opacity=5e-2, lr_rgb=2.5e-3)
    ms = MapOptSettings(rs=rs, iters=MAP_ITERS, method="vigs",
                        use_gt_depth=True, lambda_dssim=0.2, hyper=hyper)
    K = 8
    kf_colors = jnp.tile(gt_color[None], (K, 1, 1, 1))
    kf_depths = jnp.tile(gt_depth[None], (K, 1, 1))
    kf_ests = jnp.zeros_like(kf_depths)
    kf_poses = jnp.tile(pose[None], (K, 1))
    schedule = jnp.arange(MAP_ITERS, dtype=jnp.int32) % K
    cap = m.capacity

    def carry():
        return MapCarry(
            m=m, adam=adam,
            max_radii=jnp.zeros((cap,), jnp.float32),
            grad_accum=jnp.zeros((cap,), jnp.float32),
            denom=jnp.zeros((cap,), jnp.float32),
            ba_mask=jnp.ones((cap,), bool),
            kf_poses=kf_poses, pose_m=jnp.zeros_like(kf_poses),
            pose_v=jnp.zeros_like(kf_poses),
            pose_step=jnp.asarray(0, jnp.int32),
            last_loss=jnp.asarray(0.0, jnp.float32),
        )

    extent = jnp.asarray(10.0, jnp.float32)
    out1 = optimize_map(carry(), kf_colors, kf_depths, kf_ests, schedule, extent, ms)
    jax.block_until_ready(out1.last_loss)  # compile
    t0 = time.perf_counter()
    out2 = optimize_map(carry(), kf_colors, kf_depths, kf_ests, schedule, extent, ms)
    jax.block_until_ready(out2.last_loss)
    map_s = time.perf_counter() - t0

    frame_s = track_s + map_s
    fps = 1.0 / frame_s
    print(
        json.dumps(
            {
                "metric": "tum_640x480_track100+map150_fps",
                "value": round(fps, 4),
                "unit": "frames/s",
                "vs_baseline": round(fps / BASELINE_FPS, 4),
                "detail": {
                    "track_ms_per_iter": round(track_s / TRACK_ITERS * 1e3, 3),
                    "map_ms_per_iter": round(map_s / MAP_ITERS * 1e3, 3),
                    "n_gaussians": N_GAUSSIANS,
                },
            }
        )
    )


if __name__ == "__main__":
    main()

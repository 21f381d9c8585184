"""Mid-size CPU quality regression (VERDICT round-2 weak #6 closure).

Sits between the 80x64x5 smoke e2e (loose floors) and the TPU-only golden
run: 160x120, 6 frames, 1.5k-gaussian source scene (map growth capped at
6k rows/frame), XLA compositor, full mapper features (NIQE keyframing on,
pruning on). Thresholds are set 20-40% under the calibrated numbers
recorded below, so a ~20% quality regression fails on any CPU host — no
TPU required. Runs in the default slow set.

Calibration — TWO runs, zero spread (the CPU run is deterministic):
  * round-4 introduction commit: ATE 0.003203 m, PSNR 40.32, SSIM 0.9972
    in 20.6 min (host shared with a TPU-tunnel job),
  * round-5 re-run (2026-08-21, post tile-layout-mapping-loss landing —
    the CPU path is the XLA compositor, unaffected): ATE 0.003203 m,
    PSNR 40.32, SSIM 0.9972 in 19.4 min (same host contention).
Quality columns are bit-repeatable across runs AND across those commits;
the 20-40% threshold margins are therefore pure regression headroom, not
noise allowance. Wall is host-load-dependent (both calibration runs were
contended; expect less on a quiet host).
"""
import os

import numpy as np
import pytest

from test_e2e import make_cfg


@pytest.mark.slow
def test_midsize_quality_regression(tmp_path):
    from mm3dgs_slam_tpu.slam.slam import SLAM

    cfg = make_cfg(
        tmp_path,
        desired_height=120,
        desired_width=160,
        eval_every=2,
        cam={"image_height": 120, "image_width": 160, "fx": 140.0,
             "fy": 140.0, "cx": 79.5, "cy": 59.5, "crop_edge": 0,
             "png_depth_scale": 5000.0, "fps": 30},
        synthetic={"n_gaussians": 1500, "n_frames": 6, "seed": 1,
                   "orbit_radius": 0.06},
        tracking={
            "iters": 40, "use_gt_pose": False,
            "dynamics_model": "const_velocity", "use_imu_loss": False,
            "imu_T_weight": 0.0, "imu_q_weight": 0.0,
            "use_depth_estimate_loss": False, "pearson_weight": 0.05,
            "position_lr": 0.002, "rotation_lr": 0.002,
        },
    )
    cfg["mapping"].update(iters=60, kf_every=2, niqe_kf=True,
                          niqe_window_size=3, kf_window_size=8,
                          pruning_interval=30, densify_until_iter=30)
    # max_new_per_frame caps map growth (~6k vs 19k one-per-pixel rows) so
    # the XLA-compositor run stays CPU-feasible (<10 min on one core)
    cfg["tpu"].update(pair_cap=1 << 18, max_per_tile=1024,
                      max_new_per_frame=6000)

    slam = SLAM(cfg)
    slam.run()

    r = np.load(os.path.join(cfg["outputdir"], "results.npz"),
                allow_pickle=True)
    ate = float(r["ate_rmse"])
    psnr = float(np.mean(r["psnr_list"]))
    ssim = float(np.mean(r["ssim_list"]))
    print(f"midsize: ATE {ate:.6f} m  PSNR {psnr:.2f}  SSIM {ssim:.4f}")

    # calibrated (see module docstring): ATE 0.0032 / PSNR 40.3 /
    # SSIM 0.9972 — thresholds catch a ~20-40% degradation of any column
    assert ate < 4.5e-3, f"midsize ATE regressed: {ate}"
    assert psnr > 38.0, f"midsize PSNR regressed: {psnr}"
    assert ssim > 0.994, f"midsize SSIM regressed: {ssim}"

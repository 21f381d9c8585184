"""End-to-end SLAM on a self-consistent synthetic scene (small, CPU).

The synthetic dataset is rendered from a known Gaussian scene by the exact
oracle, so tracking + mapping should recover a near-zero ATE trajectory and
a map that re-renders the inputs well.
"""
import os

import numpy as np
import pytest


def make_cfg(tmp_path, **overrides):
    cfg = {
        "dataset": "synthetic",
        "method": "vigs",
        "inputdir": None,
        "scene": "synthetic",
        "outputdir": str(tmp_path / "out"),
        "use_gt_depth": True,
        "white_background": False,
        "scene_radius_depth_ratio": 2,
        "start_idx": 0,
        "stride": 1,
        "desired_height": 64,
        "desired_width": 80,
        "save_iterations": [],
        "eval_every": 2,
        "seed": 0,
        "debug": {"get_runtime_stats": True, "create_video": False,
                  "save_keyframes": False},
        "pipeline": {"convert_SHs_python": False, "compute_cov3D_python": False,
                     "transform_means_python": True, "force_isotropic": False},
        "tracking": {
            "iters": 30, "use_gt_pose": False, "dynamics_model": "const_velocity",
            "use_imu_loss": False, "imu_T_weight": 0.0, "imu_q_weight": 0.0,
            "use_depth_estimate_loss": False, "pearson_weight": 0.05,
            "position_lr": 0.002, "rotation_lr": 0.002,
        },
        "mapping": {
            "iters": 50, "kf_every": 2, "niqe_kf": False, "niqe_window_size": 3,
            "kf_window_size": 6, "covisibility_level": 1, "min_covisibility": 0.95,
            "kf_covisibility": 0.1, "do_BA": False,
            "use_depth_estimate_loss": False, "pearson_weight": 0.05,
            "sh_degree": 0, "cam_t_lr": 0.001, "cam_q_lr": 0.003,
            "position_lr_init": 0.0001, "position_lr_final": 0.0000016,
            "position_lr_delay_mult": 0.01, "position_lr_max_steps": 30000,
            "feature_lr": 0.0025, "opacity_lr": 0.05, "scaling_lr": 0.001,
            "rotation_lr": 0.001, "rgb_lr": 0.0025, "spatial_lr_scale": 1,
            "percent_dense": 0.01, "lambda_dssim": 0.2, "min_opacity": 0.005,
            "densification_interval": 50, "pruning_interval": 10,
            "size_threshold": 100, "opacity_reset_interval": 500,
            "densify_from_iter": 0, "densify_until_iter": 10,
            "densify_grad_threshold": 0.0002,
        },
        "cam": {
            "image_height": 64, "image_width": 80, "fx": 70.0, "fy": 70.0,
            "cx": 39.5, "cy": 31.5, "crop_edge": 0, "png_depth_scale": 5000.0,
            "fps": 30,
        },
        "synthetic": {"n_gaussians": 250, "n_frames": 5, "seed": 1,
                      "orbit_radius": 0.05},
        "tpu": {"pair_cap": 1 << 16, "max_per_tile": 512, "chunk": 16,
                "max_tiles_per_gaussian": 64, "imu_pad": 16,
                "use_pallas": "never", "rebin_every": 1, "mesh_devices": 1,
                "max_new_per_frame": -1},
    }
    cfg.update(overrides)
    return cfg


@pytest.mark.slow
def test_slam_end_to_end(baseline_slam):
    cfg = baseline_slam

    out = os.path.join(cfg["outputdir"], "results.npz")
    assert os.path.exists(out)
    results = np.load(out, allow_pickle=True)
    assert "pose_est" in results and "pose_gt" in results
    assert results["pose_est"].shape == (5, 7)

    ate = float(results["ate_rmse"])
    print("ATE RMSE:", ate)
    assert np.isfinite(ate)
    # Small-motion synthetic scene: trajectory should be recovered well.
    assert ate < 0.03

    psnrs = results["psnr_list"]
    print("PSNR:", psnrs)
    # modest budget (30 track / 50 map iters vs the reference's 100/150)
    assert np.mean(psnrs) > 17.0

    # PLY checkpoint exists and round-trips
    ply = os.path.join(cfg["outputdir"], "point_cloud", "iteration_5",
                       "point_cloud.ply")
    assert os.path.exists(ply)
    from mm3dgs_slam_tpu.models.ply_io import load_ply

    d = load_ply(ply)
    assert d["xyz"].shape[0] > 0
    assert d["rotation"].shape[1] == 4

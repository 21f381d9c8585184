"""IMU-pipeline smoke: full SLAM over an on-disk UT-MM-format dataset with
dynamics_model: imu — exercises loader association, c2i, timestamp deltas,
padded IMU preintegration seeding (the UTMM.yml configuration shape)."""
import os

import numpy as np

from test_utmm_dataset import write_utmm_dataset


def test_slam_imu_dynamics(tmp_path):
    root = str(tmp_path / "data")
    write_utmm_dataset(os.path.join(root, "seq"), n=4, h=40, w=60)

    cfg = {
        "dataset": "utmm",
        "method": "mm3dgs",
        "inputdir": root,
        "scene": "seq",
        "outputdir": str(tmp_path / "out"),
        "use_gt_depth": True,
        "white_background": False,
        "scene_radius_depth_ratio": 2,
        "start_idx": 0,
        "stride": 1,
        "desired_height": 40,
        "desired_width": 60,
        "save_iterations": [],
        "eval_every": 2,
        "debug": {"get_runtime_stats": False, "create_video": False,
                  "save_keyframes": False},
        "pipeline": {"transform_means_python": True, "force_isotropic": True},
        "tracking": {
            "iters": 3, "use_gt_pose": False, "dynamics_model": "imu",
            "use_imu_loss": True, "imu_T_weight": 0.5, "imu_q_weight": 0.5,
            "use_depth_estimate_loss": True, "pearson_weight": 0.001,
            "position_lr": 0.002, "rotation_lr": 0.002,
        },
        "mapping": {
            "iters": 5, "kf_every": 2, "niqe_kf": True, "niqe_window_size": 2,
            "kf_window_size": 4, "covisibility_level": 1,
            "min_covisibility": 0.95, "kf_covisibility": 0.1, "do_BA": False,
            "use_depth_estimate_loss": True, "pearson_weight": 0.001,
            "sh_degree": 0, "cam_t_lr": 0.002, "cam_q_lr": 0.002,
            "position_lr_init": 0.0001, "position_lr_final": 0.0000016,
            "position_lr_delay_mult": 0.01, "position_lr_max_steps": 30000,
            "feature_lr": 0.0025, "opacity_lr": 0.05, "scaling_lr": 0.001,
            "rotation_lr": 0.001, "rgb_lr": 0.0025, "spatial_lr_scale": 1,
            "percent_dense": 0.01, "lambda_dssim": 0.2, "min_opacity": 0.005,
            "densification_interval": 50, "pruning_interval": 5,
            "size_threshold": 200, "opacity_reset_interval": 500,
            "densify_from_iter": 0, "densify_until_iter": 5,
            "densify_grad_threshold": 0.0002,
        },
        "cam": {
            "image_height": 40, "image_width": 60, "fx": 50.0, "fy": 50.0,
            "cx": 30.0, "cy": 20.0, "crop_edge": 0,
            "png_depth_scale": 1000.0, "fps": 10,
        },
        "tpu": {"pair_cap": 1 << 14, "max_per_tile": 256, "chunk": 16,
                "max_tiles_per_gaussian": 32, "imu_pad": 16,
                "use_pallas": "never", "rebin_every": 1, "mesh_devices": 1},
    }

    from mm3dgs_slam_tpu.slam.slam import SLAM

    slam = SLAM(cfg)
    assert slam.use_imu
    slam.run()

    results = np.load(os.path.join(cfg["outputdir"], "results.npz"),
                      allow_pickle=True)
    assert results["pose_est"].shape == (4, 7)
    assert np.isfinite(results["pose_est"]).all()
    assert np.isfinite(float(results["ate_rmse"]))

"""E2E smoke tests for the method/feature variants: splatam losses, bundle
adjustment, monocular-depth mode (scale-shift fit), checkpoint resume."""
import os

import numpy as np
import pytest

from test_e2e import make_cfg


def tiny(cfg):
    cfg["desired_height"] = 48
    cfg["desired_width"] = 64
    cfg["cam"]["image_height"] = 48
    cfg["cam"]["image_width"] = 64
    cfg["cam"]["cx"] = 31.5
    cfg["cam"]["cy"] = 23.5
    cfg["synthetic"]["n_frames"] = 4
    cfg["synthetic"]["n_gaussians"] = 150
    cfg["tracking"]["iters"] = 6
    cfg["mapping"]["iters"] = 10
    cfg["tpu"]["pair_cap"] = 1 << 14
    cfg["tpu"]["max_per_tile"] = 256
    return cfg


def run_slam(cfg):
    from mm3dgs_slam_tpu.slam.slam import SLAM

    slam = SLAM(cfg)
    slam.run()
    results = np.load(os.path.join(cfg["outputdir"], "results.npz"),
                      allow_pickle=True)
    return slam, results


def test_splatam_method(tmp_path):
    cfg = tiny(make_cfg(tmp_path, method="splatam"))
    slam, results = run_slam(cfg)
    assert results["pose_est"].shape == (4, 7)
    assert np.isfinite(results["pose_est"]).all()
    assert np.isfinite(float(results["ate_rmse"]))
    # splatam keyframes every kf_every frames
    assert len(slam.mapper.keyframes) >= 2


def test_bundle_adjustment(tmp_path):
    cfg = tiny(make_cfg(tmp_path))
    cfg["mapping"]["do_BA"] = True
    slam, results = run_slam(cfg)
    assert np.isfinite(results["pose_est"]).all()
    assert np.isfinite(float(results["ate_rmse"]))


def test_est_depth_mode(tmp_path):
    """use_gt_depth: false with the synthetic affine-inverse-depth estimator:
    exercises the MiDaS code path — per-frame LS scale-shift fit
    (SLAM.py:411-448) + Pearson losses."""
    cfg = tiny(make_cfg(tmp_path))
    cfg["use_gt_depth"] = False
    cfg["dpt_model"] = "synthetic_affine"
    cfg["tracking"]["use_depth_estimate_loss"] = True
    cfg["mapping"]["use_depth_estimate_loss"] = True
    cfg["cam"]["png_depth_scale"] = 5000.0
    slam, results = run_slam(cfg)
    assert np.isfinite(results["pose_est"]).all()
    assert np.isfinite(float(results["ate_rmse"]))
    # est-depth keyframes carry est_depth
    assert slam.mapper.keyframes[0].est_depth is not None


def test_checkpoint_resume_and_eval_image(tmp_path):
    cfg = tiny(make_cfg(tmp_path))
    cfg["save_iterations"] = [3]
    slam, results = run_slam(cfg)
    n0 = int(slam.gaussians.n_alive)

    # resume: the reference's `iteration` key reloads PLY + poses + keyframes
    # (SLAM.py:90-106, mapper.py:65-71)
    cfg2 = dict(cfg)
    cfg2["iteration"] = 3
    from mm3dgs_slam_tpu.slam.slam import SLAM

    slam2 = SLAM(cfg2)
    assert int(slam2.gaussians.n_alive) > 0
    assert len(slam2.mapper.keyframes) == len(slam.mapper.keyframes)
    assert np.allclose(
        slam2.estimate_pose_list[:4], results["pose_est"], atol=1e-6
    )
    # re-render evaluation path (scripts/eval_image.py workflow)
    psnrs, ssims, lpipss, proxies = slam2.evaluate_images(4)
    assert len(psnrs) >= 1 and np.isfinite(psnrs).all()


def test_use_gt_pose_mode(tmp_path):
    cfg = tiny(make_cfg(tmp_path))
    cfg["tracking"]["use_gt_pose"] = True
    slam, results = run_slam(cfg)
    # with GT poses the trajectory is exact
    assert float(results["ate_rmse"]) < 1e-5


def test_grouped_schedule_and_bin_reuse(tmp_path):
    """tpu.group_mapping_schedule + map_rebin_every: same per-keyframe quotas,
    cached bins — the run must stay finite and comparable in quality."""
    cfg = tiny(make_cfg(tmp_path))
    cfg["tpu"]["group_mapping_schedule"] = True
    cfg["tpu"]["map_rebin_every"] = 5
    cfg["tpu"]["rebin_every"] = 3
    slam, results = run_slam(cfg)
    assert np.isfinite(results["pose_est"]).all()
    assert float(results["ate_rmse"]) < 0.1


def test_grouped_schedule_quotas():
    from mm3dgs_slam_tpu.slam.mapper import Mapper

    class Dummy(Mapper):
        def __init__(self):
            import numpy as np

            self.num_iter = 150
            self.group_schedule = True
            self.rng = np.random.default_rng(0)

    sched = Dummy()._build_schedule(7)
    counts = np.bincount(sched, minlength=7)
    assert sched.shape == (150,)
    assert counts.max() - counts.min() <= 1  # balanced quotas
    # contiguous blocks: number of value changes == n_window - 1
    assert int((np.diff(sched) != 0).sum()) == 6

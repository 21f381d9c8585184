"""Monocular end-to-end SLAM: the full est-depth pipeline (learned estimator
-> per-frame LS scale/shift fit -> Pearson depth losses) on the synthetic
scene, with a TinyDPT fitted in-test — a real image->inverse-depth net, not
the affine oracle. Mirrors the reference's MiDaS TUM pipeline shape
(configs/TUM.yml:8 use_gt_depth: false, utils/depth_utils.py:102-131,
SLAM.py:411-448).
"""
import os

import numpy as np
import pytest

from tests.test_e2e import make_cfg


@pytest.mark.slow
def test_slam_monocular_tiny_dpt(tmp_path):
    from mm3dgs_slam_tpu.data import get_dataset_type
    from mm3dgs_slam_tpu.eval.depth_est import TinyDPT
    from mm3dgs_slam_tpu.slam.slam import SLAM

    cfg = make_cfg(
        tmp_path,
        use_gt_depth=False,
        dpt_model="tiny_dpt",
        dpt_weights=str(tmp_path / "tiny_dpt.npz"),
    )
    cfg["tracking"]["use_depth_estimate_loss"] = True
    cfg["tracking"]["pearson_weight"] = 0.02
    cfg["mapping"]["use_depth_estimate_loss"] = True
    cfg["mapping"]["pearson_weight"] = 0.02

    # Fit the estimator on this scene's frames (the shipped asset
    # assets/tiny_dpt_synthetic.npz targets configs/synthetic.yml's scene).
    ds = get_dataset_type("synthetic")(
        config_dict=cfg, basedir=None, sequence="synthetic",
        start=0, end=-1, stride=1,
        desired_height=cfg["desired_height"],
        desired_width=cfg["desired_width"],
    )
    imgs, invs = [], []
    for i in range(len(ds)):
        color, depth, _, _, _ = ds[i]
        h, w = color.shape[:2]
        h8, w8 = -(-h // 8) * 8, -(-w // 8) * 8
        img = np.zeros((3, h8, w8), np.float32)
        img[:, :h, :w] = color.transpose(2, 0, 1) / 255.0
        inv = np.zeros((h8, w8), np.float32)
        inv[:h, :w] = 1.0 / np.maximum(depth[..., 0], 1e-3)
        imgs.append(img)
        invs.append(inv)
    params = TinyDPT.fit(np.stack(imgs), np.stack(invs), steps=250, seed=0)
    np.savez(cfg["dpt_weights"], **params)

    slam = SLAM(cfg)
    assert isinstance(slam.dpt, TinyDPT)
    slam.run()

    results = np.load(os.path.join(cfg["outputdir"], "results.npz"),
                      allow_pickle=True)
    ate = float(results["ate_rmse"])
    print("mono ATE RMSE:", ate, "PSNR:", results["psnr_list"])
    assert np.isfinite(ate)
    # estimated depth is affine-fit per frame: looser bars than the GT run
    assert ate < 0.06
    assert np.mean(results["psnr_list"]) > 15.0

#!/usr/bin/env python
"""Trajectory evaluation CLI: align + score a saved results.npz.

Mirror of the reference's scripts/eval_traj.py surface: loads pose_est /
pose_gt, reports Umeyama-aligned ATE RMSE for both w2c pose vectors and
camera centers, and writes a trajectory plot (PNG; optional MP4 animation).

Usage: python scripts/eval_traj.py --config configs/TUM.yml [--animate]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mm3dgs_slam_tpu.config import load_config  # noqa: E402
from mm3dgs_slam_tpu.eval.ate import (  # noqa: E402
    camera_centers,
    evaluate_ate_rmse,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--results", type=str, default=None,
                        help="override path to results.npz")
    parser.add_argument("--animate", action="store_true",
                        help="write trajectory_animation.mp4")
    args = parser.parse_args()

    cfg = load_config(args.config)
    results_path = args.results or os.path.join(cfg["outputdir"], "results.npz")
    results = np.load(results_path, allow_pickle=True)
    pose_est = results["pose_est"]
    pose_gt = results["pose_gt"]

    est_centers = camera_centers(pose_est)
    gt_centers = camera_centers(pose_gt)

    aligned_c2w, ate_c2w = evaluate_ate_rmse(est_centers, gt_centers, "umeyama")
    aligned_w2c, ate_w2c = evaluate_ate_rmse(pose_est, pose_gt, "umeyama")
    print(f"ATE RMSE (w2c pose vectors): {ate_w2c} m")
    print(f"ATE RMSE (camera centers):   {ate_c2w} m")

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(12, 5))
    ax = fig.add_subplot(121)
    ax.plot(gt_centers[:, 4], gt_centers[:, 6], "k-", label="ground truth")
    ax.plot(aligned_c2w[:, 4], aligned_c2w[:, 6], "b-", label="estimated (aligned)")
    ax.set_xlabel("x [m]")
    ax.set_ylabel("z [m]")
    ax.legend()
    ax.set_title(f"trajectory (ATE RMSE {ate_c2w:.4f} m)")

    ax3 = fig.add_subplot(122, projection="3d")
    ax3.plot(gt_centers[:, 4], gt_centers[:, 5], gt_centers[:, 6], "k-")
    ax3.plot(aligned_c2w[:, 4], aligned_c2w[:, 5], aligned_c2w[:, 6], "b-")
    ax3.set_title("3D")

    out_png = os.path.join(cfg["outputdir"], "trajectory_plot.png")
    fig.savefig(out_png, dpi=120, bbox_inches="tight")
    print("Plot saved to", out_png)

    if args.animate:
        from matplotlib import animation

        fig2, ax2 = plt.subplots()
        ax2.plot(gt_centers[:, 4], gt_centers[:, 6], "k-")
        (line,) = ax2.plot([], [], "b-")

        def update(i):
            line.set_data(aligned_c2w[: i + 1, 4], aligned_c2w[: i + 1, 6])
            return (line,)

        anim = animation.FuncAnimation(
            fig2, update, frames=len(aligned_c2w), interval=33, blit=True
        )
        out_mp4 = os.path.join(cfg["outputdir"], "trajectory_animation.mp4")
        anim.save(out_mp4, fps=30)
        print("Animation saved to", out_mp4)


if __name__ == "__main__":
    main()

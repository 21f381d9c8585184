#!/usr/bin/env python
"""Checkpoint re-render evaluation CLI.

Mirror of the reference's scripts/eval_image.py surface (with the missing
`import sys` bug fixed, eval_image.py:10): re-instantiates SLAM with an
`iteration` override so the PLY map + results.npz poses load, then
re-renders the trajectory and reports PSNR / SSIM / LPIPS.

Usage: python scripts/eval_image.py --config configs/TUM.yml --iteration 592
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mm3dgs_slam_tpu.config import load_config  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--iteration", type=int, required=True,
                        help="checkpoint iteration to load")
    args = parser.parse_args()

    cfg = load_config(args.config)
    cfg["iteration"] = args.iteration

    from mm3dgs_slam_tpu.slam.slam import SLAM

    slam = SLAM(cfg)
    last_idx = len(np.load(
        os.path.join(cfg["outputdir"], "results.npz"), allow_pickle=True
    )["pose_est"])
    psnrs, ssims, lpipss, proxies = slam.evaluate_images(last_idx)
    print("  PSNR : {:>12.7f}".format(np.mean(psnrs)))
    print("  SSIM : {:>12.7f}".format(np.mean(ssims)))
    print("  LPIPS: {:>12.7f}".format(np.nanmean(lpipss) if lpipss else float("nan")))
    if not np.isfinite(lpipss).any():
        print("  LPIPS-proxy (random-VGG, uncalibrated): "
              "{:>12.7f}".format(np.mean(proxies)))


if __name__ == "__main__":
    main()

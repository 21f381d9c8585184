#!/usr/bin/env python
"""Train the TinyDPT monocular inverse-depth estimator on a dataset.

Fits eval/depth_est.py's TinyDPT (small conv encoder/decoder) to predict
inverse depth from RGB, using a scale/shift-invariant loss (the property the
SLAM pipeline actually relies on — MiDaS output is affine too and goes
through the LS fit, SLAM.py:411-448). CPU-trainable in minutes at SLAM
resolutions.

    python scripts/train_tiny_dpt.py --config configs/synthetic.yml \
        --out assets/tiny_dpt_synthetic.npz --steps 600
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--lr", type=float, default=3e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from mm3dgs_slam_tpu.config import load_config
    from mm3dgs_slam_tpu.data import get_dataset_type
    from mm3dgs_slam_tpu.eval.depth_est import TinyDPT

    cfg = load_config(args.config)
    ds = get_dataset_type(cfg["dataset"])(
        config_dict=cfg, basedir=cfg["inputdir"], sequence=cfg["scene"],
        start=cfg["start_idx"], end=cfg.get("early_stop_idx", -1),
        stride=cfg["stride"], desired_height=cfg["desired_height"],
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
    print(f"{len(ds)} frames at {imgs[0].shape[1]}x{imgs[0].shape[2]}")

    params = TinyDPT.fit(np.stack(imgs), np.stack(invs), steps=args.steps,
                         lr=args.lr, seed=args.seed, verbose=True)
    np.savez(args.out, **params)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Fit a NIQE pristine model (mu/cov over the 36 two-scale AGGD features)
from a directory of pristine images, producing the .npz that
``MM3DGS_NIQE_MODEL`` points at (consumed by eval/quality.py).

The original NIQE release fits on 125 pristine outdoor photographs; any set
of sharp, well-exposed natural images works — keyframe selection only needs
consistent ORDERING of blur/noise degradation, which the Mahalanobis score
provides for any reasonable pristine corpus.

    python scripts/fit_niqe_model.py --images /path/to/pristine/ --out niqe.npz
"""
import argparse
import glob
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from mm3dgs_slam_tpu.eval.quality import niqe_patch_features  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True, help="directory of pristine images")
    ap.add_argument("--out", default="niqe_model.npz")
    ap.add_argument("--patch-size", type=int, default=96)
    args = ap.parse_args()

    import imageio.v2 as imageio

    paths = sorted(
        p for ext in ("png", "jpg", "jpeg", "bmp")
        for p in glob.glob(os.path.join(args.images, f"*.{ext}"))
    )
    if not paths:
        raise SystemExit(f"no images found in {args.images}")

    feats = []
    for p in paths:
        img = np.asarray(imageio.imread(p), dtype=np.float64)
        if img.ndim == 3:
            img = 0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
        feats.append(niqe_patch_features(img, args.patch_size))
        print(f"{p}: {feats[-1].shape[0]} patches")

    f = np.concatenate(feats, axis=0)
    mu = f.mean(axis=0)
    cov = np.cov(f, rowvar=False)
    np.savez(args.out, mu=mu, cov=cov, patch_size=args.patch_size)
    print(f"wrote {args.out}: {f.shape[0]} patches from {len(paths)} images")


if __name__ == "__main__":
    main()

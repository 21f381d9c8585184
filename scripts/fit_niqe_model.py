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


def synth_pristine(rng: np.random.Generator, h: int = 480,
                   w: int = 640) -> np.ndarray:
    """One sharp procedural image with natural-image statistics.

    Natural scenes have ~1/f amplitude spectra plus occlusion edges (the
    source of the AGGD asymmetry NIQE models). Recipe: power-law spectral
    noise for texture, random smooth illumination, and piecewise-constant
    occluders with crisp boundaries; light gamma for a photometric tone
    curve. Used when no real pristine corpus is stageable (zero-egress):
    the fitted model's Mahalanobis distance still orders blur/noise
    degradation correctly, which is all keyframe window-min selection needs
    (verified by tests/test_quality.py).
    """
    # 1/f^a spectral field
    fy = np.fft.fftfreq(h)[:, None]
    fx = np.fft.rfftfreq(w)[None, :]
    f = np.sqrt(fy * fy + fx * fx)
    f[0, 0] = 1.0
    a = rng.uniform(0.9, 1.4)
    spec = (f ** -a) * np.exp(2j * np.pi * rng.random((h, fx.shape[1])))
    tex = np.fft.irfft2(spec, s=(h, w))
    tex = (tex - tex.mean()) / (tex.std() + 1e-9)

    # smooth illumination gradient
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    gx, gy = rng.normal(0, 0.5, 2)
    illum = gx * (xx / w - 0.5) + gy * (yy / h - 0.5)

    img = 0.5 + 0.18 * tex + 0.2 * illum

    # occluders: random ellipses with their own mean level + texture gain
    for _ in range(rng.integers(4, 10)):
        cy, cx = rng.uniform(0, h), rng.uniform(0, w)
        ry, rx = rng.uniform(h / 16, h / 3), rng.uniform(w / 16, w / 3)
        th = rng.uniform(0, np.pi)
        dy, dx = (yy - cy), (xx - cx)
        u = dy * np.cos(th) - dx * np.sin(th)
        v = dy * np.sin(th) + dx * np.cos(th)
        mask = (u / ry) ** 2 + (v / rx) ** 2 < 1.0
        img = np.where(mask,
                       rng.uniform(0.2, 0.8) + rng.uniform(0.05, 0.3) * tex,
                       img)

    img = np.clip(img, 0.0, 1.0) ** rng.uniform(0.8, 1.2)
    return img * 255.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default=None,
                    help="directory of pristine images")
    ap.add_argument("--synthetic", type=int, default=0, metavar="N",
                    help="fit on N generated pristine images instead")
    ap.add_argument("--out", default="niqe_model.npz")
    ap.add_argument("--patch-size", type=int, default=96)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    feats = []
    if args.synthetic:
        rng = np.random.default_rng(args.seed)
        for i in range(args.synthetic):
            img = synth_pristine(rng)
            feats.append(niqe_patch_features(img, args.patch_size))
            print(f"synthetic {i}: {feats[-1].shape[0]} patches")
        n_src = args.synthetic
    else:
        if not args.images:
            raise SystemExit("need --images DIR or --synthetic N")
        import imageio.v2 as imageio

        paths = sorted(
            p for ext in ("png", "jpg", "jpeg", "bmp")
            for p in glob.glob(os.path.join(args.images, f"*.{ext}"))
        )
        if not paths:
            raise SystemExit(f"no images found in {args.images}")
        for p in paths:
            img = np.asarray(imageio.imread(p), dtype=np.float64)
            if img.ndim == 3:
                img = (0.299 * img[..., 0] + 0.587 * img[..., 1]
                       + 0.114 * img[..., 2])
            feats.append(niqe_patch_features(img, args.patch_size))
            print(f"{p}: {feats[-1].shape[0]} patches")
        n_src = len(paths)

    f = np.concatenate(feats, axis=0)
    mu = f.mean(axis=0)
    cov = np.cov(f, rowvar=False)
    np.savez(args.out, mu=mu, cov=cov, patch_size=args.patch_size)
    print(f"wrote {args.out}: {f.shape[0]} patches from {n_src} images")


if __name__ == "__main__":
    main()

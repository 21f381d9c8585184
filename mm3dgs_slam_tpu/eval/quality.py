"""Frame-quality scoring for keyframe selection.

The reference scores candidate keyframes with pyiqa's NIQE (CPU) and keeps a
sliding window of minimum-score frames (slam/mapper.py:74-78,119-136) —
lower = better. pyiqa and its pretrained pristine MVG model are unavailable
in this environment (zero egress), so the default scorer is a NIQE-oriented
*naturalness/sharpness* measure built from the same front end NIQE uses —
MSCN (mean-subtracted contrast-normalized) coefficients — scored by how much
local contrast structure survives: motion-blurred frames flatten the MSCN
variance map and score WORSE (higher). Orientation and windowed-min
selection semantics match the reference exactly; absolute values differ from
pyiqa's NIQE.

If a pristine-model file is supplied (``MM3DGS_NIQE_MODEL`` env var pointing
at an .npz with ``mu``/``cov`` over the 18 AGGD features), the full NIQE
Mahalanobis scoring is used instead.
"""
from __future__ import annotations

import os

import numpy as np
from scipy.ndimage import gaussian_filter


def _mscn(gray: np.ndarray, sigma: float = 7.0 / 6.0):
    mu = gaussian_filter(gray, sigma, truncate=3.0)
    sigma_map = np.sqrt(
        np.abs(gaussian_filter(gray * gray, sigma, truncate=3.0) - mu * mu)
    )
    return (gray - mu) / (sigma_map + 1.0), sigma_map


def _aggd_fit(x: np.ndarray):
    """Asymmetric generalized-Gaussian fit (moment matching), returning
    (alpha, left_std, right_std) — the standard BRISQUE/NIQE feature fit."""
    gam = np.arange(0.2, 10.001, 0.001)
    r_gam = (_gamma(2.0 / gam) ** 2) / (_gamma(1.0 / gam) * _gamma(3.0 / gam))
    left = x[x < 0]
    right = x[x >= 0]
    lstd = np.sqrt(np.mean(left**2)) if left.size else 1e-6
    rstd = np.sqrt(np.mean(right**2)) if right.size else 1e-6
    gammahat = lstd / max(rstd, 1e-12)
    rhat = np.mean(np.abs(x)) ** 2 / max(np.mean(x**2), 1e-12)
    rhatnorm = rhat * (gammahat**3 + 1) * (gammahat + 1) / (gammahat**2 + 1) ** 2
    alpha = gam[np.argmin((r_gam - rhatnorm) ** 2)]
    return alpha, lstd, rstd


def _gamma(x):
    from scipy.special import gamma

    return gamma(x)


def niqe_features(gray: np.ndarray) -> np.ndarray:
    """18 NIQE-style AGGD features of the MSCN field + 4 pairwise products."""
    mscn, _ = _mscn(gray)
    feats = []
    alpha, l, r = _aggd_fit(mscn.ravel())
    feats += [alpha, (l * l + r * r) / 2.0]
    for shift in [(0, 1), (1, 0), (1, 1), (1, -1)]:
        shifted = np.roll(mscn, shift, axis=(0, 1))
        pp = (mscn * shifted).ravel()
        alpha, l, r = _aggd_fit(pp)
        const = np.sqrt(_gamma(1 / alpha) / _gamma(3 / alpha))
        mean = (r - l) * (_gamma(2 / alpha) / _gamma(1 / alpha)) * const
        feats += [alpha, mean, l, r]
    return np.array(feats, dtype=np.float64)


class FrameQuality:
    """Callable scorer: lower = better (NIQE orientation)."""

    def __init__(self):
        self._model = None
        path = os.environ.get("MM3DGS_NIQE_MODEL")
        if path and os.path.exists(path):
            data = np.load(path)
            self._model = (data["mu"], data["cov"])

    def __call__(self, rgb_chw: np.ndarray) -> float:
        """rgb_chw: [3, H, W] float in [0, 1]."""
        gray = (
            0.299 * rgb_chw[0] + 0.587 * rgb_chw[1] + 0.114 * rgb_chw[2]
        ).astype(np.float64) * 255.0

        if self._model is not None:
            mu, cov = self._model
            f = niqe_features(gray)
            d = f - mu
            icov = np.linalg.pinv(cov)
            return float(np.sqrt(max(d @ icov @ d, 0.0)))

        # Fallback: MSCN local-contrast survival. Blur suppresses the
        # sigma map; score = -log(mean local contrast) so blurrier frames
        # score higher (worse), matching NIQE's orientation.
        _, sigma_map = _mscn(gray)
        return float(-np.log10(np.mean(sigma_map) + 1e-8))

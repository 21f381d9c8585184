"""Monocular depth estimation (MiDaS) — optional, gated.

The reference loads MiDaS DPT_Hybrid from torch.hub (utils/depth_utils.py:
102-131) and uses its *inverse/affine* depth output, rescaled per frame by
the LS scale/shift fit. This environment has no network egress and no cached
hub weights, so the estimator is constructed lazily and raises a clear error
if weights are unavailable; `use_gt_depth: true` pipelines never touch it.

A deterministic synthetic fallback (`dpt_model: "synthetic_affine"`) exists
for tests and offline runs: it produces an affine-inverse-depth image from
GT depth, exercising the full scale-shift + Pearson pipeline end-to-end.
"""
from __future__ import annotations

import numpy as np


class MiDaS:
    """torch.hub MiDaS wrapper (CPU ok). estimate_depth(img[3,H,W] in [0,1])
    -> inverse depth [H, W] (float32 numpy)."""

    def __init__(self, device: str = "cpu"):
        import torch

        self.torch = torch
        try:
            self.model = torch.hub.load("intel-isl/MiDaS", "DPT_Hybrid")
        except Exception as e:  # no egress / no cache
            raise RuntimeError(
                "MiDaS weights unavailable (offline environment). Use "
                "use_gt_depth: true, or dpt_model: 'synthetic_affine' for "
                "pipeline testing."
            ) from e
        self.model.eval()
        for p in self.model.parameters():
            p.requires_grad = False

    def estimate_depth(self, img_chw: np.ndarray) -> np.ndarray:
        torch = self.torch
        t = torch.from_numpy(np.asarray(img_chw, dtype=np.float32))
        h, w = t.shape[1:3]
        norm = (t[None] - 0.5) / 0.5
        norm = torch.nn.functional.interpolate(
            norm, size=(384, 512), mode="bilinear", align_corners=False
        )
        with torch.no_grad():
            pred = self.model(norm)
            pred = torch.nn.functional.interpolate(
                pred.unsqueeze(1), size=(h, w), mode="bilinear", align_corners=False
            ).squeeze()
        return pred.numpy().astype(np.float32)


class SyntheticAffineDepth:
    """Affine inverse-depth oracle for offline testing: 1/(a*z + b) + noise.

    Exercises exactly the code paths MiDaS output flows through
    (scale-shift LS fit, Pearson losses) without pretrained weights.
    """

    def __init__(self, a: float = 0.8, b: float = 0.1, noise: float = 0.0, seed=0):
        self.a, self.b, self.noise = a, b, noise
        self.rng = np.random.default_rng(seed)
        self.gt_depth: np.ndarray | None = None  # set per frame by the caller

    def estimate_depth(self, img_chw: np.ndarray) -> np.ndarray:
        assert self.gt_depth is not None, "set .gt_depth before calling"
        z = np.maximum(self.gt_depth, 1e-3)
        inv = self.a * (1.0 / z) + self.b
        if self.noise:
            inv = inv + self.noise * self.rng.standard_normal(inv.shape)
        return inv.astype(np.float32)


def get_dpt(model: str, device: str = "cpu"):
    m = model.lower()
    if m == "midas":
        return MiDaS(device)
    if m == "synthetic_affine":
        return SyntheticAffineDepth()
    raise ValueError(f"Unknown depth estimate model {model}")

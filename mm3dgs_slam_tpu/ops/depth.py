"""Depth utilities: inverse-depth scale/shift LS fit, back-projection,
colormap export.

The scale/shift fit mirrors utils/depth_utils.py:44-99: the monocular
estimate is an affine *inverse* depth, so the fit solves
``1/render_depth ~= scale * est + shift`` by least squares over masked
pixels; metric depth is recovered as ``1/(scale*est + shift)``
(slam/SLAM.py:423,448). Formulated with weighted sums so shapes stay static
under jit.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def torch_style_median(x: jnp.ndarray) -> jnp.ndarray:
    """torch.Tensor.median(): lower of the two middle elements (jnp.median
    averages them — the reference's keyframe masks depend on this)."""
    flat = jnp.sort(x.reshape(-1))
    return flat[(flat.shape[0] - 1) // 2]


def get_scale_shift_ls(
    est_depth: jnp.ndarray,
    render_depth: jnp.ndarray,
    mask: jnp.ndarray | None = None,
):
    """Weighted closed-form LS of (scale, shift): 1/render ~ s*est + b."""
    inv_render = 1.0 / render_depth
    if mask is None:
        w = (inv_render > 0).astype(jnp.float32)
    else:
        w = (mask & (inv_render > 0)).astype(jnp.float32)
    e = est_depth.reshape(-1)
    z = inv_render.reshape(-1)
    w = w.reshape(-1)
    z = jnp.where(w > 0, z, 0.0)  # kill infs from zero render depth

    s11 = jnp.sum(w * e * e)
    s12 = jnp.sum(w * e)
    s22 = jnp.sum(w)
    b1 = jnp.sum(w * e * z)
    b2 = jnp.sum(w * z)
    det = s11 * s22 - s12 * s12
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    scale = (s22 * b1 - s12 * b2) / det
    shift = (s11 * b2 - s12 * b1) / det
    return scale, shift


def backproject_all_pixels(
    depth: jnp.ndarray, w2c: jnp.ndarray, fx, fy, cx, cy
) -> jnp.ndarray:
    """Back-project EVERY pixel of a [H, W] depth map to world points
    [H*W, 3] (callers mask invalid pixels; static shapes under jit).

    Mirrors the pixel->camera->world math of slam/mapper.py:175-203,409-493.
    """
    H, W = depth.shape
    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    xg, yg = jnp.meshgrid(xs, ys)
    xx = (xg - cx) / fx
    yy = (yg - cy) / fy
    z = depth
    pts_cam = jnp.stack([xx * z, yy * z, z], axis=-1).reshape(-1, 3)
    c2w = jnp.linalg.inv(w2c)
    return pts_cam @ c2w[:3, :3].T + c2w[:3, 3]


def project_points_fraction_inside(
    pts: jnp.ndarray,
    valid: jnp.ndarray,
    w2c: jnp.ndarray,
    fx, fy, cx, cy,
    height: int,
    width: int,
    edge: int = 0,
) -> jnp.ndarray:
    """Fraction of valid world points that project inside another view.

    The covisibility metric of slam/mapper.py:205-240 (and the splatam
    keyframe-overlap variant, mapper.py:317-344, which uses edge=20).
    """
    p_cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
    z = p_cam[:, 2:3] + 1e-5
    u = (fx * p_cam[:, 0:1] + cx * p_cam[:, 2:3]) / z
    v = (fy * p_cam[:, 1:2] + cy * p_cam[:, 2:3]) / z
    inside = (
        (u[:, 0] < width - edge) & (u[:, 0] > edge)
        & (v[:, 0] < height - edge) & (v[:, 0] > edge)
        & (z[:, 0] > 0)
    )
    vf = valid.astype(jnp.float32)
    return jnp.sum(inside.astype(jnp.float32) * vf) / jnp.maximum(jnp.sum(vf), 1.0)


def depth_to_rgb_np(depth, min_depth=None, max_depth=None, colormap="viridis"):
    """Depth -> colormapped RGB [3, H, W] (host-side; utils/depth_utils.py:14-34)."""
    import matplotlib.pyplot as plt
    import numpy as np

    depth = np.asarray(depth)
    lo = float(depth.min()) if min_depth is None else min_depth
    hi = float(depth.max()) if max_depth is None else max_depth
    norm = np.clip((depth - lo) / max(hi - lo, 1e-12), 0, 1)
    cmap = plt.get_cmap(colormap)
    colored = cmap(norm)[..., :3]  # H, W, 3
    return np.transpose(colored, (2, 0, 1)).astype(np.float32)

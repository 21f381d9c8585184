"""Loss functions for tracking and mapping.

Mask-dependent losses are formulated as *weighted* reductions so every shape
stays static under jit (the reference uses boolean fancy-indexing, e.g.
``image[:, mask].mean()`` at slam/tracker.py:129; the weighted form computes
the identical value with 0/1 weights).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .pose import quat_multiply

_EPS_COUNT = 1e-12


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    """Mean of x over elements where mask (broadcastable) is True."""
    if mask is None:
        return jnp.mean(x)
    m = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), _EPS_COUNT)


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """L1; with a [H, W] mask applied across channels (utils/loss_utils.py:64-68)."""
    diff = jnp.abs(pred - gt)
    if mask is None:
        return jnp.mean(diff)
    return masked_mean(diff, mask[None, :, :] if mask.ndim == 2 and diff.ndim == 3 else mask)


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean((pred - gt) ** 2)


def masked_sum(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    m = jnp.broadcast_to(mask, x.shape).astype(x.dtype)
    return jnp.sum(x * m)


def pearson_corrcoef(x: jnp.ndarray, y: jnp.ndarray, mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Pearson correlation of flattened x vs y, optionally mask-weighted."""
    x = x.reshape(-1)
    y = y.reshape(-1)
    if mask is None:
        w = jnp.ones_like(x)
    else:
        w = mask.reshape(-1).astype(x.dtype)
    n = jnp.maximum(jnp.sum(w), _EPS_COUNT)
    mx = jnp.sum(x * w) / n
    my = jnp.sum(y * w) / n
    dx = (x - mx) * w
    dy = (y - my) * w
    cov = jnp.sum(dx * dy)
    vx = jnp.sum(dx * dx)
    vy = jnp.sum(dy * dy)
    return cov / jnp.maximum(jnp.sqrt(vx * vy), _EPS_COUNT)


def pearson_loss(
    render: jnp.ndarray,
    estimate: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    invert_estimate: bool = True,
) -> jnp.ndarray:
    """1 - Pearson(rho) depth loss (utils/loss_utils.py:43-61).

    With ``invert_estimate`` the estimate is an *inverse/affine* depth: the
    loss takes the min over the two hypotheses (-est) and 1/(est+200),
    mirroring loss_utils.py:54-58.
    """
    if invert_estimate:
        a = 1.0 - pearson_corrcoef(-estimate, render, mask)
        b = 1.0 - pearson_corrcoef(1.0 / (estimate + 200.0), render, mask)
        return jnp.minimum(a, b)
    return 1.0 - pearson_corrcoef(estimate, render, mask)


def rel_pose_loss(camera_pose: jnp.ndarray, initial_pose: jnp.ndarray):
    """(translation L2-sum, quaternion geodesic angle) between two 7-vec poses.

    Mirrors utils/loss_utils.py:20-40. Returns a (t_err, angle_err) pair.
    """
    t_err = jnp.sum((camera_pose[4:] - initial_pose[4:]) ** 2)
    gtconj = initial_pose[:4] * jnp.array([1.0, -1.0, -1.0, -1.0], camera_pose.dtype)
    diff = quat_multiply(camera_pose[:4], gtconj)
    diff = diff / jnp.maximum(jnp.linalg.norm(diff), 1e-12)
    # clamp strictly inside (-1, 1): d/dx arccos blows up at |x| = 1, and the
    # optimization STARTS at the identity difference (pose == IMU seed), so an
    # exact clamp at 1 would seed NaN gradients on the first Adam step.
    angle_err = 2.0 * jnp.arccos(jnp.clip(jnp.abs(diff[0]), 0.0, 1.0 - 1e-7))
    return t_err, angle_err


def _gaussian_window(window_size: int, sigma: float) -> jnp.ndarray:
    xs = jnp.arange(window_size, dtype=jnp.float32)
    g = jnp.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma**2))
    return g / jnp.sum(g)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11) -> jnp.ndarray:
    """SSIM with an 11x11 sigma-1.5 Gaussian window, zero-padded.

    Matches utils/loss_utils.py:95-154 (torch F.conv2d with padding=w//2 and
    groups=channels); the separable window is applied as two banded matmuls
    (MXU) instead of a depthwise conv — identical up to fp re-association.
    Inputs are [C, H, W].
    """
    g1 = _gaussian_window(window_size, 1.5).astype(img1.dtype)
    h, w = img1.shape[1], img1.shape[2]
    half = window_size // 2

    def banded(n):
        # B[i, j] = g[i - j + half] for |i - j| <= half: multiplying by B is
        # the zero-padded 1D correlation along that axis. The separable
        # window as two banded MATMULS keeps SSIM on the MXU — depthwise
        # convs don't map to it and cost ~10x more here (fwd+bwd measured
        # 17.6 ms as conv vs ~1 ms as matmul at 3x480x640); the backward of
        # a matmul is again a matmul.
        i = jnp.arange(n)[:, None]
        j = jnp.arange(n)[None, :]
        d = i - j + half
        return jnp.where((d >= 0) & (d <= 2 * half),
                         g1[jnp.clip(d, 0, 2 * half)], 0.0)

    bw = banded(w)  # [W, W]
    bh = banded(h)  # [H, H]

    def conv(x):
        # rows: [C, H, W] @ [W, W]; cols: contract H with [H, H]
        y = jax.lax.dot_general(
            x, bw, (((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # [C, H, W]
        y = jax.lax.dot_general(
            y, bh, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )  # [C, W, H]
        return y.transpose(0, 2, 1)

    mu1 = conv(img1)
    mu2 = conv(img2)
    mu1_sq = mu1**2
    mu2_sq = mu2**2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = conv(img1 * img1) - mu1_sq
    sigma2_sq = conv(img2 * img2) - mu2_sq
    sigma12 = conv(img1 * img2) - mu1_mu2

    C1 = 0.01**2
    C2 = 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.mean(ssim_map)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-image PSNR over flattened pixels (utils/image_utils.py:14-19)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))

"""EWA projection of 3D Gaussians to screen space.

Implements the standard 3DGS projection math (EWA splatting; see the gsplat
math supplement, arXiv 2312.02121) with the exact numeric conventions the
reference's CUDA rasterizer exposes through slam/renderer.py:85-224:

  * frustum cull at camera-frame z <= 0.2,
  * 2D covariance = J W Sigma W^T J^T with the 1.3*tanfov frustum clamp,
  * +0.3 low-pass on the 2D covariance diagonal,
  * radius = ceil(3 * sqrt(lambda_max)), conic = inverse 2D covariance,
  * SH -> RGB with +0.5 offset and clamp at 0,
  * fused second "color" channel set [z, 1, z^2] for depth / silhouette /
    E[z^2] (slam/renderer.py:26-43) rendered in the SAME pass here (the
    reference needs two rasterizer launches only because its CUDA kernel is
    3-channel; ours is multi-channel).

Everything is vectorized over a fixed Gaussian capacity; dead/padded entries
carry valid=False and radius 0.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .camera import Camera, projection_matrix
from .sh import eval_sh


class ProjectedGaussians(NamedTuple):
    """Screen-space Gaussians, one fixed-capacity row per map slot."""

    xy: jnp.ndarray        # [N, 2] pixel coordinates of the center
    depth: jnp.ndarray     # [N] camera-frame z
    conic: jnp.ndarray     # [N, 3] inverse 2D covariance (xx, xy, yy)
    radius: jnp.ndarray    # [N] int32 screen-space extent (3 sigma), 0 = culled
    opacity: jnp.ndarray   # [N] post-sigmoid opacity
    feat: jnp.ndarray      # [N, C] composited features: [r, g, b, z, 1, z^2]


def quat_to_rotmat_batch(q: jnp.ndarray) -> jnp.ndarray:
    """[N,4] wxyz (assumed normalized upstream) -> [N,3,3]; normalizes anyway."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    q = q / jnp.maximum(norm, 1e-12)
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
            2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
            2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(-1, 3, 3)


def build_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray) -> jnp.ndarray:
    """Sigma = R diag(s^2) R^T, [N, 3, 3]."""
    R = quat_to_rotmat_batch(rotations)
    RS = R * scales[:, None, :]  # R @ diag(s)
    return RS @ jnp.swapaxes(RS, -1, -2)


def project_gaussians(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray,
    alive: jnp.ndarray,
    w2c: jnp.ndarray,
    cam: Camera,
    sh_degree: int = 0,
    campos: jnp.ndarray | None = None,
) -> ProjectedGaussians:
    """Project all map slots to screen space.

    Args:
      means3d: [N, 3] Gaussian centers (world frame, or camera frame if w2c=I
               in the transform-means-upstream mode, cf. renderer.py:142-153).
      scales: [N, 3] post-exp scales.
      rotations: [N, 4] post-normalize wxyz quaternions.
      opacities: [N] post-sigmoid opacity.
      shs: [N, K, 3] SH coefficients (K = (deg+1)^2), DC first.
      alive: [N] bool mask of live map slots.
      w2c: 4x4 world-to-camera.
      cam: camera intrinsics (static).
      sh_degree: active SH degree (static).
      campos: [3] camera position in the means' frame for SH view directions
              (defaults to the camera center derived from w2c).
    """
    N = means3d.shape[0]
    R_w2c = w2c[:3, :3]
    t_w2c = w2c[:3, 3]

    # Camera-frame centers.
    t = means3d @ R_w2c.T + t_w2c  # [N, 3]
    tz = t[:, 2]
    in_front = tz > 0.2  # CUDA in_frustum cull

    # Pixel-space center via the OpenGL projection matrix (renderer.py:121-123).
    P = projection_matrix(cam).astype(means3d.dtype)
    p_hom = t @ P[:3, :3].T + P[:3, 3]
    p_w = 1.0 / (tz + 1e-7)  # P row 3 = [0,0,1,0] -> hom w = z
    ndc_x = p_hom[:, 0] * p_w
    ndc_y = p_hom[:, 1] * p_w
    px = ((ndc_x + 1.0) * cam.width - 1.0) * 0.5   # ndc2Pix
    py = ((ndc_y + 1.0) * cam.height - 1.0) * 0.5
    xy = jnp.stack([px, py], axis=-1)

    # EWA: J W Sigma W^T J^T with the frustum clamp on tx/ty.
    cov3d = build_cov3d(scales, rotations)
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    tz_safe = jnp.where(in_front, tz, 1.0)
    txtz = jnp.clip(t[:, 0] / tz_safe, -limx, limx)
    tytz = jnp.clip(t[:, 1] / tz_safe, -limy, limy)
    tx = txtz * tz_safe
    ty = tytz * tz_safe

    fx, fy = cam.fx, cam.fy
    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z
    # J rows (2x3): [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]]
    J = jnp.zeros((N, 2, 3), dtype=means3d.dtype)
    J = J.at[:, 0, 0].set(fx * inv_z)
    J = J.at[:, 0, 2].set(-fx * tx * inv_z2)
    J = J.at[:, 1, 1].set(fy * inv_z)
    J = J.at[:, 1, 2].set(-fy * ty * inv_z2)

    JW = J @ R_w2c  # [N, 2, 3]
    cov2d = JW @ cov3d @ jnp.swapaxes(JW, -1, -2)  # [N, 2, 2]
    c00 = cov2d[:, 0, 0] + 0.3
    c01 = cov2d[:, 0, 1]
    c11 = cov2d[:, 1, 1] + 0.3

    det = c00 * c11 - c01 * c01
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack([c11 * inv_det, -c01 * inv_det, c00 * inv_det], axis=-1)

    mid = 0.5 * (c00 + c11)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det_safe))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam))

    valid = alive & in_front & det_ok
    # Zero-radius rows are skipped by binning AND the visibility filter.
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    # SH -> RGB (done by the rasterizer in the reference: max(SH+0.5, 0)).
    if campos is None:
        campos = -R_w2c.T @ t_w2c
    dirs = means3d - campos[None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    # shs: [N, K, 3] -> eval wants [..., C, K]
    rgb = eval_sh(sh_degree, jnp.swapaxes(shs, -1, -2), dirs)
    rgb = jnp.maximum(rgb + 0.5, 0.0)

    # Fused depth/silhouette/E[z^2] channels (renderer.py:26-43): per-Gaussian
    # [z, 1, z^2] evaluated at the center in the camera frame.
    feat = jnp.concatenate(
        [rgb, jnp.stack([tz, jnp.ones_like(tz), tz * tz], axis=-1)], axis=-1
    )

    return ProjectedGaussians(
        xy=xy,
        depth=tz,
        conic=conic,
        radius=radius,
        opacity=opacities,
        feat=feat,
    )

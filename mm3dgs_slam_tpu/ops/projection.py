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

import jax
import jax.numpy as jnp

from .camera import Camera, projection_matrix
from .sh import eval_sh


class ProjectedGaussians(NamedTuple):
    """Screen-space Gaussians, one fixed-capacity row per map slot.

    `packed` is the kernel-ready [N, 16] row (xy, conic, opacity, feat, pad
    — the Pallas compositor's field order); the named fields are SLICES of
    it, so gradients through either view reach the same producers. Packing
    at projection time lets the per-pair gather be ONE wide row gather
    (~7x cheaper than four narrow per-field gathers on TPU)."""

    xy: jnp.ndarray        # [N, 2] pixel coordinates of the center
    depth: jnp.ndarray     # [N] camera-frame z
    conic: jnp.ndarray     # [N, 3] inverse 2D covariance (xx, xy, yy)
    radius: jnp.ndarray    # [N] int32 screen-space extent (3 sigma), 0 = culled
    opacity: jnp.ndarray   # [N] post-sigmoid opacity
    feat: jnp.ndarray      # [N, C] composited features: [r, g, b, z, 1, z^2]
    packed: jnp.ndarray    # [N, 16] kernel-ready row (see above)


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


def _rotmat_rows(q: jnp.ndarray) -> list[jnp.ndarray]:
    """Quaternion -> the 9 rotation-matrix entries as flat [N] vectors
    (row-major R00..R22). SoA form: [N, 3, 3] intermediates are poison on
    TPU (the physical (8,128) tiling pads both trailing dims, ~42x memory
    bloat) and batched 3x3 matmuls can't use the MXU anyway."""
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    q = q / jnp.maximum(norm, 1e-12)
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    return [
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    ]


def build_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray) -> jnp.ndarray:
    """Sigma = R diag(s^2) R^T, [N, 3, 3] (public API; the projection hot
    path uses the SoA variant below)."""
    R = quat_to_rotmat_batch(rotations)
    RS = R * scales[:, None, :]  # R @ diag(s)
    return RS @ jnp.swapaxes(RS, -1, -2)


def _cov3d_components(scales: jnp.ndarray, rotations: jnp.ndarray):
    """Upper triangle of Sigma = R diag(s^2) R^T as six [N] vectors
    (c00, c01, c02, c11, c12, c22)."""
    R = _rotmat_rows(rotations)
    s0 = scales[:, 0] ** 2
    s1 = scales[:, 1] ** 2
    s2 = scales[:, 2] ** 2

    def entry(i, j):
        return (R[3 * i] * R[3 * j] * s0
                + R[3 * i + 1] * R[3 * j + 1] * s1
                + R[3 * i + 2] * R[3 * j + 2] * s2)

    return entry(0, 0), entry(0, 1), entry(0, 2), entry(1, 1), entry(1, 2), entry(2, 2)


def _conic_soa(t_x, t_y, tz, cov3d, R, cam: Camera):
    """Camera-frame centers + cov3D upper triangle -> EWA conic rows.

    The exact 2D-covariance pipeline of the CUDA rasterizer (frustum clamp
    at 1.3*tanfov, +0.3 low-pass, conic = inverse 2D covariance) in SoA
    form. Factored out of project_gaussians so the fused pose-gradient
    path can differentiate conic w.r.t. the camera-frame center with
    jax.jvp against the SAME code (any drift between the two would
    silently split the fused and general gradients).

    Args: t_x/t_y/tz [N] camera-frame centers, cov3d = 6-tuple of [N]
    cov3D components, R = 9 w2c rotation scalars (row-major), cam static.
    Returns (conic_a, conic_b, conic_c, det_ok, radius_f, in_front).
    """
    s00, s01, s02, s11, s12, s22 = cov3d
    in_front = tz > 0.2  # CUDA in_frustum cull

    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    tz_safe = jnp.where(in_front, tz, 1.0)
    txtz = jnp.clip(t_x / tz_safe, -limx, limx)
    tytz = jnp.clip(t_y / tz_safe, -limy, limy)
    tx = txtz * tz_safe
    ty = tytz * tz_safe

    fx, fy = cam.fx, cam.fy
    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z
    # J rows (2x3): [[fx/z, 0, -fx x/z^2], [0, fy/z, -fy y/z^2]]
    J00 = fx * inv_z
    J02 = -fx * tx * inv_z2
    J11 = fy * inv_z
    J12 = -fy * ty * inv_z2

    # JW = J @ R_w2c, rows as [N] vectors.
    JW0 = [J00 * R[0] + J02 * R[6], J00 * R[1] + J02 * R[7],
           J00 * R[2] + J02 * R[8]]
    JW1 = [J11 * R[3] + J12 * R[6], J11 * R[4] + J12 * R[7],
           J11 * R[5] + J12 * R[8]]

    def quad(a, b):
        """a^T Sigma b for 3-vectors of [N] components (Sigma symmetric)."""
        return (a[0] * b[0] * s00 + a[1] * b[1] * s11 + a[2] * b[2] * s22
                + (a[0] * b[1] + a[1] * b[0]) * s01
                + (a[0] * b[2] + a[2] * b[0]) * s02
                + (a[1] * b[2] + a[2] * b[1]) * s12)

    c00 = quad(JW0, JW0) + 0.3
    c01 = quad(JW0, JW1)
    c11 = quad(JW1, JW1) + 0.3

    det = c00 * c11 - c01 * c01
    det_ok = det != 0.0
    det_safe = jnp.where(det_ok, det, 1.0)
    inv_det = 1.0 / det_safe

    mid = 0.5 * (c00 + c11)
    lam = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det_safe))
    radius_f = jnp.ceil(3.0 * jnp.sqrt(lam))

    return (c11 * inv_det, -c01 * inv_det, c00 * inv_det,
            det_ok, radius_f, in_front)


def conic_pose_jacobian_rows(
    means_cam: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    means_world: jnp.ndarray,
    cam: Camera,
) -> jnp.ndarray:
    """Per-gaussian pose-Jacobian extension rows [N, 16] for the fused
    pose-gradient kernel (ops/pallas_composite._bwd_pose_kernel).

    Layout: rows 0..8 = d(conic_a, conic_b, conic_c)/d(mcam_x, y, z)
    flattened conic-major (jc[3*i + k] = d conic_i / d mcam_k), rows
    9..11 = the WORLD-frame mean, rows 12..15 pad. Only valid in the
    transform_means_python mode (w2c = I inside projection,
    renderer.py:142-153): the kernel contracts per-pair conic/xy/z
    gradients against these rows into d(mean_cam), then into the
    per-tile [sum dmcam | sum dmcam (x) mw] accumulators.

    The Jacobian is three jax.jvp passes through the SAME _conic_soa code
    project_gaussians runs (clips/culls included), so the fused gradient
    matches the general autodiff path's chain exactly. All SoA [N]
    component math — ~free next to the compositor walk.
    """
    cov3d = _cov3d_components(scales, rotations)
    eye = [jnp.eye(4, dtype=means_cam.dtype)[i, j]
           for i in range(3) for j in range(3)]

    def conic_of(mcam):
        a, b, c, _, _, _ = _conic_soa(
            mcam[:, 0], mcam[:, 1], mcam[:, 2], cov3d, eye, cam)
        return jnp.stack([a, b, c], axis=-1)  # [N, 3]

    n = means_cam.shape[0]
    cols = []
    for k in range(3):
        tangent = jnp.zeros_like(means_cam).at[:, k].set(1.0)
        _, jc_k = jax.jvp(conic_of, (means_cam,), (tangent,))
        cols.append(jc_k)  # [N, 3] = d conic / d mcam_k
    # conic-major: jc[:, 3*i + k] = d conic_i / d mcam_k
    jc = jnp.stack(
        [cols[k][:, i] for i in range(3) for k in range(3)], axis=-1)
    pad = jnp.zeros((n, 4), means_cam.dtype)
    return jnp.concatenate([jc, means_world, pad], axis=-1)


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
    # SoA throughout: every intermediate is a flat [N] vector. [N,3]/[N,3,3]
    # intermediates physically tile as (8,128) with the trailing dim padded
    # to 128 on TPU — a silent ~40x memory bloat — and batched 3x3 matmuls
    # never reach the MXU, so explicit component algebra wins on both counts.
    mx, my, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    R = [w2c[i, j] for i in range(3) for j in range(3)]  # row-major scalars
    t_w2c = w2c[:3, 3]

    # Camera-frame centers.
    t_x = mx * R[0] + my * R[1] + mz * R[2] + t_w2c[0]
    t_y = mx * R[3] + my * R[4] + mz * R[5] + t_w2c[1]
    tz = mx * R[6] + my * R[7] + mz * R[8] + t_w2c[2]

    # Pixel-space center via the OpenGL projection matrix (renderer.py:121-123).
    P = projection_matrix(cam).astype(means3d.dtype)
    ph_x = t_x * P[0, 0] + t_y * P[0, 1] + tz * P[0, 2] + P[0, 3]
    ph_y = t_x * P[1, 0] + t_y * P[1, 1] + tz * P[1, 2] + P[1, 3]
    p_w = 1.0 / (tz + 1e-7)  # P row 3 = [0,0,1,0] -> hom w = z
    px = ((ph_x * p_w + 1.0) * cam.width - 1.0) * 0.5   # ndc2Pix
    py = ((ph_y * p_w + 1.0) * cam.height - 1.0) * 0.5

    # EWA: J W Sigma W^T J^T with the frustum clamp on tx/ty (shared with
    # the pose-Jacobian builder — see _conic_soa).
    cov3d = _cov3d_components(scales, rotations)
    conic_a, conic_b, conic_c, det_ok, radius_f, in_front = _conic_soa(
        t_x, t_y, tz, cov3d, R, cam)

    valid = alive & in_front & det_ok
    # Zero-radius rows are skipped by binning AND the visibility filter.
    radius = jnp.where(valid, radius_f, 0.0).astype(jnp.int32)

    # SH -> RGB (done by the rasterizer in the reference: max(SH+0.5, 0)).
    if campos is None:
        campos = -w2c[:3, :3].T @ t_w2c
    dirs = means3d - campos[None, :]
    dirs = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-12)
    # shs: [N, K, 3] -> eval wants [..., C, K]
    rgb = eval_sh(sh_degree, jnp.swapaxes(shs, -1, -2), dirs)
    rgb = jnp.maximum(rgb + 0.5, 0.0)

    # One kernel-ready [N, 16] row per Gaussian: xy, conic, opacity,
    # [r, g, b, z, 1, z^2] fused feature channels (renderer.py:26-43), pad.
    zero = jnp.zeros_like(tz)
    packed = jnp.stack(
        [px, py,
         conic_a, conic_b, conic_c,
         opacities,
         rgb[:, 0], rgb[:, 1], rgb[:, 2],
         tz, jnp.ones_like(tz), tz * tz,
         zero, zero, zero, zero],
        axis=-1,
    )

    return ProjectedGaussians(
        xy=packed[:, 0:2],
        depth=tz,
        conic=packed[:, 2:5],
        radius=radius,
        opacity=packed[:, 5],
        feat=packed[:, 6:12],
        packed=packed,
    )

"""Trajectory alignment and ATE-RMSE (numpy, host-side).

Implements Umeyama sim(3) alignment (S. Umeyama, TPAMI 1991) and Horn
closed-form SE(3) alignment, and the pose-list evaluation entrypoint the
reference exposes (utils/eval_utils.py:139-293). Poses are 7-vectors
``[qw qx qy qz tx ty tz]``.
"""
from __future__ import annotations

import numpy as np

from ..ops import pose as P
import jax.numpy as jnp


def align_umeyama(model: np.ndarray, data: np.ndarray, known_scale=False):
    """Find (s, R, t) with model ~= s * R @ data + t. Inputs [n, 3]."""
    mu_m = model.mean(0)
    mu_d = data.mean(0)
    model_zc = model - mu_m
    data_zc = data - mu_d
    n = model.shape[0]

    C = (model_zc.T @ data_zc) / n
    sigma2 = (data_zc**2).sum() / n
    U, D, Vt = np.linalg.svd(C)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt.T) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    s = 1.0 if known_scale else np.trace(np.diag(D) @ S) / sigma2
    t = mu_m - s * R @ mu_d
    return s, R, t[:, None]


def align_horn(model: np.ndarray, data: np.ndarray):
    """Horn closed-form rigid alignment. Inputs [3, n]; returns rot, trans,
    per-point translational error."""
    model_zc = model - model.mean(1, keepdims=True)
    data_zc = data - data.mean(1, keepdims=True)
    W = model_zc @ data_zc.T
    U, _, Vh = np.linalg.svd(W.T)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vh) < 0:
        S[2, 2] = -1
    rot = U @ S @ Vh
    trans = data.mean(1, keepdims=True) - rot @ model.mean(1, keepdims=True)
    aligned = rot @ model + trans
    err = np.sqrt(((aligned - data) ** 2).sum(0))
    return rot, trans, err


def _rotate_quats(R: np.ndarray, quats: np.ndarray) -> np.ndarray:
    Rq = np.asarray(P.quat_to_rotmat(jnp.asarray(quats, dtype=jnp.float32)))
    out = np.einsum("ij,njk->nik", R.astype(np.float32), Rq)
    return np.asarray(P.rotmat_to_quat(jnp.asarray(out)))


def evaluate_ate_rmse(est_poses, gt_poses, method: str = "umeyama"):
    """Align est to gt and return (aligned_poses, ate_rmse).

    Mirrors utils/eval_utils.py:231-293: translation columns are aligned and
    the RMSE of translation residuals is reported; quaternions are rotated by
    the alignment rotation in the returned aligned pose list.
    """
    est_poses = np.asarray(est_poses, dtype=np.float64)
    gt_poses = np.asarray(gt_poses, dtype=np.float64)
    assert len(est_poses) == len(gt_poses)
    est_traj = est_poses[:, 4:]
    gt_traj = gt_poses[:, 4:]
    aligned = est_poses.copy()

    if method.lower() == "horn":
        rot, trans, ate = align_horn(est_traj.T, gt_traj.T)
        aligned[:, :4] = _rotate_quats(rot, est_poses[:, :4])
        aligned[:, 4:] = (rot @ est_traj.T + trans).T
    elif method.lower() == "umeyama":
        s, rot, trans = align_umeyama(gt_traj, est_traj)
        aligned[:, :4] = _rotate_quats(rot, est_poses[:, :4])
        aligned[:, 4:] = (s * (rot @ est_traj.T) + trans).T
        ate = np.linalg.norm(aligned[:, 4:] - gt_traj, axis=1)
    else:
        ate = np.linalg.norm(est_traj - gt_traj, axis=1)

    ate_rmse = float(np.sqrt(np.dot(ate, ate) / len(ate)))
    return aligned, ate_rmse


def camera_centers(pose_list: np.ndarray) -> np.ndarray:
    """w2c 7-vec list -> c2w 7-vec list (SLAM.py:322-331)."""
    out = np.zeros_like(pose_list)
    for i, p in enumerate(pose_list):
        w2c = np.asarray(P.pose_to_w2c(jnp.asarray(p, dtype=jnp.float32)))
        out[i] = np.asarray(P.w2c_to_pose(jnp.asarray(np.linalg.inv(w2c))))
    return out

"""Quaternion / SE(3) pose math (differentiable, jnp).

Pose convention follows the reference system: a camera pose is a 7-vector
``[qw qx qy qz tx ty tz]`` representing the **world-to-camera** (w2c)
transform (reference: utils/pose_utils.py:352-383).

All functions are pure jnp and differentiable; quaternions are normalized
inside ``quat_to_rotmat`` so gradients flow through un-normalized pose
parameters exactly as in the reference (utils/pose_utils.py:240-271).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Gravity in the camera optical frame (reference: utils/pose_utils.py:40).
GRAVITY = jnp.array([0.0, -9.80665, 0.0], dtype=jnp.float32)


def quat_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of wxyz quaternions; broadcasts over leading dims.

    Mirrors utils/pose_utils.py:219-237.
    """
    w1, x1, y1, z1 = jnp.moveaxis(q1, -1, 0)
    w2, x2, y2, z2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def quat_conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """wxyz quaternion(s) -> rotation matrix. Normalizes first (differentiable).

    Accepts [..., 4]; returns [..., 3, 3]. Mirrors utils/pose_utils.py:240-271.
    """
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    q = q / norm
    r, x, y, z = jnp.moveaxis(q, -1, 0)
    row0 = jnp.stack(
        [1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y)], axis=-1
    )
    row1 = jnp.stack(
        [2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x)], axis=-1
    )
    row2 = jnp.stack(
        [2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y)], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def _sqrt_positive_part(x: jnp.ndarray) -> jnp.ndarray:
    """sqrt(max(0, x)) with zero subgradient at x == 0."""
    safe = jnp.where(x > 0, x, 1.0)
    return jnp.where(x > 0, jnp.sqrt(safe), 0.0)


def rotmat_to_quat(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> wxyz quaternion [..., 4].

    Branchless best-conditioned-candidate selection (the pytorch3d algorithm
    used at utils/pose_utils.py:286-349), so results match the reference
    bit-for-bit in sign conventions.
    """
    batch = m.shape[:-2]
    f = m.reshape(batch + (9,))
    m00, m01, m02, m10, m11, m12, m20, m21, m22 = jnp.moveaxis(f, -1, 0)

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )

    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1),
        ],
        axis=-2,
    )
    flr = jnp.asarray(0.1, dtype=q_abs.dtype)
    quat_candidates = quat_by_rijk / (2.0 * jnp.maximum(q_abs[..., None], flr))
    best = jnp.argmax(q_abs, axis=-1)
    onehot = jax.nn.one_hot(best, 4, dtype=quat_candidates.dtype)
    return jnp.sum(quat_candidates * onehot[..., None], axis=-2)


def pose_to_w2c(pose7: jnp.ndarray) -> jnp.ndarray:
    """[qw qx qy qz tx ty tz] -> 4x4 w2c matrix (utils/pose_utils.py:352-368)."""
    R = quat_to_rotmat(pose7[:4])
    w2c = jnp.eye(4, dtype=pose7.dtype)
    w2c = w2c.at[:3, :3].set(R)
    w2c = w2c.at[:3, 3].set(pose7[4:])
    return w2c


def w2c_to_pose(w2c: jnp.ndarray) -> jnp.ndarray:
    """4x4 transform -> 7-vector (utils/pose_utils.py:371-383)."""
    q = rotmat_to_quat(w2c[:3, :3])
    return jnp.concatenate([q, w2c[:3, 3]])


def invert_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Fast inverse for rigid transforms [R t; 0 1]."""
    R = T[:3, :3]
    t = T[:3, 3]
    inv = jnp.eye(4, dtype=T.dtype)
    inv = inv.at[:3, :3].set(R.T)
    inv = inv.at[:3, 3].set(-R.T @ t)
    return inv


def propagate_const_vel(pose_m1: jnp.ndarray, pose_m2: jnp.ndarray) -> jnp.ndarray:
    """Constant-velocity motion model (utils/pose_utils.py:203-216).

    delta = w2c[-1] @ inv(w2c[-2]);  seed = delta @ w2c[-1].
    """
    pre = pose_to_w2c(pose_m1)
    delta = pre @ jnp.linalg.inv(pose_to_w2c(pose_m2))
    return w2c_to_pose(delta @ pre)


# Shoemake axis-spec tuples (firstaxis, parity, repetition, frame) — the
# standard Graphics Gems IV encoding of the 24 Euler conventions; interface
# constants shared with utils/pose_utils.py:24-40.
_AXES2TUPLE = {
    "sxyz": (0, 0, 0, 0), "sxyx": (0, 0, 1, 0), "sxzy": (0, 1, 0, 0),
    "sxzx": (0, 1, 1, 0), "syzx": (1, 0, 0, 0), "syzy": (1, 0, 1, 0),
    "syxz": (1, 1, 0, 0), "syxy": (1, 1, 1, 0), "szxy": (2, 0, 0, 0),
    "szxz": (2, 0, 1, 0), "szyx": (2, 1, 0, 0), "szyz": (2, 1, 1, 0),
    "rzyx": (0, 0, 0, 1), "rxyx": (0, 0, 1, 1), "ryzx": (0, 1, 0, 1),
    "rxzx": (0, 1, 1, 1), "rxzy": (1, 0, 0, 1), "ryzy": (1, 0, 1, 1),
    "rzxy": (1, 1, 0, 1), "ryxy": (1, 1, 1, 1), "ryxz": (2, 0, 0, 1),
    "rzxz": (2, 0, 1, 1), "rxyz": (2, 1, 0, 1), "rzyz": (2, 1, 1, 1),
}
_NEXT_AXIS = (1, 2, 0, 1)


def euler_matrix(ai, aj, ak, axes: str = "sxyz",
                 dtype=jnp.float32) -> jnp.ndarray:
    """Euler angles -> homogeneous rotation matrix, all 24 conventions.

    Parity surface of utils/pose_utils.py:43-99 (the reference vendors the
    classic Shoemake euler_matrix; the pipeline itself only ever calls
    'sxyz' — utils/pose_utils.py:137,190). `axes` is static (selects the
    branch at trace time); angles may be traced scalars.
    """
    firstaxis, parity, repetition, frame = _AXES2TUPLE[axes.lower()]
    i = firstaxis
    j = _NEXT_AXIS[i + parity]
    k = _NEXT_AXIS[i - parity + 1]
    if frame:
        ai, ak = ak, ai
    if parity:
        ai, aj, ak = -ai, -aj, -ak
    si, sj, sk = jnp.sin(ai), jnp.sin(aj), jnp.sin(ak)
    ci, cj, ck = jnp.cos(ai), jnp.cos(aj), jnp.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    M = jnp.eye(4, dtype=dtype)
    if repetition:
        M = M.at[i, i].set(cj)
        M = M.at[i, j].set(sj * si)
        M = M.at[i, k].set(sj * ci)
        M = M.at[j, i].set(sj * sk)
        M = M.at[j, j].set(-cj * ss + cc)
        M = M.at[j, k].set(-cj * cs - sc)
        M = M.at[k, i].set(-sj * ck)
        M = M.at[k, j].set(cj * sc + cs)
        M = M.at[k, k].set(cj * cc - ss)
    else:
        M = M.at[i, i].set(cj * ck)
        M = M.at[i, j].set(sj * sc - cs)
        M = M.at[i, k].set(sj * cc + ss)
        M = M.at[j, i].set(cj * sk)
        M = M.at[j, j].set(sj * ss + cc)
        M = M.at[j, k].set(sj * cs - sc)
        M = M.at[k, i].set(-sj)
        M = M.at[k, j].set(cj * si)
        M = M.at[k, k].set(cj * ci)
    return M


def euler_sxyz_matrix(ai, aj, ak, dtype=jnp.float32) -> jnp.ndarray:
    """Static-frame xyz Euler angles -> homogeneous rotation matrix.

    The 'sxyz' convention is the one the pipeline uses
    (utils/pose_utils.py:137,190 call euler_matrix(..., axes='sxyz')); this is
    the (i,j,k)=(0,1,2), no-repetition branch of utils/pose_utils.py:43-99.
    The general 24-convention table lives in euler_matrix above.
    """
    si, sj, sk = jnp.sin(ai), jnp.sin(aj), jnp.sin(ak)
    ci, cj, ck = jnp.cos(ai), jnp.cos(aj), jnp.cos(ak)
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    M = jnp.eye(4, dtype=dtype)
    M = M.at[0, 0].set(cj * ck)
    M = M.at[0, 1].set(sj * sc - cs)
    M = M.at[0, 2].set(sj * cc + ss)
    M = M.at[1, 0].set(cj * sk)
    M = M.at[1, 1].set(sj * ss + cc)
    M = M.at[1, 2].set(sj * cs - sc)
    M = M.at[2, 0].set(-sj)
    M = M.at[2, 1].set(cj * si)
    M = M.at[2, 2].set(cj * ci)
    return M


def propagate_imu(
    pose_m1: jnp.ndarray,
    pose_m2: jnp.ndarray,
    imu_ang_vel: jnp.ndarray,
    imu_lin_accel: jnp.ndarray,
    imu_valid: jnp.ndarray,
    c2i: jnp.ndarray,
    dt_cam,
    dt_imu,
) -> jnp.ndarray:
    """IMU dead-reckoning motion model (utils/pose_utils.py:148-200).

    Velocity is seeded by finite-differencing the last two tracked IMU poses;
    each (gravity-compensated) IMU sample then integrates a small SE(3) delta
    via sxyz Euler angles. Velocity is held constant across samples within the
    propagation window, exactly as the reference does.

    Args:
      imu_ang_vel:  [K, 3] angular velocity samples (rows 13:16 of the 36-col
                    imu.txt format, see gradslam_datasets/utmm.py:215-260).
      imu_lin_accel:[K, 3] linear acceleration samples (rows 25:28).
      imu_valid:    [K] bool; padding rows integrate an identity delta so the
                    sample count can be static under jit.
      c2i:          4x4 camera-optical -> IMU extrinsic.
      dt_cam:       seconds between the two previous camera frames.
      dt_imu:       seconds between IMU samples (1/100 at the call site,
                    slam/tracker.py:217,227).
    """
    w2c_m1 = pose_to_w2c(pose_m1)
    w2c_m2 = pose_to_w2c(pose_m2)
    i2c = jnp.linalg.inv(c2i)
    i2w_m1 = invert_se3(w2c_m1) @ i2c
    i2w_m2 = invert_se3(w2c_m2) @ i2c

    rel_T = invert_se3(i2w_m2) @ i2w_m1
    lin_vel = rel_T[:3, 3] / dt_cam

    G = GRAVITY.astype(w2c_m1.dtype)
    dt = jnp.asarray(dt_imu, dtype=w2c_m1.dtype)

    def body(i2w, xs):
        omega, accel, valid = xs
        accel = accel - i2w[:3, :3].T @ G
        dp = lin_vel * dt + 0.5 * accel * dt * dt
        dtheta = omega * dt
        delta = euler_sxyz_matrix(dtheta[0], dtheta[1], dtheta[2], dtype=i2w.dtype)
        delta = delta.at[:3, 3].set(dp)
        delta = jnp.where(valid, delta, jnp.eye(4, dtype=i2w.dtype))
        return i2w @ delta, None

    i2w, _ = jax.lax.scan(body, i2w_m1, (imu_ang_vel, imu_lin_accel, imu_valid))
    w2c = jnp.linalg.inv(i2w @ c2i)
    return w2c_to_pose(w2c)

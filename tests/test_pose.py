"""Pose math unit tests vs closed forms / scipy."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from mm3dgs_slam_tpu.ops import pose as P


def rand_quat(rng, n=None):
    q = rng.normal(size=(4,) if n is None else (n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quat_to_rotmat_matches_scipy():
    rng = np.random.default_rng(0)
    q = rand_quat(rng, 32).astype(np.float32)  # wxyz
    R_ours = np.asarray(P.quat_to_rotmat(jnp.asarray(q)))
    # scipy uses xyzw
    R_scipy = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    assert np.allclose(R_ours, R_scipy, atol=1e-5)


def test_quat_rotmat_roundtrip():
    rng = np.random.default_rng(1)
    q = rand_quat(rng, 64).astype(np.float32)
    R = P.quat_to_rotmat(jnp.asarray(q))
    q2 = np.asarray(P.rotmat_to_quat(R))
    # quaternions are sign-ambiguous
    dot = np.abs(np.sum(q * q2, axis=-1))
    assert np.allclose(dot, 1.0, atol=1e-5)


def test_quat_multiply_matches_scipy():
    rng = np.random.default_rng(2)
    q1 = rand_quat(rng)
    q2 = rand_quat(rng)
    ours = np.asarray(P.quat_multiply(jnp.asarray(q1), jnp.asarray(q2)))
    r = Rotation.from_quat(q1[[1, 2, 3, 0]]) * Rotation.from_quat(q2[[1, 2, 3, 0]])
    expect = r.as_quat()[[3, 0, 1, 2]]
    dot = abs(np.dot(ours, expect))
    assert dot == pytest.approx(1.0, abs=1e-6)


def test_pose_w2c_roundtrip():
    rng = np.random.default_rng(3)
    pose = np.concatenate([rand_quat(rng), rng.normal(size=3)]).astype(np.float32)
    w2c = P.pose_to_w2c(jnp.asarray(pose))
    pose2 = np.asarray(P.w2c_to_pose(w2c))
    assert np.allclose(np.abs(np.dot(pose[:4], pose2[:4])), 1.0, atol=1e-5)
    assert np.allclose(pose[4:], pose2[4:], atol=1e-5)


def test_invert_se3():
    rng = np.random.default_rng(4)
    pose = np.concatenate([rand_quat(rng), rng.normal(size=3)]).astype(np.float32)
    T = P.pose_to_w2c(jnp.asarray(pose))
    assert np.allclose(np.asarray(P.invert_se3(T) @ T), np.eye(4), atol=1e-5)


def test_const_vel_extrapolates_translation():
    # camera translating at constant velocity along x (identity rotation)
    def pose_at(t):
        return jnp.array([1.0, 0, 0, 0, t, 0, 0], dtype=jnp.float32)

    pred = P.propagate_const_vel(pose_at(2.0), pose_at(1.0))
    expect = pose_at(3.0)
    assert np.allclose(np.asarray(pred), np.asarray(expect), atol=1e-5)


def test_const_vel_extrapolates_rotation():
    ang = 0.1
    def pose_at(k):
        q = Rotation.from_euler("z", k * ang).as_quat()[[3, 0, 1, 2]]
        return jnp.asarray(np.concatenate([q, np.zeros(3)]), dtype=jnp.float32)

    pred = np.asarray(P.propagate_const_vel(pose_at(2), pose_at(1)))
    expect = np.asarray(pose_at(3))
    assert abs(np.dot(pred[:4], expect[:4])) == pytest.approx(1.0, abs=1e-5)


def test_euler_sxyz_matches_scipy():
    rng = np.random.default_rng(5)
    a, b, c = rng.uniform(-np.pi, np.pi, 3)
    M = np.asarray(P.euler_sxyz_matrix(a, b, c))
    R = Rotation.from_euler("xyz", [a, b, c]).as_matrix()
    assert np.allclose(M[:3, :3], R, atol=1e-5)


def test_propagate_imu_zero_imu_keeps_const_position_model():
    """With zero IMU input and zero gravity-compensated accel the pose should
    advance by the constant-velocity translation (orientation fixed)."""
    # Identity orientation; gravity compensation: accel must equal R^T G to
    # integrate pure constant-velocity; feed accel = G in the IMU frame.
    g = np.array([0.0, -9.80665, 0.0], dtype=np.float32)
    K = 10
    ang = np.zeros((K, 3), dtype=np.float32)
    acc = np.tile(g, (K, 1)).astype(np.float32)  # exactly cancels gravity term
    valid = np.ones(K, dtype=bool)
    c2i = np.eye(4, dtype=np.float32)

    pose_m2 = jnp.array([1, 0, 0, 0, 0, 0, 0], dtype=jnp.float32)
    pose_m1 = jnp.array([1, 0, 0, 0, -1.0, 0, 0], dtype=jnp.float32)
    # w2c translation -1 means camera at +1 in world; velocity = +1/dt_cam.
    dt_cam = 1.0
    dt_imu = 0.1
    pred = np.asarray(
        P.propagate_imu(
            pose_m1, pose_m2, jnp.asarray(ang), jnp.asarray(acc),
            jnp.asarray(valid), jnp.asarray(c2i), dt_cam, dt_imu,
        )
    )
    # camera should have moved K*dt_imu*v = 1.0 further along +x (world),
    # i.e. w2c translation goes to -2.
    assert np.allclose(pred[4:], [-2.0, 0, 0], atol=1e-4)
    assert np.allclose(np.abs(pred[0]), 1.0, atol=1e-5)


def test_propagate_imu_pure_rotation():
    """Constant angular velocity, stationary camera."""
    K = 5
    wz = 0.2
    ang = np.tile([0, 0, wz], (K, 1)).astype(np.float32)
    g = np.array([0.0, -9.80665, 0.0], dtype=np.float32)
    # stationary: i2w rotation changes as it integrates; accel must cancel
    # gravity in the *current* IMU frame: a = R_i2w^T G. Since rotation is
    # about z and G is in the xy-plane... keep it simple: zero gravity by
    # feeding a = R^T G per step is what the filter does internally; instead
    # verify orientation change only and ignore small translation drift.
    acc = np.tile(g, (K, 1)).astype(np.float32)
    valid = np.ones(K, dtype=bool)
    c2i = np.eye(4, dtype=np.float32)
    ident = jnp.array([1, 0, 0, 0, 0, 0, 0], dtype=jnp.float32)
    dt_imu = 0.01
    pred = np.asarray(
        P.propagate_imu(ident, ident, jnp.asarray(ang), jnp.asarray(acc),
                        jnp.asarray(valid), jnp.asarray(c2i), 1.0, dt_imu)
    )
    # i2w accumulates Rz(wz*dt) per step -> total angle K*wz*dt; w2c is inverse
    total = K * wz * dt_imu
    expect_q = Rotation.from_euler("z", -total).as_quat()[[3, 0, 1, 2]]
    assert abs(np.dot(pred[:4], expect_q)) == pytest.approx(1.0, abs=1e-3)


def test_propagate_imu_padding_is_identity():
    rng = np.random.default_rng(6)
    q = rng.normal(size=4); q /= np.linalg.norm(q)
    pose_m1 = jnp.asarray(np.concatenate([q, rng.normal(size=3)]), dtype=jnp.float32)
    pose_m2 = jnp.asarray(np.concatenate([q, rng.normal(size=3)]), dtype=jnp.float32)
    c2i = np.eye(4, dtype=np.float32)
    ang = rng.normal(size=(8, 3)).astype(np.float32)
    acc = rng.normal(size=(8, 3)).astype(np.float32)
    valid_half = np.array([1, 1, 1, 1, 0, 0, 0, 0], dtype=bool)
    a = P.propagate_imu(pose_m1, pose_m2, jnp.asarray(ang), jnp.asarray(acc),
                        jnp.asarray(valid_half), jnp.asarray(c2i), 0.5, 0.01)
    b = P.propagate_imu(pose_m1, pose_m2, jnp.asarray(ang[:4]), jnp.asarray(acc[:4]),
                        jnp.ones(4, dtype=bool), jnp.asarray(c2i), 0.5, 0.01)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_euler_matrix_all_24_conventions():
    """Cross-check the Shoemake-table euler_matrix against an INDEPENDENT
    construction: compose elementary axis rotations directly. Static-frame
    'sabc' applies R_c(ak) @ R_b(aj) @ R_a(ai) (later rotations about fixed
    axes premultiply); rotating-frame 'rabc' is the reverse composition."""
    import numpy as np

    from mm3dgs_slam_tpu.ops.pose import _AXES2TUPLE, euler_matrix

    def elem(axis, t):
        c, s = np.cos(t), np.sin(t)
        m = np.eye(4)
        if axis == "x":
            m[1, 1], m[1, 2], m[2, 1], m[2, 2] = c, -s, s, c
        elif axis == "y":
            m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
        else:
            m[0, 0], m[0, 1], m[1, 0], m[1, 1] = c, -s, s, c
        return m

    rng = np.random.default_rng(3)
    for axes in _AXES2TUPLE:
        for _ in range(3):
            ai, aj, ak = rng.uniform(-np.pi, np.pi, 3)
            a, b, c = axes[1], axes[2], axes[3]
            if axes[0] == "s":
                expect = elem(c, ak) @ elem(b, aj) @ elem(a, ai)
            else:
                expect = elem(a, ai) @ elem(b, aj) @ elem(c, ak)
            got = np.asarray(
                euler_matrix(ai, aj, ak, axes, dtype=jnp.float64)
            )
            assert np.allclose(got, expect, atol=1e-5), axes


def test_euler_sxyz_matches_general():
    import numpy as np

    from mm3dgs_slam_tpu.ops.pose import euler_matrix, euler_sxyz_matrix

    rng = np.random.default_rng(5)
    for _ in range(5):
        ai, aj, ak = rng.uniform(-np.pi, np.pi, 3)
        assert np.allclose(
            np.asarray(euler_sxyz_matrix(ai, aj, ak)),
            np.asarray(euler_matrix(ai, aj, ak, "sxyz")),
            atol=1e-6,
        )

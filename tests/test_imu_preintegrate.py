"""Offline IMU dead-reckoning tool (scripts/imu_preintegrate.py) vs the
reference node's update equations (UT_MM_Scripts/imu_preintegration.py:
x-only accel, fixed dt, sxyz euler relative transforms, right-composition,
inverse-relative CSV rows)."""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))

from imu_preintegrate import _euler_matrix_sxyz, load_samples, preintegrate

from mm3dgs_slam_tpu.ops.pose import euler_matrix


def test_local_euler_matches_ops_pose():
    rng = np.random.default_rng(0)
    for _ in range(10):
        a, b, c = rng.uniform(-2, 2, 3)
        ours = _euler_matrix_sxyz(a, b, c)
        ref = np.asarray(euler_matrix(a, b, c, axes="sxyz"))
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_preintegration_equations():
    n, dt = 50, 0.01
    ts = np.arange(n) * dt
    accel = np.tile([2.0, 9.9, -1.3], (n, 1))  # y/z must be IGNORED (quirk)
    gyro = np.zeros((n, 3))
    rel_inv, world = preintegrate(ts, accel, gyro, dt)
    # pure x acceleration, no rotation: v_k = a*dt*k,
    # x_k = sum(v_{k-1}*dt + a/2*dt^2) = a/2*(k*dt)^2
    k = np.arange(1, n + 1)
    np.testing.assert_allclose(world[:, 0, 3], 0.5 * 2.0 * (k * dt) ** 2,
                               rtol=1e-9)
    assert np.allclose(world[:, 1:3, 3], 0.0)  # y/z accel ignored
    assert np.allclose(world[:, :3, :3], np.eye(3))

    # relative rows are inverses: rel_inv[i] @ I_T_N[i] == I
    gyro = np.tile([0.3, -0.2, 0.1], (n, 1))
    rel_inv, world = preintegrate(ts, accel, gyro, dt)
    acc = np.eye(4)
    for i in range(n):
        acc = acc @ np.linalg.inv(rel_inv[i])
    np.testing.assert_allclose(acc, world[-1], atol=1e-9)


def test_load_utmm_format(tmp_path):
    rows = np.zeros((5, 36))
    rows[:, 0] = np.arange(5) * 0.01
    rows[:, 4:7] = 0.1   # angular velocity
    rows[:, 7:10] = 0.5  # linear acceleration
    p = tmp_path / "imu.txt"
    np.savetxt(p, rows)
    ts, a, w = load_samples(str(p), "auto")
    assert ts.shape == (5,)
    np.testing.assert_allclose(a, 0.5)
    np.testing.assert_allclose(w, 0.1)

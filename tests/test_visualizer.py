"""FreeViewController (scripts/visualizer.py --interactive): the pure
key->pose state machine behind the dependency-free free-view window
(reference scripts/visualizer.py:232-277 does this through Open3D's
view_control; ours must be correct standalone)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from visualizer import FreeViewController  # noqa: E402


def center(ctrl):
    R, t = ctrl._w2c()
    return -R.T @ t


def test_dolly_moves_along_view_axis():
    rng = np.random.default_rng(0)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    pose = np.concatenate([q, rng.normal(size=3)])
    ctrl = FreeViewController(pose, move_step=0.25)
    R, _ = ctrl._w2c()
    c0 = center(ctrl)
    assert ctrl.handle_key("w")
    # +z in camera frame = the camera's viewing direction = R row 2
    np.testing.assert_allclose(center(ctrl) - c0, 0.25 * R[2], atol=1e-12)
    ctrl.handle_key("s")
    np.testing.assert_allclose(center(ctrl), c0, atol=1e-12)


def test_turn_keeps_camera_center_fixed_and_rotates():
    rng = np.random.default_rng(1)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    pose = np.concatenate([q, rng.normal(size=3)])
    ctrl = FreeViewController(pose, turn_step=0.3)
    c0 = center(ctrl)
    q0 = ctrl.pose[:4].copy()
    assert ctrl.handle_key("left")
    np.testing.assert_allclose(center(ctrl), c0, atol=1e-10)
    assert np.abs(np.dot(ctrl.pose[:4], q0)) < 1.0 - 1e-4  # really rotated
    # center stays pinned across repeated turns (error must not accumulate)
    for _ in range(3):
        ctrl.handle_key("left")
    np.testing.assert_allclose(center(ctrl), c0, atol=1e-10)


def test_home_resets_and_unknown_keys_ignored():
    pose = np.array([1.0, 0, 0, 0, 0.5, -0.25, 2.0])
    ctrl = FreeViewController(pose)
    for k in ("w", "a", "up", ","):
        ctrl.handle_key(k)
    assert not np.allclose(ctrl.pose, pose)
    assert not ctrl.handle_key("x")  # unmapped
    assert ctrl.handle_key("home")
    np.testing.assert_allclose(ctrl.pose, pose)


def test_quaternion_stays_normalized():
    rng = np.random.default_rng(2)
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    ctrl = FreeViewController(np.concatenate([q, rng.normal(size=3)]))
    keys = ["left", "up", ".", "right", "down", ",", "w", "a"] * 25
    for k in keys:
        ctrl.handle_key(k)
    assert abs(np.linalg.norm(ctrl.pose[:4]) - 1.0) < 1e-9

"""Pure-Python ROS1 bag reader/writer + the offline bag2data converter.

The reference's converter (bag2data.py:24-159) needs a ROS1 machine; ours
re-implements the bag container + definition-driven message codec
(mm3dgs_slam_tpu/data/rosbag1.py), so the whole capture->dataset->loader
path is testable here: synthesize a bag, convert it, and load the result
with UTMMDataset.
"""
import os

import numpy as np
import pytest

from mm3dgs_slam_tpu.data import rosbag1 as rb


def test_message_roundtrip_odometry():
    defn = rb.full_definition("nav_msgs/Odometry")
    msg = {
        "header": {"seq": 3, "stamp": 1700000000.123456789,
                   "frame_id": "odom"},
        "child_frame_id": "base_link",
        "pose": {"pose": {"position": {"x": 1.5, "y": -2.0, "z": 0.25},
                          "orientation": {"z": 0.7071068, "w": 0.7071068}},
                 "covariance": np.arange(36.0)},
        "twist": {"twist": {"linear": {"x": 0.4},
                            "angular": {"z": -0.1}},
                  "covariance": np.zeros(36)},
    }
    raw = rb.encode_message("nav_msgs/Odometry", defn, msg)
    d = rb.decode_message("nav_msgs/Odometry", defn, raw)
    assert d.header.frame_id == "odom" and d.header.seq == 3
    assert abs(d.header.stamp.to_sec() - 1700000000.123456789) < 1e-6
    assert d.pose.pose.position.y == -2.0
    assert d.pose.pose.orientation.w == 0.7071068
    assert float(d.pose.covariance[35]) == 35.0
    assert d.twist.twist.linear.x == 0.4


def test_definition_parse_handles_constants_and_comments():
    text = ("uint8 LEVEL_DEBUG=1  # a constant\n"
            "string NAME=not a field = tricky\n"
            "# pure comment\n"
            "float64 value   # trailing comment\n"
            "float64[3] vec\n")
    types = rb.parse_definition("test_msgs/Weird", text)
    assert types["test_msgs/Weird"] == [
        ("value", "float64", None), ("vec", "float64", 3)]


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_bag_roundtrip_chunked(tmp_path, compression):
    path = str(tmp_path / "t.bag")
    with rb.BagWriter(path, chunk_threshold=1500,
                      compression=compression) as w:
        w.add_connection("/imu", "sensor_msgs/Imu")
        for i in range(40):
            w.write("/imu", {
                "header": {"stamp": 50.0 + 0.01 * i, "frame_id": "imu"},
                "orientation": {"w": 1.0},
                "angular_velocity": {"x": 0.0, "y": 0.0, "z": 0.1 * i},
                "linear_acceleration": {"x": 1.0, "y": -9.80665, "z": 0.0},
                "orientation_covariance": np.full(9, 0.5),
            }, 50.0 + 0.01 * i)
    bag = rb.BagReader(path)
    assert bag.topics == {"/imu": "sensor_msgs/Imu"}
    msgs = list(bag.read_messages(["/imu"]))
    assert len(msgs) == 40
    topic, m, t = msgs[7]
    assert abs(m.angular_velocity.z - 0.7) < 1e-12
    assert m.linear_acceleration.y == -9.80665
    assert float(m.orientation_covariance[4]) == 0.5
    assert abs(t.to_sec() - 50.07) < 1e-6
    times = [t.to_sec() for _, _, t in bag.read_messages()]
    assert times == sorted(times)


def test_tf_chain_lookup(tmp_path):
    path = str(tmp_path / "tf.bag")
    with rb.BagWriter(path) as w:
        w.add_connection("/tf_static", "tf2_msgs/TFMessage")
        w.write("/tf_static", {"transforms": [
            {"header": {"frame_id": "base", "stamp": 1.0},
             "child_frame_id": "microstrain_link",
             "transform": {"translation": {"x": 0.1, "z": 0.05},
                           "rotation": {"w": 1.0}}},
            {"header": {"frame_id": "base", "stamp": 1.0},
             "child_frame_id": "realsense_color_frame",
             "transform": {"translation": {"y": 0.2},
                           "rotation": {"x": 0.7071068, "w": 0.7071068}}},
        ]}, 1.0)
    bag = rb.BagReader(path)
    t, q = rb.lookup_static_transform(bag, "microstrain_link",
                                      "realsense_color_frame")
    T_bi = np.eye(4)
    T_bi[:3, 3] = [0.1, 0, 0.05]
    T_bc = np.eye(4)
    T_bc[:3, :3] = rb.quat_to_matrix(0.7071068, 0, 0, 0.7071068)
    T_bc[:3, 3] = [0, 0.2, 0]
    T_ic = np.linalg.inv(T_bi) @ T_bc
    np.testing.assert_allclose(t, T_ic[:3, 3], atol=1e-6)
    np.testing.assert_allclose(rb.quat_to_matrix(*q), T_ic[:3, :3],
                               atol=1e-6)
    with pytest.raises(KeyError):
        rb.lookup_static_transform(bag, "microstrain_link", "nonexistent")


def test_concat_pose_and_twist(tmp_path):
    """Latest-twist-wins merge semantics of the reference's live node
    (UT_MM_Scripts/concat_pose_and_twist.py:12-25), applied offline."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import concat_pose_and_twist as cpt

    src = str(tmp_path / "pt.bag")
    with rb.BagWriter(src) as w:
        w.add_connection(cpt.POSE_TOPIC, "geometry_msgs/PoseStamped")
        w.add_connection(cpt.TWIST_TOPIC, "geometry_msgs/TwistStamped")
        for i in range(5):
            t = 10.0 + i * 0.1
            if i > 0:    # first pose arrives before any twist
                w.write(cpt.TWIST_TOPIC,
                        {"header": {"stamp": t - 0.05},
                         "twist": {"linear": {"x": 1.0 * i}}}, t - 0.05)
            w.write(cpt.POSE_TOPIC,
                    {"header": {"seq": i, "stamp": t, "frame_id": "world"},
                     "pose": {"position": {"x": 0.1 * i},
                              "orientation": {"w": 1.0}}}, t)
    merged = list(cpt.merge(rb.BagReader(src)))
    assert len(merged) == 5
    _, _, _, twist0 = merged[0]
    assert twist0 is None                       # no twist seen yet
    _, header3, pose3, twist3 = merged[3]
    assert twist3.linear.x == 3.0               # latest twist at pose time
    assert abs(pose3.position.x - 0.3) < 1e-12
    assert header3.seq == 3


def _write_capture_bag(path, n_frames=4, h=48, w=64):
    import cv2

    rng = np.random.default_rng(0)
    colors = (rng.uniform(size=(n_frames, h, w, 3)) * 255).astype(np.uint8)
    depths = (rng.uniform(0.5, 3.0, size=(n_frames, h, w)) * 1000).astype(
        np.uint16)
    with rb.BagWriter(path) as bw:
        bw.add_connection("/realsense/color/camera_info",
                          "sensor_msgs/CameraInfo")
        bw.add_connection("/realsense/color/image_raw/compressed",
                          "sensor_msgs/CompressedImage")
        bw.add_connection("/realsense/depth/image_rect_raw",
                          "sensor_msgs/Image")
        bw.add_connection("/microstrain/imu/data", "sensor_msgs/Imu")
        bw.add_connection("/vrpn_client_node/Jackal_Latest/pose",
                          "geometry_msgs/PoseStamped")
        bw.add_connection("/tf_static", "tf2_msgs/TFMessage")
        bw.write("/tf_static", {"transforms": [
            {"header": {"frame_id": "base", "stamp": 99.0},
             "child_frame_id": "microstrain_link",
             "transform": {"translation": {"x": 0.1},
                           "rotation": {"w": 1.0}}},
            {"header": {"frame_id": "base", "stamp": 99.0},
             "child_frame_id": "realsense_color_frame",
             "transform": {"translation": {"z": 0.05},
                           "rotation": {"w": 1.0}}},
        ]}, 99.0)
        bw.write("/realsense/color/camera_info", {
            "header": {"stamp": 99.5, "frame_id": "realsense_color_frame"},
            "height": h, "width": w,
            "K": [50.0, 0, w / 2, 0, 50.0, h / 2, 0, 0, 1],
        }, 99.5)
        imu_t = 100.0
        for i in range(n_frames):
            t = 100.0 + 0.1 * i
            ok, png = cv2.imencode(".png", colors[i][:, :, ::-1])  # BGR in
            assert ok
            bw.write("/realsense/color/image_raw/compressed", {
                "header": {"stamp": t, "frame_id": "cam"},
                "format": "png",
                "data": np.frombuffer(png.tobytes(), np.uint8),
            }, t)
            bw.write("/realsense/depth/image_rect_raw", {
                "header": {"stamp": t + 0.002, "frame_id": "cam"},
                "height": h, "width": w, "encoding": "16UC1",
                "is_bigendian": 0, "step": w * 2,
                "data": np.frombuffer(depths[i].tobytes(), np.uint8),
            }, t + 0.002)
            bw.write("/vrpn_client_node/Jackal_Latest/pose", {
                "header": {"stamp": t + 0.001, "frame_id": "world"},
                "pose": {"position": {"x": 0.05 * i},
                         "orientation": {"w": 1.0}},
            }, t + 0.001)
            for _ in range(4):
                bw.write("/microstrain/imu/data", {
                    "header": {"stamp": imu_t},
                    "orientation": {"w": 1.0},
                    "angular_velocity": {"z": 0.01 * i},
                    "linear_acceleration": {"x": 0.1 * i, "y": -9.80665},
                }, imu_t)
                imu_t += 0.025
    return colors, depths


def test_bag2data_end_to_end(tmp_path):
    """Synthetic capture bag -> convert -> load with UTMMDataset."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import bag2data

    h, w, crop = 48, 64, 8
    scene_dir = tmp_path / "seq"
    scene_dir.mkdir()
    colors, depths = _write_capture_bag(str(scene_dir / "seq.bag"),
                                        n_frames=4, h=h, w=w)
    bag2data.convert(str(scene_dir / "seq.bag"), str(scene_dir),
                     crop_bottom=crop)

    # files exist with the reference's layout
    for name in ("rgb.txt", "depth.txt", "imu.txt", "groundtruth.txt",
                 "tf.txt", "intrinsics.txt"):
        assert (scene_dir / name).exists(), name
    # pixel-exact round trip (PNG is lossless; crop matches :95,:119)
    import cv2

    rgb0 = cv2.imread(str(scene_dir / "rgb" / "000000.png"))  # BGR
    np.testing.assert_array_equal(rgb0[:, :, ::-1],
                                  colors[0][:h - crop])
    d0 = cv2.imread(str(scene_dir / "depth" / "000000.png"),
                    cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(d0, depths[0][:h - crop])
    # tf.txt: chain base->microstrain_link, base->realsense_color_frame
    tf_vec = np.loadtxt(str(scene_dir / "tf.txt"))
    np.testing.assert_allclose(tf_vec, [-0.1, 0, 0.05, 0, 0, 0, 1],
                               atol=1e-6)
    # imu.txt column contract: ang_vel at value-cols [13:16], lin_accel at
    # [25:28] (36 cols + stamp)
    # stamp + 37 values (4 ori + 9 cov + 3 ang + 9 cov + 3 acc + 9 cov),
    # matching bag2data.py:133-158; consumers only index value-cols
    # [13:16] / [25:28] so the trailing cov block width is inert
    imu = np.loadtxt(str(scene_dir / "imu.txt"))
    assert imu.shape[1] == 38
    assert imu[0, 1 + 26] == -9.80665

    # the produced directory loads through the UT-MM dataset
    from mm3dgs_slam_tpu.data import get_dataset_type

    cfg = {
        "dataset": "utmm",
        "cam": {"image_height": h - crop, "image_width": w,
                "fx": 50.0, "fy": 50.0, "cx": w / 2, "cy": (h - crop) / 2,
                "png_depth_scale": 1000.0, "crop_edge": 0},
    }
    ds = get_dataset_type("utmm")(
        config_dict=cfg, basedir=str(tmp_path), sequence="seq",
        stride=1, start=0, end=-1, desired_height=h - crop,
        desired_width=w)
    assert len(ds) >= 3
    color, depth, _, pose, imu_t = ds[1]
    assert color.shape == (h - crop, w, 3)
    assert float(depth.max()) <= 3.01
    assert imu_t is not None and imu_t.shape[1] == 37


def test_image_decode_honors_row_stride():
    """Raw Image messages whose step > width*bpp (drivers that pad rows)
    must decode like cv_bridge: drop the per-row padding, keep the pixels
    (scripts/bag2data._rows)."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "scripts"))
    import bag2data as b2d

    rng = np.random.default_rng(3)
    h, w, pad = 5, 7, 9

    class Msg:
        pass

    # bgr8 with padded rows
    img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
    padded = np.concatenate(
        [img.reshape(h, w * 3),
         np.zeros((h, pad), np.uint8)], axis=1)
    m = Msg()
    m._type = "sensor_msgs/Image"
    m.encoding = "bgr8"
    m.height, m.width = h, w
    m.step = w * 3 + pad
    m.is_bigendian = 0
    m.data = padded.reshape(-1)
    np.testing.assert_array_equal(b2d._decode_color(m), img)

    # 16UC1 depth with padded rows
    dep = (rng.uniform(0, 4000, size=(h, w))).astype(np.uint16)
    padded = np.concatenate(
        [np.frombuffer(dep.tobytes(), np.uint8).reshape(h, w * 2),
         np.zeros((h, pad), np.uint8)], axis=1)
    m2 = Msg()
    m2._type = "sensor_msgs/Image"
    m2.encoding = "16UC1"
    m2.height, m2.width = h, w
    m2.step = w * 2 + pad
    m2.is_bigendian = 0
    m2.data = padded.reshape(-1)
    np.testing.assert_array_equal(b2d._decode_depth(m2), dep)

"""UT-MM loader: 4-way association, IMU ranges, frame conversions, tf.txt."""
import os

import numpy as np
import imageio.v2 as imageio

from mm3dgs_slam_tpu.data import get_dataset_type


def write_utmm_dataset(root, n=5, h=40, w=60, imu_hz_per_frame=4):
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    rng = np.random.default_rng(0)
    rgb_l, dep_l, gt_l, imu_l = [], [], ["# gt"], []
    imu_t = 100.0
    for i in range(n):
        t = 100.0 + i * 0.1
        img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        depth = (rng.uniform(0.5, 3.0, size=(h, w)) * 1000).astype(np.uint16)
        imageio.imwrite(os.path.join(root, "rgb", f"{t:.6f}.png"), img)
        imageio.imwrite(os.path.join(root, "depth", f"{t:.6f}.png"), depth)
        rgb_l.append(f"{t:.6f} rgb/{t:.6f}.png")
        dep_l.append(f"{t + 0.003:.6f} depth/{t:.6f}.png")
        gt_l.append(f"{t + 0.001:.6f} {0.05 * i:.6f} 0.0 0.0 0.0 0.0 0.0 1.0")
        # imu rows between frames; 36 value columns after timestamp
        for k in range(imu_hz_per_frame):
            vals = np.zeros(36)
            vals[13:16] = [0.0, 0.0, 0.01 * i]       # ang vel
            vals[25:28] = [0.1 * i, -9.80665, 0.0]   # lin accel
            imu_l.append(
                f"{imu_t:.6f} " + " ".join(f"{v:.6f}" for v in vals)
            )
            imu_t += 0.1 / imu_hz_per_frame
    for name, lines in [("rgb.txt", rgb_l), ("depth.txt", dep_l),
                        ("groundtruth.txt", gt_l), ("imu.txt", imu_l)]:
        with open(os.path.join(root, name), "w") as f:
            f.write("\n".join(lines))
    with open(os.path.join(root, "tf.txt"), "w") as f:
        f.write("0.1 0.0 0.05 0.0 0.0 0.0 1.0")  # i2c: small offset, identity rot


def utmm_cfg(h=40, w=60):
    return {
        "dataset": "utmm",
        "cam": {
            "image_height": h, "image_width": w,
            "fx": 50.0, "fy": 50.0, "cx": w / 2, "cy": h / 2,
            "png_depth_scale": 1000.0, "crop_edge": 0,
        },
    }


def test_utmm_loader(tmp_path):
    root = str(tmp_path)
    write_utmm_dataset(os.path.join(root, "seq"))
    ds = get_dataset_type("utmm")(
        config_dict=utmm_cfg(), basedir=root, sequence="seq",
        stride=1, start=0, end=-1, desired_height=20, desired_width=30,
    )
    assert len(ds) == 5
    color, depth, intr, pose, imu = ds[0]
    assert color.shape == (20, 30, 3)
    assert imu is not None and imu.shape[1] == 36
    # IMU consumers read ang_vel [13:16] and lin_accel [25:28]
    assert np.allclose(imu[:, 25:28][0], [0.0, -9.80665, 0.0], atol=1e-5)

    # c2i from tf.txt = inverse of the i2c line
    c2i = ds.get_c2i_tf()
    assert np.allclose(c2i[:3, 3], [-0.1, 0.0, -0.05], atol=1e-6)

    # timestamps align to image stamps
    assert len(ds.tstamps) == 5
    assert abs(ds.tstamps[1] - ds.tstamps[0] - 0.1) < 1e-6

    # robot->optical conversion: groundtruth x-translation appears in
    # the optical frame's pose translation column (c2w).
    _, _, _, pose2, _ = ds[2]
    assert np.isfinite(pose2).all()


def test_utmm_stride_concatenates_imu(tmp_path):
    root = str(tmp_path)
    write_utmm_dataset(os.path.join(root, "seq"))
    ds1 = get_dataset_type("utmm")(
        config_dict=utmm_cfg(), basedir=root, sequence="seq",
        stride=1, desired_height=20, desired_width=30,
    )
    ds2 = get_dataset_type("utmm")(
        config_dict=utmm_cfg(), basedir=root, sequence="seq",
        stride=2, desired_height=20, desired_width=30,
    )
    # strided frame 1 (= original frame 2) carries imu rows of frames 1+2
    n1 = ds1[1][4].shape[0] + ds1[2][4].shape[0]
    assert ds2[1][4].shape[0] == n1

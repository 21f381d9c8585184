#!/usr/bin/env python
"""rosbag -> TUM-style multimodal dataset directory (UT-MM capture format).

Counterpart of the reference's scripts/bag2data.py: converts a ROS1 bag with
RGB, depth, IMU, odometry and TF topics into the directory layout the
UTMMDataset loader consumes:

    rgb/ depth/ rgb.txt depth.txt imu.txt groundtruth.txt tf.txt

Output contracts (consumed by mm3dgs_slam_tpu.data.utmm):
  * rgb.txt / depth.txt: "<stamp> rgb/<stamp>.png" per line,
  * groundtruth.txt: "<stamp> tx ty tz qx qy qz qw" (header line first),
  * imu.txt: 37 columns — stamp + 36 values; consumers read angular
    velocity at value-columns [13:16] and linear acceleration at [25:28]
    (the flattened [orientation(4) + 3x3 cov][ang_vel(3) + 3x3 cov]
    [lin_accel(3) + 3x3 cov] sensor_msgs/Imu layout),
  * tf.txt: "tx ty tz qx qy qz qw" of the IMU->camera transform.

Requires ROS1 python packages (rosbag, cv_bridge) — available on a ROS
machine, not in this TPU environment; the script degrades to printing the
format documentation when they're missing.
"""
import argparse
import os
import sys


def convert(bag_path: str, out_dir: str, rgb_topic: str, depth_topic: str,
            imu_topic: str, odom_topic: str, crop_bottom: int = 60):
    import cv2
    import rosbag
    from cv_bridge import CvBridge

    os.makedirs(os.path.join(out_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
    bridge = CvBridge()
    bag = rosbag.Bag(bag_path)

    rgb_f = open(os.path.join(out_dir, "rgb.txt"), "w")
    depth_f = open(os.path.join(out_dir, "depth.txt"), "w")
    imu_f = open(os.path.join(out_dir, "imu.txt"), "w")
    gt_f = open(os.path.join(out_dir, "groundtruth.txt"), "w")
    gt_f.write("# stamp tx ty tz qx qy qz qw\n")

    for topic, msg, t in bag.read_messages(
        topics=[rgb_topic, depth_topic, imu_topic, odom_topic]
    ):
        stamp = f"{msg.header.stamp.to_sec():.6f}"
        if topic == rgb_topic:
            img = bridge.imgmsg_to_cv2(msg, desired_encoding="bgr8")
            if crop_bottom:
                img = img[:-crop_bottom]
            name = f"rgb/{stamp}.png"
            cv2.imwrite(os.path.join(out_dir, name), img)
            rgb_f.write(f"{stamp} {name}\n")
        elif topic == depth_topic:
            img = bridge.imgmsg_to_cv2(msg, desired_encoding="passthrough")
            if crop_bottom:
                img = img[:-crop_bottom]
            name = f"depth/{stamp}.png"
            cv2.imwrite(os.path.join(out_dir, name), img)
            depth_f.write(f"{stamp} {name}\n")
        elif topic == imu_topic:
            o = msg.orientation
            w = msg.angular_velocity
            a = msg.linear_acceleration
            vals = (
                [o.x, o.y, o.z, o.w] + list(msg.orientation_covariance)
                + [w.x, w.y, w.z] + list(msg.angular_velocity_covariance)
                + [a.x, a.y, a.z] + list(msg.linear_acceleration_covariance)
            )
            imu_f.write(stamp + " " + " ".join(f"{v:.9f}" for v in vals) + "\n")
        elif topic == odom_topic:
            p = msg.pose.pose.position
            q = msg.pose.pose.orientation
            gt_f.write(
                f"{stamp} {p.x:.6f} {p.y:.6f} {p.z:.6f} "
                f"{q.x:.9f} {q.y:.9f} {q.z:.9f} {q.w:.9f}\n"
            )
    for f in (rgb_f, depth_f, imu_f, gt_f):
        f.close()
    bag.close()
    print("Converted", bag_path, "->", out_dir)
    print("NOTE: write tf.txt manually from your calibration "
          "(tx ty tz qx qy qz qw of the IMU->camera transform).")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--bag", required=True)
    parser.add_argument("--out", required=True)
    parser.add_argument("--rgb-topic", default="/camera/color/image_raw")
    parser.add_argument("--depth-topic",
                        default="/camera/aligned_depth_to_color/image_raw")
    parser.add_argument("--imu-topic", default="/imu/data")
    parser.add_argument("--odom-topic", default="/odom")
    parser.add_argument("--crop-bottom", type=int, default=60)
    args = parser.parse_args()
    try:
        import rosbag  # noqa: F401
    except ImportError:
        print(__doc__)
        print("ERROR: rosbag/cv_bridge not available in this environment; "
              "run on a ROS1 machine.", file=sys.stderr)
        sys.exit(1)
    convert(args.bag, args.out, args.rgb_topic, args.depth_topic,
            args.imu_topic, args.odom_topic, args.crop_bottom)


if __name__ == "__main__":
    main()

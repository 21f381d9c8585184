#!/usr/bin/env python
"""Offline IMU dead-reckoning — the non-ROS equivalent of the reference's
live preintegration node (UT_MM_Scripts/imu_preintegration.py).

Reproduces its exact conventions (quirks included, for data parity):
  * linear acceleration is taken as [ax, 0, 0] — the robot-x axis only
    (imu_preintegration.py:77, the Jackal drives forward),
  * fixed integration step dt (0.010 s at the 100 Hz IMU topic,
    imu_preintegration.py:36) regardless of sample timestamps,
  * per-sample relative transform I_T_N: R = euler_matrix(w*dt, 'sxyz'),
    t = v*dt + 0.5*a*dt^2 (imu_preintegration.py:79-91),
  * world pose composes right: W_T_N <- W_T_N @ I_T_N
    (imu_preintegration.py:95),
  * the CSV rows are the INVERSE relative transforms, schema
    "Timestamp,T_11,...,T_44" (imu_preintegration.py:152-153).

Input formats:
  * a UT-MM `imu.txt` (36-column microstrain odometry rows — columns 4-6
    angular velocity, 7-9 linear acceleration; data/utmm.py), or
  * a plain CSV/whitespace file with columns: timestamp ax ay az wx wy wz.

Usage:
  python scripts/imu_preintegrate.py --imu path/to/imu.txt \
      --out imu_rel.csv [--world-out traj_world.csv] [--dt 0.01]
"""
import argparse
import csv
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def _euler_matrix_sxyz(ai, aj, ak):
    """Homogeneous sxyz euler matrix, numpy (host-side; equivalent to
    ops/pose.euler_matrix(..., 'sxyz') — tested against it — without
    initializing a jax backend for a per-sample scalar op)."""
    si, sj, sk = np.sin([ai, aj, ak])
    ci, cj, ck = np.cos([ai, aj, ak])
    cc, cs = ci * ck, ci * sk
    sc, ss = si * ck, si * sk
    m = np.eye(4)
    m[0, 0] = cj * ck
    m[0, 1] = sj * sc - cs
    m[0, 2] = sj * cc + ss
    m[1, 0] = cj * sk
    m[1, 1] = sj * ss + cc
    m[1, 2] = sj * cs - sc
    m[2, 0] = -sj
    m[2, 1] = cj * si
    m[2, 2] = cj * ci
    return m


def load_samples(path: str, fmt: str):
    with open(path) as f:
        first = f.readline()
    delim = "," if ("," in first) else None
    raw = np.loadtxt(path, delimiter=delim, ndmin=2)
    if fmt == "auto":
        fmt = "utmm" if raw.shape[1] >= 36 else "plain"
    if fmt == "utmm":
        # 36-col microstrain odometry rows: [0] stamp, [4:7] angular
        # velocity, [7:10] linear acceleration (data/utmm.py:24-33)
        ts = raw[:, 0]
        w = raw[:, 4:7]
        a = raw[:, 7:10]
    else:
        ts = raw[:, 0]
        a = raw[:, 1:4]
        w = raw[:, 4:7]
    return ts, a, w


def preintegrate(ts, accel, gyro, dt: float):
    """Returns (rel_inv [N,4,4], world [N,4,4]) with the reference node's
    exact update equations."""
    n = len(ts)
    velocity = np.zeros(3)
    W_T_N = np.eye(4)
    rel_inv = np.zeros((n, 4, 4))
    world = np.zeros((n, 4, 4))
    for i in range(n):
        lin_accel = np.array([accel[i, 0], 0.0, 0.0])  # x-axis only (quirk)
        ang_vel = gyro[i]
        dpos = velocity * dt + 0.5 * lin_accel * dt * dt
        velocity = velocity + lin_accel * dt
        dori = ang_vel * dt

        I_T_N = _euler_matrix_sxyz(*dori)
        I_T_N[0:3, 3] = dpos
        W_T_N = W_T_N @ I_T_N

        rel_inv[i] = np.linalg.inv(I_T_N)
        world[i] = W_T_N
    return rel_inv, world


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--imu", required=True,
                    help="imu.txt (UT-MM 36-col) or 'ts ax ay az wx wy wz'")
    ap.add_argument("--format", choices=("auto", "utmm", "plain"),
                    default="auto")
    ap.add_argument("--out", default="imu_rel.csv",
                    help="relative inv(I_T_N) CSV (reference schema)")
    ap.add_argument("--world-out", default=None,
                    help="optional world-frame W_T_N CSV (same schema)")
    ap.add_argument("--dt", type=float, default=0.010,
                    help="fixed integration step (reference: 100 Hz)")
    args = ap.parse_args()

    ts, accel, gyro = load_samples(args.imu, args.format)
    rel_inv, world = preintegrate(ts, accel, gyro, args.dt)

    header = ["Timestamp"] + [f"T_{i}{j}" for i in range(1, 5)
                              for j in range(1, 5)]

    def dump(path, mats):
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(header)
            for t, m in zip(ts, mats):
                w.writerow([f"{t:.9f}", *m.flatten()])

    dump(args.out, rel_inv)
    print(f"wrote {args.out}: {len(ts)} relative transforms")
    if args.world_out:
        dump(args.world_out, world)
        print(f"wrote {args.world_out}")


if __name__ == "__main__":
    main()

"""Dataset-layer tests: a generated on-disk TUM-format sequence round-trips
through the loader (association, resize, depth scaling, relative poses)."""
import os

import numpy as np
import pytest

import imageio.v2 as imageio

from mm3dgs_slam_tpu.data import get_dataset_type


def write_tum_dataset(root, n=6, h=48, w=64, depth_scale=5000.0):
    os.makedirs(os.path.join(root, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(root, "depth"), exist_ok=True)
    rng = np.random.default_rng(0)
    rgb_lines, depth_lines, gt_lines = [], ["# depth"], ["# gt"]
    for i in range(n):
        t = 100.0 + i * 0.1
        img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
        depth = (rng.uniform(0.5, 3.0, size=(h, w)) * depth_scale).astype(np.uint16)
        imageio.imwrite(os.path.join(root, "rgb", f"{t:.6f}.png"), img)
        imageio.imwrite(os.path.join(root, "depth", f"{t:.6f}.png"), depth)
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t + 0.005:.6f} depth/{t:.6f}.png")
        gt_lines.append(
            f"{t + 0.002:.6f} {0.1 * i:.6f} 0.0 0.0 0.0 0.0 0.0 1.0"
        )
    with open(os.path.join(root, "rgb.txt"), "w") as f:
        f.write("\n".join(rgb_lines))
    with open(os.path.join(root, "depth.txt"), "w") as f:
        f.write("\n".join(depth_lines))
    with open(os.path.join(root, "groundtruth.txt"), "w") as f:
        f.write("\n".join(gt_lines))


def tum_cfg(h=48, w=64):
    return {
        "dataset": "tum",
        "cam": {
            "image_height": h, "image_width": w,
            "fx": 50.0, "fy": 50.0, "cx": w / 2, "cy": h / 2,
            "png_depth_scale": 5000.0, "crop_edge": 0,
        },
    }


def test_tum_loader_roundtrip(tmp_path):
    root = str(tmp_path)
    write_tum_dataset(os.path.join(root, "seq"))
    ds = get_dataset_type("tum")(
        config_dict=tum_cfg(), basedir=root, sequence="seq",
        stride=1, start=0, end=-1, desired_height=24, desired_width=32,
        relative_pose=True,
    )
    assert len(ds) == 6
    color, depth, intrinsics, pose, imu = ds[0]
    assert color.shape == (24, 32, 3)
    assert color.max() > 1.0  # 0-255 range
    assert depth.shape == (24, 32, 1)
    assert 0.4 < depth.mean() < 3.1  # meters
    # intrinsics rescaled by 0.5
    assert np.isclose(intrinsics[0, 0], 25.0)
    # relative poses: frame 0 is identity
    assert np.allclose(pose, np.eye(4), atol=1e-6)
    # frame 3 translated by 0.3 along x
    _, _, _, pose3, _ = ds[3]
    assert np.isclose(pose3[0, 3], 0.3, atol=1e-6)


def test_tum_loader_stride_and_start(tmp_path):
    root = str(tmp_path)
    write_tum_dataset(os.path.join(root, "seq"))
    ds = get_dataset_type("tum")(
        config_dict=tum_cfg(), basedir=root, sequence="seq",
        stride=2, start=1, end=-1, desired_height=24, desired_width=32,
    )
    assert len(ds) == 3  # frames 1, 3, 5
    # relative to frame 1: its own pose is identity, frame 3 at +0.2
    _, _, _, p0, _ = ds[0]
    _, _, _, p1, _ = ds[1]
    assert np.allclose(p0, np.eye(4), atol=1e-6)
    assert np.isclose(p1[0, 3], 0.2, atol=1e-6)


def test_registry_covers_reference_loaders():
    for name in ["tum", "utmm", "replica", "icl", "scannet", "scannetpp",
                 "azure", "realsense", "record3d", "nerfcapture", "ai2thor",
                 "synthetic"]:
        assert get_dataset_type(name) is not None
    with pytest.raises(ValueError):
        get_dataset_type("nope")


def write_replicav2_dataset(root, seq="room_0", n_train=4, n_eval=3, h=32, w=40,
                            depth_scale=1000.0):
    rng = np.random.default_rng(1)
    for split, n in (("00", n_train), ("01", n_eval)):
        d = os.path.join(root, seq, "imap", split)
        os.makedirs(os.path.join(d, "rgb"), exist_ok=True)
        os.makedirs(os.path.join(d, "depth"), exist_ok=True)
        lines = []
        for i in range(n):
            img = (rng.uniform(size=(h, w, 3)) * 255).astype(np.uint8)
            depth = (rng.uniform(0.5, 3.0, size=(h, w)) * depth_scale).astype(np.uint16)
            imageio.imwrite(os.path.join(d, "rgb", f"rgb_{i}.png"), img)
            imageio.imwrite(os.path.join(d, "depth", f"depth_{i}.png"), depth)
            T = np.eye(4)
            T[0, 3] = (0.5 if split == "01" else 0.1) * i + (10.0 if split == "01" else 0.0)
            lines.append(" ".join(f"{v:.6f}" for v in T.reshape(-1)))
        with open(os.path.join(d, "traj_w_c.txt"), "w") as f:
            f.write("\n".join(lines))


def replicav2_cfg(h=32, w=40):
    return {
        "dataset": "replicav2",
        "cam": {
            "image_height": h, "image_width": w,
            "fx": 40.0, "fy": 40.0, "cx": w / 2, "cy": h / 2,
            "png_depth_scale": 1000.0, "crop_edge": 0,
        },
    }


def test_replicav2_train_split(tmp_path):
    root = str(tmp_path)
    write_replicav2_dataset(root)
    ds = get_dataset_type("replicav2")(
        config_dict=replicav2_cfg(), basedir=root, sequence="room_0",
        stride=1, start=0, end=-1, desired_height=16, desired_width=20,
        relative_pose=False,
    )
    assert len(ds) == 4
    color, depth, intrinsics, pose, _ = ds[2]
    assert color.shape == (16, 20, 3)
    assert np.isclose(pose[0, 3], 0.2, atol=1e-6)


def test_replicav2_eval_split_prepends_train_frame0(tmp_path):
    """replica.py:111-148: eval split prepends imap/00 frame 0 as an anchor."""
    root = str(tmp_path)
    write_replicav2_dataset(root)
    ds = get_dataset_type("replicav2")(
        config_dict=replicav2_cfg(), basedir=root, sequence="room_0",
        use_train_split=False,
        stride=1, start=0, end=-1, desired_height=16, desired_width=20,
        relative_pose=False,
    )
    assert len(ds) == 4  # 1 train anchor + 3 eval
    _, _, _, p0, _ = ds[0]
    assert np.isclose(p0[0, 3], 0.0, atol=1e-6)   # train frame 0
    _, _, _, p1, _ = ds[1]
    assert np.isclose(p1[0, 3], 10.0, atol=1e-6)  # eval frame 0


def test_prefetcher_sequential_and_random():
    """data/prefetch.Prefetcher: sequential access returns the prefetched
    item; random access falls through; items are identical to direct
    loads; each index is loaded at most twice (once direct, once ahead)."""
    from mm3dgs_slam_tpu.data.prefetch import Prefetcher

    loads = []

    class Ds:
        def __len__(self):
            return 6

        def __getitem__(self, i):
            loads.append(i)
            return ("item", i)

    pf = Prefetcher(Ds())
    try:
        for i in range(6):
            assert pf[i] == ("item", i)
        assert pf[3] == ("item", 3)     # random access after the end
        assert pf[5] == ("item", 5)
        from collections import Counter

        assert max(Counter(loads).values()) <= 2
        # disabled mode is a passthrough
        pf2 = Prefetcher(Ds(), enabled=False)
        assert pf2[2] == ("item", 2)
    finally:
        pf.close()

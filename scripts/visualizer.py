#!/usr/bin/env python
"""Interactive / offline map visualizer.

Counterpart of the reference's scripts/visualizer.py (Open3D viewer,
visualizer.py:115-283): loads a PLY checkpoint + results.npz trajectory,
renders the map with our renderer and shows (or saves) an RGB + depth view
with camera frustum trajectory.

The default is an offline matplotlib viewer that renders a fly-around and
the estimated trajectory to PNGs; `--interactive` opens a dependency-free
free-view window (matplotlib GUI event loop + FreeViewController — no
Open3D needed, unlike the reference) with WASD/arrow-key camera controls,
falling back to offline rendering when the host is headless.

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


class FreeViewController:
    """Keyboard free-view camera over a w2c 7-vec pose — the dependency-free
    counterpart of the reference's Open3D view_control loop
    (visualizer.py:232-277, extrinsic read back from the window each tick).

    Keys (camera-local): w/s dolly, a/d truck, r/f pedestal; arrow keys
    yaw/pitch; ,/. roll; home resets. Steps scale with `move_step` /
    `turn_step` (radians). Pure state machine so it is unit-testable
    without a GUI backend; the matplotlib wiring below feeds it
    key_press_event names."""

    MOVES = {"w": (2, +1), "s": (2, -1), "a": (0, -1), "d": (0, +1),
             "f": (1, +1), "r": (1, -1)}
    TURNS = {"left": (1, +1), "right": (1, -1), "up": (0, +1),
             "down": (0, -1), ",": (2, +1), ".": (2, -1)}

    def __init__(self, pose7, move_step=0.1, turn_step=0.05):
        self.home = np.asarray(pose7, np.float64).copy()
        self.pose = self.home.copy()
        self.move_step = float(move_step)
        self.turn_step = float(turn_step)

    def _w2c(self):
        q, t = self.pose[:4], self.pose[4:]
        n = q / np.linalg.norm(q)
        w, x, y, z = n
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        return R, t

    def handle_key(self, key: str) -> bool:
        """Apply one key; returns True if the pose changed."""
        if key == "home":
            self.pose = self.home.copy()
            return True
        if key in self.MOVES:
            axis, sign = self.MOVES[key]
            # moving the CAMERA by +d along its local axis shifts the w2c
            # translation by -d on that axis (t' = t - d·e_axis)
            self.pose[4 + axis] -= sign * self.move_step
            return True
        if key in self.TURNS:
            axis, sign = self.TURNS[key]
            half = sign * self.turn_step / 2.0
            dq = np.zeros(4)
            dq[0] = np.cos(half)
            dq[1 + axis] = np.sin(half)
            # camera-local rotation: w2c' = dR^T @ w2c  =>  q' = conj(dq)*q
            dq[1:] = -dq[1:]
            w1, x1, y1, z1 = dq
            w2, x2, y2, z2 = self.pose[:4]
            q = np.array([
                w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            ])
            # rotate about the camera CENTER, not the world origin: keep the
            # camera position c = -R^T t fixed while the orientation turns
            R, t = self._w2c()
            c = -R.T @ t
            self.pose[:4] = q / np.linalg.norm(q)
            Rn, _ = self._w2c()
            self.pose[4:] = -Rn @ c
            return True
        return False


def run_interactive(render_view, ctrl: FreeViewController):
    """Matplotlib interactive free-view loop (needs a GUI backend). The
    render_view callback maps a 7-vec pose -> (rgb HWC, depth_rgb HWC)."""
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    rgb, dep = render_view(ctrl.pose)
    im0 = axes[0].imshow(rgb)
    im1 = axes[1].imshow(dep)
    axes[0].set_title("render — w/a/s/d/r/f move, arrows turn, home resets")
    axes[1].set_title("depth")
    for ax in axes:
        ax.axis("off")

    def on_key(event):
        if event.key == "q":
            plt.close(fig)
            return
        if ctrl.handle_key(event.key):
            rgb, dep = render_view(ctrl.pose)
            im0.set_data(rgb)
            im1.set_data(dep)
            fig.canvas.draw_idle()

    fig.canvas.mpl_connect("key_press_event", on_key)
    plt.show()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--iteration", type=int, required=True)
    parser.add_argument("--online", action="store_true",
                        help="replay the estimated trajectory")
    parser.add_argument("--interactive", action="store_true",
                        help="interactive free-view window (matplotlib GUI "
                             "backend; falls back to offline PNGs when "
                             "headless)")
    parser.add_argument("--frames", type=int, default=24)
    args = parser.parse_args()

    cfg = load_config(args.config)
    m, pose_est = load_map_and_poses(cfg, args.iteration)

    import jax.numpy as jnp
    import matplotlib

    if args.interactive:
        # need a real GUI event loop; Agg can't show windows
        for backend in ("TkAgg", "QtAgg", "GTK4Agg"):
            try:
                matplotlib.use(backend)
                break
            except Exception:
                continue
        else:
            print("no interactive matplotlib backend; falling back to "
                  "offline rendering")
            args.interactive = False
    if not args.interactive:
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

    def render_view(pose):
        out = render(g, jnp.asarray(pose, jnp.float32), rs)
        rgb = np.clip(np.asarray(out["render"]), 0, 1).transpose(1, 2, 0)
        sil = np.asarray(out["depth"][1])
        depth = np.asarray(out["depth"][0]) / np.maximum(sil, 1e-6)
        return rgb, depth_to_rgb_np(depth).transpose(1, 2, 0)

    if args.interactive:
        ctrl = FreeViewController(pose_est[0])
        try:
            run_interactive(render_view, ctrl)
            return
        except Exception as e:
            # a GUI backend can import fine on a display-less host and only
            # fail when the window opens (e.g. tkinter.TclError: no
            # $DISPLAY) — degrade to the offline renderer either way
            print(f"interactive window failed ({e!r}); falling back to "
                  "offline rendering")
            matplotlib.use("Agg", force=True)

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

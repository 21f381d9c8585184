"""Procedural synthetic RGB-D dataset rendered from a random Gaussian scene.

Self-consistent ground truth for tests, demos and benchmarking: frames are
rendered with the exact oracle compositor from a known camera trajectory, so
SLAM on this dataset should recover near-zero ATE and high PSNR. Not part of
the reference (which has no test data); selected with ``dataset: synthetic``.

Config block (all optional):
  synthetic: {n_gaussians: 400, n_frames: 12, seed: 0, orbit_radius: 0.15,
              textured: false, occluders: 0, noise_std: 0.0}

Hard-scene knobs (configs/synthetic_hard.yml) stress the subsystems the
smooth random-surfel scene exercises weakly:
  * ``textured``: colors become a high-frequency procedural function of
    world position (multi-sine "texture") instead of iid uniform — sharp
    image gradients drive the photometric losses and NIQE keyframe scoring
    the way real texture does,
  * ``occluders``: adds that many opaque foreground stripes at z~1 m; the
    orbit slides the background behind them, so occlusion boundaries CROSS
    during the run (stressing depth-sorted compositing, silhouette masks
    and covisibility),
  * ``noise_std``: per-frame iid Gaussian photometric noise (seeded,
    clipped to [0, 1]) on the rendered color — the estimator can no longer
    match frames exactly, exposing overfitting-to-noise in mapping and
    pruning.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.camera import Camera
from ..ops.oracle import composite_oracle
from ..ops.pose import pose_to_w2c, w2c_to_pose
from ..ops.render import RenderSettings, project_for_pose
from ..ops.sh import rgb_to_sh
from ..ops.render import ActivatedGaussians


def _texture_rgb(xyz):
    """High-frequency procedural 'texture': rgb as a multi-sine function of
    world position (deterministic, sharp gradients at surfel scale)."""
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    r = 0.5 + 0.25 * jnp.sin(21.0 * x + 13.0 * y) + 0.25 * jnp.sin(7.0 * z)
    g = 0.5 + 0.25 * jnp.sin(17.0 * y + 5.0 * z) + 0.25 * jnp.sin(29.0 * x)
    b = 0.5 + 0.25 * jnp.sin(11.0 * x * y) + 0.25 * jnp.sin(19.0 * z + 3.0 * y)
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.02, 0.98)


def _make_scene(key, n: int, cam: Camera, textured: bool = False,
                occluders: int = 0):
    ks = jax.random.split(key, 6)
    n_fg = min(n // 5, occluders * max(n // 20, 1)) if occluders else 0
    n_bg = n - n_fg
    z = jax.random.uniform(ks[0], (n,), minval=1.5, maxval=5.0)
    px = jax.random.uniform(ks[1], (n,), minval=-10.0, maxval=cam.width + 10.0)
    py = jax.random.uniform(ks[2], (n,), minval=-10.0, maxval=cam.height + 10.0)
    if n_fg:
        # opaque vertical stripes at z ~ 1 m: the orbit slides the 1.5-5 m
        # background behind them, crossing occlusion boundaries every frame
        kf = jax.random.split(jax.random.fold_in(key, 77), 3)
        stripe = jax.random.randint(kf[0], (n_fg,), 0, occluders)
        centers = (jnp.linspace(0.2, 0.8, occluders)[stripe]) * cam.width
        fx_px = centers + jax.random.normal(kf[1], (n_fg,)) * 0.02 * cam.width
        fy_px = jax.random.uniform(kf[2], (n_fg,), minval=-5.0,
                                   maxval=cam.height + 5.0)
        z = z.at[n_bg:].set(
            1.0 + 0.1 * jax.random.normal(jax.random.fold_in(key, 78),
                                          (n_fg,)))
        px = px.at[n_bg:].set(fx_px)
        py = py.at[n_bg:].set(fy_px)
    x = (px - cam.cx) / cam.fx * z
    y = (py - cam.cy) / cam.fy * z
    xyz = jnp.stack([x, y, z], axis=-1)
    scales = jnp.exp(jax.random.uniform(ks[3], (n, 3), minval=-3.2, maxval=-1.8))
    if n_fg:
        # foreground surfels are nearer, so equal world scale = larger
        # screen footprint already; keep them slightly smaller in world
        # units so occlusion edges stay crisp
        scales = scales.at[n_bg:].mul(0.6)
    q = jax.random.normal(ks[4], (n, 4))
    rot = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # dense, mostly-opaque surfels: well-conditioned photometric tracking
    opacity = jnp.clip(jax.nn.sigmoid(jax.random.normal(ks[5], (n,))) + 0.7, 0.7, 0.98)
    if n_fg:
        opacity = opacity.at[n_bg:].set(0.97)
    rgb = (_texture_rgb(xyz) if textured
           else jax.random.uniform(jax.random.fold_in(key, 9), (n, 3)))
    return ActivatedGaussians(
        xyz=xyz.astype(jnp.float32),
        scales=scales.astype(jnp.float32),
        rotations=rot.astype(jnp.float32),
        opacity=opacity.astype(jnp.float32),
        shs=rgb_to_sh(rgb)[:, None, :].astype(jnp.float32),
        alive=jnp.ones((n,), bool),
    )


class SyntheticDataset:
    has_imu = False

    def __init__(self, config_dict, basedir=None, sequence=None, stride=1,
                 start=0, end=-1, desired_height=64, desired_width=80,
                 relative_pose=True, **kwargs):
        syn = config_dict.get("synthetic", {}) or {}
        n_gauss = int(syn.get("n_gaussians", 400))
        n_frames = int(syn.get("n_frames", 12))
        seed = int(syn.get("seed", 0))
        orbit = float(syn.get("orbit_radius", 0.15))
        textured = bool(syn.get("textured", False))
        occluders = int(syn.get("occluders", 0))
        noise_std = float(syn.get("noise_std", 0.0))

        cam_cfg = config_dict["cam"]
        h, w = desired_height, desired_width
        ratio_h = h / cam_cfg["image_height"]
        ratio_w = w / cam_cfg["image_width"]
        cam = Camera(
            height=h, width=w,
            fx=cam_cfg["fx"] * ratio_w, fy=cam_cfg["fy"] * ratio_h,
            cx=cam_cfg["cx"] * ratio_w, cy=cam_cfg["cy"] * ratio_h,
        )
        self.cam = cam
        self.scene = _make_scene(jax.random.PRNGKey(seed), n_gauss, cam,
                                 textured=textured, occluders=occluders)
        rs = RenderSettings(cam=cam, use_oracle=True)

        # Smooth trajectory: gentle arc + forward drift (w2c convention).
        poses_w2c = []
        for i in range(n_frames):
            t = i / max(n_frames - 1, 1)
            ang = 0.5 * np.pi * t
            dx = orbit * np.sin(ang)
            dy = 0.5 * orbit * (1 - np.cos(ang))
            dz = 0.1 * t
            yaw = 0.05 * np.sin(ang)
            cy_, sy_ = np.cos(yaw), np.sin(yaw)
            w2c = np.eye(4, dtype=np.float32)
            w2c[:3, :3] = np.array([[cy_, 0, sy_], [0, 1, 0], [-sy_, 0, cy_]])
            w2c[:3, 3] = [dx, dy, dz]
            poses_w2c.append(w2c)

        self.frames = []
        self.poses = []
        noise_rng = np.random.default_rng(seed + 1)
        for w2c in poses_w2c:
            pose7 = w2c_to_pose(jnp.asarray(w2c))
            out = project_for_pose(self.scene, pose7, rs)
            img6 = composite_oracle(out, cam, jnp.zeros(6))
            rgb = np.asarray(jnp.clip(img6[:3], 0, 1))
            if noise_std > 0.0:
                # per-frame photometric noise (seeded): the SLAM can no
                # longer match frames exactly — GT poses stay clean
                rgb = np.clip(
                    rgb + noise_rng.normal(0.0, noise_std, rgb.shape)
                    .astype(np.float32), 0.0, 1.0)
            sil = np.asarray(img6[4])
            depth = np.asarray(img6[3])
            d = np.where(sil > 0.5, depth / np.maximum(sil, 1e-6), 0.0)
            self.frames.append((rgb, d.astype(np.float32)))
            self.poses.append(np.linalg.inv(w2c))  # store c2w

        sl = slice(start, None if end == -1 else end, stride or 1)
        self.frames = self.frames[sl]
        self.poses = self.poses[sl]
        if relative_pose:
            first = self.poses[0]
            self.poses = [np.linalg.inv(first) @ p for p in self.poses]
        self.num_imgs = len(self.frames)

    def __len__(self):
        return self.num_imgs

    def __getitem__(self, index):
        rgb, depth = self.frames[index]
        color_hwc = (rgb.transpose(1, 2, 0) * 255.0).astype(np.float32)
        K = np.eye(4, dtype=np.float32)
        K[0, 0], K[1, 1] = self.cam.fx, self.cam.fy
        K[0, 2], K[1, 2] = self.cam.cx, self.cam.cy
        return (
            color_hwc,
            depth[..., None].astype(np.float32),
            K,
            self.poses[index].astype(np.float32),
            None,
        )

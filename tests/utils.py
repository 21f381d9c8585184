"""Shared synthetic-scene helpers for tests."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mm3dgs_slam_tpu.ops.camera import Camera
from mm3dgs_slam_tpu.ops.render import ActivatedGaussians
from mm3dgs_slam_tpu.ops.sh import rgb_to_sh


def small_camera(h=64, w=80, f=70.0):
    return Camera(height=h, width=w, fx=f, fy=f, cx=w / 2 - 0.5, cy=h / 2 - 0.5)


def random_scene(key, n, cam: Camera, n_dead: int = 0, depth_range=(1.0, 6.0)):
    """Random Gaussians filling the camera frustum; returns ActivatedGaussians."""
    ks = jax.random.split(key, 6)
    z = jax.random.uniform(ks[0], (n,), minval=depth_range[0], maxval=depth_range[1])
    # spread across the image plane (slightly beyond edges)
    px = jax.random.uniform(ks[1], (n,), minval=-8.0, maxval=cam.width + 8.0)
    py = jax.random.uniform(ks[2], (n,), minval=-8.0, maxval=cam.height + 8.0)
    x = (px - cam.cx) / cam.fx * z
    y = (py - cam.cy) / cam.fy * z
    xyz = jnp.stack([x, y, z], axis=-1)

    scales = jnp.exp(jax.random.uniform(ks[3], (n, 3), minval=-4.5, maxval=-2.5))
    q = jax.random.normal(ks[4], (n, 4))
    rotations = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    opacity = jax.nn.sigmoid(jax.random.normal(ks[5], (n,)) * 2.0)
    rgb = jax.random.uniform(jax.random.fold_in(key, 7), (n, 3))
    shs = rgb_to_sh(rgb)[:, None, :]  # [n, 1, 3]
    alive = jnp.arange(n) < (n - n_dead)
    return ActivatedGaussians(
        xyz=xyz.astype(jnp.float32),
        scales=scales.astype(jnp.float32),
        rotations=rotations.astype(jnp.float32),
        opacity=opacity.astype(jnp.float32),
        shs=shs.astype(jnp.float32),
        alive=alive,
    )


def allclose_report(a, b, atol=1e-5, rtol=1e-5):
    a = np.asarray(a)
    b = np.asarray(b)
    ok = np.allclose(a, b, atol=atol, rtol=rtol)
    if not ok:
        diff = np.abs(a - b)
        print("max abs diff", diff.max(), "at", np.unravel_index(diff.argmax(), diff.shape))
    return ok

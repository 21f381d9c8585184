"""Camera model and projection matrices.

The pinhole camera is a static (hashable) NamedTuple so jitted render
functions can specialize on image size / tile grid while intrinsics stay
plain Python floats baked into the program.
"""
from __future__ import annotations

import math
import os
from typing import NamedTuple

import jax.numpy as jnp

# Pixel tile edge used by the rasterizer's binning grid. The reference CUDA
# rasterizer hardcodes 16x16 blocks (one thread per pixel); here the tile is
# the Pallas kernel's sublane extent, and the best value depends on splat
# scale: every (gaussian, tile) pair costs TILE*TILE pixels of VPU work, so
# pixel-scale splats waste most of a 16x16 tile while big splats amortize the
# per-chunk fixed costs better. Env knob for measurement; import-time constant
# so jitted programs specialize on it.
TILE = int(os.environ.get("MM3DGS_TILE", "16"))


class Camera(NamedTuple):
    """Pinhole camera with principal point; mirrors slam/renderer.py:46-77."""

    height: int
    width: int
    fx: float
    fy: float
    cx: float
    cy: float
    znear: float = 0.01
    zfar: float = 100.0

    @property
    def tanfovx(self) -> float:
        # reference: renderer.py:61  (tanfov from focal, not an actual FOV angle)
        return self.width / (2.0 * self.fx)

    @property
    def tanfovy(self) -> float:
        return self.height / (2.0 * self.fy)

    @property
    def tiles_x(self) -> int:
        return math.ceil(self.width / TILE)

    @property
    def tiles_y(self) -> int:
        return math.ceil(self.height / TILE)

    @property
    def n_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    def intrinsics_matrix(self) -> jnp.ndarray:
        K = jnp.eye(3, dtype=jnp.float32)
        K = K.at[0, 0].set(self.fx)
        K = K.at[1, 1].set(self.fy)
        K = K.at[0, 2].set(self.cx)
        K = K.at[1, 2].set(self.cy)
        return K


def projection_matrix(cam: Camera) -> jnp.ndarray:
    """OpenGL-style projection with principal point.

    Mirrors utils/graphics_utils.py:85-94 (getProjectionMatrix2); used
    column-convention here: p_hom = P @ [x_cam, y_cam, z_cam, 1].
    """
    znear, zfar = cam.znear, cam.zfar
    w, h = cam.width, cam.height
    return jnp.array(
        [
            [2 * cam.fx / w, 0.0, -(w - 2 * cam.cx) / w, 0.0],
            [0.0, 2 * cam.fy / h, -(h - 2 * cam.cy) / h, 0.0],
            [0.0, 0.0, zfar / (zfar - znear), -(zfar * znear) / (zfar - znear)],
            [0.0, 0.0, 1.0, 0.0],
        ],
        dtype=jnp.float32,
    )


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: int) -> float:
    return 2 * math.atan(pixels / (2 * focal))

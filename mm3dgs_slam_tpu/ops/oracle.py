"""Exact (slow) reference compositor: the rasterizer oracle.

Replays the reference CUDA rasterizer's per-pixel front-to-back loop exactly
(including the alpha < 1/255 skip, the 0.99 alpha clamp, and the hard
T < 1e-4 termination that freezes transmittance), densely over the full
image with a `lax.scan` over depth-sorted Gaussians. O(N * H * W) — only for
tests and tiny scenes; the production path is ops/composite.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .camera import TILE, Camera
from .projection import ProjectedGaussians


def composite_oracle(
    proj: ProjectedGaussians, cam: Camera, bg: jnp.ndarray
) -> jnp.ndarray:
    """Returns [C, H, W] composited features (+ T * bg per channel)."""
    H, W = cam.height, cam.width
    C = proj.feat.shape[-1]

    order = jnp.argsort(proj.depth, stable=True)
    # Note: the CUDA rasterizer sorts by (tile, depth); for full-image pixels a
    # global depth sort is equivalent per pixel.
    xy = proj.xy[order]
    conic = proj.conic[order]
    opac = proj.opacity[order]
    feat = proj.feat[order]
    radius = proj.radius[order]

    ys = jnp.arange(H, dtype=jnp.float32)
    xs = jnp.arange(W, dtype=jnp.float32)
    pixx, pixy = jnp.meshgrid(xs, ys)  # [H, W]

    tiles_x = cam.tiles_x
    tiles_y = cam.tiles_y

    def body(carry, g):
        T, done, acc = carry
        gxy, gconic, gop, gfeat, grad = g
        dx = gxy[0] - pixx
        dy = gxy[1] - pixy
        power = -0.5 * (gconic[0] * dx * dx + gconic[2] * dy * dy) - gconic[1] * dx * dy
        alpha_raw = gop * jnp.exp(power)
        alpha = jnp.minimum(0.99, alpha_raw)
        # Tile-rect mask: CUDA only composites a Gaussian into pixels of tiles
        # its [center +- radius] box overlaps (getRect semantics).
        r = grad.astype(jnp.float32)
        t = float(TILE)
        x0 = jnp.clip(jnp.floor((gxy[0] - r) / t), 0, tiles_x).astype(jnp.int32)
        x1 = jnp.clip(jnp.floor((gxy[0] + r + t - 1) / t), 0, tiles_x).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor((gxy[1] - r) / t), 0, tiles_y).astype(jnp.int32)
        y1 = jnp.clip(jnp.floor((gxy[1] + r + t - 1) / t), 0, tiles_y).astype(jnp.int32)
        in_rect = (
            (pixx >= x0 * t) & (pixx < x1 * t) & (pixy >= y0 * t) & (pixy < y1 * t)
        )
        contribute = (power <= 0.0) & (alpha >= (1.0 / 255.0)) & (grad > 0) & in_rect
        alpha = jnp.where(contribute, alpha, 0.0)
        T_test = T * (1.0 - alpha)
        newly_done = contribute & (T_test < 1e-4) & (~done)
        use = contribute & (~done) & (~newly_done)
        w = jnp.where(use, alpha * T, 0.0)
        acc = acc + w[None] * gfeat[:, None, None]
        T = jnp.where(use, T_test, T)
        done = done | newly_done
        return (T, done, acc), None

    T0 = jnp.ones((H, W), dtype=jnp.float32)
    done0 = jnp.zeros((H, W), dtype=bool)
    acc0 = jnp.zeros((C, H, W), dtype=jnp.float32)
    (T, _, acc), _ = jax.lax.scan(
        body, (T0, done0, acc0), (xy, conic, opac, feat, radius)
    )
    return acc + T[None] * bg[:, None, None]

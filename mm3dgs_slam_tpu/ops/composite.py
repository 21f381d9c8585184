"""Differentiable tile-based alpha compositing (pure-jnp production path).

Consumes the (tile, depth)-sorted pair lists from ops/binning.py and
composites all feature channels (RGB + depth/silhouette/E[z^2]) in ONE pass.
Exact CUDA-forward semantics: per-pixel front-to-back order, alpha clamp at
0.99 (straight-through gradient, matching the CUDA backward which ignores the
clamp), the alpha >= 1/255 skip, and the hard T < 1e-4 stop that freezes
transmittance.

Structure: a `lax.scan` over fixed "rounds"; round r processes pairs
[tile_start + r*chunk, +chunk) of EVERY tile simultaneously. Within a chunk
the sequential transmittance recursion is expressed with an exclusive cumprod,
and feature accumulation is a batched [pixels x chunk] @ [chunk x C] matmul
(MXU). The scan body is rematerialized so backward memory stays O(carry).

A Pallas kernel with per-tile dynamic trip counts and early termination
replaces this for peak performance (ops/pallas_composite.py); this module is
the semantics-defining, any-backend fallback, and the two are cross-checked
in tests.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .binning import TileBins
from .camera import TILE, Camera
from .projection import ProjectedGaussians

TILE_PIXELS = TILE * TILE  # 256


def _straight_through_min(x: jnp.ndarray, cap: float) -> jnp.ndarray:
    """min(x, cap) in value; identity in gradient (CUDA-backward parity)."""
    return x - jax.lax.stop_gradient(x - jnp.minimum(x, cap))


@partial(jax.jit, static_argnames=("cam", "max_per_tile", "chunk"))
def composite_tiles(
    proj: ProjectedGaussians,
    bins: TileBins,
    cam: Camera,
    bg: jnp.ndarray,
    max_per_tile: int = 1024,
    chunk: int = 32,
) -> jnp.ndarray:
    """Composite into a [C, H, W] image (+ frozen-T * bg).

    Args:
      proj: projected Gaussians (differentiable inputs).
      bins: pair lists from build_bins (treated as constants w.r.t. autodiff).
      bg: [C] background per feature channel (the reference feeds the SAME RGB
          bg to both of its passes, renderer.py:130,207-214, so callers pass
          concat([bg_rgb, bg_rgb])).
      max_per_tile: static upper bound on pairs composited per tile
          (deeper segments are truncated back-to-front).
      chunk: pairs per round; also the matmul K dimension.
    """
    n_tiles = cam.n_tiles
    tiles_x = cam.tiles_x
    C = proj.feat.shape[-1]
    pair_cap = bins.pair_gauss.shape[0]
    n_rounds = max(max_per_tile // chunk, 1)

    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_y = tids // tiles_x
    tile_x = tids % tiles_x
    lane = jnp.arange(TILE_PIXELS, dtype=jnp.int32)
    pixf_x = (tile_x[:, None] * TILE + (lane % TILE)[None, :]).astype(jnp.float32)
    pixf_y = (tile_y[:, None] * TILE + (lane // TILE)[None, :]).astype(jnp.float32)

    seg_start = bins.tile_start
    seg_end = bins.tile_start + bins.tile_count

    def round_body(carry, r):
        T_run, done, acc = carry
        base = seg_start[:, None] + r * chunk + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        in_seg = base < seg_end[:, None]
        idx = jnp.clip(base, 0, pair_cap - 1)
        g = bins.pair_gauss[idx]  # [T, chunk]

        gxy = proj.xy[g]          # [T, chunk, 2]
        gcon = proj.conic[g]      # [T, chunk, 3]
        gop = proj.opacity[g]     # [T, chunk]
        gfeat = proj.feat[g]      # [T, chunk, C]

        dx = gxy[..., 0:1] - pixf_x[:, None, :]  # [T, chunk, P]
        dy = gxy[..., 1:2] - pixf_y[:, None, :]
        power = (
            -0.5 * (gcon[..., 0:1] * dx * dx + gcon[..., 2:3] * dy * dy)
            - gcon[..., 1:2] * dx * dy
        )
        alpha = _straight_through_min(gop[..., None] * jnp.exp(power), 0.99)
        contribute = (power <= 0.0) & (alpha >= 1.0 / 255.0) & in_seg[..., None]
        alpha = jnp.where(contribute, alpha, 0.0)

        one_m = 1.0 - alpha
        cp = jnp.cumprod(one_m, axis=1)  # inclusive, along pairs
        excl = jnp.concatenate([jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1)
        T_j = T_run[:, None, :] * excl        # transmittance before pair j
        T_test = T_j * one_m
        stop = contribute & (T_test < 1e-4)
        stopped_incl = jnp.cumsum(stop.astype(jnp.int32), axis=1) > 0
        use = contribute & (~done[:, None, :]) & (~stopped_incl)
        w = jnp.where(use, alpha * T_j, 0.0)  # [T, chunk, P]

        # HIGHEST: TPU matmuls default to one bf16 pass, which costs ~0.3%
        # relative error here (visible as up to 0.16 absolute on the z^2
        # channel vs the oracle); full-fp32 passes are exact and free at
        # this size.
        acc = acc + jnp.einsum(
            "tjp,tjc->tpc", w, gfeat, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

        any_stop = stopped_incl[:, -1, :]
        first_stop = jnp.argmax(stop, axis=1)  # [T, P]
        frozen_T = jnp.take_along_axis(T_j, first_stop[:, None, :], axis=1)[:, 0, :]
        T_cont = T_run * cp[:, -1, :]
        T_new = jnp.where(done, T_run, jnp.where(any_stop, frozen_T, T_cont))
        done_new = done | any_stop
        return (T_new, done_new, acc), None

    T0 = jnp.ones((n_tiles, TILE_PIXELS), dtype=jnp.float32)
    done0 = jnp.zeros((n_tiles, TILE_PIXELS), dtype=bool)
    acc0 = jnp.zeros((n_tiles, TILE_PIXELS, C), dtype=jnp.float32)
    (T_fin, _, acc), _ = jax.lax.scan(
        jax.checkpoint(round_body),
        (T0, done0, acc0),
        jnp.arange(n_rounds, dtype=jnp.int32),
    )

    out = acc + T_fin[..., None] * bg[None, None, :]

    # [T, P, C] -> [C, H, W]
    tiles_y = cam.tiles_y
    img = out.reshape(tiles_y, tiles_x, TILE, TILE, C)
    img = img.transpose(4, 0, 2, 1, 3).reshape(C, tiles_y * TILE, tiles_x * TILE)
    return img[:, : cam.height, : cam.width]

"""Tile binning: build depth-sorted per-tile Gaussian pair lists.

TPU-native replacement for the CUDA rasterizer's duplicated-key radix sort:

  * every Gaussian overlapping k tiles emits k (tile, depth, gaussian) pairs
    into a fixed-capacity buffer via cumsum offsets + scatter (static shapes),
  * one lexicographic `lax.sort` by (tile, depth-bits) orders pairs so each
    tile's Gaussians are contiguous and front-to-back,
  * per-tile segment bounds come from a vectorized searchsorted.

Binning is a *selection* (non-differentiable by design — the CUDA kernel's
sort isn't differentiated either); gradients flow through the subsequent
gather + composite. Because binning is pure jnp it can also be refreshed
inside a jitted optimization loop, or cached across iterations when the
geometry barely moves (pose deltas during tracking).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .camera import TILE, Camera
from .projection import ProjectedGaussians


class TileBins(NamedTuple):
    pair_gauss: jnp.ndarray   # [PAIR_CAP] int32 gaussian index, (tile, depth)-sorted
    pair_valid: jnp.ndarray   # [PAIR_CAP] bool
    tile_start: jnp.ndarray   # [n_tiles] int32 segment start into pair_gauss
    tile_count: jnp.ndarray   # [n_tiles] int32 segment length
    n_pairs: jnp.ndarray      # [] int32 total emitted pairs (pre-clamp)
    overflow: jnp.ndarray     # [] bool, True if pairs were dropped


def gaussian_tile_rect(xy, radius, tiles_x, tiles_y):
    """Tile-rect covered by each Gaussian (CUDA getRect semantics)."""
    r = radius.astype(jnp.float32)
    x0 = jnp.clip(jnp.floor((xy[:, 0] - r) / TILE), 0, tiles_x).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((xy[:, 0] + r + TILE - 1) / TILE), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((xy[:, 1] - r) / TILE), 0, tiles_y).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((xy[:, 1] + r + TILE - 1) / TILE), 0, tiles_y).astype(jnp.int32)
    return x0, x1, y0, y1


@partial(
    jax.jit,
    static_argnames=("cam", "pair_cap", "max_tiles_per_gaussian", "align"),
)
def build_bins(
    proj: ProjectedGaussians,
    cam: Camera,
    pair_cap: int,
    max_tiles_per_gaussian: int = 64,
    align: int = 0,
) -> TileBins:
    """Bin projected Gaussians into per-tile depth-sorted pair lists.

    Args:
      proj: projected Gaussians (radius == 0 rows are skipped).
      cam: static camera (defines the tile grid).
      pair_cap: static pair-buffer capacity; overflowing pairs are dropped
        (reported via `overflow`).
      max_tiles_per_gaussian: static cap on tiles one Gaussian may cover
        (row-major truncation beyond that; generous default — pruning keeps
        screen extents bounded in the SLAM setting).
      align: if > 0, re-layout segments so every tile_start is a multiple of
        `align` (the Pallas kernel's DMA alignment requirement); the buffer
        grows by n_tiles * align slots of padding.
    """
    xy = jax.lax.stop_gradient(proj.xy)
    depth = jax.lax.stop_gradient(proj.depth)
    radius = proj.radius
    tiles_x, tiles_y = cam.tiles_x, cam.tiles_y
    n_tiles = tiles_x * tiles_y
    N = xy.shape[0]

    # Depth-sort the GAUSSIANS first (N keys — 10-20x smaller than the pair
    # sort): pairs are then emitted in depth order, so one STABLE sort by
    # tile id alone yields (tile, depth)-ordered segments.
    order = jnp.argsort(jnp.where(radius > 0, depth, jnp.inf)).astype(jnp.int32)
    xy = xy[order]
    radius = radius[order]

    x0, x1, y0, y1 = gaussian_tile_rect(xy, radius, tiles_x, tiles_y)
    rect_w = jnp.maximum(x1 - x0, 0)
    rect_h = jnp.maximum(y1 - y0, 0)
    count = jnp.where(radius > 0, rect_w * rect_h, 0)
    count = jnp.minimum(count, max_tiles_per_gaussian)

    offsets = jnp.cumsum(count) - count  # exclusive prefix sum
    n_pairs = offsets[-1] + count[-1]

    pair_tile = jnp.full((pair_cap,), n_tiles, dtype=jnp.int32)
    pair_gauss = jnp.zeros((pair_cap,), dtype=jnp.int32)

    # Emit in blocks of EMIT_BLOCK rect cells per Gaussian: one big scatter
    # per block instead of max_tiles_per_gaussian tiny dependent ones.
    EMIT_BLOCK = 8
    rect_w_safe = jnp.maximum(rect_w, 1)

    def emit(b, bufs):
        pair_tile, pair_gauss = bufs
        d = b * EMIT_BLOCK + jnp.arange(EMIT_BLOCK, dtype=jnp.int32)[None, :]
        emit_ok = d < count[:, None]
        dy = d // rect_w_safe[:, None]
        dx = d - dy * rect_w_safe[:, None]
        tile = (y0[:, None] + dy) * tiles_x + (x0[:, None] + dx)
        target = jnp.where(emit_ok, offsets[:, None] + d, pair_cap)
        gid = jnp.broadcast_to(order[:, None], target.shape)
        pair_tile = pair_tile.at[target.reshape(-1)].set(
            jnp.where(emit_ok, tile, 0).reshape(-1), mode="drop"
        )
        pair_gauss = pair_gauss.at[target.reshape(-1)].set(
            gid.reshape(-1), mode="drop"
        )
        return pair_tile, pair_gauss

    pair_tile, pair_gauss = jax.lax.fori_loop(
        0, (max_tiles_per_gaussian + EMIT_BLOCK - 1) // EMIT_BLOCK,
        emit, (pair_tile, pair_gauss),
    )

    # Stable sort by tile id; buffer order is already depth order.
    pair_tile, pair_gauss = jax.lax.sort(
        (pair_tile, pair_gauss), num_keys=1, is_stable=True
    )

    pair_valid = pair_tile < n_tiles
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    tile_start = jnp.searchsorted(pair_tile, tile_ids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(pair_tile, tile_ids, side="right").astype(jnp.int32)
    tile_count = tile_end - tile_start

    if align:
        # Scatter pairs into a chunk-aligned layout: tile t's segment starts
        # at cumsum of aligned predecessor sizes; padding slots are invalid.
        aligned_sizes = ((tile_count + align - 1) // align) * align
        aligned_start = (jnp.cumsum(aligned_sizes) - aligned_sizes).astype(jnp.int32)
        buf_cap = pair_cap + n_tiles * align
        tile_of_pair = jnp.clip(pair_tile, 0, n_tiles - 1)
        rank = jnp.arange(pair_cap, dtype=jnp.int32) - tile_start[tile_of_pair]
        target = jnp.where(
            pair_valid, aligned_start[tile_of_pair] + rank, buf_cap
        )
        pg = jnp.zeros((buf_cap,), jnp.int32).at[target].set(pair_gauss, mode="drop")
        pv = jnp.zeros((buf_cap,), bool).at[target].set(pair_valid, mode="drop")
        pair_gauss, pair_valid, tile_start = pg, pv, aligned_start

    return TileBins(
        pair_gauss=pair_gauss,
        pair_valid=pair_valid,
        tile_start=tile_start,
        tile_count=tile_count,
        n_pairs=n_pairs.astype(jnp.int32),
        overflow=(n_pairs > pair_cap)
        | jnp.any((radius > 0) & (rect_w * rect_h > max_tiles_per_gaussian)),
    )

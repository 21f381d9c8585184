"""Tile-sharded compositing over the device mesh (SPMD, shard_map).

The gaussian-sharded step (parallel/sharded.py) scales projection, memory
and the optimizer across chips but runs binning + compositing REPLICATED —
every chip does the full tile walk. This module shards the composite over
TILE WINDOWS, the real multi-chip path to real-time (PROFILE.md roadmap #5):

  * the map stays row-sharded on the 1-D ``("gauss",)`` mesh: projection,
    Adam, densify/prune remain shard-local,
  * the packed projections enter the shard_map REPLICATED (in_specs P()):
    XLA's partitioner materializes the ICI all-gather at the boundary; its
    transpose automatically reduce-scatters the per-gaussian gradient
    partials each shard's slot-table reduction produces,
  * inside, each shard bins and composites only its contiguous window of
    ceil(n_tiles / n_dev) tiles (window-local build_bins + the Pallas
    kernels' `tile_lo` scalar) — pack, kernel walk, backward and slot-table
    reduce all scale ~linearly with the mesh,
  * tile slabs leave the shard_map sharded on the tile axis (out_specs
    P("gauss")); the loss-side image assembly gathers them (6 channels,
    ~7 MB at 640x480 — one cheap ICI all-gather whose transpose scatters
    the per-pixel cotangents back to the owning shard).

Binning is window-local (1/n_dev of the global tile load per chip) and can
either run inline in the loss (bins=None) or be built once per segment with
`build_window_bins` and reused across optimizer iterations — the sharded
analogue of the single-chip bins-as-loop-invariant cache (the tracker and
mapper segment drivers use this).

Reference behavior contract: identical to ops/render.py's single-device
pallas path — same compositing semantics (slam/renderer.py:196-214), same
pair selection per window (ops/binning.py docstring).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.binning import build_bins
from ..ops.camera import TILE, Camera
from ..ops.projection import ProjectedGaussians

GAUSS_AXIS = "gauss"

# TileBins leaves shipped across the shard_map boundary when window bins
# are cached across iterations (each leaf sharded on its leading axis).
# `gauss_rank` is not shipped: window builds use the default
# original-id-keyed tables (depth_tables=False), where it is None.
_BIN_FIELDS = ("pair_gauss", "pair_valid", "tile_start", "tile_count",
               "n_pairs", "overflow", "small_slots", "big_slots",
               "big_gauss", "big_valid")


def tiles_per_shard(cam: Camera, n_dev: int) -> int:
    return -(-cam.n_tiles // n_dev)


def _window_bins(packed, radius, depth, cam, rs, tpb):
    """Shard-local window binning (call inside shard_map)."""
    from ..ops.pallas_composite import CHUNK

    idx = jax.lax.axis_index(GAUSS_AXIS)
    lo = (idx * tpb).astype(jnp.int32)
    proj_l = ProjectedGaussians(
        xy=packed[:, 0:2], depth=depth, conic=packed[:, 2:5],
        radius=radius, opacity=packed[:, 5], feat=packed[:, 6:12],
        packed=packed,
    )
    bins = build_bins(
        proj_l, cam, 0, rs.max_tiles_per_gaussian, align=CHUNK,
        d1=rs.bin_d1, big_frac=rs.bin_big_frac, d2_live=rs.bin_d2_live,
        tile_lo=lo, n_local=tpb,
    )
    return lo, bins


def build_window_bins(proj: ProjectedGaussians, cam: Camera, mesh: Mesh, rs):
    """Per-shard window bins as a tuple of tile-axis-sharded arrays —
    the sharded analogue of the single-chip cached `TileBins` loop
    invariant. Feed the result back via `composite_tiles_sharded(...,
    bins=...)` for as long as the selection may be reused (same cadence
    rules as the single-chip bins cache)."""
    n_dev = mesh.devices.size
    tpb = tiles_per_shard(cam, n_dev)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=tuple(P(GAUSS_AXIS) for _ in _BIN_FIELDS),
        check_vma=False,
    )
    def fn(packed, radius, depth):
        _, bins = _window_bins(packed, radius, depth, cam, rs, tpb)
        # scalars ([] n_pairs/overflow) ride as [1] so every leaf has a
        # leading axis to shard
        return tuple(jnp.atleast_1d(getattr(bins, f)) for f in _BIN_FIELDS)

    return fn(jax.lax.stop_gradient(proj.packed), proj.radius,
              jax.lax.stop_gradient(proj.depth))


def composite_tiles_sharded(proj: ProjectedGaussians, cam: Camera,
                            bg: jnp.ndarray, mesh: Mesh, rs,
                            interpret: bool = False,
                            bins=None) -> jnp.ndarray:
    """Tile-sharded drop-in for composite_tiles_pallas.

    With `bins=None` each shard builds window-local bins inline (selection
    refreshed every call); pass `build_window_bins(...)`'s result to reuse
    the selection across optimizer iterations (the sharded equivalent of
    the single-chip bins cache).

    Returns the assembled [NC, H, W] image (sharding propagation decides
    where the tile all-gather happens — typically at the assembly reshape).
    """
    from ..ops.pallas_composite import NC, _composite_packed

    n_dev = mesh.devices.size
    tpb = tiles_per_shard(cam, n_dev)

    def composite(packed, lo, b):
        return _composite_packed(
            packed, b.pair_gauss, b.pair_valid, b.small_slots,
            b.big_slots, b.big_gauss, b.big_valid, b.gauss_rank,
            b.tile_start, b.tile_count, cam, interpret, rs.grad_bf16, lo,
            tpb,
        )

    if bins is None:
        @partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=(P(GAUSS_AXIS), P(GAUSS_AXIS)),
            check_vma=False,
        )
        def window_fn(packed, radius, depth):
            lo, b = _window_bins(packed, radius, depth, cam, rs, tpb)
            return composite(packed, lo, b)

        acc, tfin = window_fn(proj.packed, proj.radius, proj.depth)
    else:
        from ..ops.binning import TileBins

        @partial(
            shard_map, mesh=mesh,
            in_specs=(P(),) + tuple(P(GAUSS_AXIS) for _ in _BIN_FIELDS),
            out_specs=(P(GAUSS_AXIS), P(GAUSS_AXIS)),
            check_vma=False,
        )
        def window_fn_cached(packed, *leaves):
            d = dict(zip(_BIN_FIELDS, leaves))
            d["n_pairs"] = d["n_pairs"][0]
            d["overflow"] = d["overflow"][0]
            b = TileBins(**d)
            idx = jax.lax.axis_index(GAUSS_AXIS)
            lo = (idx * tpb).astype(jnp.int32)
            return composite(packed, lo, b)

        acc, tfin = window_fn_cached(proj.packed, *bins)
    # [n_dev * tpb, PIX, NC] sharded on the tile axis; drop the window pad
    acc = acc[: cam.n_tiles]
    tfin = tfin[: cam.n_tiles]
    out = acc + tfin * bg[None, None, :]
    tiles_y, tiles_x = cam.tiles_y, cam.tiles_x
    img = out.reshape(tiles_y, tiles_x, TILE, TILE, NC)
    img = img.transpose(4, 0, 2, 1, 3).reshape(NC, tiles_y * TILE,
                                               tiles_x * TILE)
    return img[:, : cam.height, : cam.width]

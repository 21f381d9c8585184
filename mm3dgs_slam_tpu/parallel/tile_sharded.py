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
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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


class PoseWindowBins(NamedTuple):
    """Window bins for the FUSED POSE tracking path: per-shard pair order +
    segment bounds only — the fused backward contracts pose Jacobians
    in-kernel and never reads the reverse slot tables, so their inverse
    sort is skipped per window (the sharded analogue of the single-chip
    `reverse_tables=False` tracker rebins). All leaves sharded on their
    leading (tile-window) axis over the "gauss" mesh axis."""

    pair_gauss: jnp.ndarray   # [n_dev * buf_local] int32
    tile_start: jnp.ndarray   # [n_dev * tpb] int32 (window-local starts)
    tile_count: jnp.ndarray   # [n_dev * tpb] int32
    n_pairs: jnp.ndarray      # [n_dev] int32
    overflow: jnp.ndarray     # [n_dev] bool


def _window_bins(packed, radius, depth, cam, rs, tpb, reverse_tables=True):
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
        tile_lo=lo, n_local=tpb, reverse_tables=reverse_tables,
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


def build_window_bins_pose(proj: ProjectedGaussians, cam: Camera,
                           mesh: Mesh, rs) -> PoseWindowBins:
    """Per-shard window bins for the fused pose tracking path — no reverse
    slot tables (the fused backward never reads them; skipping their
    inverse sort is the sharded analogue of the single-chip tracker's
    reverse_tables=False rebins, -0.85 ms/build single-chip)."""
    n_dev = mesh.devices.size
    tpb = tiles_per_shard(cam, n_dev)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=tuple(P(GAUSS_AXIS) for _ in range(5)),
        check_vma=False,
    )
    def fn(packed, radius, depth):
        _, b = _window_bins(packed, radius, depth, cam, rs, tpb,
                            reverse_tables=False)
        return (b.pair_gauss, b.tile_start, b.tile_count,
                jnp.atleast_1d(b.n_pairs), jnp.atleast_1d(b.overflow))

    return PoseWindowBins(*fn(jax.lax.stop_gradient(proj.packed),
                              proj.radius,
                              jax.lax.stop_gradient(proj.depth)))


def _pose_fwd_sharded(q, T, xyz, scales, rotations, opacity, shs, alive,
                      pair_gauss, tile_start, tile_count, rs, mesh,
                      nc, interpret):
    """Replicated projection + Jacobian rows, then per-window fused-pose
    forward walks under shard_map. Mirrors ops/render._pose_fwd_impl with
    the one ICI all-gather at the packed32 boundary (its transpose is a
    psum of the per-gaussian gradient partials — which the fused pose
    backward never materializes, so the bwd pays only a [16] psum)."""
    from ..ops.pallas_composite import _composite_pallas_fwd, pack_pairs
    from ..ops.projection import conic_pose_jacobian_rows, project_gaussians
    from ..ops.render import background, effective_scales, means_cam_soa

    cam = rs.cam
    scales_eff = effective_scales(scales, rs)
    means_cam = means_cam_soa(xyz, jnp.concatenate([q, T]))
    proj = project_gaussians(
        means3d=means_cam, scales=scales_eff, rotations=rotations,
        opacities=opacity, shs=shs, alive=alive,
        w2c=jnp.eye(4, dtype=xyz.dtype), cam=cam,
        sh_degree=rs.sh_degree, campos=jnp.zeros(3, dtype=xyz.dtype))
    ext = conic_pose_jacobian_rows(means_cam, scales_eff, rotations, xyz, cam)
    packed32 = jnp.concatenate([proj.packed, ext], axis=-1)
    packed32 = jax.lax.with_sharding_constraint(
        packed32, NamedSharding(mesh, P()))
    n_dev = mesh.devices.size
    tpb = tiles_per_shard(cam, n_dev)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(GAUSS_AXIS), P(GAUSS_AXIS), P(GAUSS_AXIS)),
        out_specs=(P(GAUSS_AXIS), P(GAUSS_AXIS)),
        check_vma=False,
    )
    def fwd(packed, pg, ts_, tc_):
        idx = jax.lax.axis_index(GAUSS_AXIS)
        lo = (idx * tpb).astype(jnp.int32)
        pair_rows = pack_pairs(packed, pg)
        return _composite_pallas_fwd(pair_rows, ts_, tc_, cam, interpret,
                                     lo, tpb, True, nc)

    acc, tfin = fwd(packed32, pair_gauss, tile_start, tile_count)
    bg = background(rs)[:nc]
    out = (acc + tfin * bg[None, :, None])[: cam.n_tiles]
    return out, (packed32, acc, tfin, q)


@partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13, 14))
def _tiles_pose_sharded(q, T, xyz, scales, rotations, opacity, shs, alive,
                        pair_gauss, tile_start, tile_count, rs, mesh,
                        nc, interpret):
    out, _ = _pose_fwd_sharded(q, T, xyz, scales, rotations, opacity, shs,
                               alive, pair_gauss, tile_start, tile_count,
                               rs, mesh, nc, interpret)
    return out


def _tps_fwd(q, T, xyz, scales, rotations, opacity, shs, alive, pair_gauss,
             tile_start, tile_count, rs, mesh, nc, interpret):
    out, res = _pose_fwd_sharded(q, T, xyz, scales, rotations, opacity, shs,
                                 alive, pair_gauss, tile_start, tile_count,
                                 rs, mesh, nc, interpret)
    zshapes = tuple(jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
        (xyz, scales, rotations, opacity, shs)))
    return out, res + (pair_gauss, tile_start, tile_count, zshapes)


def _tps_bwd(rs, mesh, nc, interpret, res, d_out):
    """dq/dT from per-window fused-kernel partials: each shard contracts
    its window's per-pair gradients against the packed pose Jacobians
    in-register, sums to [16], and the 12 live numbers cross the ICI as
    ONE psum — the cheapest possible collective for this gradient."""
    from ..ops.pallas_composite import _composite_pose_bwd, pack_pairs
    from ..ops.render import background
    from ..ops.pose import quat_to_rotmat

    packed32, acc, tfin, q, pair_gauss, tile_start, tile_count, zshapes = res
    cam = rs.cam
    n_dev = mesh.devices.size
    tpb = tiles_per_shard(cam, n_dev)
    bg = background(rs)[:nc]
    pad = n_dev * tpb - cam.n_tiles
    d_out_p = jnp.pad(d_out, ((0, pad), (0, 0), (0, 0)))
    dacc = d_out_p
    dtfin = jnp.sum(d_out_p * bg[None, :, None], axis=1, keepdims=True)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(),) + (P(GAUSS_AXIS),) * 7,
        out_specs=P(),
        check_vma=False,
    )
    def bwd(packed, pg, ts_, tc_, acc_l, tfin_l, dacc_l, dtfin_l):
        idx = jax.lax.axis_index(GAUSS_AXIS)
        lo = (idx * tpb).astype(jnp.int32)
        pair_rows = pack_pairs(packed, pg)
        psums = _composite_pose_bwd(pair_rows, ts_, tc_, acc_l, tfin_l,
                                    dacc_l, dtfin_l, cam, interpret, True,
                                    nc, lo, tpb)
        return jax.lax.psum(psums.sum(axis=(0, 2)), GAUSS_AXIS)

    s = bwd(packed32, pair_gauss, tile_start, tile_count, acc, tfin,
            dacc, dtfin)
    dT = s[0:3]
    M = s[3:12]
    _, rvjp = jax.vjp(lambda qq: quat_to_rotmat(qq).reshape(9), q)
    (dq,) = rvjp(M)
    zeros = tuple(jnp.zeros(zs.shape, zs.dtype) for zs in zshapes)
    return (dq, dT) + zeros + (None, None, None, None)


_tiles_pose_sharded.defvjp(_tps_fwd, _tps_bwd)


def render_tiles_pose_sharded(g, q, T, rs, bins: PoseWindowBins, mesh: Mesh,
                              nc: int = 6, interpret: bool = False):
    """Tile-sharded render_tiles_pose: same channel-major [n_tiles, nc, PIX]
    forward, fused in-kernel pose gradients per tile window, ONE [16] psum
    across shards. Same validity domain as the single-chip path
    (transform_means_python + sh_degree 0)."""
    assert rs.transform_means_python and rs.sh_degree == 0, (
        "fused pose gradients require transform_means_python + sh_degree 0")
    return _tiles_pose_sharded(q, T, g.xyz, g.scales, g.rotations, g.opacity,
                               g.shs, g.alive, bins.pair_gauss,
                               bins.tile_start, bins.tile_count, rs, mesh,
                               nc, interpret)


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

"""Jitted map optimization: the mapper's inner loop as segmented dispatches.

TPU rebuild of optimize_map (slam/mapper.py:718-950). Per iteration:
render the scheduled keyframe -> (1-lambda)*L1 + lambda*(1-SSIM)
[+ Pearson depth] -> grads -> functional Adam over the Gaussian-map pytree
(+ keyframe poses when BA is on).

Loop structure (v5e-measured): the round-1 single-dispatch flat
`lax.fori_loop` carried the bins pytree through a rebin `lax.cond`, which
cost ~36 ms/iter of pure structure overhead (scripts/profile_loop.py).
Here the host splits the schedule into SEGMENTS — contiguous runs on one
keyframe, cut at rebin cadence and at prune iterations — and dispatches one
jitted segment per run with the bins built once as a loop invariant.
Segments run as a binary decomposition over power-of-two lengths so the
whole mapper needs at most ~7 distinct jit shapes. Dispatches enqueue
back-to-back with no host syncs.

Reproduced reference semantics, including the quirks:
  * the keyframe "stack" sampling is precomputed on the host into a static
    [iters] schedule (mapper.py:801-807 picks with replacement-stack),
  * max_radii2D / densification stats update every iter while
    iteration <= densify_until_iter (mapper.py:887-898); stats feed
    densify() which the reference never calls (mapper.py:914-928) but we
    keep them for the complete API + pruning's screen-size test,
  * pruning runs at iterations where i >= densify_from_iter and
    i % pruning_interval == 0 (mapper.py:900-909); because the reference
    swaps torch parameter objects during prune, the grads computed that
    iteration are orphaned and the map Adam step is a NO-OP on prune
    iterations (torch skips params with grad=None) — we skip it likewise
    (the prune step is its own jitted dispatch, not an in-loop cond),
  * on BA iterations gradients of non-covisible Gaussians are zeroed
    (mapper.py:931-936) and the per-keyframe pose Adam steps afterwards;
    BA moves poses every iteration, so BA segments have length 1 (bins
    refresh per iteration, as the reference implicitly re-sorts per call).
"""
from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussians import (
    AdamState,
    GaussianMap,
    MapOptHyper,
    adam_update,
    prune_compact,
    prune_mask_reference,
)
from ..ops.binning import build_bins
from ..ops.composite import composite_tiles
from ..ops.losses import l1_loss, masked_mean, pearson_loss, ssim
from ..ops.render import RenderSettings, background, project_for_pose

_SEG_SIZES = (32, 16, 8, 4, 2, 1)  # binary decomposition of segment lengths

# Import-time env default for the tile-layout mapping loss (the mapping
# analogue of the tracker's MM3DGS_TRACK_TILES; production runs set the
# MapOptSettings field from cfg.tpu.map_tiles in slam/mapper.py).
_MAP_TILES_DEFAULT = os.environ.get("MM3DGS_MAP_TILES", "1") == "1"


class MapOptSettings(NamedTuple):
    rs: RenderSettings
    iters: int
    method: str = "vigs"
    use_gt_depth: bool = True
    use_depth_estimate_loss: bool = False
    pearson_weight: float = 0.0
    lambda_dssim: float = 0.2
    min_opacity: float = 0.005
    size_threshold: float | None = 100.0
    pruning_interval: int = 50
    densify_from_iter: int = 0
    densify_until_iter: int = 50
    do_BA: bool = False
    cam_t_lr: float = 0.001
    cam_q_lr: float = 0.003
    hyper: MapOptHyper = None  # per-group map LRs
    rebin_every: int = 1       # binning refresh cadence within a keyframe
                               # run (1 = every iteration, exact parity;
                               # >1 pays off with a grouped schedule where
                               # consecutive iterations render the same
                               # keyframe)
    mesh: object = None        # jax.sharding.Mesh: map rows sharded over
                               # "gauss"; projection output replicated (the
                               # ICI boundary); compositing replicated
    map_tiles: bool = _MAP_TILES_DEFAULT
                               # tile-layout mapping loss (single-chip
                               # pallas only): walk only the channels the
                               # loss reads (vigs rgb[,z] — sil/E[z^2] feed
                               # nothing outside splatam, ref
                               # mapper.py:856-874) channel-major, assemble
                               # ONLY rgb for SSIM, evaluate L1 on the
                               # 3-channel image and the Pearson depth term
                               # in tile layout. The mapping analogue of
                               # the tracker's measured track_tiles win.
    interpret: bool = False    # pallas interpret mode (CPU parity tests of
                               # the tiled path; compiled runs use False)


class MapCarry(NamedTuple):
    m: GaussianMap
    adam: AdamState
    max_radii: jnp.ndarray       # [CAP] f32
    grad_accum: jnp.ndarray      # [CAP] f32  (xyz_gradient_accum)
    denom: jnp.ndarray           # [CAP] f32
    ba_mask: jnp.ndarray         # [CAP] bool (covisible-or-new mask for BA)
    kf_poses: jnp.ndarray        # [K, 7] (optimized when BA)
    pose_m: jnp.ndarray          # [K, 7] pose Adam moments
    pose_v: jnp.ndarray          # [K, 7]
    pose_step: jnp.ndarray       # [] int32
    last_loss: jnp.ndarray       # [] f32


def _map_loss(
    params: dict,
    screen_offset: jnp.ndarray,
    pose: jnp.ndarray,
    n_alive: jnp.ndarray,
    gt_color: jnp.ndarray,
    gt_depth: jnp.ndarray,
    est_depth: jnp.ndarray,
    bins,
    ms: MapOptSettings,
):
    """Loss + aux (radii, visibility). Differentiable in (params,
    screen_offset, pose); n_alive rides separately (int leaves can't be
    grad arguments); bins are precomputed selection (cacheable)."""
    from ..parallel.sharded import replicate_proj

    rs = ms.rs
    m = GaussianMap(**params, n_alive=n_alive)
    g = m.activated()
    proj = project_for_pose(g, pose, rs)
    # keep the packed rows and the xy view consistent (pallas consumes packed);
    # the offset add runs shard-local BEFORE the replication boundary
    new_packed = jnp.concatenate(
        [proj.xy + screen_offset, proj.packed[:, 2:]], axis=1
    )
    proj = proj._replace(xy=new_packed[:, 0:2], packed=new_packed)
    proj = replicate_proj(proj, ms.mesh)

    from ..ops.binning import TileBins

    if (rs.use_pallas and ms.mesh is None and ms.map_tiles
            and isinstance(bins, TileBins) and bins.small_slots is not None):
        # Tile-layout mapping loss (the mapping analogue of the tracker's
        # measured tile-loss + channel-slim wins): the vigs mapping loss
        # reads ONLY rgb (+ depth when the Pearson term is on) — silhouette
        # and E[z^2] feed nothing outside splatam's tracker uncertainty
        # (ref mapper.py:856-874) — so the kernel walks nc=3/4 channels
        # channel-major, ONLY the 3 rgb channels are assembled to [3, H, W]
        # (SSIM's windowed stats need the image; its backward shares the
        # assembly transpose with L1's), and the Pearson depth term stays
        # in tile layout (global masked reduction — same pixel set via
        # tile_pixel_valid). Values match the image path up to fp
        # summation order; dpacked keeps [N, 16] with exact-zero grads on
        # the unwalked feature columns.
        from ..ops.pallas_composite import _composite_packed
        from ..ops.render import from_tiles, tile_pixel_valid, to_tiles

        nc = 4 if (ms.method == "splatam" or ms.use_depth_estimate_loss) else 3
        acc, tfin = _composite_packed(
            proj.packed, bins.pair_gauss, bins.pair_valid, bins.small_slots,
            bins.big_slots, bins.big_gauss, bins.big_valid, bins.gauss_rank,
            bins.tile_start, bins.tile_count, rs.cam, ms.interpret,
            rs.grad_bf16, None, None, True, nc,
        )
        bg = background(rs)[:nc]
        out_t = acc + tfin * bg[None, :, None]   # [T, nc, PIX] chan-major
        image = from_tiles(out_t[:, :3], rs.cam)

        lam = ms.lambda_dssim
        if ms.method == "splatam":
            depth_t = out_t[:, 3]
            valid = tile_pixel_valid(rs.cam)
            gt_depth_t = to_tiles(gt_depth, rs.cam)
            nan_mask = ~jnp.isnan(depth_t)
            mask = (gt_depth_t > 0) & nan_mask & valid
            loss_depth = masked_mean(jnp.abs(gt_depth_t - depth_t), mask)
            loss_im = (1 - lam) * l1_loss(image, gt_color) + lam * (
                1.0 - ssim(image, gt_color))
            loss = loss_depth + 0.5 * loss_im
        else:
            loss = (1 - lam) * l1_loss(image, gt_color) + lam * (
                1.0 - ssim(image, gt_color))
            if ms.use_depth_estimate_loss:
                depth_t = out_t[:, 3]
                valid = tile_pixel_valid(rs.cam)
                if ms.use_gt_depth:
                    gt_depth_t = to_tiles(gt_depth, rs.cam)
                    loss = loss + ms.pearson_weight * pearson_loss(
                        depth_t, gt_depth_t,
                        mask=(gt_depth_t > 0) & valid, invert_estimate=False
                    )
                else:
                    est_depth_t = to_tiles(est_depth, rs.cam)
                    loss = loss + ms.pearson_weight * pearson_loss(
                        depth_t, est_depth_t, mask=valid,
                        invert_estimate=False
                    )
        return loss, (proj.radius, proj.radius > 0)

    if rs.use_pallas and ms.mesh is not None:
        # tile-sharded composite over the mesh; `bins` is the window-bins
        # tuple (build_window_bins) cached across the segment, or None to
        # rebin inline
        from ..parallel.tile_sharded import composite_tiles_sharded

        img6 = composite_tiles_sharded(proj, rs.cam, background(rs),
                                       ms.mesh, rs, bins=bins)
    elif rs.use_pallas:
        from ..ops.pallas_composite import composite_tiles_pallas

        img6 = composite_tiles_pallas(proj, bins, rs.cam, background(rs),
                                      grad_bf16=rs.grad_bf16)
    else:
        img6 = composite_tiles(proj, bins, rs.cam, background(rs),
                               rs.max_per_tile, rs.chunk)
    image = img6[:3]
    depth = img6[3]

    lam = ms.lambda_dssim
    if ms.method == "splatam":
        nan_mask = ~jnp.isnan(depth)
        mask = (gt_depth > 0) & nan_mask
        loss_depth = masked_mean(jnp.abs(gt_depth - depth), mask)
        loss_im = (1 - lam) * l1_loss(image, gt_color) + lam * (1.0 - ssim(image, gt_color))
        loss = loss_depth + 0.5 * loss_im
    else:
        loss = (1 - lam) * l1_loss(image, gt_color) + lam * (1.0 - ssim(image, gt_color))
        if ms.use_depth_estimate_loss:
            if ms.use_gt_depth:
                loss = loss + ms.pearson_weight * pearson_loss(
                    depth, gt_depth, mask=gt_depth > 0, invert_estimate=False
                )
            else:
                loss = loss + ms.pearson_weight * pearson_loss(
                    depth, est_depth, invert_estimate=False
                )
    return loss, (proj.radius, proj.radius > 0)


@partial(jax.jit, static_argnames=("ms",))
def _map_bins(carry: MapCarry, k: jnp.ndarray, ms: MapOptSettings):
    """Binning for the current map snapshot + keyframe pose (selection)."""
    from ..models.gaussians import _PARAM_FIELDS
    from ..parallel.sharded import replicate_proj

    rs = ms.rs
    params = {f: jax.lax.stop_gradient(getattr(carry.m, f))
              for f in _PARAM_FIELDS}
    m = GaussianMap(**params, n_alive=carry.m.n_alive)
    pose = jax.lax.stop_gradient(carry.kf_poses[k])
    proj = project_for_pose(m.activated(), pose, rs)
    proj = replicate_proj(proj, ms.mesh)
    if rs.use_pallas and ms.mesh is not None:
        # tile-sharded: per-shard window bins (the sharded bins cache)
        from ..parallel.tile_sharded import build_window_bins

        return build_window_bins(proj, rs.cam, ms.mesh, rs)
    align = 0
    if rs.use_pallas:
        from ..ops.pallas_composite import CHUNK as _PL_CHUNK

        align = _PL_CHUNK
    return build_bins(proj, rs.cam, rs.pair_cap, rs.max_tiles_per_gaussian,
                      align=align, d1=rs.bin_d1, big_frac=rs.bin_big_frac,
                      d2_live=rs.bin_d2_live)


def _grad_and_stats(c: MapCarry, bins, k, i, kf_colors, kf_depths, kf_ests,
                    ms: MapOptSettings):
    """Shared loss/grad + densification-stats update for one iteration."""
    from ..models.gaussians import _PARAM_FIELDS

    argnums = (0, 1, 2) if ms.do_BA else (0, 1)
    grad_fn = jax.value_and_grad(_map_loss, argnums=argnums, has_aux=True)
    pose = c.kf_poses[k]
    params = {f: getattr(c.m, f) for f in _PARAM_FIELDS}
    screen0 = jnp.zeros_like(c.m.xyz[:, :2])
    (loss, (radii, visible)), grads = grad_fn(
        params, screen0, pose, c.m.n_alive, kf_colors[k], kf_depths[k],
        kf_ests[k], bins, ms
    )
    if ms.do_BA:
        gp_dict, g_screen, g_pose = grads
    else:
        gp_dict, g_screen = grads
        g_pose = None
    gm = GaussianMap(**gp_dict, n_alive=c.m.n_alive)

    in_densify_phase = i <= ms.densify_until_iter
    # max radii + densification stats (mapper.py:887-898)
    max_radii = jnp.where(
        visible & in_densify_phase,
        jnp.maximum(c.max_radii, radii.astype(jnp.float32)),
        c.max_radii,
    )
    gnorm = jnp.linalg.norm(g_screen, axis=-1)
    upd = visible & in_densify_phase
    grad_accum = c.grad_accum + jnp.where(upd, gnorm, 0.0)
    denom = c.denom + upd.astype(jnp.float32)
    return loss, gm, g_pose, max_radii, grad_accum, denom


def _pose_adam(c: MapCarry, k, g_pose, ms: MapOptSettings):
    """Adam on the sampled keyframe's pose (per-group LRs for q/T,
    torch default eps; mapper.py:768-780,940-942)."""
    pose_step = c.pose_step + 1
    sf = pose_step.astype(jnp.float32)
    bc1 = 1.0 - 0.9**sf
    bc2 = 1.0 - 0.999**sf
    gp = jnp.zeros_like(c.kf_poses).at[k].set(g_pose)
    pose_m = 0.9 * c.pose_m + 0.1 * gp
    pose_v = 0.999 * c.pose_v + 0.001 * gp * gp
    lr_vec = jnp.concatenate(
        [jnp.full((4,), ms.cam_q_lr), jnp.full((3,), ms.cam_t_lr)]
    )
    upd = lr_vec * (pose_m / bc1) / (jnp.sqrt(pose_v) / jnp.sqrt(bc2) + 1e-15)
    return c.kf_poses - upd, pose_m, pose_v, pose_step


@partial(jax.jit, static_argnames=("ms", "n_iters"))
def _map_segment(
    carry: MapCarry,
    bins,
    k: jnp.ndarray,
    base_i: jnp.ndarray,
    kf_colors: jnp.ndarray,
    kf_depths: jnp.ndarray,
    kf_ests: jnp.ndarray,
    ms: MapOptSettings,
    n_iters: int,
) -> MapCarry:
    """`n_iters` map-Adam iterations on keyframe slot `k` with FIXED bins.
    No prune, no rebin — both are host-level segment boundaries."""

    def body(j, c):
        i = base_i + j
        loss, gm, g_pose, max_radii, grad_accum, denom = _grad_and_stats(
            c, bins, k, i, kf_colors, kf_depths, kf_ests, ms
        )
        row_mask = c.ba_mask if ms.do_BA else None
        m2, adam2 = adam_update(c.m, gm, c.adam, ms.hyper, row_mask=row_mask)

        kf_poses, pose_m, pose_v, pose_step = (
            c.kf_poses, c.pose_m, c.pose_v, c.pose_step
        )
        if ms.do_BA:
            kf_poses, pose_m, pose_v, pose_step = _pose_adam(c, k, g_pose, ms)

        return MapCarry(
            m=m2, adam=adam2, max_radii=max_radii, grad_accum=grad_accum,
            denom=denom, ba_mask=c.ba_mask, kf_poses=kf_poses, pose_m=pose_m,
            pose_v=pose_v, pose_step=pose_step, last_loss=loss,
        )

    return jax.lax.fori_loop(0, n_iters, body, carry)


@partial(jax.jit, static_argnames=("ms",))
def _map_prune_step(
    carry: MapCarry,
    bins,
    k: jnp.ndarray,
    base_i: jnp.ndarray,
    kf_colors: jnp.ndarray,
    kf_depths: jnp.ndarray,
    kf_ests: jnp.ndarray,
    camera_extent: jnp.ndarray,
    ms: MapOptSettings,
) -> MapCarry:
    """One prune iteration: loss/grads still run (stats update, reference
    mapper.py:887-898) but the map Adam step is skipped (grads orphaned by
    the torch param swap) and the map is compacted."""
    c = carry
    loss, gm, g_pose, max_radii, grad_accum, denom = _grad_and_stats(
        c, bins, k, base_i, kf_colors, kf_depths, kf_ests, ms
    )
    if ms.method == "splatam":
        pmask = prune_mask_reference(c.m, camera_extent, ms.min_opacity)
    else:
        pmask = prune_mask_reference(
            c.m, camera_extent, ms.min_opacity, max_radii, ms.size_threshold
        )
    if ms.mesh is not None:
        # shard-local compaction: each shard argsorts + gathers only its
        # own block (parallel/shard_local.py) — the global stable argsort
        # gathers every leaf across shards (measured 12.2x SPMD overhead,
        # scripts/bench_sharded.py append_prune phase)
        from ..parallel.shard_local import prune_compact_sharded

        m2, adam2, (mr2, ga2, dn2, bam2) = prune_compact_sharded(
            c.m, c.adam, ~pmask, ms.mesh,
            extras=(max_radii, grad_accum, denom, c.ba_mask),
        )
    else:
        m2, adam2, order = prune_compact(c.m, c.adam, ~pmask)
        mr2, ga2, dn2, bam2 = (max_radii[order], grad_accum[order],
                               denom[order], c.ba_mask[order])

    kf_poses, pose_m, pose_v, pose_step = (
        c.kf_poses, c.pose_m, c.pose_v, c.pose_step
    )
    if ms.do_BA:
        kf_poses, pose_m, pose_v, pose_step = _pose_adam(c, k, g_pose, ms)

    return MapCarry(
        m=m2, adam=adam2, max_radii=mr2,
        grad_accum=ga2, denom=dn2,
        ba_mask=bam2, kf_poses=kf_poses, pose_m=pose_m,
        pose_v=pose_v, pose_step=pose_step, last_loss=loss,
    )


def _is_prune_iter(i: int, ms: MapOptSettings) -> bool:
    if ms.method == "splatam":
        # splatam prunes (opacity-only) at i in {0, 20} (mapper.py:879-884)
        return i <= 20 and i % 20 == 0
    return (
        i >= ms.densify_from_iter
        and i % ms.pruning_interval == 0
        and i <= ms.densify_until_iter
    )


def plan_segments(schedule: np.ndarray, ms: MapOptSettings):
    """Host-side segment plan: ("prune"|"opt", kf_slot, base_i, n).

    Cuts at prune iterations, keyframe switches, and every `rebin_every`
    iterations within a keyframe run (BA: every iteration — poses move)."""
    sched = np.asarray(schedule)
    iters = len(sched)
    rebin = 1 if ms.do_BA else max(int(ms.rebin_every), 1)
    segs = []
    i = 0
    while i < iters:
        if _is_prune_iter(i, ms):
            segs.append(("prune", int(sched[i]), i, 1))
            i += 1
            continue
        j = i + 1
        while (j < iters and j - i < rebin and sched[j] == sched[i]
               and not _is_prune_iter(j, ms)):
            j += 1
        segs.append(("opt", int(sched[i]), i, j - i))
        i = j
    return segs


def optimize_map(
    carry: MapCarry,
    kf_colors: jnp.ndarray,   # [K, 3, H, W]
    kf_depths: jnp.ndarray,   # [K, H, W]
    kf_ests: jnp.ndarray,     # [K, H, W]
    schedule,                 # [iters] int indices into the K axis (host)
    camera_extent: jnp.ndarray,
    ms: MapOptSettings,
):
    """Host-level driver over jitted segments. The schedule must be host
    material (numpy or concrete jnp) — segment boundaries are compile-time.
    Opt segments run as a binary decomposition over power-of-two lengths so
    the number of distinct jit shapes is bounded by len(_SEG_SIZES).

    Returns (carry, overflow): `overflow` ORs the real `bins.overflow` flag
    over every rebin (device scalar, no host sync — the SLAM loop fetches it
    once per frame; ops/binning.py documents what the flag covers)."""
    from .tracker import bins_overflow

    # Host glue is DISPATCH-COUNT-optimized (round-5): segment indices ride
    # the jitted calls as numpy scalars (no eager `jnp.asarray` round trips)
    # and the per-rebin overflow flags are OR-reduced in ONE fused dispatch
    # at the end instead of an eager `|` per rebin.
    sched = np.asarray(schedule)
    flags = []
    for kind, k, base_i, n in plan_segments(sched, ms):
        kj = np.int32(k)
        if kind == "prune":
            bins = _map_bins(carry, kj, ms)
            flags.append(bins_overflow(bins))
            carry = _map_prune_step(
                carry, bins, kj, np.int32(base_i), kf_colors,
                kf_depths, kf_ests, camera_extent, ms,
            )
            continue
        bins = _map_bins(carry, kj, ms)
        flags.append(bins_overflow(bins))
        off = 0
        for size in _SEG_SIZES:
            while n - off >= size:
                carry = _map_segment(
                    carry, bins, kj, np.int32(base_i + off),
                    kf_colors, kf_depths, kf_ests, ms, size,
                )
                off += size
    return carry, _or_flags(tuple(flags))


@jax.jit
def _or_flags(flags):
    """OR-reduce the per-rebin overflow flags in one dispatch."""
    out = flags[0]
    for f in flags[1:]:
        out = out | f
    return out

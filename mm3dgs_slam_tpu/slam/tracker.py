"""Camera tracking: gradient descent on the 7-DoF pose against the map.

TPU-native version of slam/tracker.py:45-266 — the per-frame optimization
(render -> loss -> grad -> Adam on (q, T)) runs as a short sequence of
jitted SEGMENT dispatches: `rebin_every` Adam iterations per dispatch with
the tile binning rebuilt between segments.

Binning is rebuilt at exactly the same global iterations as the round-1
single-dispatch flat loop (i % rebin_every == 0), but as a host-level
segment boundary instead of an in-loop `lax.cond` with the bins pytree in
the carry — measured on v5e the cond+carry structure cost ~36 ms/iter of
pure overhead (scripts/profile_loop.py: flat+cond 114 ms/iter vs fixed-bins
78 ms/iter; a nested scan-of-fori only recovered 9). Segment dispatches
enqueue back-to-back without host syncs, so the extra dispatch overhead is
amortized to ~nothing.

Faithful semantics:
  * separate Adam groups for translation/rotation with their own LRs and
    torch-default betas/eps (tracker.py:233-246),
  * vigs/mm3dgs loss: photometric L1 over the silhouette>0.99 mask
    (tracker.py:107,129), optional Pearson depth loss against the monocular
    estimate or GT depth (tracker.py:130-144), optional IMU relative-pose
    prior against the motion-model seed (tracker.py:146-155),
  * splatam loss: uncertainty/nan/validity-masked depth+RGB *sums*
    (tracker.py:110-126),
  * the returned pose is the LAST-iteration pose, reproducing the
    reference's ineffective best-candidate rebinding (tracker.py:167-181 only
    rebinds locals).
"""
from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.binning import TileBins

# Import-time env defaults for the two path-selection knobs (the
# A/B-measurement escape hatch). Resolved ONCE so two independently-jitted
# functions (_track_bins / _track_segment) can never trace inconsistent
# decisions from a mid-process env flip; production runs override them per
# TrackSettings from cfg.tpu (slam/slam.py), probes pass the fields
# explicitly.
_POSE_KERNEL_DEFAULT = os.environ.get("MM3DGS_POSE_KERNEL", "1") == "1"
_TRACK_TILES_DEFAULT = os.environ.get("MM3DGS_TRACK_TILES", "1") == "1"
from ..ops.losses import masked_mean, masked_sum, pearson_loss, rel_pose_loss
from ..ops.render import (ActivatedGaussians, RenderSettings, render,
                          render_tiles, tile_pixel_valid, to_tiles)
from ..parallel.sharded import replicate_proj


class TrackSettings(NamedTuple):
    """Static tracking configuration (from cfg['tracking'] + method flags)."""

    rs: RenderSettings
    iters: int
    method: str = "vigs"            # 'vigs' | 'mm3dgs' | 'splatam'
    use_gt_depth: bool = True
    use_depth_estimate_loss: bool = False
    pearson_weight: float = 0.0
    use_imu_loss: bool = False
    imu_T_weight: float = 0.0
    imu_q_weight: float = 0.0
    position_lr: float = 0.001
    rotation_lr: float = 0.003
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8               # torch.optim.Adam default
    rebin_every: int = 1            # tile-binning refresh cadence; the pose
                                    # moves sub-pixel per Adam step so stale
                                    # bins only affect the (non-diff) pair
                                    # selection, not gradients
    mesh: object = None             # jax.sharding.Mesh when the map is
                                    # row-sharded (see parallel/sharded.py);
                                    # projection output is constrained
                                    # replicated (the ICI all-gather
                                    # boundary), compositing runs replicated
    track_tiles: bool = _TRACK_TILES_DEFAULT
                                    # tile-layout tracking loss (skips the
                                    # [NC,H,W] assembly; −1.1 ms/iter on v5e)
    pose_kernel: bool = _POSE_KERNEL_DEFAULT
                                    # fused in-kernel pose gradients (no
                                    # per-pair emission / slot-table reduce;
                                    # −4.9 ms/iter); auto-gated on
                                    # transform_means_python + sh_degree 0 +
                                    # single-device pallas (see
                                    # _pose_fused_static)


def tracking_loss(
    g: ActivatedGaussians,
    pose: jnp.ndarray,
    gt_color: jnp.ndarray,
    gt_depth: jnp.ndarray,
    est_depth: jnp.ndarray,
    initial_pose: jnp.ndarray,
    ts: TrackSettings,
    bins=None,
) -> jnp.ndarray:
    out = render(g, pose, ts.rs, bins=bins, mesh=ts.mesh)
    image = out["render"]
    depth = out["depth"][0]
    silhouette = out["depth"][1]
    presence = silhouette > 0.99

    if ts.method == "splatam":
        depth_sq = out["depth"][2]
        uncertainty = jax.lax.stop_gradient(depth_sq - depth * depth)
        nan_mask = (~jnp.isnan(depth)) & (~jnp.isnan(uncertainty))
        mask = (gt_depth > 0) & nan_mask & presence
        loss_depth = masked_sum(jnp.abs(gt_depth - depth), mask)
        loss_im = masked_sum(jnp.abs(gt_color - image), mask[None])
        return loss_depth + 0.5 * loss_im

    loss = masked_mean(jnp.abs(image - gt_color), presence[None])
    if ts.use_depth_estimate_loss:
        if ts.use_gt_depth:
            dmask = presence & (gt_depth > 0)
            loss = loss + ts.pearson_weight * pearson_loss(
                depth, gt_depth, mask=dmask, invert_estimate=True
            )
        else:
            loss = loss + ts.pearson_weight * pearson_loss(
                depth, est_depth, mask=presence, invert_estimate=True
            )
    if ts.use_imu_loss:
        t_err, q_err = rel_pose_loss(pose, initial_pose)
        loss = loss + ts.imu_T_weight * t_err + ts.imu_q_weight * q_err
    return loss


def tracking_loss_tiles(
    g: ActivatedGaussians,
    pose: jnp.ndarray,
    gt_color_t: jnp.ndarray,   # [n_tiles, 3, PIX] (channel-major)
    gt_depth_t: jnp.ndarray,   # [n_tiles, PIX]
    est_depth_t: jnp.ndarray,  # [n_tiles, PIX]
    valid: jnp.ndarray,        # [n_tiles, PIX] in-image mask
    initial_pose: jnp.ndarray,
    ts: TrackSettings,
    bins: TileBins,
    pose_fused: bool = False,
) -> jnp.ndarray:
    """tracking_loss evaluated in the compositor's channel-major tile
    layout [n_tiles, C, PIX].

    Every tracking loss term is elementwise or a global masked reduction
    (L1, Pearson over masked pixels, pose prior), so it needs no [NC, H, W]
    image — skipping the assembly transpose and its backward saves
    ~1.4 ms/iter at 640x480. Same pixel set as the cropped image via
    `valid`; values match tracking_loss up to fp summation order.

    vigs/mm3dgs walks FIVE channels (rgb, z, sil): E[z^2] feeds only
    splatam's uncertainty mask (reference tracker.py:110-126), so the
    kernel skips its accumulate + gradient work entirely (the dropped
    channel's gradient is exactly zero — the loss never reads it).
    Measured a WASH on v5e (16.02 vs 16.01 ms/iter same-process A/B,
    scripts/probe_r3b.py 2026-08-19): the accumulate dots pay per MXU
    pass, not per output column, and NC never appears in a [PIX, CHUNK]
    VPU op — kept because it is exact and free, not because it wins."""
    nc = 6 if ts.method == "splatam" else 5
    if pose_fused:
        # fused in-kernel pose gradients (ops/render.render_tiles_pose):
        # tracking only differentiates w.r.t. (q, T), so the backward
        # contracts per-pair field grads against packed pose Jacobians
        # in-register instead of emitting dpair + slot-table reducing
        # (measured -4.9 ms/iter, 16.0 -> 11.1, probe_pose_kernel.py;
        # the CUDA w-pose rasterizer's in-kernel viewmatrix grads are
        # the same structural move). Under a mesh the same kernel runs per
        # tile window and the 12 live pose numbers cross the ICI as ONE
        # [16] psum (parallel/tile_sharded.render_tiles_pose_sharded).
        if ts.mesh is not None:
            from ..parallel.tile_sharded import render_tiles_pose_sharded

            out6 = render_tiles_pose_sharded(g, pose[:4], pose[4:], ts.rs,
                                             bins, ts.mesh, nc=nc)
        else:
            from ..ops.render import render_tiles_pose

            out6 = render_tiles_pose(g, pose[:4], pose[4:], ts.rs, bins,
                                     nc=nc)
    else:
        out6 = render_tiles(g, pose, ts.rs, bins, nc=nc)
    image = out6[:, :3]
    depth = out6[:, 3]
    silhouette = out6[:, 4]
    presence = (silhouette > 0.99) & valid

    if ts.method == "splatam":
        depth_sq = out6[:, 5]
        uncertainty = jax.lax.stop_gradient(depth_sq - depth * depth)
        nan_mask = (~jnp.isnan(depth)) & (~jnp.isnan(uncertainty))
        mask = (gt_depth_t > 0) & nan_mask & presence
        loss_depth = masked_sum(jnp.abs(gt_depth_t - depth), mask)
        loss_im = masked_sum(jnp.abs(gt_color_t - image), mask[:, None])
        return loss_depth + 0.5 * loss_im

    loss = masked_mean(jnp.abs(image - gt_color_t), presence[:, None])
    if ts.use_depth_estimate_loss:
        if ts.use_gt_depth:
            dmask = presence & (gt_depth_t > 0)
            loss = loss + ts.pearson_weight * pearson_loss(
                depth, gt_depth_t, mask=dmask, invert_estimate=True
            )
        else:
            loss = loss + ts.pearson_weight * pearson_loss(
                depth, est_depth_t, mask=presence, invert_estimate=True
            )
    if ts.use_imu_loss:
        t_err, q_err = rel_pose_loss(pose, initial_pose)
        loss = loss + ts.imu_T_weight * t_err + ts.imu_q_weight * q_err
    return loss


def _pose_fused_static(ts: TrackSettings) -> bool:
    """True when the segment will take the fused pose-kernel path
    (render_tiles_pose): every term is a static TrackSettings/RenderSettings
    field, so _track_bins and _track_segment share one immutable decision —
    the fused backward never reads the reverse slot tables, so the tracker's
    rebins skip building them (-0.85 ms/build, scripts/probe_bins_cost2.py).

    Mesh-compatible since round 5: under a mesh the fused backward runs per
    tile window with a single [16] psum (render_tiles_pose_sharded), so the
    gate no longer requires mesh is None."""
    return (ts.pose_kernel and ts.track_tiles
            and ts.rs.use_pallas
            and not ts.rs.use_oracle
            and ts.rs.transform_means_python and ts.rs.sh_degree == 0)


@jax.jit
def _track_init(pose_init):
    """Initial tracker Adam carry as one dispatch (q, T, m_q, v_q, m_T,
    v_T, loss)."""
    q0 = pose_init[:4]
    T0 = pose_init[4:]
    z4 = jnp.zeros_like(q0)
    z3 = jnp.zeros_like(T0)
    return (q0, T0, z4, z4, z3, z3, jnp.asarray(0.0, jnp.float32))


@jax.jit
def _track_finish(q, T, flags):
    """Final pose assembly + overflow OR-reduce as one dispatch."""
    ovf = flags[0]
    for f in flags[1:]:
        ovf = ovf | f
    return jnp.concatenate([q, T]), ovf


@partial(jax.jit, static_argnames=("ts",))
def _track_bins(g: ActivatedGaussians, pose: jnp.ndarray, ts: TrackSettings):
    from ..ops.binning import build_bins
    from ..ops.render import project_for_pose

    rs = ts.rs
    proj = project_for_pose(g, jax.lax.stop_gradient(pose), rs)
    if ts.mesh is not None and rs.use_pallas:
        # tile-sharded: per-shard window bins (the sharded bins cache);
        # the fused pose path builds the table-free variant
        proj = replicate_proj(proj, ts.mesh)
        if _pose_fused_static(ts):
            from ..parallel.tile_sharded import build_window_bins_pose

            return build_window_bins_pose(proj, rs.cam, ts.mesh, rs)
        from ..parallel.tile_sharded import build_window_bins

        return build_window_bins(proj, rs.cam, ts.mesh, rs)
    align = 0
    if rs.use_pallas:
        from ..ops.pallas_composite import CHUNK as _PL_CHUNK

        align = _PL_CHUNK
    proj = replicate_proj(proj, ts.mesh)
    return build_bins(proj, rs.cam, rs.pair_cap, rs.max_tiles_per_gaussian,
                      align=align, d1=rs.bin_d1, big_frac=rs.bin_big_frac,
                      d2_live=rs.bin_d2_live,
                      reverse_tables=not _pose_fused_static(ts))


@partial(jax.jit, static_argnames=("ts",))
def _track_bins_qt(g: ActivatedGaussians, q: jnp.ndarray, T: jnp.ndarray,
                   ts: TrackSettings):
    """Rebin from the carry's (q, T) without an eager host-side concat."""
    return _track_bins.__wrapped__(g, jnp.concatenate([q, T]), ts)


@partial(jax.jit, static_argnames=("ts", "n_iters"))
def _track_segment(
    g: ActivatedGaussians,
    carry,
    bins,
    base_i: jnp.ndarray,
    gt_color: jnp.ndarray,
    gt_depth: jnp.ndarray,
    est_depth: jnp.ndarray,
    initial_pose: jnp.ndarray,
    ts: TrackSettings,
    n_iters: int,
):
    """`n_iters` Adam steps with FIXED bins (the loop-invariant hoisted out
    of the dispatch); `base_i` is the global iteration of step 0 (bias
    correction).

    The loss is evaluated in the kernel's channel-major TILE layout
    ([T, NC, PIX], tracking_loss_tiles) by DEFAULT instead of assembling
    the [NC, H, W] image: with the kernel emitting channel-major
    accumulators (pixels on the lane dim), skipping the assembly transpose
    + its backward measured 1.1 ms/iter FASTER on v5e (18.78 vs 19.89,
    bisect_seg 2026-08-19). An earlier [T, PIX, 6] variant was 1.3 ms/iter
    slower (NC=6 on the minor dim lane-padded every loss op ~21x) — that
    layout is gone. ts.track_tiles=False (cfg tpu.track_tiles, env default
    MM3DGS_TRACK_TILES) restores the image-assembly path (parity-tested);
    values match up to fp summation order."""
    from ..parallel.tile_sharded import PoseWindowBins

    pose_fused = _pose_fused_static(ts) and isinstance(
        bins, PoseWindowBins if ts.mesh is not None else TileBins)
    # the fused pose path never touches the reverse slot tables (so
    # _track_bins skips building them: bins.small_slots is None
    # single-chip, PoseWindowBins under the mesh); the general tile path's
    # pack backward requires them
    tiled = pose_fused or (
        ts.track_tiles
        and ts.mesh is None and ts.rs.use_pallas
        and not ts.rs.use_oracle
        and isinstance(bins, TileBins) and bins.small_slots is not None)
    if tiled:
        cam = ts.rs.cam
        gt_color_t = to_tiles(gt_color, cam)
        gt_depth_t = to_tiles(gt_depth, cam)
        est_depth_t = to_tiles(est_depth, cam)
        valid = tile_pixel_valid(cam)

        def loss_fn(q, T):
            pose = jnp.concatenate([q, T])
            return tracking_loss_tiles(
                g, pose, gt_color_t, gt_depth_t, est_depth_t, valid,
                initial_pose, ts, bins, pose_fused=pose_fused
            )
    else:
        def loss_fn(q, T):
            pose = jnp.concatenate([q, T])
            return tracking_loss(
                g, pose, gt_color, gt_depth, est_depth, initial_pose, ts,
                bins
            )

    grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

    def body(j, carry):
        q, T, mq, vq, mT, vT, _ = carry
        loss, (gq, gT) = grad_fn(q, T)
        step = (base_i + j + 1).astype(jnp.float32)
        bc1 = 1.0 - ts.b1**step
        bc2 = 1.0 - ts.b2**step

        mq = ts.b1 * mq + (1 - ts.b1) * gq
        vq = ts.b2 * vq + (1 - ts.b2) * gq * gq
        q = q - ts.rotation_lr * (mq / bc1) / (jnp.sqrt(vq) / jnp.sqrt(bc2) + ts.eps)

        mT = ts.b1 * mT + (1 - ts.b1) * gT
        vT = ts.b2 * vT + (1 - ts.b2) * gT * gT
        T = T - ts.position_lr * (mT / bc1) / (jnp.sqrt(vT) / jnp.sqrt(bc2) + ts.eps)
        return (q, T, mq, vq, mT, vT, loss)

    return jax.lax.fori_loop(0, n_iters, body, carry)


def bins_overflow(bins) -> jnp.ndarray:
    """[] bool: the build's REAL overflow flag (rect truncation, big-tier
    cap, d2_live truncation, aligned-buffer clamp — ops/binning.py) for a
    single-chip TileBins, a PoseWindowBins, or a window-bins tuple
    (build_window_bins)."""
    if isinstance(bins, TileBins):
        return bins.overflow
    from ..parallel.tile_sharded import _BIN_FIELDS, PoseWindowBins

    if isinstance(bins, PoseWindowBins):
        return jnp.any(bins.overflow)
    return jnp.any(bins[_BIN_FIELDS.index("overflow")])


def track_frame(
    g: ActivatedGaussians,
    pose_init: jnp.ndarray,
    gt_color: jnp.ndarray,
    gt_depth: jnp.ndarray,
    est_depth: jnp.ndarray,
    ts: TrackSettings,
):
    """Optimize the pose for `ts.iters` Adam steps. Returns
    (pose, last_loss, overflow) — `overflow` ORs the real `bins.overflow`
    flag over every rebin (a device scalar: no host sync here; the SLAM
    loop fetches it once per frame).

    The map `g` is frozen (gradients flow only to the pose). Host-level
    driver: one jitted segment per `rebin_every` block, bins rebuilt
    between segments (same cadence as an in-loop i % rebin_every == 0
    refresh). No host syncs — dispatches enqueue back-to-back."""
    initial_pose = jax.lax.stop_gradient(pose_init)
    rebin = max(int(ts.rebin_every), 1)

    # Host glue is DISPATCH-COUNT-optimized (round-5): every eager jnp op
    # here is a separate ~30 ms tunnel round trip, so init/rebin-pose/
    # finish are fused jits and segment indices are numpy scalars that ride
    # the jitted calls.
    carry = _track_init(pose_init)
    flags = []

    i = 0
    while i < ts.iters:
        if i == 0:
            bins = _track_bins(g, pose_init, ts)
        else:
            bins = _track_bins_qt(g, carry[0], carry[1], ts)
        flags.append(bins_overflow(bins))
        n = min(rebin, ts.iters - i)
        carry = _track_segment(
            g, carry, bins, np.int32(i), gt_color, gt_depth,
            est_depth, initial_pose, ts, n,
        )
        i += n

    q, T, *_, loss = carry
    pose, overflow = _track_finish(q, T, tuple(flags))
    return pose, loss, overflow

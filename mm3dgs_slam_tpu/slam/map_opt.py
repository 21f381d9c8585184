"""Jitted map optimization: the mapper's inner loop as one `lax.fori_loop`.

TPU rebuild of optimize_map (slam/mapper.py:718-950). Per iteration:
render the scheduled keyframe -> (1-lambda)*L1 + lambda*(1-SSIM)
[+ Pearson depth] -> grads -> functional Adam over the Gaussian-map pytree
(+ keyframe poses when BA is on).

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
    iterations (torch skips params with grad=None) — we skip it likewise,
  * on BA iterations gradients of non-covisible Gaussians are zeroed
    (mapper.py:931-936) and the per-keyframe pose Adam steps afterwards.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

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
    rebin_every: int = 1       # binning refresh cadence (1 = every iteration,
                               # exact parity; >1 pays off with a grouped
                               # schedule where consecutive iterations render
                               # the same keyframe)
    mesh: object = None        # jax.sharding.Mesh: map rows sharded over
                               # "gauss"; projection output replicated (the
                               # ICI boundary); compositing replicated


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


def _bins_for(params: dict, n_alive, pose, ms: MapOptSettings):
    """Binning for a map snapshot + pose (non-differentiable selection)."""
    rs = ms.rs
    from ..parallel.sharded import replicate_proj

    m = GaussianMap(**jax.tree.map(jax.lax.stop_gradient, params),
                    n_alive=n_alive)
    proj = project_for_pose(m.activated(), jax.lax.stop_gradient(pose), rs)
    proj = replicate_proj(proj, ms.mesh)
    if rs.use_pallas:
        from ..ops.pallas_composite import CHUNK as _PL_CHUNK

        return build_bins(proj, rs.cam, rs.pair_cap,
                          rs.max_tiles_per_gaussian, align=_PL_CHUNK,
                          d1=rs.bin_d1, big_frac=rs.bin_big_frac)
    return build_bins(proj, rs.cam, rs.pair_cap, rs.max_tiles_per_gaussian,
                      d1=rs.bin_d1, big_frac=rs.bin_big_frac)


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
    if rs.use_pallas:
        from ..ops.pallas_composite import composite_tiles_pallas

        img6 = composite_tiles_pallas(proj, bins, rs.cam, background(rs))
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
def optimize_map(
    carry: MapCarry,
    kf_colors: jnp.ndarray,   # [K, 3, H, W]
    kf_depths: jnp.ndarray,   # [K, H, W]
    kf_ests: jnp.ndarray,     # [K, H, W]
    schedule: jnp.ndarray,    # [iters] int32 indices into the K axis
    camera_extent: jnp.ndarray,
    ms: MapOptSettings,
) -> MapCarry:
    argnums = (0, 1, 2) if ms.do_BA else (0, 1)
    grad_fn = jax.value_and_grad(_map_loss, argnums=argnums, has_aux=True)
    from ..models.gaussians import _PARAM_FIELDS

    def body(i, loop_carry):
        c, bins, bins_kf = loop_carry
        k = schedule[i]
        pose = c.kf_poses[k]
        gt_color = kf_colors[k]
        gt_depth = kf_depths[k]
        est_depth = kf_ests[k]

        params = {f: getattr(c.m, f) for f in _PARAM_FIELDS}

        # Binning reuse: the selection only changes when the viewpoint
        # switches (different keyframe), the map rows move (prune sets
        # bins_kf = -1), or BA moves poses. Gaussian drift within a few
        # map-Adam steps is sub-pixel (xyz lr 1e-4) so in-between refreshes
        # follow ms.rebin_every like the tracker.
        needs_rebin = (k != bins_kf) | (jnp.mod(i, ms.rebin_every) == 0)
        if ms.do_BA:
            needs_rebin = jnp.asarray(True)
        bins = jax.lax.cond(
            needs_rebin,
            lambda: _bins_for(params, c.m.n_alive, pose, ms),
            lambda: bins,
        )
        bins_kf = k

        screen0 = jnp.zeros_like(c.m.xyz[:, :2])
        (loss, (radii, visible)), grads = grad_fn(
            params, screen0, pose, c.m.n_alive, gt_color, gt_depth,
            est_depth, bins, ms
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

        is_prune_iter = (
            (i >= ms.densify_from_iter)
            & (jnp.mod(i, ms.pruning_interval) == 0)
            & in_densify_phase
        )
        if ms.method == "splatam":
            # splatam prunes (opacity-only) at i in {0, 20} (mapper.py:879-884)
            is_prune_iter = (i <= 20) & (jnp.mod(i, 20) == 0)

        def do_prune(args):
            m, adam, max_radii, grad_accum, denom, ba_mask = args
            if ms.method == "splatam":
                pmask = prune_mask_reference(m, camera_extent, ms.min_opacity)
            else:
                pmask = prune_mask_reference(
                    m, camera_extent, ms.min_opacity, max_radii, ms.size_threshold
                )
            m2, adam2, order = prune_compact(m, adam, ~pmask)
            return (
                m2,
                adam2,
                max_radii[order],
                grad_accum[order],
                denom[order],
                ba_mask[order],
            )

        def do_adam(args):
            m, adam, max_radii, grad_accum, denom, ba_mask = args
            row_mask = ba_mask if ms.do_BA else None
            m2, adam2 = adam_update(m, gm, adam, ms.hyper, row_mask=row_mask)
            return (m2, adam2, max_radii, grad_accum, denom, ba_mask)

        # Prune iterations skip the map Adam step (see module docstring).
        m, adam, max_radii, grad_accum, denom, ba_mask = jax.lax.cond(
            is_prune_iter,
            do_prune,
            do_adam,
            (c.m, c.adam, max_radii, grad_accum, denom, c.ba_mask),
        )

        kf_poses, pose_m, pose_v, pose_step = c.kf_poses, c.pose_m, c.pose_v, c.pose_step
        if ms.do_BA:
            # Adam on the sampled keyframe's pose (per-group LRs for q/T,
            # torch default eps; mapper.py:768-780,940-942).
            pose_step = pose_step + 1
            sf = pose_step.astype(jnp.float32)
            bc1 = 1.0 - 0.9**sf
            bc2 = 1.0 - 0.999**sf
            gp = jnp.zeros_like(kf_poses).at[k].set(g_pose)
            pose_m = 0.9 * pose_m + 0.1 * gp
            pose_v = 0.999 * pose_v + 0.001 * gp * gp
            lr_vec = jnp.concatenate(
                [jnp.full((4,), ms.cam_q_lr), jnp.full((3,), ms.cam_t_lr)]
            )
            upd_p = lr_vec * (pose_m / bc1) / (jnp.sqrt(pose_v) / jnp.sqrt(bc2) + 1e-15)
            kf_poses = kf_poses - upd_p

        # pruning compacts/permutes rows -> cached bins are stale
        bins_kf = jnp.where(is_prune_iter, -1, bins_kf)

        c_out = MapCarry(
            m=m, adam=adam, max_radii=max_radii, grad_accum=grad_accum,
            denom=denom, ba_mask=ba_mask, kf_poses=kf_poses, pose_m=pose_m,
            pose_v=pose_v, pose_step=pose_step, last_loss=loss,
        )
        return (c_out, bins, bins_kf)

    params0 = {f: getattr(carry.m, f) for f in _PARAM_FIELDS}
    bins0 = _bins_for(params0, carry.m.n_alive, carry.kf_poses[schedule[0]], ms)
    out, _, _ = jax.lax.fori_loop(
        0, ms.iters, body, (carry, bins0, jnp.asarray(-1, jnp.int32))
    )
    return out

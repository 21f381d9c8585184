"""Jitted mapper geometry ops: silhouette masks, covisibility, new-Gaussian
candidates (slam/mapper.py:103-716, rebuilt as pure static-shape functions).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gaussians import GaussianMap, NewGaussians
from ..ops.camera import Camera
from ..ops.depth import (
    backproject_all_pixels,
    project_points_fraction_inside,
    torch_style_median,
)
from ..ops.pose import pose_to_w2c
from ..ops.render import ActivatedGaussians, RenderSettings, render
from ..ops.sh import rgb_to_sh


@partial(jax.jit, static_argnames=("rs",))
def render_depth_sil(g: ActivatedGaussians, pose: jnp.ndarray, rs: RenderSettings):
    """No-grad render returning (depth, silhouette, visibility_filter)."""
    out = render(g, pose, rs)
    return out["depth"][0], out["depth"][1], out["visibility_filter"]


@partial(jax.jit, static_argnames=("cam",))
def keyframe_world_points(
    depth: jnp.ndarray, silhouette: jnp.ndarray, pose: jnp.ndarray, cam: Camera
):
    """World points of a keyframe's rendered depth, with validity mask.

    Mirrors the depth point-cloud extraction at slam/mapper.py:141-167 and
    175-203: pixels with silhouette <= 0.99 or depth <= 0 are invalid, and
    points at the camera origin are dropped (the reference removes rounded
    duplicates of (0,0,0), mapper.py:192-201).
    """
    presence = silhouette > 0.99
    d = jnp.where(presence, depth, 0.0)
    valid = d > 0
    w2c = pose_to_w2c(pose)
    pts = backproject_all_pixels(d, w2c, cam.fx, cam.fy, cam.cx, cam.cy)
    near_origin = jnp.all(jnp.abs(jnp.round(pts, 4)) == 0.0, axis=-1)
    valid = valid.reshape(-1) & (~near_origin)
    return pts, valid


@partial(jax.jit, static_argnames=("cam", "edge"))
def covisibility_fraction(
    pts: jnp.ndarray,
    valid: jnp.ndarray,
    candidate_pose: jnp.ndarray,
    cam: Camera,
    edge: int = 0,
) -> jnp.ndarray:
    w2c = pose_to_w2c(candidate_pose)
    return project_points_fraction_inside(
        pts, valid, w2c, cam.fx, cam.fy, cam.cx, cam.cy, cam.height, cam.width, edge
    )


@partial(jax.jit, static_argnames=("cam", "edge"))
def _covis_fractions_jit(pts, valid, poses, cam, edge):
    def one(p):
        return covisibility_fraction.__wrapped__(pts, valid, p, cam, edge)

    return jax.vmap(one)(poses)


def covisibility_fractions_batch(
    pts: jnp.ndarray,
    valid: jnp.ndarray,
    candidate_poses: jnp.ndarray,  # [K, 7]
    cam: Camera,
    edge: int = 0,
) -> jnp.ndarray:
    """Covisibility fraction of `pts` against each candidate pose.

    The keyframe count grows by one every kf_every frames; compiling a new
    [K, 7] program per keyframe cost minutes each through the remote
    compiler, so the batch is PADDED to blocks of 8 identity poses (their
    fractions are computed and discarded) and the whole pipeline is jitted —
    recompiles happen every 8th keyframe instead of every one."""
    k = candidate_poses.shape[0]
    kp = -(-k // 8) * 8
    if kp > k:
        # pad on whichever host/device side the input lives: numpy inputs
        # pad for free on the host (no eager device dispatches)
        xp = np if isinstance(candidate_poses, np.ndarray) else jnp
        pad = xp.tile(
            xp.asarray([1.0, 0, 0, 0, 0, 0, 0], candidate_poses.dtype)[None],
            (kp - k, 1),
        )
        candidate_poses = xp.concatenate([candidate_poses, pad])
    return _covis_fractions_jit(pts, valid, candidate_poses, cam, edge)[:k]


@partial(jax.jit, static_argnames=("rs",))
def covis_check_last_kf(g, last_pose, est_pose, rs):
    """need_new_keyframe's covisibility test (mapper.py:141-167) fused into
    ONE dispatch: render last KF depth/sil -> world points -> fraction
    visible from the current estimated pose."""
    depth, sil, _ = render_depth_sil.__wrapped__(g, last_pose, rs)
    pts, valid = keyframe_world_points.__wrapped__(depth, sil, last_pose,
                                                   rs.cam)
    return covisibility_fraction.__wrapped__(pts, valid, est_pose, rs.cam, 0)


@partial(jax.jit, static_argnames=("rs",))
def kf_world_points(g, pose, rs):
    """Fused render_depth_sil + keyframe_world_points (one dispatch) for
    the covisibility-graph update (mapper.py:242-277)."""
    depth, sil, _ = render_depth_sil.__wrapped__(g, pose, rs)
    return keyframe_world_points.__wrapped__(depth, sil, pose, rs.cam)


class NewGaussianStats(NamedTuple):
    candidates: NewGaussians
    non_presence: jnp.ndarray  # [H, W] bool (pre depth-validity AND)
    n_new: jnp.ndarray         # [] int32


@partial(jax.jit, static_argnames=("rs", "first_frame", "method"))
def new_gaussian_candidates(
    g: ActivatedGaussians,
    pose: jnp.ndarray,
    gt_color: jnp.ndarray,   # [3, H, W] in [0, 1]
    depth: jnp.ndarray,      # [H, W] metric depth used for backprojection
    rs: RenderSettings,
    first_frame: bool,
    method: str = "vigs",
) -> NewGaussianStats:
    """One candidate Gaussian per pixel + mask of which to add.

    Mirrors initialize_new_gaussians (mapper.py:495-688):
      * non-presence = silhouette < 0.5  OR  depth-error > 10x median error
        (splatam: render_depth > depth AND error > 50x median),
      * candidates: back-projected center, RGB2SH color, identity rotation,
        logit-0 opacity (sigma=0.5), isotropic log scale from projective
        pixel size sqrt((z / ((fx+fy)/2))^2).
    """
    cam = rs.cam
    H, W = cam.height, cam.width

    if first_frame:
        non_presence = jnp.ones((H, W), dtype=bool)
    else:
        out = render(g, pose, rs)
        render_depth = out["depth"][0]
        silhouette = out["depth"][1]
        non_presence_sil = silhouette < 0.5
        depth_error = jnp.abs(depth - render_depth) * (depth > 0)
        med = torch_style_median(depth_error)
        if method == "splatam":
            non_presence_depth = (render_depth > depth) & (depth_error > 50 * med)
        else:
            non_presence_depth = depth_error > 10 * med
        non_presence = non_presence_sil | non_presence_depth

    mask = non_presence.reshape(-1) & (depth.reshape(-1) > 0)

    w2c = pose_to_w2c(pose)
    pts = backproject_all_pixels(depth, w2c, cam.fx, cam.fy, cam.cx, cam.cy)
    cols = gt_color.transpose(1, 2, 0).reshape(-1, 3)

    z = depth.reshape(-1)
    scale_gaussian = z / ((cam.fx + cam.fy) / 2.0)
    mean3_sq = scale_gaussian**2
    log_scale = jnp.log(jnp.sqrt(jnp.maximum(mean3_sq, 1e-20)))

    M = H * W
    candidates = NewGaussians(
        xyz=pts.astype(jnp.float32),
        features_dc=rgb_to_sh(cols)[:, None, :].astype(jnp.float32),
        features_rest=jnp.zeros((M, g.shs.shape[1] - 1 if g.shs.shape[1] > 1 else 1, 3), jnp.float32),
        scaling=jnp.tile(log_scale[:, None], (1, 3)).astype(jnp.float32),
        rotation=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (M, 1)),
        opacity=jnp.zeros((M, 1), jnp.float32),
        rgb=cols.astype(jnp.float32),
        mask=mask,
    )
    return NewGaussianStats(
        candidates=candidates,
        non_presence=non_presence,
        n_new=jnp.sum(mask.astype(jnp.int32)),
    )


@partial(jax.jit, static_argnames=("rs", "min_kf"))
def covisible_gaussian_mask(
    g: ActivatedGaussians,
    poses: jnp.ndarray,        # [K, 7] padded window poses
    pose_valid: jnp.ndarray,   # [K] bool
    rs: RenderSettings,
    min_kf: int = 2,
) -> jnp.ndarray:
    """Gaussians visible in >= min_kf window views (mapper.py:690-716; the
    reference hardcodes 2 regardless of the min_kf arg — we honor min_kf but
    callers pass 2)."""

    def one(p, v):
        vis = render(g, p, rs)["visibility_filter"]
        return vis & v

    vis_sum = jnp.sum(
        jax.vmap(one)(poses, pose_valid).astype(jnp.int32), axis=0
    )
    return vis_sum >= min_kf

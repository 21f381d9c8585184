"""High-level differentiable render: the TPU equivalent of slam/renderer.py.

One fused multi-channel composite produces what the reference needs two CUDA
launches for (RGB pass + [z, 1, z^2] depth/silhouette pass,
renderer.py:196-214). The returned dict keeps the reference's contract:
``render`` [3,H,W], ``depth`` [3,H,W] (expected depth, silhouette,
E[z^2]), ``radii`` [N], ``visibility_filter`` [N].

Faithfully mirrored quirks of the reference's default configs
(pipeline.transform_means_python == true, TUM.yml:28 / UTMM.yml:31):

  * pose gradients flow through a jnp mean transform; the rasterizer sees
    w2c = I (renderer.py:117-118,142-153),
  * rotations are passed UNtransformed even though means were moved to the
    camera frame (the computed rotation transform is discarded at
    renderer.py:152,171-175) — so anisotropic covariances keep their world
    orientation; with force_isotropic (UTMM) the quirk is invisible,
  * camera position for SH view directions is the origin in that mode.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .binning import TileBins, build_bins
from .camera import Camera
from .composite import composite_tiles
from .oracle import composite_oracle
from .pose import pose_to_w2c
from .projection import ProjectedGaussians, project_gaussians


class RenderSettings(NamedTuple):
    """Static rasterization settings (hashable; specializes the jit)."""

    cam: Camera
    sh_degree: int = 0
    transform_means_python: bool = True
    force_isotropic: bool = False
    # pipeline.compute_cov3D_python (renderer.py:160-175): when the reference
    # precomputes cov3D in python it never applies force_isotropic (the
    # isotropic tiling lives on the scales=... branch that is skipped), so
    # the ONLY observable effect of the flag is bypassing force_isotropic.
    # pipeline.convert_SHs_python is a true no-op here: its python branch
    # (renderer.py:182-190) computes exactly the eval_sh + 0.5 clamp the CUDA
    # rasterizer otherwise does — which is what ops/projection.py always does.
    # pipeline.use_rgb is dead in the reference (defined at TUM.yml:30,
    # consumed by no code) and is accepted-but-ignored for config parity.
    compute_cov3d_python: bool = False
    white_background: bool = False
    pair_cap: int = 1 << 20
    max_per_tile: int = 1024
    chunk: int = 32
    max_tiles_per_gaussian: int = 64
    use_oracle: bool = False  # exact dense compositor (tests / tiny scenes)
    use_pallas: bool = False  # pallas kernel compositor (TPU fast path)
    bin_d1: int = 8           # binning small-tier slots/gaussian, sized
                              # against POST-cull live tiles (ops/binning.py);
                              # 4 fits pixel-scale scenes, watch `overflow`
    bin_big_frac: int = 8     # binning big-tier capacity divisor
    bin_d2_live: int = 0      # post-cull big-tier width cap (0 = full
                              # max_tiles_per_gaussian; see build_bins)
    grad_bf16: bool = False   # emit per-pair backward grads as bfloat16
                              # (halves the slot-table reduce bytes; the
                              # per-gaussian accumulation stays f32)


class ActivatedGaussians(NamedTuple):
    """Post-activation Gaussian attributes (see models/gaussians.py)."""

    xyz: jnp.ndarray        # [N, 3]
    scales: jnp.ndarray     # [N, 3] post-exp
    rotations: jnp.ndarray  # [N, 4] post-normalize
    opacity: jnp.ndarray    # [N] post-sigmoid
    shs: jnp.ndarray        # [N, K, 3]
    alive: jnp.ndarray      # [N] bool


def effective_scales(scales: jnp.ndarray, rs: RenderSettings) -> jnp.ndarray:
    """Post-activation scales honoring force_isotropic: exp(tile(
    _scaling[:,0])) (renderer.py:167-168); scales here are post-exp so
    tiling column 0 is equivalent. compute_cov3D_python skips this branch
    entirely (renderer.py:164-175) — see RenderSettings.compute_cov3d_python.

    Shared by project_for_pose and the fused pose path (_pose_fwd_impl) so
    a quirk/dtype change cannot diverge tracking from mapping forwards."""
    if rs.force_isotropic and not rs.compute_cov3d_python:
        return jnp.tile(scales[:, :1], (1, 3))
    return scales


def means_cam_soa(xyz: jnp.ndarray, camera_pose: jnp.ndarray) -> jnp.ndarray:
    """Camera-frame means for a 7-vec w2c pose, the transform_means_python
    mean move (renderer.py:142-153), in SoA form (scalar R entries x [N]
    columns): the [N,3] @ [3,3] form's BACKWARD emits a 3-wide reduction
    matmul that the TPU executes pathologically (measured ~5 ms/131k rows
    d/dpose); the SoA form's transpose is nine [N]-dot reductions that fuse
    clean. Shared by project_for_pose and _pose_fwd_impl."""
    rel_w2c = pose_to_w2c(camera_pose)
    mx, my, mz = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    R = rel_w2c[:3, :3]
    t = rel_w2c[:3, 3]
    return jnp.stack(
        [mx * R[0, 0] + my * R[0, 1] + mz * R[0, 2] + t[0],
         mx * R[1, 0] + my * R[1, 1] + mz * R[1, 2] + t[1],
         mx * R[2, 0] + my * R[2, 1] + mz * R[2, 2] + t[2]],
        axis=-1,
    )


def project_for_pose(
    g: ActivatedGaussians, camera_pose: jnp.ndarray, rs: RenderSettings
) -> ProjectedGaussians:
    """Project the map for a 7-vec w2c pose, honoring the transform mode."""
    scales = effective_scales(g.scales, rs)

    if rs.transform_means_python:
        means = means_cam_soa(g.xyz, camera_pose)
        w2c = jnp.eye(4, dtype=g.xyz.dtype)
        campos = jnp.zeros(3, dtype=g.xyz.dtype)
    else:
        w2c = pose_to_w2c(camera_pose)
        means = g.xyz
        campos = None

    return project_gaussians(
        means3d=means,
        scales=scales,
        rotations=g.rotations,
        opacities=g.opacity,
        shs=g.shs,
        alive=g.alive,
        w2c=w2c,
        cam=rs.cam,
        sh_degree=rs.sh_degree,
        campos=campos,
    )


def to_tiles(img: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """[C, H, W] (or [H, W]) -> CHANNEL-major tile layout
    [n_tiles, C, TILE*TILE] (or [n_tiles, TILE*TILE]).

    The inverse of the compositor's image assembly; used to move LOSS
    TARGETS into the kernel's native channel-major layout so elementwise
    losses skip the per-iteration [NC, H, W] assembly transpose (and its
    backward) while keeping pixels on the minor (lane) dim (channels pad
    sublanes 6->8 instead of lanes 6->128)."""
    from .camera import TILE

    squeeze = img.ndim == 2
    if squeeze:
        img = img[None]
    c = img.shape[0]
    ty, tx = cam.tiles_y, cam.tiles_x
    img = jnp.pad(img, ((0, 0), (0, ty * TILE - cam.height),
                        (0, tx * TILE - cam.width)))
    t = img.reshape(c, ty, TILE, tx, TILE).transpose(1, 3, 0, 2, 4)
    t = t.reshape(ty * tx, c, TILE * TILE)
    return t[:, 0] if squeeze else t


def from_tiles(t: jnp.ndarray, cam: Camera) -> jnp.ndarray:
    """CHANNEL-major tile layout [n_tiles, C, TILE*TILE] -> [C, H, W].

    The inverse of to_tiles; used by the tile-layout MAPPING loss to
    assemble ONLY the channels a 2D-structured loss needs (SSIM's windowed
    statistics need the image; L1/Pearson do not) instead of the full
    [6, H, W] image every iteration."""
    from .camera import TILE

    ty, tx = cam.tiles_y, cam.tiles_x
    c = t.shape[1]
    img = t.reshape(ty, tx, c, TILE, TILE).transpose(2, 0, 3, 1, 4)
    img = img.reshape(c, ty * TILE, tx * TILE)
    return img[:, : cam.height, : cam.width]


def tile_pixel_valid(cam: Camera) -> jnp.ndarray:
    """[n_tiles, TILE*TILE] bool: True where the tile pixel lies inside the
    H x W image (False on the bottom/right tile-grid padding). Constant per
    camera — XLA folds it."""
    from .camera import TILE

    t = jnp.arange(cam.n_tiles)[:, None]
    p = jnp.arange(TILE * TILE)[None, :]
    gy = (t // cam.tiles_x) * TILE + p // TILE
    gx = (t % cam.tiles_x) * TILE + p % TILE
    return (gy < cam.height) & (gx < cam.width)


def render_tiles(
    g: ActivatedGaussians,
    camera_pose: jnp.ndarray,
    rs: RenderSettings,
    bins: TileBins,
    nc: int = 6,
):
    """Tile-layout render fast path: the fused pack+composite WITHOUT the
    [NC, H, W] image assembly. Returns out CHANNEL-major
    [n_tiles, nc, TILE*TILE] (channel prefix of rgb, z, sil, z^2),
    background already applied.

    Tracking's losses are elementwise + global masked reductions, so they
    evaluate identically in this layout (same pixel set via
    tile_pixel_valid), skipping the assembly transpose and its backward.
    The kernel emits channel-major accumulators (pixels stay on the lane
    dim — an earlier [T, PIX, NC] variant lane-padded every loss op ~21x
    and measured net slower). Requires pallas bins built with slot tables
    (align=CHUNK).

    `nc=5` drops the E[z^2] channel from the walk — only splatam's
    uncertainty mask reads it (slam/tracker.py:140-147). Measured
    cost-neutral on v5e (the accumulate is MXU-pass-bound, not
    column-bound; scripts/probe_r3b.py) — the slim walk is kept for
    exactness of intent, not speed."""
    proj = project_for_pose(g, camera_pose, rs)
    from .pallas_composite import _composite_packed

    bg = background(rs)[:nc]
    acc, tfin = _composite_packed(
        proj.packed, bins.pair_gauss, bins.pair_valid, bins.small_slots,
        bins.big_slots, bins.big_gauss, bins.big_valid, bins.gauss_rank,
        bins.tile_start, bins.tile_count, rs.cam, False, rs.grad_bf16,
        None, None, True, nc,
    )
    return acc + tfin * bg[None, :, None]


def _pose_fwd_impl(q, T, xyz, scales, rotations, opacity, shs, alive,
                   pair_gauss, tile_start, tile_count, rs: RenderSettings,
                   nc: int, interpret: bool):
    """Forward for the fused pose-gradient path: project_for_pose's exact
    math (SoA mean transform, w2c=I projection, campos=0 — the
    transform_means_python quirks), plus the packed conic pose-Jacobian
    extension rows the backward kernel contracts in-register."""
    from .pallas_composite import _composite_pallas_fwd, pack_pairs
    from .projection import conic_pose_jacobian_rows

    scales_eff = effective_scales(scales, rs)
    means_cam = means_cam_soa(xyz, jnp.concatenate([q, T]))
    proj = project_gaussians(
        means3d=means_cam, scales=scales_eff, rotations=rotations,
        opacities=opacity, shs=shs, alive=alive,
        w2c=jnp.eye(4, dtype=xyz.dtype), cam=rs.cam,
        sh_degree=rs.sh_degree, campos=jnp.zeros(3, dtype=xyz.dtype))
    ext = conic_pose_jacobian_rows(means_cam, scales_eff, rotations, xyz,
                                   rs.cam)
    packed32 = jnp.concatenate([proj.packed, ext], axis=-1)
    pair_rows = pack_pairs(packed32, pair_gauss)
    acc, tfin = _composite_pallas_fwd(pair_rows, tile_start, tile_count,
                                      rs.cam, interpret, None, None, True,
                                      nc)
    bg = background(rs)[:nc]
    out = acc + tfin * bg[None, :, None]
    return out, (pair_rows, acc, tfin, tile_start, tile_count, q)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12, 13))
def _tiles_pose(q, T, xyz, scales, rotations, opacity, shs, alive,
                pair_gauss, tile_start, tile_count, rs: RenderSettings,
                nc: int, interpret: bool):
    out, _ = _pose_fwd_impl(q, T, xyz, scales, rotations, opacity, shs,
                            alive, pair_gauss, tile_start, tile_count, rs,
                            nc, interpret)
    return out


def _tiles_pose_fwd(q, T, xyz, scales, rotations, opacity, shs, alive,
                    pair_gauss, tile_start, tile_count, rs, nc, interpret):
    out, res = _pose_fwd_impl(q, T, xyz, scales, rotations, opacity, shs,
                              alive, pair_gauss, tile_start, tile_count, rs,
                              nc, interpret)
    zshapes = tuple(jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype),
        (xyz, scales, rotations, opacity, shs)))
    return out, res + (zshapes,)


def _tiles_pose_bwd(rs: RenderSettings, nc: int, interpret: bool, res,
                    d_out):
    """dq/dT straight from the fused kernel's per-tile partials:
    dT = sum d(mean_cam); dq = vjp of the quaternion->R chain applied to
    M = sum d(mean_cam) (x) mean_world (= dL/dR, since mcam = R mw + T).
    The map parameters are frozen during tracking — their cotangents are
    exact zeros (XLA DCEs them under grad-w.r.t.-pose)."""
    from .pallas_composite import _composite_pose_bwd
    from .pose import quat_to_rotmat

    pair_rows, acc, tfin, tile_start, tile_count, q, zshapes = res
    bg = background(rs)[:nc]
    dacc = d_out
    dtfin = jnp.sum(d_out * bg[None, :, None], axis=1, keepdims=True)
    psums = _composite_pose_bwd(pair_rows, tile_start, tile_count, acc,
                                tfin, dacc, dtfin, rs.cam, interpret, True,
                                nc)
    s = psums.sum(axis=(0, 2))
    dT = s[0:3]
    M = s[3:12]
    _, rvjp = jax.vjp(lambda qq: quat_to_rotmat(qq).reshape(9), q)
    (dq,) = rvjp(M)
    zeros = tuple(jnp.zeros(zs.shape, zs.dtype) for zs in zshapes)
    return (dq, dT) + zeros + (None, None, None, None)


_tiles_pose.defvjp(_tiles_pose_fwd, _tiles_pose_bwd)


def render_tiles_pose(
    g: ActivatedGaussians,
    q: jnp.ndarray,
    T: jnp.ndarray,
    rs: RenderSettings,
    bins: TileBins,
    nc: int = 6,
    interpret: bool = False,
):
    """render_tiles with the FUSED pose-gradient backward (tracking fast
    path): same channel-major [n_tiles, nc, PIX] forward, but grad w.r.t.
    (q, T) comes from ops/pallas_composite._bwd_pose_kernel — no per-pair
    gradient emission, no slot-table reduce, no per-gaussian chain.

    Valid only where every pose-dependent quantity flows through the
    camera-frame means: transform_means_python mode with sh_degree 0 (the
    shipped configs; view-dependent SH would add a d(rgb)/d(mean_cam)
    term the kernel does not carry)."""
    assert rs.transform_means_python and rs.sh_degree == 0, (
        "fused pose gradients require transform_means_python + sh_degree 0")
    return _tiles_pose(q, T, g.xyz, g.scales, g.rotations, g.opacity,
                       g.shs, g.alive, bins.pair_gauss, bins.tile_start,
                       bins.tile_count, rs, nc, interpret)


def background(rs: RenderSettings, channels: int = 6) -> jnp.ndarray:
    """Per-channel background; the reference reuses the RGB bg for the
    depth/sil pass (renderer.py:79-83,207-214)."""
    bg_rgb = jnp.ones(3) if rs.white_background else jnp.zeros(3)
    reps = channels // 3
    return jnp.tile(bg_rgb, reps).astype(jnp.float32)


def render(
    g: ActivatedGaussians,
    camera_pose: jnp.ndarray,
    rs: RenderSettings,
    bins: TileBins | None = None,
    mesh=None,
):
    """Render the map from a pose. Returns the reference's render dict plus
    the bins used (callers may cache them across optimizer iterations).

    With `mesh` (jax.sharding.Mesh), the map/projection is row-sharded over
    the "gauss" axis and the projected attributes are constrained replicated
    — the one ICI all-gather on the forward path (its transpose is the
    reduce-scatter of per-gaussian gradients back to their home shards)."""
    proj = project_for_pose(g, camera_pose, rs)
    if mesh is not None:
        from ..parallel.sharded import replicate_proj

        proj = replicate_proj(proj, mesh)
    bg = background(rs)

    if rs.use_oracle:
        img6 = composite_oracle(proj, rs.cam, bg)
        bins_used = bins
    elif rs.use_pallas:
        from .pallas_composite import CHUNK as PL_CHUNK, composite_tiles_pallas

        if mesh is not None:
            # tile-sharded composite (parallel/tile_sharded.py). `bins`
            # here means the WINDOW-bins tuple from build_window_bins —
            # a single-chip TileBins does not apply and is ignored.
            from ..parallel.tile_sharded import composite_tiles_sharded

            win_bins = bins if (bins is not None
                                and not isinstance(bins, TileBins)) else None
            img6 = composite_tiles_sharded(proj, rs.cam, bg, mesh, rs,
                                           bins=win_bins)
            bins_used = win_bins
        else:
            if bins is None:
                bins = build_bins(
                    proj, rs.cam, rs.pair_cap, rs.max_tiles_per_gaussian,
                    align=PL_CHUNK, d1=rs.bin_d1, big_frac=rs.bin_big_frac, d2_live=rs.bin_d2_live,
                )
            img6 = composite_tiles_pallas(proj, bins, rs.cam, bg,
                                          grad_bf16=rs.grad_bf16)
            bins_used = bins
    else:
        if bins is None:
            bins = build_bins(
                proj, rs.cam, rs.pair_cap, rs.max_tiles_per_gaussian,
                d1=rs.bin_d1, big_frac=rs.bin_big_frac, d2_live=rs.bin_d2_live,
            )
        img6 = composite_tiles(
            proj, bins, rs.cam, bg, rs.max_per_tile, rs.chunk
        )
        bins_used = bins

    return {
        "render": img6[:3],
        "depth": img6[3:6],
        "radii": proj.radius,
        "visibility_filter": proj.radius > 0,
        "proj": proj,
        "bins": bins_used,
    }

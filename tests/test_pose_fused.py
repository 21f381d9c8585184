"""Fused pose-gradient kernel == general autodiff pose gradients.

The tracking fast path (ops/render.render_tiles_pose) computes d(loss)/d(q, T)
inside the Pallas backward walk (ops/pallas_composite._bwd_pose_kernel) by
contracting per-pair field gradients against packed conic Jacobians and
accumulating [sum dmcam | sum dmcam (x) mw] per tile — no per-pair gradient
emission, no slot-table reduce. It must produce the SAME pose gradient as
the general path (autodiff through projection -> pack -> composite), which
these tests take through the fully independent XLA compositor
(ops/composite.composite_tiles). Differences are fp re-association only.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm3dgs_slam_tpu.ops.binning import build_bins
from mm3dgs_slam_tpu.ops.pallas_composite import CHUNK
from mm3dgs_slam_tpu.ops.render import (RenderSettings, render,
                                        render_tiles_pose, tile_pixel_valid,
                                        to_tiles, project_for_pose)

from utils import random_scene, small_camera

POSE = jnp.array([0.999, 0.02, -0.01, 0.005, 0.01, -0.02, 0.03], jnp.float32)


def _setup(hw=(64, 80), n=900, white=False, iso=False):
    cam = small_camera(h=hw[0], w=hw[1], f=70.0)
    g = random_scene(jax.random.PRNGKey(5), n, cam)
    rs = RenderSettings(cam=cam, pair_cap=1 << 16, max_per_tile=512,
                        chunk=16, max_tiles_per_gaussian=128,
                        white_background=white, force_isotropic=iso,
                        bin_d1=4, bin_big_frac=4, bin_d2_live=8)
    proj = project_for_pose(g, POSE, rs)
    bins = build_bins(proj, cam, rs.pair_cap, rs.max_tiles_per_gaussian,
                      align=CHUNK, d1=rs.bin_d1, big_frac=rs.bin_big_frac,
                      d2_live=rs.bin_d2_live)
    assert not bool(bins.overflow)
    return cam, g, rs, bins


@pytest.mark.parametrize("nc", [5, 6])
@pytest.mark.parametrize("white,iso", [(False, False), (True, False),
                                       (False, True)])
def test_fused_pose_grads_match_xla_autodiff(nc, white, iso):
    cam, g, rs, bins = _setup(white=white, iso=iso)
    valid = tile_pixel_valid(cam)
    key = jax.random.PRNGKey(11)
    wgrid = jax.random.normal(key, (cam.n_tiles, nc, valid.shape[1]))
    wgrid = wgrid * valid[:, None, :]

    def loss_fused(q, T):
        out = render_tiles_pose(g, q, T, rs, bins, nc=nc, interpret=True)
        return jnp.sum(out * wgrid)

    def loss_general(q, T):
        pose = jnp.concatenate([q, T])
        out = render(g, pose, rs, bins=None)  # XLA compositor, own bins
        img6 = jnp.concatenate([out["render"], out["depth"]], axis=0)
        return jnp.sum(to_tiles(img6, cam)[:, :nc] * wgrid)

    q, T = POSE[:4], POSE[4:]
    lf, (gq_f, gt_f) = jax.value_and_grad(loss_fused, argnums=(0, 1))(q, T)
    lg, (gq_g, gt_g) = jax.value_and_grad(loss_general, argnums=(0, 1))(q, T)

    np.testing.assert_allclose(float(lf), float(lg), rtol=2e-5)
    for a, b, name in ((gq_f, gq_g, "dq"), (gt_f, gt_g, "dT")):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-4 * scale,
                                   err_msg=name)


def test_fused_pose_grads_zero_map_cotangents_dce():
    """grad w.r.t. pose only must not fail, and the fused loss value must
    match the general pallas-free forward exactly (same forward kernel as
    render_tiles — tested in test_pallas; here just the wrapper glue)."""
    cam, g, rs, bins = _setup(hw=(48, 64), n=400)
    valid = tile_pixel_valid(cam)

    def loss(q, T):
        out = render_tiles_pose(g, q, T, rs, bins, nc=6, interpret=True)
        return jnp.sum(jnp.abs(out) * valid[:, None, :])

    gq, gt = jax.grad(loss, argnums=(0, 1))(POSE[:4], POSE[4:])
    assert np.isfinite(np.asarray(gq)).all()
    assert np.isfinite(np.asarray(gt)).all()
    assert np.abs(np.asarray(gq)).max() > 0

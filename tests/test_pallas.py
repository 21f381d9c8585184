"""Pallas composite (interpret mode on CPU) vs the XLA compositor + oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm3dgs_slam_tpu.ops.binning import build_bins
from mm3dgs_slam_tpu.ops.composite import composite_tiles
from mm3dgs_slam_tpu.ops.pallas_composite import composite_tiles_pallas
from mm3dgs_slam_tpu.ops.render import RenderSettings, background, project_for_pose

from utils import allclose_report, random_scene, small_camera

IDENTITY_POSE = jnp.array([1.0, 0, 0, 0, 0, 0, 0], dtype=jnp.float32)


def _setup(seed=0, n=300, n_dead=30):
    from mm3dgs_slam_tpu.ops.pallas_composite import CHUNK

    cam = small_camera()
    g = random_scene(jax.random.PRNGKey(seed), n, cam, n_dead=n_dead)
    rs = RenderSettings(cam=cam, pair_cap=1 << 15, max_per_tile=512, chunk=16,
                        max_tiles_per_gaussian=256)
    proj = project_for_pose(g, IDENTITY_POSE, rs)
    # chunk-aligned segments: what the TPU kernel requires; the XLA
    # compositor consumes the same layout, so outputs stay comparable
    bins = build_bins(proj, cam, rs.pair_cap, rs.max_tiles_per_gaussian,
                      align=CHUNK)
    return cam, g, rs, proj, bins


@pytest.mark.parametrize("seed", [0, 1])
def test_pallas_forward_matches_xla(seed):
    cam, g, rs, proj, bins = _setup(seed)
    bg = background(rs)
    img_xla = composite_tiles(proj, bins, cam, bg, rs.max_per_tile, rs.chunk)
    img_pl = composite_tiles_pallas(proj, bins, cam, bg, interpret=True)
    assert allclose_report(img_pl, img_xla, atol=2e-5, rtol=1e-4)


def test_pallas_forward_white_bg():
    cam, g, rs, proj, bins = _setup(2)
    rs = rs._replace(white_background=True)
    bg = background(rs)
    img_xla = composite_tiles(proj, bins, cam, bg, rs.max_per_tile, rs.chunk)
    img_pl = composite_tiles_pallas(proj, bins, cam, bg, interpret=True)
    assert allclose_report(img_pl, img_xla, atol=2e-5, rtol=1e-4)


def test_pallas_backward_matches_xla():
    cam, g, rs, proj, bins = _setup(3, n=150, n_dead=10)
    bg = background(rs)
    gt = jax.random.uniform(jax.random.PRNGKey(9), (6, cam.height, cam.width))

    def loss_xla(xy, conic, opacity, feat):
        p = proj._replace(xy=xy, conic=conic, opacity=opacity, feat=feat)
        img = composite_tiles(p, bins, cam, bg, rs.max_per_tile, rs.chunk)
        return jnp.mean((img - gt) ** 2)

    def loss_pl(xy, conic, opacity, feat):
        # the pallas path consumes proj.packed (its differentiable boundary);
        # rebuild it from the component args like projection does
        packed = jnp.concatenate(
            [xy, conic, opacity[:, None], feat,
             jnp.zeros((xy.shape[0], 4), xy.dtype)], axis=1)
        p = proj._replace(xy=xy, conic=conic, opacity=opacity, feat=feat,
                          packed=packed)
        img = composite_tiles_pallas(p, bins, cam, bg, interpret=True)
        return jnp.mean((img - gt) ** 2)

    args = (proj.xy, proj.conic, proj.opacity, proj.feat)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(*args)
    gp = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(*args)
    for a, b, name in zip(gp, gx, ["xy", "conic", "op", "feat"]):
        assert allclose_report(a, b, atol=1e-5, rtol=5e-3), name


def test_pallas_bf16_grads_close_to_f32():
    """grad_bf16 emits per-pair gradients in bfloat16 before the f32
    slot-table accumulation — per-gaussian grads must stay within bf16
    rounding (~0.5% relative) of the exact path."""
    cam, g, rs, proj, bins = _setup(4, n=150, n_dead=10)
    bg = background(rs)
    gt = jax.random.uniform(jax.random.PRNGKey(11), (6, cam.height, cam.width))

    def loss(packed, bf16):
        p = proj._replace(xy=packed[:, 0:2], conic=packed[:, 2:5],
                          opacity=packed[:, 5], feat=packed[:, 6:12],
                          packed=packed)
        img = composite_tiles_pallas(p, bins, cam, bg, interpret=True,
                                     grad_bf16=bf16)
        return jnp.mean((img - gt) ** 2)

    g32 = jax.grad(lambda x: loss(x, False))(proj.packed)
    g16 = jax.grad(lambda x: loss(x, True))(proj.packed)
    scale = jnp.maximum(jnp.max(jnp.abs(g32)), 1e-12)
    assert float(jnp.max(jnp.abs(g16 - g32)) / scale) < 1e-2


def test_pallas_chan_major_matches_row_major():
    """Channel-major [T, NC, PIX] output (the tile-layout loss path) must be
    an exact re-layout of the row-major output, forward AND backward."""
    from mm3dgs_slam_tpu.ops.pallas_composite import _composite_packed

    cam, g, rs, proj, bins = _setup(5, n=150, n_dead=10)

    def run(chan_major):
        def loss(packed):
            acc, tfin = _composite_packed(
                packed, bins.pair_gauss, bins.pair_valid, bins.small_slots,
                bins.big_slots, bins.big_gauss, bins.big_valid, bins.gauss_rank,
                bins.tile_start, bins.tile_count, cam, True, False, None,
                None, chan_major)
            # identical scalar in both layouts (weights tied to channel id)
            w = jnp.arange(1.0, 7.0)
            wacc = acc * (w[None, :, None] if chan_major
                          else w[None, None, :])
            return jnp.sum(wacc) + 2.0 * jnp.sum(tfin), (acc, tfin)

        (val, (acc, tfin)), grad = jax.value_and_grad(
            loss, has_aux=True)(proj.packed)
        if chan_major:
            acc = jnp.transpose(acc, (0, 2, 1))
            tfin = jnp.transpose(tfin, (0, 2, 1))
        return val, acc, tfin, grad

    v0, a0, t0, g0 = run(False)
    v1, a1, t1, g1 = run(True)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0), rtol=1e-6)
    # gradients: the transposed-layout dots re-associate fp summation
    # (~1e-5 rel observed); forward values above are bit-exact
    scale = np.maximum(np.abs(np.asarray(g0)), 1e-3 * np.abs(g0).max())
    np.testing.assert_array_less(
        np.abs(np.asarray(g1) - np.asarray(g0)) / scale, 2e-3)


def test_pair_cap_buffer_clamp():
    """pair_cap as a STATIC buffer cap (binning round-3): a non-binding cap
    must be bit-identical to worst-case sizing; a binding cap must set
    `overflow`, keep every segment inside the usable region (so kernel
    walk/spill DMAs stay in bounds) and still composite (dropped tail pairs
    only)."""
    from mm3dgs_slam_tpu.ops.pallas_composite import CHUNK, UNROLL

    cam, g, rs, proj, bins_full = _setup(3)
    bg = background(rs)
    img_full = composite_tiles_pallas(proj, bins_full, cam, bg,
                                      interpret=True)

    # non-binding: generous cap below the worst-case size but above need
    need = int(bins_full.tile_start[-1] + bins_full.tile_count[-1])
    cap_ok = ((need + (4 + 2) * CHUNK) // CHUNK + 1) * CHUNK
    bins_ok = build_bins(proj, cam, cap_ok, rs.max_tiles_per_gaussian,
                         align=CHUNK)
    assert bins_ok.pair_gauss.shape[0] <= cap_ok
    assert not bool(bins_ok.overflow)
    img_ok = composite_tiles_pallas(proj, bins_ok, cam, bg, interpret=True)
    np.testing.assert_allclose(np.asarray(img_ok), np.asarray(img_full),
                               rtol=0, atol=0)

    # binding: half the needed space -> overflow flagged, segments clamped
    cap_tight = max((need // 2 // CHUNK) * CHUNK, 8 * CHUNK)
    bins_t = build_bins(proj, cam, cap_tight, rs.max_tiles_per_gaussian,
                        align=CHUNK)
    assert bool(bins_t.overflow)
    buf = int(bins_t.pair_gauss.shape[0])
    usable = buf - 4 * CHUNK
    starts = np.asarray(bins_t.tile_start)
    counts = np.asarray(bins_t.tile_count)
    assert (starts + counts <= usable).all()
    # walk DMA high-water mark (trip-wide reads) stays inside the buffer
    trips = -(-counts // (UNROLL * CHUNK))
    assert (starts + trips * UNROLL * CHUNK <= buf).all()
    img_t = composite_tiles_pallas(proj, bins_t, cam, bg, interpret=True)
    assert np.isfinite(np.asarray(img_t)).all()


def test_pallas_nc5_matches_nc6_prefix():
    """The nc=5 tracking walk (E[z^2] channel dropped — only splatam's
    uncertainty mask reads it, reference tracker.py:110-126) must match the
    full 6-channel walk exactly on the channels it keeps, forward AND
    backward, with an exact-zero gradient on the dropped z^2 column."""
    from mm3dgs_slam_tpu.ops.pallas_composite import _composite_packed

    cam, g, rs, proj, bins = _setup(7, n=150, n_dead=10)

    def run(nc):
        def loss(packed):
            acc, tfin = _composite_packed(
                packed, bins.pair_gauss, bins.pair_valid, bins.small_slots,
                bins.big_slots, bins.big_gauss, bins.big_valid,
                bins.gauss_rank, bins.tile_start, bins.tile_count, cam,
                True, False, None, None, True, nc)
            # scalar reads only the first 5 channels (rgb, z, sil) — the
            # loss surface vigs tracking exposes
            w = jnp.arange(1.0, 6.0)
            return (jnp.sum(acc[:, :5] * w[None, :, None])
                    + 2.0 * jnp.sum(tfin), (acc, tfin))

        (val, (acc, tfin)), grad = jax.value_and_grad(
            loss, has_aux=True)(proj.packed)
        return val, acc, tfin, grad

    v6, a6, t6, g6 = run(6)
    v5, a5, t5, g5 = run(5)
    np.testing.assert_allclose(np.asarray(a5), np.asarray(a6)[:, :5],
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(t5), np.asarray(t6), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(v5), np.asarray(v6), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g5), np.asarray(g6), rtol=0,
                               atol=0)
    # the dropped channel's packed column gets an exact-zero gradient
    assert float(jnp.abs(g5[:, 11]).max()) == 0.0

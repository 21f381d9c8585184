"""Round-4 binning fast paths: the f32 reciprocal-multiply floor divisions,
the two-level fill-forward max scan, and the reverse_tables=False variant
must be EXACTLY equivalent to the straightforward formulations they
replaced (they are perf rewrites, not approximations — build_bins is a
selection whose output feeds bit-exact compositor parity tests)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm3dgs_slam_tpu.ops.binning import (_candidate_tiles, _fill_forward_max,
                                         _tile_alpha_cull, build_bins)


def test_candidate_tiles_f32_div_exact():
    """dy = floor((d+0.5)/w) must equal d // w for every (d, w) the
    kernel can see (d < n_slots <= 64, w in [1, 64])."""
    rng = np.random.default_rng(0)
    n_slots = 64
    w = np.concatenate([np.arange(1, 65), rng.integers(1, 65, size=500)])
    n = w.shape[0]
    x0 = rng.integers(0, 30, size=n).astype(np.int32)
    y0 = rng.integers(0, 20, size=n).astype(np.int32)
    count = rng.integers(0, n_slots + 1, size=n).astype(np.int32)
    tiles_x = 40
    got = np.asarray(_candidate_tiles(
        jnp.asarray(x0), jnp.asarray(w, jnp.int32), jnp.asarray(y0),
        jnp.asarray(count), n_slots, tiles_x))
    d = np.arange(n_slots)[None, :]
    wv = np.maximum(w, 1)[:, None]
    dy = d // wv
    dx = d - dy * wv
    want = (y0[:, None] + dy) * tiles_x + (x0[:, None] + dx)
    want = np.where(d < count[:, None], want, -1)
    np.testing.assert_array_equal(got, want)


def test_tile_cull_f32_split_matches_int():
    """The f32 tile-id -> (tx, ty) split (n_tiles passed) must select the
    same cull set as the integer-division path (n_tiles=None)."""
    rng = np.random.default_rng(1)
    n, d = 400, 16
    tiles_x, tiles_y = 40, 30
    tile = rng.integers(-1, tiles_x * tiles_y, size=(n, d)).astype(np.int32)
    xy = rng.uniform(0, 640, size=(n, 2)).astype(np.float32)
    # PD conics
    a = rng.uniform(0.05, 2.0, size=n).astype(np.float32)
    c = rng.uniform(0.05, 2.0, size=n).astype(np.float32)
    b = (rng.uniform(-0.9, 0.9, size=n) * np.sqrt(a * c)).astype(np.float32)
    conic = np.stack([a, b, c], axis=1)
    tau = np.log(255.0 * rng.uniform(0.01, 1.0, size=n)).astype(np.float32)
    got_fast = np.asarray(_tile_alpha_cull(
        jnp.asarray(tile), jnp.asarray(xy), jnp.asarray(conic),
        jnp.asarray(tau), tiles_x, n_tiles=tiles_x * tiles_y))
    got_int = np.asarray(_tile_alpha_cull(
        jnp.asarray(tile), jnp.asarray(xy), jnp.asarray(conic),
        jnp.asarray(tau), tiles_x))
    np.testing.assert_array_equal(got_fast, got_int)


@pytest.mark.parametrize("p", [1, 127, 128, 129, 4096, 4097, 70001])
def test_fill_forward_max_matches_scan(p):
    rng = np.random.default_rng(p)
    steps = np.zeros(p, np.int32)
    idx = rng.integers(0, p, size=max(p // 50, 1))
    steps[idx] = rng.integers(0, 1 << 20, size=idx.shape[0])
    want = np.maximum.accumulate(steps)
    got = np.asarray(_fill_forward_max(jnp.asarray(steps)))
    np.testing.assert_array_equal(got, want)


def _random_proj(n, seed, cam):
    from mm3dgs_slam_tpu.ops.render import project_for_pose, RenderSettings
    from __graft_entry__ import _build_scene

    m, cam = _build_scene(n, cam_hw=(cam.height, cam.width))
    rs = RenderSettings(cam=cam, pair_cap=1 << 14, max_per_tile=256,
                        chunk=16, max_tiles_per_gaussian=16, use_pallas=True,
                        bin_d1=4, bin_big_frac=7, bin_d2_live=8)
    pose = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)
    return project_for_pose(m.activated(), pose, rs), cam, rs


def test_reverse_tables_off_shares_pair_layout():
    """build_bins(reverse_tables=False) must produce the identical pair
    buffer / segment bounds / overflow as the default — only the slot
    tables are absent."""
    from mm3dgs_slam_tpu.ops.camera import Camera

    cam = Camera(height=120, width=160, fx=90.0, fy=90.0, cx=79.5, cy=59.5)
    proj, cam, rs = _random_proj(1 << 11, 0, cam)
    kw = dict(pair_cap=rs.pair_cap,
              max_tiles_per_gaussian=rs.max_tiles_per_gaussian,
              align=32, d1=4, big_frac=7, d2_live=8)
    full = build_bins(proj, cam, **kw)
    slim = build_bins(proj, cam, reverse_tables=False, **kw)
    np.testing.assert_array_equal(np.asarray(full.pair_gauss),
                                  np.asarray(slim.pair_gauss))
    np.testing.assert_array_equal(np.asarray(full.pair_valid),
                                  np.asarray(slim.pair_valid))
    np.testing.assert_array_equal(np.asarray(full.tile_start),
                                  np.asarray(slim.tile_start))
    np.testing.assert_array_equal(np.asarray(full.tile_count),
                                  np.asarray(slim.tile_count))
    assert int(full.n_pairs) == int(slim.n_pairs)
    assert bool(full.overflow) == bool(slim.overflow)
    assert full.small_slots is not None and slim.small_slots is None


def test_pair_cap_slice_matches_unsliced_when_no_overflow():
    """The pair_cap candidate-stream slice must be behavior-invisible when
    the buffer fits: same pair buffer as a build with a roomy cap."""
    from mm3dgs_slam_tpu.ops.camera import Camera

    cam = Camera(height=120, width=160, fx=90.0, fy=90.0, cx=79.5, cy=59.5)
    proj, cam, rs = _random_proj(1 << 11, 0, cam)
    kw = dict(max_tiles_per_gaussian=16, align=32, d1=4, big_frac=7,
              d2_live=8)
    roomy = build_bins(proj, cam, pair_cap=0, **kw)
    capped = build_bins(proj, cam, pair_cap=1 << 14, **kw)
    assert not bool(capped.overflow)
    n = capped.pair_gauss.shape[0]
    np.testing.assert_array_equal(np.asarray(roomy.pair_gauss[:n]),
                                  np.asarray(capped.pair_gauss))
    np.testing.assert_array_equal(np.asarray(roomy.tile_start),
                                  np.asarray(capped.tile_start))
    # slot tables agree on live entries (sentinels may differ in value
    # only if OOB either way — both gather as zero); here no overflow so
    # they must be identical
    np.testing.assert_array_equal(np.asarray(roomy.small_slots),
                                  np.asarray(capped.small_slots))

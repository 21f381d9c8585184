#!/usr/bin/env python
"""True device cost of build_bins (round 4). The map-decomp probe timed it
as ONE dispatch+fetch per rep — which measures the ~25-35 ms tunnel round
trip, not the op (CLAUDE.md gotcha 5). Here each rep chains K builds whose
outputs feed the next build's pose perturbation (serial on device, no
dedupe) and fetches once; a null chain (same structure, build replaced by
a cheap op) is subtracted.

Also stage-decomposes the build with the same chaining: S1 cull,
S2 +row-compaction, S3 +fused sort, S4 +aligned scatter, S5 full.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

K = 10       # chained builds per dispatch-chain
REPS = 5
N = 1 << 17


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_scene
    from mm3dgs_slam_tpu.ops import binning as B
    from mm3dgs_slam_tpu.ops.pallas_composite import CHUNK
    from mm3dgs_slam_tpu.ops.render import RenderSettings, project_for_pose

    m, cam = _build_scene(N, cam_hw=(480, 640))
    g = m.activated()
    rs = RenderSettings(cam=cam, pair_cap=1 << 19, max_per_tile=1024,
                        chunk=32, max_tiles_per_gaussian=16, use_pallas=True,
                        bin_d1=4, bin_big_frac=7, bin_d2_live=8)
    base = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)

    D2 = 16

    def proj_of(s):
        return project_for_pose(g, base.at[4].add(s * 1e-5), rs)

    def stage(proj, upto):
        """Re-run build_bins' pipeline up to a stage, returning a scalar."""
        xy = proj.xy
        depth = proj.depth
        radius = jnp.where(proj.opacity >= (1.0 / 255.0), proj.radius, 0)
        order = jnp.argsort(
            jnp.where(radius > 0, depth, jnp.inf)).astype(jnp.int32)
        xy = xy[order]
        radius = radius[order]
        x0, x1, y0, y1 = B.gaussian_tile_rect(xy, radius, cam.tiles_x,
                                              cam.tiles_y)
        rect_w = jnp.maximum(x1 - x0, 0)
        rect_h = jnp.maximum(y1 - y0, 0)
        count = jnp.minimum(jnp.where(radius > 0, rect_w * rect_h, 0), D2)
        tileA = B._candidate_tiles(x0, rect_w, y0, count, D2, cam.tiles_x)
        conic = proj.conic[order]
        op = proj.opacity[order]
        tau = jnp.log(jnp.maximum(255.0 * op, 1e-12))
        tileA = B._tile_alpha_cull(tileA, xy, conic, tau, cam.tiles_x)
        if upto == 1:
            return jnp.sum((tileA >= 0).astype(jnp.int32)).astype(jnp.float32)
        d_iota = jnp.broadcast_to(
            jnp.arange(D2, dtype=jnp.int32)[None, :], tileA.shape)
        ckey = jnp.where(tileA >= 0, d_iota, jnp.int32(1 << 30))
        _, tileA = jax.lax.sort((ckey, tileA), num_keys=1, dimension=1)
        count_kept = jnp.sum((tileA >= 0).astype(jnp.int32), axis=1)
        if upto == 2:
            return jnp.sum(count_kept).astype(jnp.float32)
        is_big = count_kept > 4
        tile1 = jnp.where(is_big[:, None], -1, tileA[:, :4])
        big_cap = max(N // 7, 1)
        big_sel = jnp.argsort(~is_big, stable=True).astype(jnp.int32)[:big_cap]
        big_valid = is_big[big_sel]
        tile2 = jnp.where(big_valid[:, None], tileA[big_sel][:, :8], -1)
        n_tiles = cam.tiles_x * cam.tiles_y
        n_pad = N
        sentinel = n_tiles * n_pad
        rank1 = jnp.arange(N, dtype=jnp.int32)[:, None]
        rank2 = big_sel[:, None]
        gauss1 = jnp.broadcast_to(order[:, None], tile1.shape)
        gauss2 = jnp.broadcast_to(order[big_sel][:, None], tile2.shape)
        cand_gauss = jnp.concatenate([gauss1.reshape(-1), gauss2.reshape(-1)])
        P = cand_gauss.shape[0]
        cand_idx = jnp.arange(P, dtype=jnp.int32)
        key1 = jnp.where(tile1 >= 0, tile1 * n_pad + rank1, sentinel)
        key2 = jnp.where(tile2 >= 0, tile2 * n_pad + rank2, sentinel)
        keys = jnp.concatenate([key1.reshape(-1), key2.reshape(-1)])
        keys, pair_gauss, pair_cand = jax.lax.sort(
            (keys, cand_gauss, cand_idx), num_keys=1, is_stable=True)
        pair_tile = jnp.where(keys < sentinel, keys // n_pad, n_tiles)
        if upto == 3:
            return jnp.sum(pair_tile % 7).astype(jnp.float32)
        pair_valid = pair_tile < n_tiles
        tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
        tile_start = jnp.searchsorted(pair_tile, tile_ids,
                                      side="left").astype(jnp.int32)
        tile_end = jnp.searchsorted(pair_tile, tile_ids,
                                    side="right").astype(jnp.int32)
        tile_count = tile_end - tile_start
        align = CHUNK
        aligned_sizes = ((tile_count + align - 1) // align) * align
        aligned_start = (jnp.cumsum(aligned_sizes)
                         - aligned_sizes).astype(jnp.int32)
        buf_cap = P + n_tiles * align + 4 * align
        delta = aligned_start - tile_start
        steps = jnp.zeros((P,), jnp.int32).at[tile_start].max(
            delta, mode="drop")
        pair_delta = jax.lax.associative_scan(jnp.maximum, steps)
        target = jnp.where(pair_valid,
                           jnp.arange(P, dtype=jnp.int32) + pair_delta,
                           buf_cap)
        pg = jnp.full((buf_cap,), N, jnp.int32).at[target].set(
            pair_gauss, mode="drop")
        if upto == 4:
            return jnp.sum((pg < N).astype(jnp.int32)).astype(jnp.float32)
        _, slot_of_cand = jax.lax.sort(
            (pair_cand, jnp.where(pair_valid, target, B.SLOT_SENTINEL)),
            num_keys=1)
        small_depth_order = slot_of_cand[: N * 4].reshape(N, 4)
        rank_of = jnp.zeros((N,), jnp.int32).at[order].set(
            jnp.arange(N, dtype=jnp.int32))
        small_slots = small_depth_order[rank_of]
        return (jnp.sum(pg % 13) + jnp.sum(small_slots % 13)).astype(
            jnp.float32)

    def full_bins(proj):
        bins = B.build_bins(proj, cam, rs.pair_cap,
                            rs.max_tiles_per_gaussian, align=CHUNK,
                            d1=4, big_frac=7, d2_live=8)
        return bins.n_pairs.astype(jnp.float32)

    def chain(fn):
        @jax.jit
        def run(s0):
            def body(i, s):
                return s + fn(proj_of(s * 1e-9 + i))
            return jax.lax.fori_loop(0, K, body, s0)
        return run

    variants = {
        "null": chain(lambda proj: jnp.sum(proj.xy[:64, 0])),
        "S1_cull": chain(lambda p: stage(p, 1)),
        "S2_rowsort": chain(lambda p: stage(p, 2)),
        "S3_fusedsort": chain(lambda p: stage(p, 3)),
        "S4_scatter": chain(lambda p: stage(p, 4)),
        "S5_full_inline": chain(lambda p: stage(p, 5)),
        "S6_build_bins": chain(full_bins),
    }
    times = {k: [] for k in variants}
    for rep in range(REPS):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            out = fn(jnp.float32(rep + 1))
            float(out)
            dt = time.perf_counter() - t0
            if rep:
                times[name].append(dt)
            print(f"rep {rep} {name}: {dt / K * 1e3:.2f} ms/call")
    base_t = sorted(times["null"])[len(times["null"]) // 2]
    print()
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: median {med / K * 1e3:.2f} ms/call "
              f"({(med - base_t) / K * 1e3:+.2f} vs null)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B the slot-table reduce's gather ORDER in one process (tunnel-variance
safe): depth-ordered small_slots rows + final [N, NF] un-permute gather
(round-3 lever 1) vs the round-2 original-id-keyed rows. Also splits E into
bwd-kernel-only and reduce-only.

Methodology per CLAUDE.md: single-dispatch jitted 20-iter fori loops, varied
input scale per rep, one fetched scalar."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_ITERS = 20
REPS = 6


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_scene
    from mm3dgs_slam_tpu.ops.binning import build_bins
    from mm3dgs_slam_tpu.ops.pallas_composite import (
        CHUNK, _composite_pallas_bwd_rows, _composite_pallas_fwd,
        _table_reduce)
    from mm3dgs_slam_tpu.ops.render import RenderSettings, project_for_pose

    m, cam = _build_scene(1 << 17, cam_hw=(480, 640))
    g = m.activated()
    rs = RenderSettings(cam=cam, pair_cap=1 << 20, max_per_tile=1024,
                        chunk=32, max_tiles_per_gaussian=16, use_pallas=True,
                        bin_d1=4, bin_big_frac=7, bin_d2_live=8)
    base = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)
    bins = jax.jit(lambda p: build_bins(
        project_for_pose(g, p, rs), cam, 0, rs.max_tiles_per_gaussian,
        align=CHUNK, d1=rs.bin_d1, big_frac=rs.bin_big_frac,
        d2_live=rs.bin_d2_live, depth_tables=True))(base)
    print(f"pairs={int(bins.n_pairs)} buf={bins.pair_gauss.shape[0]}")

    packed0 = jax.jit(lambda p: project_for_pose(g, p, rs))(base).packed
    rows0 = jax.jit(lambda: jnp.asarray(
        packed0, jnp.float32).at[bins.pair_gauss].get(
            mode="fill", fill_value=0.0).T)()
    acc0, tfin0 = _composite_pallas_fwd(rows0, bins.tile_start,
                                        bins.tile_count, rs.cam)
    dpair0 = _composite_pallas_bwd_rows(
        rows0, bins.tile_start, bins.tile_count, acc0, tfin0,
        jnp.ones_like(acc0), jnp.ones_like(tfin0), rs.cam)
    jax.block_until_ready(dpair0)

    # round-2 layout reconstructed from the depth-ordered tables
    small_orig = bins.small_slots[bins.gauss_rank]
    jax.block_until_ready(small_orig)

    def loop(body, tag):
        def seg(s0):
            def b(j, c):
                s, acc = c
                return (s + 1e-12 * body(s), acc + body(s) * 0.0)

            return jax.lax.fori_loop(0, N_ITERS, b, (s0, jnp.float32(0.0)))[0]

        f = jax.jit(seg)
        float(f(jnp.float32(1.0)))
        times = []
        for i in range(REPS):
            t0 = time.perf_counter()
            float(f(jnp.float32(1.0 + 1e-4 * (i + 1))))
            times.append((time.perf_counter() - t0) / N_ITERS * 1e3)
        print(f"{tag}: {sorted(times)[len(times)//2]:.2f} ms/iter "
              f"(min {min(times):.2f})", flush=True)

    def red_depth(s):
        return jnp.sum(_table_reduce(dpair0 * s, bins.small_slots,
                                     bins.big_slots, bins.big_gauss,
                                     bins.big_valid, bins.gauss_rank))

    def red_orig(s):
        return jnp.sum(_table_reduce(dpair0 * s, small_orig,
                                     bins.big_slots, bins.big_gauss,
                                     bins.big_valid, None))

    def bwd_only(s):
        d = _composite_pallas_bwd_rows(
            rows0 * s, bins.tile_start, bins.tile_count, acc0, tfin0,
            jnp.full_like(acc0, s), jnp.full_like(tfin0, s), rs.cam)
        return jnp.sum(d[:, :128])

    loop(red_depth, "reduce DEPTH-ordered + unpermute")
    loop(red_orig, "reduce ORIGINAL-id keyed        ")
    loop(bwd_only, "bwd kernel only                 ")
    loop(red_depth, "reduce DEPTH-ordered (again)    ")
    loop(red_orig, "reduce ORIGINAL-id (again)      ")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Isolate the Pallas compositor's PER-PROGRAM fixed cost (grid setup,
output-block DMA, scalar reads) from its per-chunk walk cost.

Three same-process measurements of the fwd kernel on the bench scene:
  1. real bins                    (n_programs * prog_cost + n_chunks * chunk_cost)
  2. zero-length segments         (n_programs * prog_cost; every tile_count=0)
  3. same pairs in HALF the tiles (the tile window trick: n_programs/2, same
     chunk total) — cross-checks the linear model from 1+2.

If prog_cost * n_programs is a material slice of the 7.4 ms fwd unit, a
merged-segments kernel (k tiles per program) is worth building; if the walk
dominates, that lever is closed (VERDICT round-2 next-step 2a).

Methodology per CLAUDE.md: single-dispatch jitted N-iter fori loops, varied
input scale per rep, one fetched scalar.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_ITERS = 20
REPS = 5


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_scene
    from mm3dgs_slam_tpu.ops.binning import build_bins
    from mm3dgs_slam_tpu.ops.pallas_composite import (
        CHUNK, _composite_pallas_fwd)
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
        d2_live=rs.bin_d2_live))(base)
    import numpy as np
    counts = np.asarray(bins.tile_count)
    n_tiles = counts.shape[0]
    n_chunks = int((-(-counts // CHUNK)).sum())
    print(f"tiles={n_tiles} pairs={int(bins.n_pairs)} chunks={n_chunks} "
          f"buf={bins.pair_gauss.shape[0]}")

    packed0 = jax.jit(lambda p: project_for_pose(g, p, rs))(base).packed
    rows0 = jax.jit(lambda: jnp.asarray(
        packed0, jnp.float32).at[bins.pair_gauss].get(
            mode="fill", fill_value=0.0).T)()
    jax.block_until_ready(rows0)

    zero_counts = jnp.zeros_like(bins.tile_count)

    def loop_fwd(tile_start, tile_count, tag, n_local=None, tile_lo=None):
        def seg(s0):
            def b(j, c):
                s, acc = c
                a, tf = _composite_pallas_fwd(
                    rows0 * s, tile_start, tile_count, rs.cam,
                    tile_lo=tile_lo, n_local=n_local)
                return s * 1.000001, acc + a[0, 0, 0] + tf[0, 0, 0]
            return jax.lax.fori_loop(0, N_ITERS, b, (s0, jnp.float32(0.0)))

        f = jax.jit(seg)
        float(f(jnp.float32(1.0))[1])  # compile + warm
        best = 1e9
        for r in range(REPS):
            t0 = time.perf_counter()
            float(f(jnp.float32(1.0 + 1e-6 * r))[1])
            dt = (time.perf_counter() - t0) / N_ITERS * 1e3
            best = min(best, dt)
        print(f"{tag}: {best:.3f} ms/iter")
        return best

    t_real = loop_fwd(bins.tile_start, bins.tile_count, "fwd real bins      ")
    t_zero = loop_fwd(bins.tile_start, zero_counts, "fwd zero segments  ")
    # half the grid, same front half of the pairs (window path): isolates
    # how cost scales with program count at fixed chunk math
    half = n_tiles // 2
    t_half = loop_fwd(bins.tile_start[:half], bins.tile_count[:half],
                      "fwd half window    ", n_local=half,
                      tile_lo=jnp.zeros((1,), jnp.int32))
    chunks_half = int((-(-counts[:half] // CHUNK)).sum())

    prog_us = t_zero / n_tiles * 1e3
    walk = t_real - t_zero
    chunk_us = walk / max(n_chunks, 1) * 1e3
    print(f"\nper-program fixed cost ~{prog_us:.2f} us "
          f"({t_zero:.2f} ms over {n_tiles} programs = "
          f"{100 * t_zero / t_real:.0f}% of the real fwd)")
    print(f"per-chunk walk cost ~{chunk_us:.2f} us over {n_chunks} chunks")
    pred_half = t_zero * half / n_tiles + chunk_us * chunks_half / 1e3
    print(f"half-window check: measured {t_half:.2f} vs linear-model "
          f"{pred_half:.2f} ms ({chunks_half} chunks)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Post-optimization build_bins timing (round 4): the REAL build_bins with
its outputs force-materialized (probe_bins_cost's S6 consumed only n_pairs
and XLA DCE'd the whole relayout). Chained-dispatch method as before."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

K = 10
REPS = 5
N = 1 << 17


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_scene
    from mm3dgs_slam_tpu.ops.binning import build_bins
    from mm3dgs_slam_tpu.ops.pallas_composite import CHUNK
    from mm3dgs_slam_tpu.ops.render import RenderSettings, project_for_pose

    m, cam = _build_scene(N, cam_hw=(480, 640))
    g = m.activated()
    rs = RenderSettings(cam=cam, pair_cap=1 << 19, max_per_tile=1024,
                        chunk=32, max_tiles_per_gaussian=16, use_pallas=True,
                        bin_d1=4, bin_big_frac=7, bin_d2_live=8)
    base = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)

    def proj_of(s):
        return project_for_pose(g, base.at[4].add(s * 1e-5), rs)

    def consume(bins):
        out = (jnp.sum(bins.pair_gauss % 13)
               + jnp.sum(bins.tile_start % 13)
               + bins.n_pairs)
        if bins.small_slots is not None:
            out = out + jnp.sum(bins.small_slots % 13) + jnp.sum(
                bins.big_slots % 13)
        return out.astype(jnp.float32)

    def with_tables(p):
        return consume(build_bins(p, cam, rs.pair_cap,
                                  rs.max_tiles_per_gaussian, align=CHUNK,
                                  d1=4, big_frac=7, d2_live=8))

    def without_tables(p):
        return consume(build_bins(p, cam, rs.pair_cap,
                                  rs.max_tiles_per_gaussian, align=CHUNK,
                                  d1=4, big_frac=7, d2_live=8,
                                  reverse_tables=False))

    def chain(fn):
        @jax.jit
        def run(s0):
            def body(i, s):
                return s + fn(proj_of(s * 1e-9 + i))
            return jax.lax.fori_loop(0, K, body, s0)
        return run

    variants = {
        "null": chain(lambda p: jnp.sum(p.xy[:64, 0])),
        "tables": chain(with_tables),
        "no_tables": chain(without_tables),
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
            print(f"rep {rep} {name}: {dt / K * 1e3:.2f} ms/call",
                  flush=True)
    base_t = sorted(times["null"])[len(times["null"]) // 2]
    print()
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: median {med / K * 1e3:.2f} ms/call "
              f"({(med - base_t) / K * 1e3:+.2f} vs null)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Decompose the slot-table reduce (the ~7 ms/iter backward-unit component)
into its stages, each as a single-dispatch 20-iter fori loop on the bench
scene. Theoretical bandwidth for the whole reduce is ~0.35 ms — this probe
finds which stage eats the other ~6.5.

Stages: input scale (control), HBM transpose [NF,P]->[P,NF], slot gather,
reshape-sums + scatter-add, and the full _table_reduce; plus bf16-input and
pair_cap-tightened variants."""
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
        CHUNK, NF, _composite_pallas_bwd_rows, _composite_pallas_fwd,
        _table_reduce)
    from mm3dgs_slam_tpu.ops.render import RenderSettings, project_for_pose

    m, cam = _build_scene(1 << 17, cam_hw=(480, 640))
    g = m.activated()
    rs = RenderSettings(cam=cam, pair_cap=1 << 20, max_per_tile=1024,
                        chunk=32, max_tiles_per_gaussian=16, use_pallas=True,
                        bin_d1=4, bin_big_frac=7, bin_d2_live=8)
    base = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)

    def mkbins(cap):
        return jax.jit(lambda p: build_bins(
            project_for_pose(g, p, rs), cam, cap, rs.max_tiles_per_gaussian,
            align=CHUNK, d1=rs.bin_d1, big_frac=rs.bin_big_frac,
            d2_live=rs.bin_d2_live))(base)

    bins = mkbins(0)
    print(f"pairs={int(bins.n_pairs)} buf={bins.pair_gauss.shape[0]} "
          f"overflow={bool(bins.overflow)}")

    packed0 = jax.jit(lambda p: project_for_pose(g, p, rs))(base).packed

    def mk_dpair(b):
        rows = jnp.asarray(packed0, jnp.float32).at[b.pair_gauss].get(
            mode="fill", fill_value=0.0).T
        acc0, tfin0 = _composite_pallas_fwd(rows, b.tile_start, b.tile_count,
                                            rs.cam)
        return _composite_pallas_bwd_rows(
            rows, b.tile_start, b.tile_count, acc0, tfin0,
            jnp.ones_like(acc0), jnp.ones_like(tfin0), rs.cam)

    dpair0 = mk_dpair(bins)
    jax.block_until_ready(dpair0)
    idx = jnp.concatenate([bins.small_slots.reshape(-1),
                           bins.big_slots.reshape(-1)])
    rowmaj0 = jax.jit(lambda d: jax.lax.optimization_barrier(d.T))(dpair0)
    jax.block_until_ready(rowmaj0)

    def loop(body, tag):
        def seg(s0):
            def b(j, c):
                s, acc = c
                return (s + 1e-12 * body(s), acc)

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

    def scale_only(s):
        y = jax.lax.optimization_barrier(dpair0 * s)
        return y[0, 0] + y[NF - 1, -1]

    def transpose(s):
        y = jax.lax.optimization_barrier((dpair0 * s).T)
        return y[0, 0] + y[-1, NF - 1]

    def transpose_gather(s):
        y = jax.lax.optimization_barrier((dpair0 * s).T)
        gth = jax.lax.optimization_barrier(
            y.at[idx].get(mode="fill", fill_value=0))
        return gth[0, 0] + gth[-1, NF - 1]

    def gather_only(s):
        y = jax.lax.optimization_barrier(rowmaj0 * s)
        gth = jax.lax.optimization_barrier(
            y.at[idx].get(mode="fill", fill_value=0))
        return gth[0, 0] + gth[-1, NF - 1]

    def full(s):
        out = _table_reduce(dpair0 * s, bins.small_slots, bins.big_slots,
                            bins.big_gauss, bins.big_valid)
        return jnp.sum(out)

    loop(scale_only, "A scale+barrier only (control)  ")
    loop(transpose, "B  + HBM transpose              ")
    loop(transpose_gather, "C  + slot gather                ")
    loop(full, "D full _table_reduce            ")
    loop(gather_only, "E gather from pre-transposed    ")

    dpair16 = dpair0.astype(jnp.bfloat16)
    jax.block_until_ready(dpair16)

    def full16(s):
        out = _table_reduce(dpair16 * jnp.bfloat16(s), bins.small_slots,
                            bins.big_slots, bins.big_gauss, bins.big_valid)
        return jnp.sum(out)

    loop(full16, "F full reduce, bf16 dpair       ")

    capped = mkbins(1 << 19)
    print(f"capped buf={capped.pair_gauss.shape[0]} "
          f"overflow={bool(capped.overflow)}")
    dpair_c = mk_dpair(capped)
    jax.block_until_ready(dpair_c)

    def full_capped(s):
        out = _table_reduce(dpair_c * s, capped.small_slots, capped.big_slots,
                            capped.big_gauss, capped.big_valid)
        return jnp.sum(out)

    loop(full_capped, "G full reduce, pair_cap 512k    ")


if __name__ == "__main__":
    main()

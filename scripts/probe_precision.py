#!/usr/bin/env python
"""Probe: in-kernel matmul precision (MXU pass count) vs speed + accuracy.

TPU f32 dots decompose into bf16 MXU passes (DEFAULT=1, HIGH=3, HIGHEST=6).
The compositor runs 3 dots per fwd chunk and 6 per bwd chunk, all HIGHEST;
this measures what the passes cost and what accuracy each tier loses, all
WITHIN ONE PROCESS (tunnel throughput varies ±30% between runs) by swapping
pallas_composite._PREC and clearing jit caches between variants.

Timing: single-dispatch 20-iteration fori loops (ground-truth methodology,
CLAUDE.md gotcha 15); accuracy: fwd image + packed-grad max|Δ| vs HIGHEST.
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
    from mm3dgs_slam_tpu.ops import pallas_composite as pc
    from mm3dgs_slam_tpu.ops.render import RenderSettings, project_for_pose

    m, cam = _build_scene(1 << 17, cam_hw=(480, 640))
    g = m.activated()
    rs = RenderSettings(cam=cam, pair_cap=1 << 20, max_per_tile=1024,
                        chunk=32, max_tiles_per_gaussian=16, use_pallas=True,
                        bin_d1=4, bin_big_frac=7, bin_d2_live=8)
    base = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)
    bins = jax.jit(lambda p: build_bins(
        project_for_pose(g, p, rs), cam, 0, rs.max_tiles_per_gaussian,
        align=pc.CHUNK, d1=rs.bin_d1, big_frac=rs.bin_big_frac,
        tight_cull=True, d2_live=rs.bin_d2_live))(base)
    packed0 = jax.jit(lambda p: project_for_pose(g, p, rs))(base).packed
    jax.block_until_ready(packed0)
    chunks = int(jnp.sum(-(-bins.tile_count // pc.CHUNK)))
    print(f"pairs={int(bins.n_pairs)} chunks={chunks}")

    def fwd_loss(sv):
        acc, tfin = pc._composite_packed(
            packed0 * sv, bins.pair_gauss, bins.pair_valid,
            bins.small_slots, bins.big_slots, bins.big_gauss,
            bins.big_valid, bins.gauss_rank, bins.tile_start, bins.tile_count,
            rs.cam, False)
        return jnp.sum(acc) + jnp.sum(tfin)

    def loop(body, tag):
        def seg(s0):
            def b(j, c):
                s, acc = c
                l = body(s)
                return (s + 1e-12 * l, acc + l)
            return jax.lax.fori_loop(0, N_ITERS, b, (s0, jnp.float32(0.0)))[1]
        f = jax.jit(seg)
        float(f(jnp.float32(1.0)))
        times = []
        for i in range(REPS):
            t0 = time.perf_counter()
            float(f(jnp.float32(1.0 + 1e-4 * (i + 1))))
            times.append((time.perf_counter() - t0) / N_ITERS * 1e3)
        med = sorted(times)[len(times) // 2]
        print(f"  {tag}: {med:.2f} ms/iter (min {min(times):.2f})")
        return med

    def outputs():
        acc, tfin = jax.jit(lambda p: pc._composite_packed(
            p, bins.pair_gauss, bins.pair_valid, bins.small_slots,
            bins.big_slots, bins.big_gauss, bins.big_valid, bins.gauss_rank,
            bins.tile_start, bins.tile_count, rs.cam, False))(packed0)
        gr = jax.jit(jax.grad(fwd_loss))(jnp.float32(1.0))
        gp = jax.jit(lambda p: jax.grad(
            lambda pp: fwd_loss_packed(pp))(p))(packed0)
        return (jax.device_get(acc), jax.device_get(tfin),
                float(gr), jax.device_get(gp))

    def fwd_loss_packed(pp):
        acc, tfin = pc._composite_packed(
            pp, bins.pair_gauss, bins.pair_valid,
            bins.small_slots, bins.big_slots, bins.big_gauss,
            bins.big_valid, bins.gauss_rank, bins.tile_start, bins.tile_count,
            rs.cam, False)
        return jnp.sum(acc ** 2) + jnp.sum(tfin ** 2)

    import numpy as np
    ref = None
    # NOTE: Mosaic's dot lowering supports only DEFAULT and HIGHEST
    # (lowering.py:2254 raises on HIGH); a manual bf16 operand-splitting
    # scheme measured SLOWER than HIGHEST (see PROFILE.md). "mixed" =
    # value dots HIGHEST, gradient dots DEFAULT.
    H, D = jax.lax.Precision.HIGHEST, jax.lax.Precision.DEFAULT
    for name, prec, gprec in (("highest", H, H), ("mixed", H, D),
                              ("default", D, D)):
        pc._PREC = prec
        pc._GPREC = gprec
        pc._PREC_MODE = name
        jax.clear_caches()
        print(f"precision={name}")
        loop(lambda s: jax.grad(fwd_loss)(s), "fwd+bwd")
        loop(fwd_loss, "fwd only")
        out = outputs()
        if ref is None:
            ref = out
        else:
            acc_d = np.max(np.abs(out[0] - ref[0]))
            rel = acc_d / max(np.max(np.abs(ref[0])), 1e-9)
            tfin_d = np.max(np.abs(out[1] - ref[1]))
            d = np.abs(out[3] - ref[3])
            scale = np.abs(ref[3]) + 1e-3 * np.max(np.abs(ref[3]))
            r = (d / scale).ravel()
            q = np.percentile(r, [50, 99, 99.9, 100])
            gp_d = np.max(d)
            gp_rel = gp_d / max(np.max(np.abs(ref[3])), 1e-9)
            print(f"  vs highest: acc max|d|={acc_d:.3e} (rel {rel:.2e}) "
                  f"tfin max|d|={tfin_d:.3e} dpacked max|d|={gp_d:.3e} "
                  f"(rel {gp_rel:.2e})")
            print(f"  dpacked |d|/scale p50={q[0]:.1e} p99={q[1]:.1e} "
                  f"p99.9={q[2]:.1e} max={q[3]:.1e}")


if __name__ == "__main__":
    main()

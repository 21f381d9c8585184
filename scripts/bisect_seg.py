#!/usr/bin/env python
"""Perf bisect: time ONLY the 20-iteration jitted tracker segment (the
ground-truth loop) with grad_bf16 on and off, under the current env knobs
(MM3DGS_PL_STOP_GUARD / MM3DGS_PL_CHUNK). Run twice with the env toggled to
A/B a kernel variant; the segment is a single dispatch so host load barely
matters."""
import os
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
    from mm3dgs_slam_tpu.ops.pallas_composite import CHUNK
    from mm3dgs_slam_tpu.ops.render import RenderSettings, render, \
        project_for_pose
    from mm3dgs_slam_tpu.slam.tracker import TrackSettings, _track_segment

    print(f"CHUNK={CHUNK}")
    m, cam = _build_scene(1 << 17, cam_hw=(480, 640))
    g = m.activated()
    rs = RenderSettings(cam=cam, pair_cap=1 << 20, max_per_tile=1024,
                        chunk=32, max_tiles_per_gaussian=16, use_pallas=True,
                        bin_d1=8, bin_big_frac=7)
    base = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)

    seg_cap = int(os.environ.get("MM3DGS_SEG_PAIRCAP", "0"))

    def mkbins(p, cull, d1, d2l):
        return build_bins(
            project_for_pose(g, p, rs), cam, seg_cap,
            rs.max_tiles_per_gaussian,
            align=CHUNK, d1=d1, big_frac=rs.bin_big_frac,
            tight_cull=cull, d2_live=d2l)

    # The 4-config bins sweep costs 4 big remote compiles (~15 min EACH on
    # a slow tunnel day — it killed a whole run on 2026-08-19); skip it
    # unless explicitly requested.
    if os.environ.get("MM3DGS_SEG_SWEEP", "0") == "1":
        for cull, d1, d2l in ((False, 8, 0), (True, 8, 0), (True, 4, 0),
                              (True, 4, 8)):
            b = jax.jit(lambda p: mkbins(p, cull, d1, d2l))(base)
            chunks = int(jnp.sum(-(-b.tile_count // CHUNK)))
            print(f"tight_cull={cull} d1={d1} d2_live={d2l}: "
                  f"pairs={int(b.n_pairs)} "
                  f"chunks={chunks} buf={b.pair_gauss.shape[0]} "
                  f"overflow={bool(b.overflow)}")
    d1_seg = int(os.environ.get("MM3DGS_SEG_D1", "4"))
    d2l_seg = int(os.environ.get("MM3DGS_SEG_D2L", "8"))
    rs = rs._replace(bin_d1=d1_seg, bin_d2_live=d2l_seg)
    print(f"segment loops at d1={d1_seg} d2_live={d2l_seg}")
    bins0 = jax.jit(lambda p: mkbins(p, True, d1_seg, d2l_seg))(base)
    out0 = render(g, base, rs, bins=bins0)
    gt = jnp.clip(out0["render"], 0, 1)
    jax.block_until_ready(gt)
    z4, z3 = jnp.zeros(4), jnp.zeros(3)
    zdep = jnp.zeros((480, 640), jnp.float32)

    def run(tag, gbf16, rebin=N_ITERS, track_tiles=True):
        ts = TrackSettings(rs=rs._replace(grad_bf16=gbf16), iters=N_ITERS,
                           method="vigs", use_gt_depth=True,
                           position_lr=0.001, rotation_lr=0.003,
                           rebin_every=rebin, track_tiles=track_tiles)

        def seg(s):
            carry = (base[:4] * s, base[4:], z4, z4, z3, z3,
                     jnp.float32(0.0))
            return _track_segment(g, carry, bins0,
                                  jnp.asarray(0, jnp.int32), gt, zdep, zdep,
                                  base, ts, N_ITERS)[-1]

        f = jax.jit(seg)
        float(f(jnp.float32(1.0)))  # compile
        times = []
        for i in range(REPS):
            t0 = time.perf_counter()
            float(f(jnp.float32(1.0 + 1e-4 * (i + 1))))
            times.append((time.perf_counter() - t0) / N_ITERS * 1e3)
        med = sorted(times)[len(times) // 2]
        print(f"{tag}: {med:.2f} ms/iter (min {min(times):.2f})")

    if os.environ.get("MM3DGS_SEG_ONLY") != "loops":
        run("track seg bf16", True)
        run("track seg f32 ", False)
        # image-assembly loss path (the pre-round-3 default; tile layout is
        # now the default after it measured 1.1 ms/iter faster on
        # chan-major) — track_tiles is a TrackSettings field (round 5)
        run("track seg IMG ", False, track_tiles=False)

    if os.environ.get("MM3DGS_SEG_ONLY") == "track":
        return

    # loop-level decomposition (same fori_loop dispatch shape):
    # B: fused pack+kernel fwd+bwd only  C: B + assembly + masked L1
    from mm3dgs_slam_tpu.ops.camera import TILE
    from mm3dgs_slam_tpu.ops.losses import masked_mean
    from mm3dgs_slam_tpu.ops.pallas_composite import _composite_packed
    from mm3dgs_slam_tpu.ops.render import background

    packed0 = jax.jit(lambda p: project_for_pose(g, p, rs))(base).packed
    jax.block_until_ready(packed0)
    bg = background(rs)

    def loop(body_loss, tag):
        def seg(s0):
            def body(j, c):
                s, acc = c
                l = body_loss(s)
                return (s + 1e-12 * l, acc + l)

            return jax.lax.fori_loop(0, N_ITERS, body,
                                     (s0, jnp.float32(0.0)))[1]

        f = jax.jit(seg)
        float(f(jnp.float32(1.0)))
        times = []
        for i in range(REPS):
            t0 = time.perf_counter()
            float(f(jnp.float32(1.0 + 1e-4 * (i + 1))))
            times.append((time.perf_counter() - t0) / N_ITERS * 1e3)
        print(f"{tag}: {sorted(times)[len(times)//2]:.2f} ms/iter "
              f"(min {min(times):.2f})")

    def kern_only(s):
        def l(sv):
            acc, tfin = _composite_packed(
                packed0 * sv, bins0.pair_gauss, bins0.pair_valid,
                bins0.small_slots, bins0.big_slots, bins0.big_gauss,
                bins0.big_valid, bins0.gauss_rank, bins0.tile_start,
                bins0.tile_count, rs.cam, False)
            return jnp.sum(acc) + jnp.sum(tfin)

        return jax.grad(l)(s)

    loop(kern_only, "B kernel fwd+bwd+reduce only")

    def kern_loss(s):
        def l(sv):
            acc, tfin = _composite_packed(
                packed0 * sv, bins0.pair_gauss, bins0.pair_valid,
                bins0.small_slots, bins0.big_slots, bins0.big_gauss,
                bins0.big_valid, bins0.gauss_rank, bins0.tile_start,
                bins0.tile_count, rs.cam, False)
            out = acc + tfin * bg[None, None, :]
            ty, tx = cam.tiles_y, cam.tiles_x
            img = out.reshape(ty, tx, TILE, TILE, 6)
            img = img.transpose(4, 0, 2, 1, 3).reshape(6, ty * TILE,
                                                       tx * TILE)
            img = img[:, :cam.height, :cam.width]
            return masked_mean(jnp.abs(img[:3] - gt), (img[4] > 0.99)[None])

        return jax.grad(l)(s)

    loop(kern_loss, "C  + assembly + masked L1    ")

    def kern_fwd(s):
        acc, tfin = _composite_packed(
            packed0 * s, bins0.pair_gauss, bins0.pair_valid,
            bins0.small_slots, bins0.big_slots, bins0.big_gauss,
            bins0.big_valid, bins0.gauss_rank, bins0.tile_start,
            bins0.tile_count, rs.cam, False)
        return jnp.sum(acc) + jnp.sum(tfin)

    loop(kern_fwd, "D kernel fwd only (no grad)  ")

    # E: bwd kernel + table reduce, loop-fed dacc (no fwd recompute of the
    # value pass; measures the backward unit in-loop)
    rows0 = jax.jit(lambda: jnp.asarray(
        packed0, jnp.float32).at[bins0.pair_gauss].get(
            mode="fill", fill_value=0.0).T)()
    from mm3dgs_slam_tpu.ops.pallas_composite import (
        _composite_pallas_bwd_rows, _composite_pallas_fwd, _table_reduce)
    acc0, tfin0 = _composite_pallas_fwd(rows0, bins0.tile_start,
                                        bins0.tile_count, rs.cam)
    jax.block_until_ready(acc0)

    def bwd_red(s):
        dpair = _composite_pallas_bwd_rows(
            rows0, bins0.tile_start, bins0.tile_count, acc0, tfin0,
            jnp.full_like(acc0, s), jnp.full_like(tfin0, s), rs.cam)
        out = _table_reduce(dpair, bins0.small_slots, bins0.big_slots,
                            bins0.big_gauss, bins0.big_valid,
                            bins0.gauss_rank)
        return jnp.sum(out)

    loop(bwd_red, "E bwd kernel + table reduce  ")


if __name__ == "__main__":
    main()

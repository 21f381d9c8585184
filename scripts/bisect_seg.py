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
    bins0 = jax.jit(lambda p: build_bins(
        project_for_pose(g, p, rs), cam, 0, rs.max_tiles_per_gaussian,
        align=CHUNK, d1=rs.bin_d1, big_frac=rs.bin_big_frac))(base)
    out0 = render(g, base, rs, bins=bins0)
    gt = jnp.clip(out0["render"], 0, 1)
    jax.block_until_ready(gt)
    z4, z3 = jnp.zeros(4), jnp.zeros(3)
    zdep = jnp.zeros((480, 640), jnp.float32)

    def run(tag, gbf16):
        ts = TrackSettings(rs=rs._replace(grad_bf16=gbf16), iters=N_ITERS,
                           method="vigs", use_gt_depth=True,
                           position_lr=0.001, rotation_lr=0.003,
                           rebin_every=N_ITERS)

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

    run("track seg bf16", True)
    run("track seg f32 ", False)


if __name__ == "__main__":
    main()

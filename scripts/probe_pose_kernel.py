#!/usr/bin/env python
"""A/B the fused in-kernel pose gradient (MM3DGS_POSE_KERNEL) against the
per-pair-emission + slot-table-reduce tracking backward, same process, same
bins, single-dispatch 20-iter tracker segments (bisect_seg methodology)."""
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

    m, cam = _build_scene(1 << 17, cam_hw=(480, 640))
    g = m.activated()
    rs = RenderSettings(cam=cam, pair_cap=1 << 19, max_per_tile=1024,
                        chunk=32, max_tiles_per_gaussian=16, use_pallas=True,
                        bin_d1=4, bin_big_frac=7, bin_d2_live=8)
    base = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)

    def mkbins(p):
        return build_bins(project_for_pose(g, p, rs), cam, rs.pair_cap,
                          rs.max_tiles_per_gaussian, align=CHUNK,
                          d1=rs.bin_d1, big_frac=rs.bin_big_frac,
                          tight_cull=True, d2_live=rs.bin_d2_live)

    bins0 = jax.jit(mkbins)(base)
    out0 = render(g, base, rs, bins=bins0)
    gt = jnp.clip(out0["render"], 0, 1)
    jax.block_until_ready(gt)
    print(f"pairs={int(bins0.n_pairs)} overflow={bool(bins0.overflow)}")
    z4, z3 = jnp.zeros(4), jnp.zeros(3)
    zdep = jnp.zeros((480, 640), jnp.float32)

    def run(tag, fused, rebin):
        # pose_kernel is a TrackSettings field now (round 5) — flipping it
        # changes the settings hash, so no rebin_every trace-forcing tricks
        # or env flips are needed
        ts = TrackSettings(rs=rs, iters=N_ITERS, method="vigs",
                           use_gt_depth=True, position_lr=0.001,
                           rotation_lr=0.003, rebin_every=rebin,
                           pose_kernel=fused)

        def seg(s):
            carry = (base[:4] * s, base[4:], z4, z4, z3, z3,
                     jnp.float32(0.0))
            return _track_segment(g, carry, bins0,
                                  jnp.asarray(0, jnp.int32), gt, zdep, zdep,
                                  base, ts, N_ITERS)

        f = jax.jit(lambda s: seg(s)[-1])
        float(f(jnp.float32(1.0)))  # compile
        times = []
        for i in range(REPS):
            t0 = time.perf_counter()
            float(f(jnp.float32(1.0 + 1e-4 * (i + 1))))
            times.append((time.perf_counter() - t0) / N_ITERS * 1e3)
        med = sorted(times)[len(times) // 2]
        print(f"{tag}: {med:.2f} ms/iter (min {min(times):.2f})", flush=True)
        # converged-state agreement: same final pose from both backwards
        q, T = seg(jnp.float32(1.0))[:2]
        return med, jax.device_get((q, T))

    m1, p1 = run("pose-fused ", True, N_ITERS)
    m0, p0 = run("general    ", False, N_ITERS + 1)
    m1b, _ = run("pose-fused2", True, N_ITERS + 2)
    import numpy as np
    dq = np.abs(p1[0] - p0[0]).max()
    dT = np.abs(p1[1] - p0[1]).max()
    print(f"delta: {m0 - (m1 + m1b) / 2:+.2f} ms/iter; "
          f"20-step pose drift |dq|={dq:.2e} |dT|={dT:.2e}")


if __name__ == "__main__":
    main()

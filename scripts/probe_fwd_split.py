#!/usr/bin/env python
"""Probe: FORWARD-kernel dot variants — replace HIGHEST (6 bf16 MXU passes)
with explicit bf16-term splits at f32-grade accuracy:

  v0  baseline: power/cumsum/acc all HIGHEST
  v1  power = 3 DEFAULT passes on bf16-split coefs (split cost: [8,CHUNK])
  v2  v1 + transmittance cumsum = 3 DEFAULT passes on bf16-split s
  v3  v2 + acc = 3 DEFAULT passes (w, feat 2-term splits: hh+hl+lh, ~17 bit)

All within one process (tunnel varies between runs); single-dispatch
20-iteration fori loops; accuracy of the fwd image vs v0.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_ITERS = 20
REPS = 6


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

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

    def fwd_sum(sv):
        acc, tfin = pc._composite_pallas_fwd(
            pc.pack_pairs(packed0 * sv, bins.pair_gauss),
            bins.tile_start, bins.tile_count, rs.cam)
        return jnp.sum(acc) + jnp.sum(tfin)

    def time_fwd(tag):
        def seg(s0):
            def b(j, c):
                s, acc = c
                l = fwd_sum(s)
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
        print(f"  {tag}: fwd {med:.2f} ms/iter (min {min(times):.2f})")

    def image():
        acc, tfin = jax.jit(lambda p: pc._composite_pallas_fwd(
            pc.pack_pairs(p, bins.pair_gauss),
            bins.tile_start, bins.tile_count, rs.cam))(packed0)
        return jax.device_get(acc), jax.device_get(tfin)

    ref = None
    import os
    names = os.environ.get("MM3DGS_PROBE_VARIANTS", "v0,v1,v2,v3")
    for name in names.split(","):
        pc._FWD_SPLIT = name
        jax.clear_caches()
        print(f"fwd variant {name}")
        time_fwd(name)
        out = image()
        if ref is None:
            ref = out
        else:
            d = np.max(np.abs(out[0] - ref[0]))
            rel = d / np.max(np.abs(ref[0]))
            dt = np.max(np.abs(out[1] - ref[1]))
            print(f"  vs v0: acc max|d|={d:.3e} (rel {rel:.2e}) "
                  f"tfin max|d|={dt:.3e}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Tracking cost split at GOLDEN scale: iterations vs rebin builds.

The round-5 golden decomposition has track at a 3.47 s/frame steady median
(100 iters, rebin_every=10 → 10 builds). This probe loads the golden PLY
and times whole track_frame calls at rebin_every 10 vs 100 (same 100
iters; the delta / 9 prices one golden-scale _track_bins build), plus a
rebin_every=100 run as the iteration-floor bound. Inputs vary per rep
(CLAUDE.md gotcha 2); each call ends in its natural pose fetch.

Usage: python scripts/probe_golden_track.py [outdir=output/golden_r5_decomp]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPS = 5


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from mm3dgs_slam_tpu.models import gaussians as G
    from mm3dgs_slam_tpu.models.ply_io import load_ply
    from mm3dgs_slam_tpu.ops.camera import Camera
    from mm3dgs_slam_tpu.ops.render import RenderSettings, render
    from mm3dgs_slam_tpu.slam.tracker import TrackSettings, track_frame

    outdir = sys.argv[1] if len(sys.argv) > 1 else "output/golden_r5_decomp"
    ply = sorted(Path(outdir).glob("point_cloud/iteration_*/point_cloud.ply"))[-1]
    data = load_ply(str(ply))
    n = data["xyz"].shape[0]
    cap = G.required_capacity(n)
    m = G.empty_map(cap, 0)
    idx = np.arange(n)
    m = m._replace(
        xyz=m.xyz.at[idx].set(data["xyz"]),
        features_dc=m.features_dc.at[idx].set(data["features_dc"]),
        scaling=m.scaling.at[idx].set(data["scaling"]),
        rotation=m.rotation.at[idx].set(data["rotation"]),
        opacity=m.opacity.at[idx].set(data["opacity"]),
        n_alive=jnp.asarray(n, jnp.int32),
    )
    res = np.load(Path(outdir) / "results.npz", allow_pickle=True)
    pose = np.asarray(res["pose_est"][-1], np.float32)
    print(f"map: {n} gaussians (cap {cap})")

    cam = Camera(height=480, width=640, fx=520.0, fy=520.0, cx=319.5,
                 cy=239.5)
    g = G.activate(m)
    rs = RenderSettings(cam=cam, pair_cap=1 << 21, max_per_tile=2048,
                        chunk=32, max_tiles_per_gaussian=16, use_pallas=True,
                        bin_d1=4, bin_big_frac=64, transform_means_python=True)
    out = render(g, jnp.asarray(pose), rs)
    gt_color = jnp.clip(out["render"], 0, 1)
    gt_depth = out["depth"][0] / jnp.maximum(out["depth"][1], 1e-6)
    float(gt_color[0, 0, 0])

    variants = {
        "rebin10": TrackSettings(rs=rs, iters=100, rebin_every=10),
        "rebin100": TrackSettings(rs=rs, iters=100, rebin_every=100),
    }
    times = {k: [] for k in variants}
    for rep in range(REPS):
        for name, ts in variants.items():
            seed = np.array(pose, np.float32)
            seed[4] += 1e-3 * (rep + 1)  # vary per rep: no dedupe
            t0 = time.perf_counter()
            p, loss, ovf = track_frame(g, jnp.asarray(seed), gt_color,
                                       gt_depth, jnp.zeros_like(gt_depth), ts)
            p = np.asarray(p)
            dt = time.perf_counter() - t0
            if rep:
                times[name].append(dt)
            print(f"rep {rep} {name}: {dt:.3f} s loss={float(loss):.5f} "
                  f"ovf={bool(ovf)}")

    med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
    for k, v in med.items():
        print(f"{k}: median {v:.3f} s/frame")
    print(f"one build ≈ {(med['rebin10'] - med['rebin100']) / 9 * 1e3:.1f} ms"
          f"; iter floor ≈ {med['rebin100'] / 100 * 1e3:.1f} ms/iter")


if __name__ == "__main__":
    main()

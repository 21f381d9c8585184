#!/usr/bin/env python
"""Map-iteration cost at GOLDEN scale (the real saved golden map), and the
d2_live question the round-4 verdict left open there.

The round-5 golden decomposition put map.optimize at a 15.2 s/frame steady
median (~101 ms/iter at ~334k gaussians) while the 262k synthetic probe
measured 43 ms/iter — but that probe ran the BENCH knobs (bin_d2_live=8),
and the golden config ships d2_live=0 (full 16-wide big tier). This probe
loads the round-5 golden PLY + an estimated pose from its results.npz and

  1. sweeps build_bins d2_live in {0, 8, 10, 12, 14} printing the exact
     `overflow` flag (lossless iff False) and n_pairs,
  2. times the 20-iteration jitted _map_segment at d2_live=0 vs the
     smallest LOSSLESS cap, alternating within one process (CLAUDE.md
     gotchas 5/6/15: single-dispatch segments, one fetched scalar each).

Usage: python scripts/probe_golden_scale.py [outdir=output/golden_r5_decomp]
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
    import numpy as np

    from mm3dgs_slam_tpu.models import gaussians as G
    from mm3dgs_slam_tpu.models.ply_io import load_ply
    from mm3dgs_slam_tpu.ops.binning import build_bins
    from mm3dgs_slam_tpu.ops.camera import Camera
    from mm3dgs_slam_tpu.ops.render import (RenderSettings, project_for_pose,
                                            render)
    from mm3dgs_slam_tpu.slam.map_opt import (MapCarry, MapOptSettings,
                                              _map_bins, _map_segment)

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
    print(f"map: {n} gaussians (cap {cap}) pose {pose.round(3)}")

    cam = Camera(height=480, width=640, fx=520.0, fy=520.0, cx=319.5,
                 cy=239.5)
    g = G.activate(m)

    # --- 1. post-cull live-tile census (the d2_live sizing question:
    # the run-level overflow flag already fires on rect truncation at this
    # scene, so the live max must be read directly) -----------------------
    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("rs",))
    def live_stats(g, pose, rs):
        from mm3dgs_slam_tpu.ops.binning import (_candidate_tiles,
                                                 _tile_alpha_cull,
                                                 gaussian_tile_rect)

        proj = project_for_pose(g, pose, rs)
        xy = proj.xy
        depth = proj.depth
        radius = jnp.where(proj.opacity >= (1.0 / 255.0), proj.radius, 0)
        order = jnp.argsort(jnp.where(radius > 0, depth, jnp.inf)).astype(
            jnp.int32)
        xy = xy[order]
        radius = radius[order]
        D2 = rs.max_tiles_per_gaussian
        x0, x1, y0, y1 = gaussian_tile_rect(xy, radius, cam.tiles_x,
                                            cam.tiles_y)
        rect_w = jnp.maximum(x1 - x0, 0)
        count = jnp.minimum(jnp.where(radius > 0, rect_w * jnp.maximum(
            y1 - y0, 0), 0), D2)
        tileA = _candidate_tiles(x0, rect_w, y0, count, D2, cam.tiles_x)
        conic = proj.conic[order]
        op = proj.opacity[order]
        tau = jnp.log(jnp.maximum(255.0 * op, 1e-12))
        tileA = _tile_alpha_cull(tileA, xy, conic, tau, cam.tiles_x,
                                 n_tiles=cam.tiles_x * cam.tiles_y)
        count_kept = jnp.sum((tileA >= 0).astype(jnp.int32), axis=1)
        hist = jnp.bincount(count_kept, length=D2 + 1)
        return jnp.max(count_kept), jnp.sum(count_kept > 4), hist

    rs_d = RenderSettings(cam=cam, pair_cap=1 << 21, max_per_tile=2048,
                          chunk=32, max_tiles_per_gaussian=16,
                          use_pallas=True, bin_d1=4, bin_big_frac=8)
    mx, nbig, hist = live_stats(g, jnp.asarray(pose), rs_d)
    print(f"post-cull live-tile max={int(mx)}  n_big(>4)={int(nbig)} "
          f"(big_cap={cap // 8})")
    print("live-count histogram:", np.asarray(hist).tolist())
    first_lossless = int(mx) if int(mx) < 16 else 0

    # --- 2. segment timing: the golden knobs vs big-tier right-sizing ---
    # (big_frac, d2_live) pairs; the census above showed n_big(>4)=3.6k
    # vs big_cap=57k at big_frac=8 — the big tier is ~94% padding.
    variants = {
        "bf8_d2l0": (8, 0),
        "bf64_d2l0": (64, 0),
        "bf64_d2l8": (64, 8),
    }

    hyper = G.MapOptHyper(lr_xyz=1e-4, lr_features_dc=2.5e-3,
                          lr_features_rest=1.25e-4, lr_scaling=1e-3,
                          lr_rotation=1e-3, lr_opacity=5e-2, lr_rgb=2.5e-3)
    rs0 = RenderSettings(cam=cam, pair_cap=1 << 21, max_per_tile=2048,
                         chunk=32, max_tiles_per_gaussian=16,
                         use_pallas=True, bin_d1=4, bin_big_frac=8)
    out = render(g, jnp.asarray(pose), rs0)
    gt_color = jnp.clip(out["render"], 0, 1)
    gt_depth = out["depth"][0] / jnp.maximum(out["depth"][1], 1e-6)
    float(gt_color[0, 0, 0])

    K = 2
    kf_colors = jnp.tile(gt_color[None], (K, 1, 1, 1))
    kf_depths = jnp.tile(gt_depth[None], (K, 1, 1))
    kf_ests = jnp.zeros_like(kf_depths)
    adam = G.init_adam(m)

    def carry(seed):
        poses = jnp.tile(jnp.asarray(pose)[None], (K, 1)).at[:, 4].add(
            1e-4 * seed)
        return MapCarry(
            m=m, adam=adam,
            max_radii=jnp.zeros((cap,), jnp.float32),
            grad_accum=jnp.zeros((cap,), jnp.float32),
            denom=jnp.zeros((cap,), jnp.float32),
            ba_mask=jnp.ones((cap,), bool),
            kf_poses=poses, pose_m=jnp.zeros((K, 7)),
            pose_v=jnp.zeros((K, 7)),
            pose_step=jnp.asarray(0, jnp.int32),
            last_loss=jnp.asarray(0.0, jnp.float32),
        )

    k0 = np.int32(0)
    settings = {
        name: MapOptSettings(
            rs=rs0._replace(bin_big_frac=bf, bin_d2_live=d2l),
            iters=N_ITERS, method="vigs", use_gt_depth=True,
            lambda_dssim=0.2, hyper=hyper, rebin_every=N_ITERS)
        for name, (bf, d2l) in variants.items()
    }
    bins = {name: _map_bins(carry(1), k0, ms_v)
            for name, ms_v in settings.items()}
    times = {name: [] for name in variants}
    for rep in range(REPS):
        for name, ms_v in settings.items():
            c = carry(rep + 1)
            t0 = time.perf_counter()
            outc = _map_segment(c, bins[name], k0, np.int32(1), kf_colors,
                                kf_depths, kf_ests, ms_v, N_ITERS)
            float(outc.last_loss)
            dt = time.perf_counter() - t0
            if rep:
                times[name].append(dt)
            print(f"rep {rep} {name}: {dt / N_ITERS * 1e3:.2f} ms/iter "
                  f"loss={float(outc.last_loss):.5f}")

    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: median {med / N_ITERS * 1e3:.2f} ms/iter over "
              f"{len(ts)} reps")

    if "decomp" not in sys.argv:
        return

    # --- 3. fwd-only and grad-no-adam loops at the winning knobs --------
    from mm3dgs_slam_tpu.models.gaussians import _PARAM_FIELDS
    from mm3dgs_slam_tpu.slam.map_opt import _grad_and_stats, _map_loss

    ms_w = settings["bf64_d2l0"]
    bins_w = bins["bf64_d2l0"]

    @_partial(jax.jit, static_argnames=("ms", "n_iters"))
    def fwd_only(c, bins, k, kf_colors, kf_depths, kf_ests, ms, n_iters):
        def body(j, acc):
            params = {f: getattr(c.m, f) for f in _PARAM_FIELDS}
            pose = c.kf_poses[k] * (1.0 + 1e-12 * acc)  # chain: no CSE
            screen0 = jnp.zeros_like(c.m.xyz[:, :2])
            loss, _aux = _map_loss(params, screen0, pose, c.m.n_alive,
                                   kf_colors[k], kf_depths[k], kf_ests[k],
                                   bins, ms)
            return acc + loss
        return jax.lax.fori_loop(0, n_iters, body,
                                 jnp.asarray(0.0, jnp.float32))

    @_partial(jax.jit, static_argnames=("ms", "n_iters"))
    def grad_no_adam(c, bins, k, kf_colors, kf_depths, kf_ests, ms, n_iters):
        def body(j, acc):
            c2 = c._replace(kf_poses=c.kf_poses * (1.0 + 1e-12 * acc))
            loss, gm, _gp, mr, ga, dn = _grad_and_stats(
                c2, bins, k, jnp.asarray(1, jnp.int32), kf_colors, kf_depths,
                kf_ests, ms)
            consume = sum(jnp.sum(getattr(gm, f)[0]) for f in _PARAM_FIELDS)
            return acc + loss + consume * 1e-20 + mr[0] * 0 + ga[0] * 0 + dn[0] * 0
        return jax.lax.fori_loop(0, n_iters, body,
                                 jnp.asarray(0.0, jnp.float32))

    dtimes = {"fwd_only": [], "grad_no_adam": []}
    for rep in range(REPS):
        c = carry(rep + 1)
        t0 = time.perf_counter()
        v = fwd_only(c, bins_w, k0, kf_colors, kf_depths, kf_ests, ms_w,
                     N_ITERS)
        float(v)
        dt = time.perf_counter() - t0
        if rep:
            dtimes["fwd_only"].append(dt)
        print(f"rep {rep} fwd_only: {dt / N_ITERS * 1e3:.2f} ms/iter")
        t0 = time.perf_counter()
        v = grad_no_adam(c, bins_w, k0, kf_colors, kf_depths, kf_ests, ms_w,
                         N_ITERS)
        float(v)
        dt = time.perf_counter() - t0
        if rep:
            dtimes["grad_no_adam"].append(dt)
        print(f"rep {rep} grad_no_adam: {dt / N_ITERS * 1e3:.2f} ms/iter")
    for name, ts in dtimes.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: median {med / N_ITERS * 1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()

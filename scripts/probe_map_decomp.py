#!/usr/bin/env python
"""Round-4 map-segment decomposition at bench scale (131k gaussians).

Splits the MAP iteration (BENCH_r03: 18.47 ms/iter) into
  A  full map segment   (render -> L1+SSIM -> grads -> Adam, fixed bins)
  B  forward-only loop  (render -> loss, chained into the pose so the
                         remote layer can't dedupe; no backward)
  C  one build_bins     (the rebin paid every ms.rebin_every iters)
so A - B bounds the backward unit (bwd kernel + slot-table reduce +
projection bwd + Adam) with CURRENT defaults (pair_cap, tile-layout
flips, UNROLL=2, early-exit off) — the round-3 component numbers predate
several default flips and no longer sum to the bench number.

Method per CLAUDE.md gotchas: single-dispatch jitted segments, one host
fetch per rep, alternating reps within one process.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_ITERS = 20
REPS = 6
N = 1 << 17


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_scene
    from mm3dgs_slam_tpu.models import gaussians as G
    from mm3dgs_slam_tpu.ops.render import RenderSettings
    from mm3dgs_slam_tpu.slam.map_opt import (MapCarry, MapOptSettings,
                                              _map_bins, _map_loss,
                                              _map_segment)

    m, cam = _build_scene(N, cam_hw=(480, 640))
    rs = RenderSettings(cam=cam, pair_cap=1 << 19, max_per_tile=1024,
                        chunk=32, max_tiles_per_gaussian=16, use_pallas=True,
                        bin_d1=4, bin_big_frac=7, bin_d2_live=8)
    base = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)

    hyper = G.MapOptHyper(lr_xyz=1e-4, lr_features_dc=2.5e-3,
                          lr_features_rest=1.25e-4, lr_scaling=1e-3,
                          lr_rotation=1e-3, lr_opacity=5e-2, lr_rgb=2.5e-3)
    K = 2
    ms = MapOptSettings(rs=rs, iters=N_ITERS, method="vigs",
                        use_gt_depth=True, lambda_dssim=0.2,
                        hyper=hyper, rebin_every=N_ITERS)
    adam = G.init_adam(m)
    cap = m.capacity

    def carry(seed):
        poses = jnp.tile(base[None], (K, 1)).at[:, 4].add(1e-4 * seed)
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

    # round-5 A/B: tile-layout mapping loss (nc=3 walk + rgb-only assembly)
    # vs the image path (nc=6 walk + [6,H,W] assembly)
    ms_img = ms._replace(map_tiles=False)
    ms_til = ms._replace(map_tiles=True)

    k0 = jnp.asarray(0, jnp.int32)
    base_i = jnp.asarray(1, jnp.int32)
    c1 = carry(1)
    bins = _map_bins(c1, k0, ms)
    print(f"N={N} pairs={int(bins.n_pairs)} buf={bins.pair_gauss.shape[0]} "
          f"overflow={bool(bins.overflow)}")

    # synthetic targets from a rendered frame (stop-grad)
    from mm3dgs_slam_tpu.ops.render import render
    out = render(m.activated(), base, rs)
    gt_color = jnp.clip(out["render"], 0, 1)
    gt_depth = out["depth"][0] / jnp.maximum(out["depth"][1], 1e-6)
    kf_colors = jnp.tile(gt_color[None], (K, 1, 1, 1))
    kf_depths = jnp.tile(gt_depth[None], (K, 1, 1))
    kf_ests = jnp.zeros_like(kf_depths)
    jax.block_until_ready(kf_colors)

    from mm3dgs_slam_tpu.models.gaussians import _PARAM_FIELDS

    import functools

    @functools.partial(jax.jit, static_argnames=("msv",))
    def fwd_only(c, n_alive, msv):
        """Forward-only chained loop: each iteration's loss perturbs the
        pose of the next, so XLA cannot collapse the loop and the remote
        layer cannot dedupe."""
        params = {f: jax.lax.stop_gradient(getattr(c.m, f))
                  for f in _PARAM_FIELDS}
        screen0 = jnp.zeros_like(c.m.xyz[:, :2])

        def body(j, acc):
            tot, pose = acc
            loss, _ = _map_loss(params, screen0, pose, n_alive,
                                kf_colors[0], kf_depths[0], kf_ests[0],
                                bins, msv)
            return tot + loss, pose.at[4].add(loss * 1e-12)

        tot, _ = jax.lax.fori_loop(
            0, N_ITERS, body, (jnp.float32(0.0), c.kf_poses[0]))
        return tot

    times = {"A_img": [], "A_til": [], "B_img": [], "B_til": [],
             "C_bins": []}

    def seg(rep, msv):
        c = carry(rep + 1)
        t0 = time.perf_counter()
        outc = _map_segment(c, bins, k0, base_i, kf_colors, kf_depths,
                            kf_ests, msv, N_ITERS)
        float(outc.last_loss)
        return time.perf_counter() - t0

    def fwd(rep, msv):
        c = carry(rep + 1)
        t0 = time.perf_counter()
        float(fwd_only(c, c.m.n_alive, msv))
        return time.perf_counter() - t0

    for rep in range(REPS):
        for name, fn, msv in (("A_img", seg, ms_img), ("A_til", seg, ms_til),
                              ("B_img", fwd, ms_img), ("B_til", fwd, ms_til)):
            dt = fn(rep, msv)
            if rep:
                times[name].append(dt)
            print(f"rep {rep} {name}: {dt / N_ITERS * 1e3:.2f} ms/iter",
                  flush=True)

        c = carry(rep + 1)
        t0 = time.perf_counter()
        b = _map_bins(c, k0, ms)
        float(b.n_pairs)
        dt = time.perf_counter() - t0
        if rep:
            times["C_bins"].append(dt)
        print(f"rep {rep} C_bins: {dt * 1e3:.2f} ms/build", flush=True)

    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        unit = "ms/build" if name == "C_bins" else "ms/iter"
        scale = 1.0 if name == "C_bins" else 1.0 / N_ITERS
        print(f"{name}: median {med * scale * 1e3:.2f} {unit}")


if __name__ == "__main__":
    main()

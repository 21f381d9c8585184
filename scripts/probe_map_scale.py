#!/usr/bin/env python
"""bf16 per-pair gradient emission at >200k-gaussian maps (MAP segment).

Round-2's grad_bf16 A/B found ~nothing at 131k gaussians and left the
question open for larger maps ("bytes double"); round-3 pass 1 then showed
the slot-table reduce is PER-INDEX bound (6.7 ns/idx — bf16 rows and a
half-size buffer change nothing at 131k). Tracking no longer emits dpair
at all (fused pose kernel), so the knob's only remaining consumer is the
MAPPING backward. This probe times the 20-iteration jitted MAP segment
(_map_segment: render -> L1+SSIM -> grads -> Adam on 7 groups) at
262k gaussians (~2x the bench scene's pair count) with f32 vs bf16
emission in ONE process, same bins, alternating reps.

Method per CLAUDE.md gotchas: single-dispatch segments (one fetched
scalar per rep), median over alternating reps so tunnel drift hits both
variants equally.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_ITERS = 20
REPS = 6
N = 1 << 18  # 262144 gaussians


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_scene
    from mm3dgs_slam_tpu.models import gaussians as G
    from mm3dgs_slam_tpu.ops.render import RenderSettings, render
    from mm3dgs_slam_tpu.slam.map_opt import (MapCarry, MapOptSettings,
                                              _map_bins, _map_segment)

    m, cam = _build_scene(N, cam_hw=(480, 640))
    rs = RenderSettings(cam=cam, pair_cap=1 << 21, max_per_tile=1024,
                        chunk=32, max_tiles_per_gaussian=16, use_pallas=True,
                        bin_d1=4, bin_big_frac=7, bin_d2_live=8,
                        grad_bf16=False)
    base = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)

    out = render(m.activated(), base, rs)
    gt_color = jnp.clip(out["render"], 0, 1)
    gt_depth = out["depth"][0] / jnp.maximum(out["depth"][1], 1e-6)
    jax.block_until_ready(gt_color)
    print(f"N={N} pairs={int(out['bins'].n_pairs)} "
          f"overflow={bool(out['bins'].overflow)}")
    assert not bool(out["bins"].overflow)

    hyper = G.MapOptHyper(lr_xyz=1e-4, lr_features_dc=2.5e-3,
                          lr_features_rest=1.25e-4, lr_scaling=1e-3,
                          lr_rotation=1e-3, lr_opacity=5e-2, lr_rgb=2.5e-3)
    K = 2
    kf_colors = jnp.tile(gt_color[None], (K, 1, 1, 1))
    kf_depths = jnp.tile(gt_depth[None], (K, 1, 1))
    kf_ests = jnp.zeros_like(kf_depths)
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

    k0 = jnp.asarray(0, jnp.int32)
    base_i = jnp.asarray(1, jnp.int32)

    import os as _os
    if _os.environ.get("MM3DGS_PROBE_CAPSWEEP", "0") == "1":
        # round-4 superlinearity check: is the 131k->262k cost growth
        # (2.0x pairs -> 2.3-2.6x ms) intrinsic, or the 2M static
        # pair_cap padding the buffer to ~2.6x the live pairs (every
        # buffer slot pays the pack gather + bwd zero-fill)?
        variants = {"cap2M": rs,
                    "cap1M": rs._replace(pair_cap=1 << 20)}
    else:
        variants = {"f32": rs, "bf16": rs._replace(grad_bf16=True)}
    times = {name: [] for name in variants}
    settings = {
        name: MapOptSettings(rs=v, iters=N_ITERS, method="vigs",
                             use_gt_depth=True, lambda_dssim=0.2,
                             hyper=hyper, rebin_every=N_ITERS)
        for name, v in variants.items()
    }
    bins = {name: _map_bins(carry(1), k0, ms_v)
            for name, ms_v in settings.items()}

    for rep in range(REPS):
        for name, ms_v in settings.items():
            c = carry(rep + 1)
            t0 = time.perf_counter()
            outc = _map_segment(c, bins[name], k0, base_i, kf_colors,
                                kf_depths, kf_ests, ms_v, N_ITERS)
            float(outc.last_loss)
            dt = time.perf_counter() - t0
            if rep:  # rep 0 pays the compile
                times[name].append(dt)
            print(f"rep {rep} {name}: {dt / N_ITERS * 1e3:.2f} ms/iter "
                  f"loss={float(outc.last_loss):.5f}")

    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: median {med / N_ITERS * 1e3:.2f} ms/iter over "
              f"{len(ts)} reps")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-3 focused A/B: nc-slim tracking walk + UNROLL trip width.

One bins build (d1=4, d2_live=8, tight cull, pair_cap 512k), then
same-process 20-iter tracker segments:
  * nc=6 full walk (the pre-round-3 channel set)
  * nc=5 walk (z^2 dropped — the new vigs default)
Flip MM3DGS_PL_UNROLL between process runs for the trip-width A/B (module
constant; binning tail pad covers UNROLL <= 4).

Usage: [MM3DGS_PL_UNROLL=N] python scripts/probe_r3b.py
"""
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
    from mm3dgs_slam_tpu.ops.losses import masked_mean
    from mm3dgs_slam_tpu.ops.pallas_composite import CHUNK, UNROLL
    from mm3dgs_slam_tpu.ops.render import (RenderSettings, render,
                                            render_tiles, project_for_pose,
                                            tile_pixel_valid, to_tiles)

    print(f"CHUNK={CHUNK} UNROLL={UNROLL}")
    m, cam = _build_scene(1 << 17, cam_hw=(480, 640))
    g = m.activated()
    rs = RenderSettings(cam=cam, pair_cap=1 << 19, max_per_tile=1024,
                        chunk=32, max_tiles_per_gaussian=16, use_pallas=True,
                        bin_d1=4, bin_big_frac=7, bin_d2_live=8)
    base = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)

    bins0 = jax.jit(lambda p: build_bins(
        project_for_pose(g, p, rs), cam, rs.pair_cap,
        rs.max_tiles_per_gaussian, align=CHUNK, d1=rs.bin_d1,
        big_frac=rs.bin_big_frac, d2_live=rs.bin_d2_live))(base)
    chunks = int(jnp.sum(-(-bins0.tile_count // CHUNK)))
    print(f"pairs={int(bins0.n_pairs)} chunks={chunks} "
          f"buf={bins0.pair_gauss.shape[0]} overflow={bool(bins0.overflow)}")

    out0 = render(g, base, rs, bins=bins0)
    gt = jnp.clip(out0["render"], 0, 1)
    jax.block_until_ready(gt)

    gt_t = to_tiles(gt, cam)
    valid = tile_pixel_valid(cam)
    z4, z3 = jnp.zeros(4), jnp.zeros(3)

    def seg_factory(nc):
        """20 vigs Adam iterations in the tile layout at channel count nc
        (mirrors tracker._track_segment's default path)."""

        def loss_fn(q, T):
            pose = jnp.concatenate([q, T])
            out = render_tiles(g, pose, rs, bins0, nc=nc)
            presence = (out[:, 4] > 0.99) & valid
            return masked_mean(jnp.abs(out[:, :3] - gt_t), presence[:, None])

        grad_fn = jax.value_and_grad(loss_fn, argnums=(0, 1))

        def seg(s):
            def body(j, carry):
                q, T, mq, vq, mT, vT, _ = carry
                loss, (gq, gT) = grad_fn(q, T)
                step = (j + 1).astype(jnp.float32)
                bc1 = 1.0 - 0.9 ** step
                bc2 = 1.0 - 0.999 ** step
                mq = 0.9 * mq + 0.1 * gq
                vq = 0.999 * vq + 0.001 * gq * gq
                q = q - 0.003 * (mq / bc1) / (jnp.sqrt(vq) / jnp.sqrt(bc2) + 1e-8)
                mT = 0.9 * mT + 0.1 * gT
                vT = 0.999 * vT + 0.001 * gT * gT
                T = T - 0.001 * (mT / bc1) / (jnp.sqrt(vT) / jnp.sqrt(bc2) + 1e-8)
                return (q, T, mq, vq, mT, vT, loss)

            carry = (base[:4] * s, base[4:], z4, z4, z3, z3, jnp.float32(0.0))
            return jax.lax.fori_loop(0, N_ITERS, body, carry)[-1]

        return jax.jit(seg)

    def run(tag, f):
        float(f(jnp.float32(1.0)))  # compile
        times = []
        for i in range(REPS):
            t0 = time.perf_counter()
            float(f(jnp.float32(1.0 + 1e-4 * (i + 1))))
            times.append((time.perf_counter() - t0) / N_ITERS * 1e3)
        med = sorted(times)[len(times) // 2]
        print(f"{tag}: {med:.2f} ms/iter (min {min(times):.2f})", flush=True)

    run("track nc=6", seg_factory(6))
    run("track nc=5", seg_factory(5))
    run("track nc=6 (rep)", seg_factory(6))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Attribute the in-loop vs isolated-stage cost gap for the tracker.

Compares per-iteration time of:
  A. track_frame as-is (blocked: outer fori over blocks, inner fori + cond)
  B. flat fori_loop, bins prebuilt outside, no cond
  C. flat fori_loop with cond-rebin every `rebin` iters (map-style)
Each variant is ONE dispatch over `iters` iterations, so tunnel overhead is
amortized to zero. Inputs vary per rep; host fetch per rep.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

from __graft_entry__ import _build_scene
from mm3dgs_slam_tpu.ops.binning import build_bins
from mm3dgs_slam_tpu.ops.losses import masked_mean
from mm3dgs_slam_tpu.ops.pallas_composite import CHUNK
from mm3dgs_slam_tpu.ops.render import RenderSettings, project_for_pose, render
from mm3dgs_slam_tpu.slam.tracker import TrackSettings, track_frame

ITERS = 20
REBIN = 10
REPS = 3


def run(name, fn, poses):
    out = fn(poses[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(REPS):
        l = fn(poses[1 + i])
        float(jnp.ravel(jax.tree.leaves(l)[0])[0])
    ms = (time.perf_counter() - t0) / REPS / ITERS * 1e3
    print(f"| {name} | {ms:8.2f} |", flush=True)


def main():
    m, cam = _build_scene(1 << 17, cam_hw=(480, 640))
    g = m.activated()
    rs = RenderSettings(cam=cam, pair_cap=1 << 20, max_per_tile=1024,
                        chunk=32, max_tiles_per_gaussian=64, use_pallas=True)
    base = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)
    poses = [base.at[4].add(1e-3 * i) for i in range(REPS + 2)]
    out = render(g, base, rs)
    gt = jnp.clip(out["render"], 0, 1)
    zeros_d = jnp.zeros((cam.height, cam.width), jnp.float32)
    jax.block_until_ready(gt)
    print(f"backend={jax.default_backend()}  ({ITERS} iters, {REPS} reps)")
    print("| variant | ms/iter |\n|---|---|")

    # A. track_frame as-is
    ts = TrackSettings(rs=rs, iters=ITERS, method="vigs", use_gt_depth=True,
                       position_lr=0.001, rotation_lr=0.003, rebin_every=REBIN)
    run("A track_frame (blocked/nested)",
        jax.jit(lambda p: track_frame(g, p, gt, zeros_d, zeros_d, ts)[1]),
        poses)

    # B. flat loop, fixed bins, no cond
    def make_loss(bins):
        def loss_fn(q, T):
            pose = jnp.concatenate([q, T])
            o = render(g, pose, rs, bins=bins)
            sil = o["depth"][1]
            return masked_mean(jnp.abs(o["render"] - gt), (sil > 0.99)[None])
        return loss_fn

    def adam_step(i, carry, bins):
        q, T, mq, vq, mT, vT, _ = carry
        loss, (gq, gT) = jax.value_and_grad(make_loss(bins), argnums=(0, 1))(q, T)
        step = (i + 1).astype(jnp.float32)
        bc1 = 1.0 - 0.9**step
        bc2 = 1.0 - 0.999**step
        mq = 0.9 * mq + 0.1 * gq
        vq = 0.999 * vq + 0.001 * gq * gq
        q = q - 0.003 * (mq / bc1) / (jnp.sqrt(vq) / jnp.sqrt(bc2) + 1e-8)
        mT = 0.9 * mT + 0.1 * gT
        vT = 0.999 * vT + 0.001 * gT * gT
        T = T - 0.001 * (mT / bc1) / (jnp.sqrt(vT) / jnp.sqrt(bc2) + 1e-8)
        return (q, T, mq, vq, mT, vT, loss)

    def mkbins(pose):
        proj = project_for_pose(g, jax.lax.stop_gradient(pose), rs)
        return build_bins(proj, cam, rs.pair_cap, rs.max_tiles_per_gaussian,
                          align=CHUNK)

    @jax.jit
    def flat_fixed(p):
        bins = mkbins(p)
        z4 = jnp.zeros(4)
        z3 = jnp.zeros(3)
        c0 = (p[:4], p[4:], z4, z4, z3, z3, jnp.float32(0))
        c = jax.lax.fori_loop(0, ITERS, lambda i, c: adam_step(i, c, bins), c0)
        return c[-1]

    run("B flat loop, fixed bins", flat_fixed, poses)

    # C. flat loop, cond-rebin every REBIN iters (bins in carry)
    @jax.jit
    def flat_rebin(p):
        bins0 = mkbins(p)
        z4 = jnp.zeros(4)
        z3 = jnp.zeros(3)
        c0 = ((p[:4], p[4:], z4, z4, z3, z3, jnp.float32(0)), bins0)

        def body(i, cb):
            c, bins = cb
            bins = jax.lax.cond(
                jnp.mod(i, REBIN) == 0,
                lambda: mkbins(jnp.concatenate([c[0], c[1]])),
                lambda: bins,
            )
            return (adam_step(i, c, bins), bins)

        c, _ = jax.lax.fori_loop(0, ITERS, body, c0)
        return c[-1]

    run("C flat loop, cond-rebin (bins in carry)", flat_rebin, poses)

    # D. scan over rebin segments: bins rebuilt UNCONDITIONALLY at segment
    # start (a loop-invariant of the inner fori — no cond, bins not in any
    # carry). The rebin cadence is static, so this is semantically variant C
    # with the cond decided at trace time.
    @jax.jit
    def seg_scan(p):
        z4 = jnp.zeros(4)
        z3 = jnp.zeros(3)
        c0 = (p[:4], p[4:], z4, z4, z3, z3, jnp.float32(0))

        def seg(c, base_i):
            bins = mkbins(jnp.concatenate([c[0], c[1]]))
            c = jax.lax.fori_loop(
                0, REBIN, lambda j, cc: adam_step(base_i + j, cc, bins), c
            )
            return c, None

        c, _ = jax.lax.scan(
            seg, c0, jnp.arange(0, ITERS, REBIN, dtype=jnp.int32)
        )
        return c[-1]

    run("D scan segments, unconditional rebin", seg_scan, poses)


if __name__ == "__main__":
    main()

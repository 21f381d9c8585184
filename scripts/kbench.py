#!/usr/bin/env python
"""Fast A/B kernel bench at PRODUCTION knobs (mirrors bench.py's settings).

Isolates the compositor stages that dominate the per-iteration cost so
kernel edits can be measured in ~1 min instead of a full bench.py run:

  fwd        : fused pack+kernel forward (production path)
  fwd+bwd    : d/dpacked through _composite_packed (kernel bwd + table reduce)
  bwd kernel : _composite_pallas_bwd_rows alone (varied dacc)
  table_red  : _table_reduce alone (varied dpair rows)
  track 20it : ground truth — one jitted 20-iteration tracker segment

Timing rules per CLAUDE.md: chained VARIED dispatches accumulate into one
fetched scalar; null-dispatch baseline subtracted; tunnel throughput varies
±30% between minutes so only compare numbers within one run.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

_overhead_ms = 0.0


def timeit(name, fn, variants, reps, per=1.0):
    import jax
    import jax.numpy as jnp

    def scalar(v):
        leaf = jax.tree.leaves(fn(v))[0]
        return jnp.ravel(leaf)[0].astype(jnp.float32)

    acc = scalar(variants[0]) * 0.0
    for v in variants[:2]:
        acc = acc + scalar(v) * 0.0
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for i in range(reps):
        acc = acc + scalar(variants[i % len(variants)])
    float(acc)
    ms = ((time.perf_counter() - t0) / reps * 1e3 - _overhead_ms) / per
    print(f"| {name} | {ms:8.2f} |", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 17)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--track-iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_scene
    from mm3dgs_slam_tpu.ops.binning import build_bins
    from mm3dgs_slam_tpu.ops.pallas_composite import (
        CHUNK,
        _composite_packed,
        _composite_pallas_bwd_rows,
        _composite_pallas_fwd,
        _table_reduce,
        pack_pairs,
    )
    from mm3dgs_slam_tpu.ops.render import RenderSettings, render
    from mm3dgs_slam_tpu.slam.tracker import TrackSettings, _track_segment

    print(f"backend={jax.default_backend()} n={args.n} CHUNK={CHUNK}")
    m, cam = _build_scene(args.n, cam_hw=(480, 640))
    g = m.activated()
    # production knobs == bench.py
    rs = RenderSettings(cam=cam, pair_cap=1 << 20, max_per_tile=1024, chunk=32,
                        max_tiles_per_gaussian=16, use_pallas=True,
                        bin_d1=8, bin_big_frac=7)
    base = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)

    from mm3dgs_slam_tpu.ops.render import project_for_pose
    proj0 = jax.jit(lambda p: project_for_pose(g, p, rs))(base)
    bins0 = jax.jit(lambda p: build_bins(
        project_for_pose(g, p, rs), cam, rs.pair_cap,
        rs.max_tiles_per_gaussian, align=CHUNK, d1=rs.bin_d1,
        big_frac=rs.bin_big_frac))(base)
    jax.block_until_ready(bins0.pair_gauss)
    print(f"live pairs {int(bins0.n_pairs)}; aligned "
          f"{int(bins0.tile_start[-1] + bins0.tile_count[-1])}; "
          f"buffer cols {int(bins0.pair_gauss.shape[0])}; "
          f"overflow {bool(bins0.overflow)}")

    scales = [jnp.float32(1.0 + 1e-4 * i) for i in range(args.reps + 2)]
    print("| stage | ms |\n|---|---|")

    global _overhead_ms
    null = jax.jit(lambda s: s * 2.0)
    _overhead_ms = timeit("null dispatch", null, scales, args.reps)

    packed0 = proj0.packed

    def fwd_only(s):
        rows = pack_pairs(packed0 * s, bins0.pair_gauss)
        return _composite_pallas_fwd(rows, bins0.tile_start, bins0.tile_count,
                                     cam)[0]

    timeit("pack+kernel fwd", jax.jit(fwd_only), scales, args.reps)

    def closs(s):
        acc, tfin = _composite_packed(
            packed0 * s, bins0.pair_gauss, bins0.pair_valid,
            bins0.small_slots, bins0.big_slots, bins0.big_gauss,
            bins0.big_valid, bins0.gauss_rank, bins0.tile_start, bins0.tile_count,
            cam, False)
        return jnp.sum(acc) + jnp.sum(tfin)

    timeit("pack+kernel fwd+bwd (d/dpacked)", jax.jit(jax.grad(closs)),
           scales, args.reps)

    def closs16(s):
        acc, tfin = _composite_packed(
            packed0 * s, bins0.pair_gauss, bins0.pair_valid,
            bins0.small_slots, bins0.big_slots, bins0.big_gauss,
            bins0.big_valid, bins0.gauss_rank, bins0.tile_start, bins0.tile_count,
            cam, False, True)
        return jnp.sum(acc) + jnp.sum(tfin)

    timeit("pack+kernel fwd+bwd bf16 grads", jax.jit(jax.grad(closs16)),
           scales, args.reps)

    # bwd kernel alone (fixed rows/outputs, varied dacc)
    rows0 = jax.jit(lambda: pack_pairs(packed0, bins0.pair_gauss))()
    acc0, tfin0 = _composite_pallas_fwd(rows0, bins0.tile_start,
                                        bins0.tile_count, cam)
    jax.block_until_ready(acc0)

    def bwd_only(s):
        return _composite_pallas_bwd_rows(
            rows0, bins0.tile_start, bins0.tile_count, acc0, tfin0,
            jnp.full_like(acc0, s), jnp.full_like(tfin0, s), cam)

    timeit("bwd kernel alone", jax.jit(bwd_only), scales, args.reps)

    dpair0 = bwd_only(jnp.float32(1.0))
    jax.block_until_ready(dpair0)

    def tred(s):
        return _table_reduce(dpair0 * s, bins0.small_slots, bins0.big_slots,
                             bins0.big_gauss, bins0.big_valid, bins0.gauss_rank)

    timeit("table_reduce alone (incl dpair*s)", jax.jit(tred), scales,
           args.reps)

    # projection fwd+bwd wrt pose (tracker side): contract packed with a
    # fixed cotangent so only projection's own cost is measured
    key = jax.random.PRNGKey(0)
    w0 = jax.random.normal(key, proj0.packed.shape, jnp.float32) * 1e-3

    def ppose(p):
        return jnp.sum(project_for_pose(g, p, rs).packed * w0)

    poses_v = [base.at[4].add(1e-3 * i) for i in range(args.reps + 2)]
    timeit("projection fwd+bwd (d/dpose)", jax.jit(jax.grad(ppose)),
           poses_v, args.reps)

    # projection fwd+bwd wrt map params (mapper side)
    from mm3dgs_slam_tpu.models.gaussians import _PARAM_FIELDS, GaussianMap
    params0 = {f: getattr(m, f) for f in _PARAM_FIELDS}

    def pparams(s):
        mm = GaussianMap(**{k: v * s for k, v in params0.items()},
                         n_alive=m.n_alive)
        return jnp.sum(project_for_pose(mm.activated(), base, rs).packed * w0)

    timeit("activate+projection fwd+bwd (d/dparams)",
           jax.jit(jax.grad(pparams)), scales, args.reps)

    # image assembly + L1 loss fwd+bwd from fixed tile outputs
    out0f = render(g, base, rs, bins=bins0)
    gt0 = jnp.clip(out0f["render"], 0, 1)
    jax.block_until_ready(gt0)
    from mm3dgs_slam_tpu.ops.camera import TILE
    from mm3dgs_slam_tpu.ops.losses import masked_mean

    def assemble_loss(ac, s):
        acc2, tfin2 = ac[0] * s, ac[1]
        bg = jnp.zeros((6,), jnp.float32)
        out = acc2 + tfin2 * bg[None, None, :]
        ty, tx = cam.tiles_y, cam.tiles_x
        img = out.reshape(ty, tx, TILE, TILE, 6)
        img = img.transpose(4, 0, 2, 1, 3).reshape(6, ty * TILE, tx * TILE)
        img = img[:, :cam.height, :cam.width]
        sil = img[4]
        return masked_mean(jnp.abs(img[:3] - gt0), (sil > 0.99)[None])

    agrad = jax.jit(jax.grad(assemble_loss, argnums=1))
    timeit("assembly+L1 fwd+bwd (d/dacc)",
           lambda s: agrad((acc0, tfin0), s), scales, args.reps)

    # ground truth: one jitted tracker segment, per-iteration
    out0 = render(g, base, rs, bins=bins0)
    gt_color = jnp.clip(out0["render"], 0, 1)
    jax.block_until_ready(gt_color)
    ts = TrackSettings(rs=rs._replace(grad_bf16=True), iters=args.track_iters,
                       method="vigs", use_gt_depth=True, position_lr=0.001,
                       rotation_lr=0.003, rebin_every=args.track_iters)
    z4 = jnp.zeros(4)
    z3 = jnp.zeros(3)
    zdep = jnp.zeros((480, 640), jnp.float32)

    def seg(s):
        carry = (base[:4] * s, base[4:], z4, z4, z3, z3, jnp.float32(0.0))
        out = _track_segment(g, carry, bins0, jnp.asarray(0, jnp.int32),
                             gt_color, zdep, zdep, base, ts, args.track_iters)
        return out[-1]

    timeit(f"track segment ({args.track_iters} it) per-iter", jax.jit(seg),
           scales, max(args.reps // 2, 3), per=args.track_iters)

    # loop-level bisection: same fori_loop dispatch shape, loss fwd ONLY
    from mm3dgs_slam_tpu.slam.tracker import tracking_loss

    def seg_fwd(s):
        def body(j, c):
            q, acc = c
            pose = jnp.concatenate([q, base[4:]])
            l = tracking_loss(g, pose, gt_color, zdep, zdep, base, ts, bins0)
            return (q + 1e-9 * l, acc + l)

        return jax.lax.fori_loop(0, args.track_iters, body,
                                 (base[:4] * s, jnp.float32(0.0)))[1]

    timeit(f"track fwd-only loop ({args.track_iters} it) per-iter",
           jax.jit(seg_fwd), scales, max(args.reps // 2, 3),
           per=args.track_iters)


if __name__ == "__main__":
    main()

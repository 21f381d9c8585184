#!/usr/bin/env python
"""Stage-isolation profile of the track/map hot path on real TPU.

Times each pipeline stage independently at the bench configuration
(131k pixel-scale Gaussians, 640x480) so the per-iteration cost can be
attributed. Follows the environment timing rules (CLAUDE.md): inputs VARY
between repetitions and every rep forces a host fetch — the tunneled remote
layer dedupes identical dispatches and reports fantasy numbers otherwise.

Usage: python scripts/profile_hotpath.py [--n 131072] [--reps 5]
Writes a markdown table to stdout; paste into PROFILE.md.
"""
import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


_overhead_ms = 0.0


def timeit(name, fn, variants, reps):
    """fn(v) -> jax array(s). The tunnel costs ~tens of ms per
    dispatch+fetch round trip, so chain `reps` VARIED calls (dedup trap)
    whose first-leaf scalars accumulate into ONE fetched value; enqueue is
    async so wall-clock ≈ sum of device times + one round trip. The caller
    measures a null dispatch first and we subtract it."""
    import jax
    import jax.numpy as jnp

    def scalar(v):
        leaf = jax.tree.leaves(fn(v))[0]
        return jnp.ravel(leaf)[0].astype(jnp.float32)

    acc = scalar(variants[0]) * 0.0
    for v in variants[:3]:  # warm/compile incl. accumulate graph
        acc = acc + scalar(v) * 0.0
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for i in range(reps):
        acc = acc + scalar(variants[i % len(variants)])
    float(acc)
    ms = (time.perf_counter() - t0) / reps * 1e3 - _overhead_ms
    print(f"| {name} | {ms:8.2f} |", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 17)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--hw", type=str, default="480x640")
    args = ap.parse_args()
    H, W = map(int, args.hw.split("x"))

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_scene
    from mm3dgs_slam_tpu.models import gaussians as G
    from mm3dgs_slam_tpu.ops.binning import build_bins
    from mm3dgs_slam_tpu.ops.losses import l1_loss, masked_mean, ssim
    from mm3dgs_slam_tpu.ops.pallas_composite import (
        CHUNK,
        composite_pairs_pallas,
        composite_tiles_pallas,
        pack_pairs,
    )
    from mm3dgs_slam_tpu.ops.render import (
        RenderSettings,
        background,
        project_for_pose,
        render,
    )

    print(f"backend={jax.default_backend()} n={args.n} hw={H}x{W}")
    m, cam = _build_scene(args.n, cam_hw=(H, W))
    g = m.activated()
    rs = RenderSettings(cam=cam, pair_cap=1 << 20, max_per_tile=1024, chunk=32,
                        max_tiles_per_gaussian=64, use_pallas=True)
    base = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)
    poses = [base.at[4].add(1e-3 * i) for i in range(max(args.reps, 4) + 4)]

    print("| stage | ms |\n|---|---|")

    global _overhead_ms
    null = jax.jit(lambda p: p * 2.0)
    _overhead_ms = timeit("null dispatch (overhead/rep)", null, poses,
                          args.reps)

    # --- projection fwd ---------------------------------------------------
    proj_fn = jax.jit(lambda p: project_for_pose(g, p, rs))
    timeit("projection fwd", proj_fn, poses, args.reps)

    # --- build_bins (align=CHUNK) ------------------------------------------
    @jax.jit
    def bins_fn(p):
        proj = project_for_pose(g, p, rs)
        return build_bins(proj, cam, rs.pair_cap, rs.max_tiles_per_gaussian,
                          align=CHUNK)

    timeit("projection + build_bins", bins_fn, poses, args.reps)

    proj0 = proj_fn(poses[0])
    bins0 = bins_fn(poses[0])
    jax.block_until_ready(bins0.pair_gauss)
    n_pairs = int(bins0.n_pairs)
    buf_cols = int(bins0.pair_gauss.shape[0])
    aligned_pairs = int(bins0.tile_start[-1] + bins0.tile_count[-1])
    print(f"| (live pairs {n_pairs}; aligned {aligned_pairs}; buffer cols {buf_cols}) | |")

    # --- pack fwd (gather into [16, buf]) ----------------------------------
    @jax.jit
    def pack_fn(p):
        proj = project_for_pose(g, p, rs)
        return pack_pairs(proj.packed, bins0.pair_gauss, bins0.pair_valid)

    t_pack = timeit("projection + pack fwd", pack_fn, poses, args.reps)

    # --- kernel fwd (fixed pair data, vary a scale) -------------------------
    pd0 = pack_fn(poses[0])
    jax.block_until_ready(pd0)
    kf = jax.jit(lambda s: composite_pairs_pallas(
        pd0 * s, bins0.tile_start, bins0.tile_count, cam)[0])
    scales = [jnp.float32(1.0 + 1e-4 * i) for i in range(args.reps + 4)]
    timeit("kernel fwd (incl. pd*s)", kf, scales, args.reps)

    # --- kernel fwd+bwd w.r.t. pair data ------------------------------------
    def kloss(s):
        acc, tfin = composite_pairs_pallas(pd0 * s, bins0.tile_start,
                                           bins0.tile_count, cam)
        return jnp.sum(acc) + jnp.sum(tfin)

    kfb = jax.jit(jax.grad(kloss))
    timeit("kernel fwd+bwd (d/dpair)", kfb, scales, args.reps)

    # --- full render fwd (pallas, incl bins) --------------------------------
    rfull = jax.jit(lambda p: render(g, p, rs)["render"])
    timeit("render fwd (incl bins)", rfull, poses, args.reps)

    # --- render fwd with cached bins ----------------------------------------
    rcached = jax.jit(lambda p: render(g, p, rs, bins=bins0)["render"])
    timeit("render fwd (cached bins)", rcached, poses, args.reps)

    # --- tracker-style loss fwd+bwd w.r.t. pose (cached bins) ---------------
    out0 = render(g, poses[0], rs, bins=bins0)
    gt_color = jnp.clip(out0["render"], 0, 1)
    jax.block_until_ready(gt_color)

    def tloss(p):
        out = render(g, p, rs, bins=bins0)
        sil = out["depth"][1]
        return masked_mean(jnp.abs(out["render"] - gt_color), (sil > 0.99)[None])

    tgrad = jax.jit(jax.value_and_grad(tloss))
    timeit("track loss fwd+bwd (cached bins)", tgrad, poses, args.reps)

    # --- map-style loss fwd+bwd w.r.t. all params (cached bins) -------------
    from mm3dgs_slam_tpu.models.gaussians import _PARAM_FIELDS, GaussianMap

    params0 = {f: getattr(m, f) for f in _PARAM_FIELDS}

    def mloss(params, p):
        mm = GaussianMap(**params, n_alive=m.n_alive)
        out = render(mm.activated(), p, rs, bins=bins0)
        return 0.8 * l1_loss(out["render"], gt_color) + 0.2 * (
            1.0 - ssim(out["render"], gt_color))

    mgrad = jax.jit(jax.grad(mloss))
    timeit("map loss fwd+bwd (L1+SSIM, cached bins)",
           lambda p: mgrad(params0, p), poses, args.reps)

    # --- map loss without SSIM ----------------------------------------------
    def mloss_l1(params, p):
        mm = GaussianMap(**params, n_alive=m.n_alive)
        out = render(mm.activated(), p, rs, bins=bins0)
        return l1_loss(out["render"], gt_color)

    mgrad_l1 = jax.jit(jax.grad(mloss_l1))
    timeit("map loss fwd+bwd (L1 only, cached bins)",
           lambda p: mgrad_l1(params0, p), poses, args.reps)

    # --- SSIM alone ----------------------------------------------------------
    imgs = [jnp.clip(gt_color + 1e-3 * i, 0, 1) for i in range(args.reps + 4)]
    sgrad = jax.jit(jax.grad(lambda x: 1.0 - ssim(x, gt_color)))
    timeit("SSIM fwd+bwd (3ch 640x480)", sgrad, imgs, args.reps)

    # --- Adam over the map pytree --------------------------------------------
    adam0 = G.init_adam(m)
    hyper = G.MapOptHyper(lr_xyz=1e-4, lr_features_dc=2.5e-3,
                          lr_features_rest=1.25e-4, lr_scaling=1e-3,
                          lr_rotation=1e-3, lr_opacity=5e-2, lr_rgb=2.5e-3)

    @jax.jit
    def adam_fn(s):
        gm = jax.tree.map(lambda x: x * 0 + s, m)
        gm = gm._replace(n_alive=m.n_alive)
        m2, a2 = G.adam_update(m, gm, adam0, hyper)
        return m2.xyz

    timeit("map Adam step", adam_fn, scales, args.reps)

    # --- fused pack+composite fwd+bwd (the production tables path) ----------
    from mm3dgs_slam_tpu.ops.pallas_composite import _composite_packed

    def closs(packed, s):
        acc, tfin = _composite_packed(
            packed * s, bins0.pair_gauss, bins0.pair_valid,
            bins0.small_slots, bins0.big_slots, bins0.big_gauss,
            bins0.big_valid, bins0.gauss_rank, bins0.tile_start, bins0.tile_count,
            cam, False)
        return jnp.sum(acc) + jnp.sum(tfin)

    cgrad = jax.jit(jax.grad(closs))
    timeit("fused pack+kernel fwd+bwd (d/dpacked)",
           lambda s: cgrad(proj0.packed, s), scales, args.reps)


if __name__ == "__main__":
    main()

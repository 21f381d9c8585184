#!/usr/bin/env python
"""Round-4 binning drill-down. probe_bins_cost found the aligned-relayout
stage (+5.7 ms), cull stage (+2.8) and reverse tables (+2.1) dominate the
~12 ms device cost of build_bins. This probe sub-decomposes the relayout
(searchsorted | delta-scan | scatter) and A/Bs candidate optimizations:

  V1  f32-reciprocal div/mod in _candidate_tiles + _tile_alpha_cull
      (integer div/mod are multi-pass on the VPU; d<16, w<16, tile ids
      < 2^23 are all f32-exact)
  V2  two-level fill-forward (reshape [P/128, 128]: in-row lane max-scan +
      tiny block carry scan) replacing the generic associative_scan
  V3  slice the tile-sorted candidate stream to pair_cap before the
      relayout + reverse tables (dead candidates sort last; -24% P), with
      the reverse table built by scatter instead of a second sort
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

K = 10
REPS = 5
N = 1 << 17


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _build_scene
    from mm3dgs_slam_tpu.ops import binning as B
    from mm3dgs_slam_tpu.ops.pallas_composite import CHUNK
    from mm3dgs_slam_tpu.ops.render import RenderSettings, project_for_pose

    m, cam = _build_scene(N, cam_hw=(480, 640))
    g = m.activated()
    rs = RenderSettings(cam=cam, pair_cap=1 << 19, max_per_tile=1024,
                        chunk=32, max_tiles_per_gaussian=16, use_pallas=True,
                        bin_d1=4, bin_big_frac=7, bin_d2_live=8)
    base = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)
    D2 = 16
    tiles_x, tiles_y = cam.tiles_x, cam.tiles_y
    n_tiles = tiles_x * tiles_y

    def proj_of(s):
        return project_for_pose(g, base.at[4].add(s * 1e-5), rs)

    def cand_f32(x0, rect_w, y0, count, n_slots):
        d = jnp.arange(n_slots, dtype=jnp.int32)[None, :]
        w = jnp.maximum(rect_w, 1)[:, None]
        dy = jnp.floor(d.astype(jnp.float32)
                       * (1.0 / w.astype(jnp.float32))).astype(jnp.int32)
        dx = d - dy * w
        tile = (y0[:, None] + dy) * tiles_x + (x0[:, None] + dx)
        return jnp.where(d < count[:, None], tile, -1)

    def cull_f32(tile, xy, conic, tau):
        t = float(B.TILE)
        tsafe = jnp.maximum(tile, 0)
        ty = jnp.floor(tsafe.astype(jnp.float32)
                       * (1.0 / tiles_x)).astype(jnp.int32)
        tx = tsafe - ty * tiles_x
        lx = tx.astype(jnp.float32) * t - xy[:, 0:1]
        ly = ty.astype(jnp.float32) * t - xy[:, 1:2]
        hx = lx + (t - 1.0)
        hy = ly + (t - 1.0)
        a, b, c = conic[:, 0:1], conic[:, 1:2], conic[:, 2:3]

        def qval(x, y):
            return 0.5 * a * x * x + b * x * y + 0.5 * c * y * y

        def edge_x(ex):
            ystar = jnp.clip(-b * ex / jnp.maximum(c, 1e-12), ly, hy)
            return qval(ex, ystar)

        def edge_y(ey):
            xstar = jnp.clip(-b * ey / jnp.maximum(a, 1e-12), lx, hx)
            return qval(xstar, ey)

        qmin = jnp.minimum(jnp.minimum(edge_x(lx), edge_x(hx)),
                           jnp.minimum(edge_y(ly), edge_y(hy)))
        inside = (lx <= 0) & (hx >= 0) & (ly <= 0) & (hy >= 0)
        qmin = jnp.where(inside, 0.0, qmin)
        mx = jnp.maximum(jnp.abs(lx), jnp.abs(hx))
        my = jnp.maximum(jnp.abs(ly), jnp.abs(hy))
        margin = 1e-3 + 1e-5 * (0.5 * a * mx * mx + jnp.abs(b) * mx * my
                                + 0.5 * c * my * my)
        keep = (tile >= 0) & (qmin <= tau[:, None] + margin)
        return jnp.where(keep, tile, -1)

    def front(proj, f32div):
        """Stages through the fused sort; returns sort outputs."""
        xy = proj.xy
        depth = proj.depth
        radius = jnp.where(proj.opacity >= (1.0 / 255.0), proj.radius, 0)
        order = jnp.argsort(
            jnp.where(radius > 0, depth, jnp.inf)).astype(jnp.int32)
        xy = xy[order]
        radius = radius[order]
        x0, x1, y0, y1 = B.gaussian_tile_rect(xy, radius, tiles_x, tiles_y)
        rect_w = jnp.maximum(x1 - x0, 0)
        rect_h = jnp.maximum(y1 - y0, 0)
        count = jnp.minimum(jnp.where(radius > 0, rect_w * rect_h, 0), D2)
        conic = proj.conic[order]
        op = proj.opacity[order]
        tau = jnp.log(jnp.maximum(255.0 * op, 1e-12))
        if f32div:
            tileA = cand_f32(x0, rect_w, y0, count, D2)
            tileA = cull_f32(tileA, xy, conic, tau)
        else:
            tileA = B._candidate_tiles(x0, rect_w, y0, count, D2, tiles_x)
            tileA = B._tile_alpha_cull(tileA, xy, conic, tau, tiles_x)
        d_iota = jnp.broadcast_to(
            jnp.arange(D2, dtype=jnp.int32)[None, :], tileA.shape)
        ckey = jnp.where(tileA >= 0, d_iota, jnp.int32(1 << 30))
        _, tileA = jax.lax.sort((ckey, tileA), num_keys=1, dimension=1)
        count_kept = jnp.sum((tileA >= 0).astype(jnp.int32), axis=1)
        is_big = count_kept > 4
        tile1 = jnp.where(is_big[:, None], -1, tileA[:, :4])
        big_cap = max(N // 7, 1)
        big_sel = jnp.argsort(~is_big, stable=True).astype(jnp.int32)[:big_cap]
        big_valid = is_big[big_sel]
        tile2 = jnp.where(big_valid[:, None], tileA[big_sel][:, :8], -1)
        n_pad = N
        sentinel = n_tiles * n_pad
        rank1 = jnp.arange(N, dtype=jnp.int32)[:, None]
        rank2 = big_sel[:, None]
        gauss1 = jnp.broadcast_to(order[:, None], tile1.shape)
        gauss2 = jnp.broadcast_to(order[big_sel][:, None], tile2.shape)
        cand_gauss = jnp.concatenate([gauss1.reshape(-1),
                                      gauss2.reshape(-1)])
        P = cand_gauss.shape[0]
        cand_idx = jnp.arange(P, dtype=jnp.int32)
        key1 = jnp.where(tile1 >= 0, tile1 * n_pad + rank1, sentinel)
        key2 = jnp.where(tile2 >= 0, tile2 * n_pad + rank2, sentinel)
        keys = jnp.concatenate([key1.reshape(-1), key2.reshape(-1)])
        keys, pair_gauss, pair_cand = jax.lax.sort(
            (keys, cand_gauss, cand_idx), num_keys=1, is_stable=True)
        pair_tile = jnp.where(keys < sentinel, keys // n_pad, n_tiles)
        return pair_tile, pair_gauss, pair_cand

    def seg_bounds(pair_tile):
        tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
        ts = jnp.searchsorted(pair_tile, tile_ids,
                              side="left").astype(jnp.int32)
        te = jnp.searchsorted(pair_tile, tile_ids,
                              side="right").astype(jnp.int32)
        return ts, te - ts

    def scan2(steps):
        """Two-level fill-forward max-scan over [P] int32."""
        P = steps.shape[0]
        W = 128
        nb = P // W
        s2 = steps[: nb * W].reshape(nb, W)
        # in-row inclusive max scan (log2 W shifted maxes)
        x = s2
        sh = 1
        while sh < W:
            shifted = jnp.pad(x, ((0, 0), (sh, 0)))[:, :W]
            x = jnp.maximum(x, shifted)
            sh *= 2
        row_max = x[:, -1]
        carry = jax.lax.associative_scan(jnp.maximum, row_max)
        carry = jnp.concatenate([jnp.zeros((1,), steps.dtype), carry[:-1]])
        out = jnp.maximum(x, carry[:, None]).reshape(-1)
        if P > nb * W:
            tail = jax.lax.associative_scan(
                jnp.maximum, jnp.concatenate([out[-1:], steps[nb * W:]]))
            out = jnp.concatenate([out, tail[1:]])
        return out

    align = CHUNK

    def relayout(pair_tile, pair_gauss, pair_cand, two_level, rev,
                 rev_scatter=False, slice_cap=0):
        ts, tc = seg_bounds(pair_tile)
        P = pair_gauss.shape[0]
        pair_valid = pair_tile < n_tiles
        aligned_sizes = ((tc + align - 1) // align) * align
        aligned_start = (jnp.cumsum(aligned_sizes)
                         - aligned_sizes).astype(jnp.int32)
        if slice_cap:
            # dead candidates sorted last; static-slice them away before
            # the P-sized relayout ops
            pair_gauss = pair_gauss[:slice_cap]
            pair_cand = pair_cand[:slice_cap]
            pair_valid = pair_valid[:slice_cap]
            P = slice_cap
        buf_cap = 1 << 19
        delta = aligned_start - ts
        steps = jnp.zeros((P,), jnp.int32).at[ts].max(delta, mode="drop")
        pair_delta = (scan2(steps) if two_level
                      else jax.lax.associative_scan(jnp.maximum, steps))
        target = jnp.where(pair_valid,
                           jnp.arange(P, dtype=jnp.int32) + pair_delta,
                           buf_cap)
        pg = jnp.full((buf_cap,), N, jnp.int32).at[target].set(
            pair_gauss, mode="drop")
        out = jnp.sum(pg % 13).astype(jnp.float32)
        if rev:
            if rev_scatter:
                soc = jnp.full((N * 4 + (N // 7) * 8,), B.SLOT_SENTINEL,
                               jnp.int32).at[pair_cand].set(
                    jnp.where(pair_valid, target, B.SLOT_SENTINEL),
                    mode="drop")
            else:
                _, soc = jax.lax.sort(
                    (pair_cand,
                     jnp.where(pair_valid, target, B.SLOT_SENTINEL)),
                    num_keys=1)
            out = out + jnp.sum(soc[: N * 4] % 13).astype(jnp.float32)
        return out

    def v(name, fn):
        @jax.jit
        def run(s0):
            def body(i, s):
                return s + fn(proj_of(s * 1e-9 + i))
            return jax.lax.fori_loop(0, K, body, s0)
        return name, run

    variants = dict([
        v("null", lambda p: jnp.sum(p.xy[:64, 0])),
        v("A_front", lambda p: jnp.sum(front(p, False)[0] % 7)
          .astype(jnp.float32)),
        v("A_front_f32div", lambda p: jnp.sum(front(p, True)[0] % 7)
          .astype(jnp.float32)),
        v("B_seg_only", lambda p: (lambda pt, pgs, pc: jnp.sum(
            seg_bounds(pt)[1]).astype(jnp.float32))(*front(p, False))),
        v("C_scan_generic", lambda p: relayout(*front(p, False), False,
                                               False)),
        v("C_scan_2level", lambda p: relayout(*front(p, False), True,
                                              False)),
        v("D_full_sortrev", lambda p: relayout(*front(p, False), True,
                                               True)),
        v("D_full_scatrev", lambda p: relayout(*front(p, False), True,
                                               True, rev_scatter=True)),
        v("E_full_sliced", lambda p: relayout(*front(p, False), True,
                                              True, rev_scatter=True,
                                              slice_cap=1 << 19)),
    ])
    times = {k: [] for k in variants}
    for rep in range(REPS):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            out = fn(jnp.float32(rep + 1))
            float(out)
            dt = time.perf_counter() - t0
            if rep:
                times[name].append(dt)
            print(f"rep {rep} {name}: {dt / K * 1e3:.2f} ms/call",
                  flush=True)
    base_t = sorted(times["null"])[len(times["null"]) // 2]
    print()
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        print(f"{name}: median {med / K * 1e3:.2f} ms/call "
              f"({(med - base_t) / K * 1e3:+.2f} vs null)")


if __name__ == "__main__":
    main()

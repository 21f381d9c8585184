"""Tile binning: build depth-sorted per-tile Gaussian pair lists.

TPU-native replacement for the CUDA rasterizer's duplicated-key radix sort.
Design driven by measured TPU primitive costs (sort ~4 ms/M keys; scatter
~8 ms/M elements — scatters are the thing to avoid):

  1. depth-argsort the GAUSSIANS (N keys, cheap) so any stable tile ordering
     inherits front-to-back order,
  2. emit tile candidates DENSELY, no scatter: every Gaussian owns D1 slots
     ([N, D1]); the few Gaussians covering more than D1 tiles are compacted
     into a big-tier block ([BIG_CAP, D2]). Empty slots get a sentinel key,
  3. ONE fused-key sort: key = tile * N_pad + depth_rank packs (tile, depth)
     into a single int32 (falls back to a 2-key lexicographic sort when the
     pack would overflow), values = gaussian ids,
  4. per-tile segment bounds via vectorized searchsorted,
  5. (pallas path) one scatter re-layout so every segment start is
     chunk-aligned for the kernel's DMA.

Binning is a *selection* (non-differentiable by design — the CUDA kernel's
sort isn't differentiated either); gradients flow through the subsequent
gather + composite. Because binning is pure jnp it can be refreshed inside a
jitted optimization loop, or cached across iterations when the geometry
barely moves (pose deltas during tracking).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .camera import TILE, Camera
from .projection import ProjectedGaussians

D1 = 8          # dense candidate slots per gaussian (covers rects <= 8 tiles)
BIG_FRAC = 8    # big-tier capacity = capacity // BIG_FRAC


SLOT_SENTINEL = 1 << 30  # out-of-bounds slot -> gathered as 0 (mode='fill')


class TileBins(NamedTuple):
    pair_gauss: jnp.ndarray   # [P] int32 gaussian index, (tile, depth)-sorted
    pair_valid: jnp.ndarray   # [P] bool
    tile_start: jnp.ndarray   # [n_tiles] int32 segment start into pair_gauss
    tile_count: jnp.ndarray   # [n_tiles] int32 segment length
    n_pairs: jnp.ndarray      # [] int32 total emitted pairs
    overflow: jnp.ndarray     # [] bool, True if pairs were dropped/truncated
    # Reverse tables (align>0 only): for each gaussian, the buffer slots of
    # its pairs — turns the pack-gather's backward from a P-sized scatter-add
    # into fixed-width gathers + sums (TPU scatters are ~25x slower than
    # gathers). None on the non-pallas path.
    #
    # small_slots rows are keyed by ORIGINAL gaussian id. A depth-ordered
    # row layout (depth-adjacent rows gather adjacent buffer slots, plus a
    # final [N]-row un-permute in the reduce) was the round-3 lever-1
    # candidate and measured slightly SLOWER in a same-process A/B on v5e
    # (7.65-8.9 vs 7.2-7.3 ms/iter reduce loop, scripts/probe_reduce_order
    # .py): TPU row-gather cost is index-locality-insensitive at this
    # scale, so the extra gather only adds. Kept behind
    # build_bins(depth_tables=True) + `gauss_rank` for re-measurement on
    # other topologies.
    small_slots: jnp.ndarray | None = None  # [N, D1] int32 (SLOT_SENTINEL pad)
    big_slots: jnp.ndarray | None = None    # [big_cap, D2] int32
    big_gauss: jnp.ndarray | None = None    # [big_cap] int32 gaussian ids
    big_valid: jnp.ndarray | None = None    # [big_cap] bool
    gauss_rank: jnp.ndarray | None = None   # [N] int32 original id -> depth
                                            # row (depth_tables=True only)


def gaussian_tile_rect(xy, radius, tiles_x, tiles_y):
    """Tile-rect covered by each Gaussian (CUDA getRect semantics)."""
    r = radius.astype(jnp.float32)
    x0 = jnp.clip(jnp.floor((xy[:, 0] - r) / TILE), 0, tiles_x).astype(jnp.int32)
    x1 = jnp.clip(jnp.floor((xy[:, 0] + r + TILE - 1) / TILE), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor((xy[:, 1] - r) / TILE), 0, tiles_y).astype(jnp.int32)
    y1 = jnp.clip(jnp.floor((xy[:, 1] + r + TILE - 1) / TILE), 0, tiles_y).astype(jnp.int32)
    return x0, x1, y0, y1


def _candidate_tiles(x0, rect_w, y0, count, n_slots, tiles_x):
    """Row-major rect cells -> tile ids [N, n_slots]; -1 beyond count.

    The cell split d -> (dy, dx) uses an f32 reciprocal-multiply floor
    instead of integer division (multi-pass on the VPU; measured
    -0.7 ms/build at 131k gaussians, scripts/probe_bins_cost2.py): the
    reciprocal is one [N]-sized divide, the [N, n_slots] block pays only a
    multiply+floor. Exact because d < n_slots <= 64 and w >= 1 put
    (d + 0.5)/w at least 0.5/64 away from any integer while the f32
    product error is < 1e-5."""
    d = jnp.arange(n_slots, dtype=jnp.int32)[None, :]
    w = jnp.maximum(rect_w, 1)[:, None]
    w_recip = 1.0 / w.astype(jnp.float32)
    dy = jnp.floor((d.astype(jnp.float32) + 0.5) * w_recip).astype(jnp.int32)
    dx = d - dy * w
    tile = (y0[:, None] + dy) * tiles_x + (x0[:, None] + dx)
    return jnp.where(d < count[:, None], tile, -1)


def _tile_alpha_cull(tile, xy, conic, tau, tiles_x, n_tiles=None):
    """Drop candidate (gaussian, tile) pairs that are provably no-ops.

    The rect test (CUDA getRect semantics) keeps every tile of the radius
    BOUNDING BOX, but a pair only ever contributes where its per-pixel
    alpha = op * exp(power) clears the compositor's 1/255 skip rule — the
    box corners of a multi-tile splat never do. With Q(d) = -power =
    0.5*a*dx^2 + b*dx*dy + 0.5*c*dy^2 (convex: conic is the PD inverse
    2D covariance), the EXACT minimum of Q over the tile's pixel box is
    either the interior stationary point (the center, Q=0) or the minimum
    over one of the 4 edges — each a 1D convex quadratic with a closed-form
    clamped argmin. Pairs with min Q > log(255*op) have alpha < 1/255 at
    EVERY pixel of the tile, so every compositor (oracle / XLA / Pallas)
    already treats them as exact zeros; culling them here only removes dead
    kernel chunks. A small fp-error margin keeps any pair whose bound is
    within the kernels' evaluation-order error envelope, so the output
    stays bit-identical. (Public-3DGS analogue: the "tight culling" /
    SnugBox refinement of the CUDA rasterizer's getRect.)

    tile: [M, D] global tile ids (-1 = empty); xy/conic/tau: per-row
    gaussian params aligned with tile's rows. Returns tile with culled
    entries set to -1."""
    t = float(TILE)
    tsafe = jnp.maximum(tile, 0)
    if n_tiles is not None and n_tiles < (1 << 22):
        # f32 reciprocal-multiply floor for the tile-id split (integer
        # div/mod are multi-pass VPU ops — probe_bins_cost2.py measured
        # -0.7 ms/build together with _candidate_tiles' variant): exact
        # while (id + 0.5)/tiles_x keeps its 0.5/tiles_x distance from
        # integers above the f32 product error (~(n_tiles/tiles_x) *
        # 1.2e-7), i.e. for any grid below ~4M tiles.
        ty = jnp.floor((tsafe.astype(jnp.float32) + 0.5)
                       * (1.0 / tiles_x)).astype(jnp.int32)
        tx = tsafe - ty * tiles_x
    else:
        tx = tsafe % tiles_x
        ty = tsafe // tiles_x
    lx = tx.astype(jnp.float32) * t - xy[:, 0:1]
    ly = ty.astype(jnp.float32) * t - xy[:, 1:2]
    hx = lx + (t - 1.0)
    hy = ly + (t - 1.0)
    a = conic[:, 0:1]
    b = conic[:, 1:2]
    c = conic[:, 2:3]

    def qval(x, y):
        return 0.5 * a * x * x + b * x * y + 0.5 * c * y * y

    def edge_x(ex):  # x = ex fixed, minimize over y in [ly, hy]
        ystar = jnp.clip(-b * ex / jnp.maximum(c, 1e-12), ly, hy)
        return qval(ex, ystar)

    def edge_y(ey):
        xstar = jnp.clip(-b * ey / jnp.maximum(a, 1e-12), lx, hx)
        return qval(xstar, ey)

    qmin = jnp.minimum(
        jnp.minimum(edge_x(lx), edge_x(hx)),
        jnp.minimum(edge_y(ly), edge_y(hy)),
    )
    inside = (lx <= 0) & (hx >= 0) & (ly <= 0) & (hy >= 0)
    qmin = jnp.where(inside, 0.0, qmin)
    # fp-error envelope of the kernels' own power evaluation (different
    # associativity): absolute floor + a few ulps of the largest term.
    mx = jnp.maximum(jnp.abs(lx), jnp.abs(hx))
    my = jnp.maximum(jnp.abs(ly), jnp.abs(hy))
    margin = 1e-3 + 1e-5 * (0.5 * a * mx * mx + jnp.abs(b) * mx * my
                            + 0.5 * c * my * my)
    keep = (tile >= 0) & (qmin <= tau[:, None] + margin)
    return jnp.where(keep, tile, -1)


def _fill_forward_max(steps: jnp.ndarray) -> jnp.ndarray:
    """Inclusive running max over [P] int32 — PRECONDITION: steps >= 0
    (the zero pad/carry seeds act as the scan identity only for
    non-negative inputs; negative values would be silently clamped at 0).
    The caller's steps are aligned_start - tile_start deltas, provably
    >= 0. Two-level: in-row lane scans on a [P/128, 128] view (log2(128)
    shifted maxes, pure VPU) + a 128x-smaller carry scan over row maxima.
    XLA's generic associative_scan lowers to full-width passes and measured
    0.9 ms slower per build at 131k gaussians (scripts/probe_bins_cost2.py
    C_scan_generic vs C_scan_2level).
    """
    P = steps.shape[0]
    W = 128
    nb = P // W
    if nb < 2:
        return jax.lax.associative_scan(jnp.maximum, steps)
    x = steps[: nb * W].reshape(nb, W)
    sh = 1
    while sh < W:
        x = jnp.maximum(x, jnp.pad(x, ((0, 0), (sh, 0)))[:, :W])
        sh *= 2
    carry = jax.lax.associative_scan(jnp.maximum, x[:, -1])
    carry = jnp.concatenate([jnp.zeros((1,), steps.dtype), carry[:-1]])
    out = jnp.maximum(x, carry[:, None]).reshape(-1)
    if P > nb * W:
        tail = jax.lax.associative_scan(
            jnp.maximum, jnp.concatenate([out[-1:], steps[nb * W:]])
        )
        out = jnp.concatenate([out, tail[1:]])
    return out


@partial(jax.jit, static_argnames=("cam", "max_tiles_per_gaussian", "d1"))
def binning_diagnostics(proj: ProjectedGaussians, cam: Camera,
                        max_tiles_per_gaussian: int = 64, d1: int = D1):
    """Cheap overflow surfacing (one dispatch): how close the scene is to the
    static binning caps. Returns (n_pairs, n_big, max_rect, max_tile_count).
    The production loop host-checks these once per frame — the CUDA
    reference sizes its buffers exactly per frame, so a silent cap breach
    here would be a silent quality loss there is no analogue for."""
    xy = proj.xy
    radius = proj.radius
    x0, x1, y0, y1 = gaussian_tile_rect(xy, radius, cam.tiles_x, cam.tiles_y)
    rect = jnp.maximum(x1 - x0, 0) * jnp.maximum(y1 - y0, 0)
    count = jnp.where(radius > 0, rect, 0)
    D2 = max(max_tiles_per_gaussian, d1)
    n_pairs = jnp.sum(jnp.minimum(count, D2))
    n_big = jnp.sum(count > d1)
    max_rect = jnp.max(count)
    # per-tile load: upper bound via center-tile histogram is another sort;
    # approximate with total/n_tiles average + max rect (cheap, monotone)
    return n_pairs, n_big, max_rect


@partial(
    jax.jit,
    static_argnames=("cam", "pair_cap", "max_tiles_per_gaussian", "align",
                     "d1", "big_frac", "n_local", "tight_cull", "d2_live",
                     "depth_tables", "reverse_tables"),
)
def build_bins(
    proj: ProjectedGaussians,
    cam: Camera,
    pair_cap: int = 0,
    max_tiles_per_gaussian: int = 64,
    align: int = 0,
    d1: int = D1,
    big_frac: int = BIG_FRAC,
    tile_lo=None,
    n_local: int | None = None,
    tight_cull: bool = True,
    d2_live: int = 0,
    depth_tables: bool = False,
    reverse_tables: bool = True,
) -> TileBins:
    """Bin projected Gaussians into per-tile depth-sorted pair lists.

    Args:
      proj: projected Gaussians (radius == 0 rows are skipped).
      cam: static camera (defines the tile grid).
      pair_cap: static cap on the ALIGNED pair-buffer size (align>0 only;
        0 = worst-case sizing N*d1 + big_cap*D2 + per-tile pad). The
        worst case assumes every candidate slot is live, but after the
        alpha cull typically only ~40-60% are — and the pack's wide row
        gather, the backward's [NF, buf_cap] gradient buffer, its HBM
        transpose and the zero-fill all scale with the BUFFER, not with
        live pairs. A cap at ~1.3x the live-pair high-water mark halves
        those costs; breaches clamp the overflowing tail tiles (pairs
        dropped, same semantics as the other static caps) and set
        `overflow`, which the per-frame host check surfaces.
      max_tiles_per_gaussian: static cap on tiles one Gaussian may cover
        (row-major truncation beyond that; pruning keeps screen extents
        bounded in the SLAM setting).
      align: if > 0, re-layout segments so every tile_start is a multiple of
        `align` (the Pallas kernel's DMA alignment requirement).
      d1: small-tier dense slots per gaussian (rects <= d1 tiles). Every
        downstream buffer scales with N*d1 — production configs with
        pixel-scale splats (typical rect 1-4 tiles) should use 4.
      big_frac: big-tier capacity divisor (capacity = N // big_frac).
        binning_diagnostics + the per-frame overflow check surface breaches.
      tile_lo / n_local: optional tile WINDOW — emit/segment only the
        `n_local` tiles starting at global tile `tile_lo` (a traced scalar),
        with window-LOCAL tile ids in the output tables. Used by the
        tile-sharded composite: each mesh shard bins its own contiguous
        range; the emitted pair set is exactly the global set restricted to
        the window (the cull + compaction + tier split run on the GLOBAL
        candidate set before localization, so slot layout and truncation
        match the global build shard-for-shard).
      tight_cull: drop candidate pairs whose max alpha over their tile is
        provably < 1/255 (see _tile_alpha_cull) — exact no-ops in every
        compositor; the switch exists only for A/B measurement.
      d2_live: static POST-cull width of the big tier (0 = full D2).
        Candidates are still enumerated over the first D2 rect cells, but
        after the cull compacts live tiles left, a big row keeps only its
        first `d2_live` live tiles — with pixel-scale splats the live count
        is far below the rect-cell count (measured max 7 of 16 at the
        bench scene), so a tight cap shrinks the big reverse table and the
        pair buffer by ~2x with zero loss; breaches set `overflow` (the
        per-frame host check surfaces them).
      reverse_tables: build the small/big reverse slot tables (align>0
        only). False skips their inverse sort — for consumers whose
        backward never reads them (the fused pose-kernel tracking path).
    """
    xy = jax.lax.stop_gradient(proj.xy)
    depth = jax.lax.stop_gradient(proj.depth)
    radius = proj.radius
    tiles_x, tiles_y = cam.tiles_x, cam.tiles_y
    n_tiles = tiles_x * tiles_y if n_local is None else n_local
    N = xy.shape[0]
    D1_ = d1
    D2 = max(max_tiles_per_gaussian, D1_)
    big_cap = max(N // big_frac, 1)

    # Opacity pre-filter (exact, not an approximation): alpha = op *
    # exp(power) with power <= 0, so op < 1/255 can never pass the
    # compositor's alpha >= 1/255 skip rule (composite semantics,
    # CUDA forward.cu alpha test) — such pairs contribute 0 at every pixel.
    # The CUDA reference still bins them; dropping them here changes
    # nothing downstream and skips dead pairs in converged maps where many
    # gaussians idle below the pruning threshold between prunes.
    radius = jnp.where(
        jax.lax.stop_gradient(proj.opacity) >= (1.0 / 255.0), radius, 0
    )

    # 1. depth order (culled rows last)
    order = jnp.argsort(jnp.where(radius > 0, depth, jnp.inf)).astype(jnp.int32)
    xy = xy[order]
    radius = radius[order]

    x0, x1, y0, y1 = gaussian_tile_rect(xy, radius, tiles_x, tiles_y)
    rect_w = jnp.maximum(x1 - x0, 0)
    rect_h = jnp.maximum(y1 - y0, 0)
    raw_count = jnp.where(radius > 0, rect_w * rect_h, 0)
    count = jnp.minimum(raw_count, D2)
    n_pairs = jnp.sum(count)

    # 2. dense candidate enumeration at full D2 width, then (optionally)
    # alpha-cull + per-row left-compaction BEFORE the tier split: a splat
    # whose rect spans 10 tiles but only truly touches 3 stays in the cheap
    # small tier, and d1 sizes against LIVE tiles rather than bounding-box
    # tiles. The tier split keys off the post-cull count, so the compaction
    # also recovers candidates the positional d1/D2 truncation would have
    # dropped. (With tight_cull=False the compaction is the identity and
    # this reduces exactly to the positional two-tier split.)
    tileA = _candidate_tiles(x0, rect_w, y0, count, D2, tiles_x)
    if tight_cull:
        conic = jax.lax.stop_gradient(proj.conic)[order]
        op = jax.lax.stop_gradient(proj.opacity)[order]
        tau = jnp.log(jnp.maximum(255.0 * op, 1e-12))
        tileA = _tile_alpha_cull(tileA, xy, conic, tau, tiles_x,
                                 n_tiles=tiles_x * tiles_y)
        # left-compact kept tiles, preserving row-major order: one cross-lane
        # sort of the [N, D2] candidate block keyed by hole-ness
        d_iota = jnp.broadcast_to(
            jnp.arange(D2, dtype=jnp.int32)[None, :], tileA.shape
        )
        ckey = jnp.where(tileA >= 0, d_iota, jnp.int32(1 << 30))
        _, tileA = jax.lax.sort((ckey, tileA), num_keys=1, dimension=1)
    count_kept = jnp.sum((tileA >= 0).astype(jnp.int32), axis=1)
    n_pairs = jnp.sum(count_kept)
    is_big = count_kept > D1_

    # 2a. small tier: first d1 compacted slots of small rows
    tile1 = jnp.where(is_big[:, None], -1, tileA[:, :D1_])

    # 2b. big tier: compact big gaussians (depth order preserved — stable),
    # at the post-cull live width (see d2_live docstring)
    D2L = max(d2_live, D1_) if (tight_cull and 0 < d2_live < D2) else D2
    big_sel = jnp.argsort(~is_big, stable=True).astype(jnp.int32)[:big_cap]
    big_valid = is_big[big_sel]
    tile2 = jnp.where(big_valid[:, None], tileA[big_sel][:, :D2L], -1)
    live_trunc = (
        jnp.any(count_kept > D2L) if D2L < D2
        else jnp.asarray(False)
    )

    if n_local is not None:
        # window-localize: keep only candidates in [tile_lo, tile_lo+n_local)
        # and re-express them in window-local ids
        lo = jnp.asarray(tile_lo, jnp.int32)

        def localize(t):
            tl = t - lo
            return jnp.where((t >= lo) & (tl < n_tiles), tl, -1)

        tile1 = localize(tile1)
        tile2 = localize(tile2)
        n_pairs = jnp.sum(tile1 >= 0) + jnp.sum(tile2 >= 0)

    # 3. fused (tile, depth-rank) keys; sentinel sorts last
    n_pad = N  # depth rank < N
    rank1 = jnp.arange(N, dtype=jnp.int32)[:, None]
    rank2 = big_sel[:, None]
    sentinel = n_tiles * n_pad
    use_fused = (n_tiles + 1) * n_pad < 2**31 - 1

    gauss1 = jnp.broadcast_to(order[:, None], tile1.shape)
    gauss2 = jnp.broadcast_to(order[big_sel][:, None], tile2.shape)
    cand_gauss = jnp.concatenate([gauss1.reshape(-1), gauss2.reshape(-1)])

    P = cand_gauss.shape[0]
    # candidate ids ride the sort only when the reverse tables (their sole
    # consumer) will be built — a 2-array sort is measurably cheaper than
    # a 3-array one on the tracker's table-free rebuilds
    need_cand = bool(align) and reverse_tables
    cand_idx = (jnp.arange(P, dtype=jnp.int32),) if need_cand else ()
    pair_cand = None
    if use_fused:
        key1 = jnp.where(tile1 >= 0, tile1 * n_pad + rank1, sentinel)
        key2 = jnp.where(tile2 >= 0, tile2 * n_pad + rank2, sentinel)
        keys = jnp.concatenate([key1.reshape(-1), key2.reshape(-1)])
        keys, pair_gauss, *rest = jax.lax.sort(
            (keys, cand_gauss) + cand_idx, num_keys=1, is_stable=True
        )
        if need_cand:
            (pair_cand,) = rest
        pair_tile = None  # segment bounds come from the keys directly:
        # keys // n_pad is a P-sized non-pow2 integer division (multi-pass
        # on the VPU) and its only consumers were searchsorted + validity
    else:  # huge maps/images: 2-key lexicographic fallback
        t1 = jnp.where(tile1 >= 0, tile1, n_tiles)
        t2 = jnp.where(tile2 >= 0, tile2, n_tiles)
        tiles_c = jnp.concatenate([t1.reshape(-1), t2.reshape(-1)])
        ranks_c = jnp.concatenate(
            [jnp.broadcast_to(rank1, tile1.shape).reshape(-1),
             jnp.broadcast_to(rank2, tile2.shape).reshape(-1)]
        )
        pair_tile, _, pair_gauss, *rest = jax.lax.sort(
            (tiles_c, ranks_c, cand_gauss) + cand_idx, num_keys=2,
            is_stable=True,
        )
        if need_cand:
            (pair_cand,) = rest

    # 4. segment bounds
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    if pair_tile is None:
        # fused keys are (tile * n_pad + rank), rank < n_pad: tile t's
        # segment is exactly keys in [t * n_pad, (t+1) * n_pad) — binary
        # search the boundaries on the keys, no per-pair division
        pair_valid = keys < sentinel
        tile_start = jnp.searchsorted(
            keys, tile_ids * n_pad, side="left").astype(jnp.int32)
        tile_end = jnp.searchsorted(
            keys, (tile_ids + 1) * n_pad, side="left").astype(jnp.int32)
    else:
        pair_valid = pair_tile < n_tiles
        tile_start = jnp.searchsorted(
            pair_tile, tile_ids, side="left").astype(jnp.int32)
        tile_end = jnp.searchsorted(
            pair_tile, tile_ids, side="right").astype(jnp.int32)
    tile_count = tile_end - tile_start

    overflow = (
        jnp.any(raw_count > D2)
        | (jnp.sum(is_big.astype(jnp.int32)) > big_cap)
        | live_trunc
    )

    small_slots = big_slots = big_gauss_out = big_valid_out = rank_of = None
    if align:
        # 5. one scatter into a chunk-aligned layout (pallas DMA requirement).
        # P-sized ops here are the binning hot spot (measured: [n_tiles]-table
        # gathers ~6 ms/M-index, scalar scatters ~4 ms/M, a P-sort ~1.3 ms/M)
        # so: ONE combined table gather (aligned_start - tile_start folded
        # into a single delta), ONE scatter (gauss ids with sentinel N for
        # invalid — the pack gathers with mode="fill", so no validity buffer
        # is scattered), and a SORT instead of a scatter to invert the sort.
        aligned_sizes = ((tile_count + align - 1) // align) * align
        aligned_start = (jnp.cumsum(aligned_sizes) - aligned_sizes).astype(jnp.int32)
        P = pair_gauss.shape[0]
        # +4*align tail pad: the kernel's cross-tile chunk-0 prefetch DMA
        # may read one trip-wide slab (UNROLL*align pairs, UNROLL <= 4) at
        # the last (possibly empty) tile's start, and the backward's
        # trip-wide write-back may spill up to UNROLL-1 zero chunks past
        # the last segment's aligned end
        buf_cap = P + n_tiles * align + 4 * align
        # static buffer cap (see pair_cap docstring): clamp overflowing
        # tail tiles so every kernel DMA (walk reads up to the segment's
        # aligned end, spill writes up to +4*align past it) stays in
        # bounds; clamped-away pairs simply keep the sentinel row (never
        # scattered), identical to the other caps' drop semantics
        usable = None
        S = P  # width of the per-pair relayout ops
        if pair_cap and pair_cap < buf_cap:
            buf_cap = max((pair_cap // align) * align, 8 * align)
            usable = buf_cap - 4 * align
            # Slice the tile-sorted stream to the buffer size before the
            # P-sized relayout ops (scan + scatter): dead candidates sort
            # last, target >= rank, so every pair at rank >= buf_cap would
            # be clamp-dropped below anyway — the dropped set is unchanged.
            # Measured ~-1 ms/build at 131k gaussians (674k -> 512k,
            # probe_bins_cost2.py).
            S = min(P, buf_cap)
        pv_s = pair_valid[:S]
        delta = aligned_start - tile_start  # [n_tiles], non-decreasing
        # Per-pair delta WITHOUT a [n_tiles]-table gather (measured ~6 ms/M
        # indices on v5e): pairs are tile-sorted, so delta-per-pair is a
        # non-decreasing step function of the pair index — scatter each
        # tile's delta at its segment start (ties: empty tiles share a start,
        # max picks the last = the tile that owns the pairs) and inclusive
        # max-scan. Segment starts beyond the slice (== P, or clamped
        # tiles') are dropped.
        steps = jnp.zeros((S,), jnp.int32).at[tile_start].max(
            delta, mode="drop"
        )
        pair_delta = _fill_forward_max(steps)
        target = jnp.where(
            pv_s,
            jnp.arange(S, dtype=jnp.int32) + pair_delta,
            buf_cap,
        )
        if usable is not None:
            overflow = overflow | (
                aligned_start[-1] + aligned_sizes[-1] > usable
            )
            target = jnp.where(target < usable, target, buf_cap)
            aligned_start = jnp.minimum(aligned_start, usable)
            tile_count = jnp.clip(tile_count, 0, usable - aligned_start)
        # sentinel gauss id N marks invalid slots: the pack's row gather uses
        # mode="fill" so they read as all-zero pair data
        pg = jnp.full((buf_cap,), N, jnp.int32).at[target].set(
            pair_gauss[:S], mode="drop"
        )
        pv = pg < N

        # 6. reverse tables: invert the sort WITH a sort (pair_cand is a
        # permutation of arange(P), so sorting by it is a gather-free inverse
        # and sorts are ~3x cheaper than P-sized scatters here — a scatter
        # variant re-measured +2.8 ms/build, probe_bins_cost2.py). Sliced-
        # away candidates get sentinel slots (they were dropped pairs).
        # reverse_tables=False skips the whole section (-0.85 ms/build):
        # the fused pose-kernel tracking backward never reads the slot
        # tables (it contracts pose Jacobians in-kernel), so the tracker's
        # rebins don't pay for them (slam/tracker.py _track_bins).
        if not reverse_tables:
            return TileBins(
                pair_gauss=pg,
                pair_valid=pv,
                tile_start=aligned_start,
                tile_count=tile_count,
                n_pairs=n_pairs.astype(jnp.int32),
                overflow=overflow,
            )
        slot_full = jnp.full((P,), SLOT_SENTINEL, jnp.int32)
        slot_full = jax.lax.dynamic_update_slice(
            slot_full, jnp.where(pv_s, target, SLOT_SENTINEL), (0,)
        )
        _, slot_of_cand = jax.lax.sort(
            (pair_cand, slot_full),
            num_keys=1,
        )
        small_depth_order = slot_of_cand[: N * D1_].reshape(N, D1_)
        rank_of = jnp.zeros((N,), jnp.int32).at[order].set(
            jnp.arange(N, dtype=jnp.int32)
        )
        if depth_tables:
            # measured-slower experimental layout (see TileBins docstring):
            # rows in depth order + gauss_rank un-permute in the reduce
            small_slots = small_depth_order
        else:
            # rows re-keyed by ORIGINAL gaussian id so the pack backward
            # indexes directly (row gather by the inverse depth
            # permutation, not a row scatter)
            small_slots = small_depth_order[rank_of]
            rank_of = None
        big_slots = slot_of_cand[N * D1_:].reshape(big_cap, D2L)
        big_gauss_out = order[big_sel]
        big_valid_out = big_valid

        pair_gauss, pair_valid, tile_start = pg, pv, aligned_start

    return TileBins(
        pair_gauss=pair_gauss,
        pair_valid=pair_valid,
        tile_start=tile_start,
        tile_count=tile_count,
        n_pairs=n_pairs.astype(jnp.int32),
        overflow=overflow,
        small_slots=small_slots,
        big_slots=big_slots,
        big_gauss=big_gauss_out,
        big_valid=big_valid_out,
        gauss_rank=rank_of,
    )

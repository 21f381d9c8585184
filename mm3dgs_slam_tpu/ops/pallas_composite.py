"""Pallas TPU kernel for the tile compositing hot loop.

Replaces ops/composite.py's fixed-round scan with a real per-tile walk:

  * grid = one program per 16x16 pixel tile,
  * each program DMAs its (tile, depth)-sorted pair slab from HBM in
    128-pair chunks and composites front-to-back,
  * the trip count is the tile's true segment length (the XLA fallback must
    pad every tile to max_per_tile), and the walk stops early once every
    pixel's transmittance saturates — the two wins a static-shape XLA
    program cannot express,
  * within a chunk the sequential transmittance recursion is a Hillis-Steele
    multiplicative scan along lanes; feature accumulation is a
    [PIX, CHUNK] x [CHUNK, NC] MXU contraction,
  * backward is analytic: the same walk replayed front-to-back with a prefix
    accumulator (the standard 3DGS gradient rearranged to avoid a
    back-to-front pass) emits per-pair gradients; the surrounding jnp
    gather's autodiff turns those into per-Gaussian scatter-adds.

Layout (dictated by Mosaic's lane-alignment rules): pair data is packed
FIELD-MAJOR ``[16, PAIR_CAP + CHUNK]`` so a chunk DMA slices 128 aligned
lanes; in-kernel arrays put the tile's 256 pixels on sublanes and the 128
chunk pairs on lanes.

Field rows: 0 xy_x, 1 xy_y, 2:5 conic, 5 opacity, 6:12 features
(rgb + z/sil/z^2).

Semantics match ops/composite.py exactly (alpha clamp straight-through,
1/255 skip, hard T < 1e-4 stop with frozen transmittance); tests cross-check
all three compositors (oracle / XLA tiles / pallas).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .camera import TILE, Camera

CHUNK = 128         # pairs per inner step (lanes)
PIX = TILE * TILE   # 256 pixels per tile (sublanes)
NF = 16             # packed pair fields (12 used + 4 pad; Mosaic DMA
                    # slices must be 8-aligned on sublanes, so 12 is illegal)
NC = 6              # composited channels


def pack_pairs(proj_packed, pair_gauss, pair_valid):
    """Gather per-pair data into pair order, field-major [NF, CAP + CHUNK].

    ONE wide row gather from the projection-time packed [N, 16] rows —
    measured ~7x cheaper than four narrow per-field gathers on TPU. The
    gather is the differentiable boundary: its VJP reduces the kernel's
    per-pair gradients back to per-Gaussian [N, 16] gradients. Invalid
    (padding) pairs are zeroed; CHUNK extra zero columns let the kernel DMA
    full chunks without clamping.
    """
    rows = proj_packed[pair_gauss]                       # [P, NF]
    rows = jnp.where(pair_valid[:, None], rows, 0.0)
    data = rows.T                                        # [NF, P]
    return jnp.concatenate(
        [data, jnp.zeros((NF, CHUNK), data.dtype)], axis=1
    )


def _scan_lanes(x, op, identity, col=None):
    """Inclusive Hillis-Steele scan along lanes (axis 1)."""
    n = x.shape[1]
    if col is None:
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    s = 1
    while s < n:
        rolled = pltpu.roll(x, shift=s, axis=1)
        x = op(x, jnp.where(col >= s, rolled, identity))
        s *= 2
    return x


def _chunk_forward(data, pixf_x, pixf_y, base_rank, count, T_run, done):
    """Shared per-chunk forward math.

    data: [NF, CHUNK] fields x pairs; pixf_*: [PIX, 1]; T_run/done: [PIX, 1].
    Returns (w [PIX, CHUNK], T_new, done_new, alpha_raw, use, T_j, dx, dy).
    """
    xy_x = data[0:1, :]   # [1, CHUNK]
    xy_y = data[1:2, :]
    c0 = data[2:3, :]
    c1 = data[3:4, :]
    c2 = data[4:5, :]
    op = data[5:6, :]
    dx = xy_x - pixf_x    # [PIX, CHUNK]
    dy = xy_y - pixf_y
    power = -0.5 * (c0 * dx * dx + c2 * dy * dy) - c1 * dx * dy
    alpha_raw = op * jnp.exp(power)
    alpha = jnp.minimum(alpha_raw, 0.99)
    col = jax.lax.broadcasted_iota(jnp.int32, (PIX, CHUNK), 1)
    rank = base_rank + col
    contribute = (power <= 0.0) & (alpha >= 1.0 / 255.0) & (rank < count)
    alpha = jnp.where(contribute, alpha, 0.0)

    one_m = 1.0 - alpha
    cp_incl = _scan_lanes(one_m, jax.lax.mul, 1.0, col=col)
    excl = jnp.where(col >= 1, pltpu.roll(cp_incl, shift=1, axis=1), 1.0)
    T_j = T_run * excl
    # CUDA stop rule: pair j contributes unless some k <= j (with alpha_k>0)
    # drove T*(1-alpha) below 1e-4. T_run*cp_incl_j IS that inclusive test
    # value and is monotone non-increasing along j (factors <= 1, and only
    # alpha>0 pairs shrink it), so "stopped at or before j" == below_j — no
    # second scan needed. frozen_T = T at the first crossing = max of the
    # (monotone decreasing) exclusive T over the below region.
    below = (T_run * cp_incl < 1e-4).astype(jnp.float32)
    use = (alpha > 0.0) & (done < 1.0) & (below < 1.0)
    w = jnp.where(use, alpha * T_j, 0.0)

    any_stop = below[:, CHUNK - 1:CHUNK]
    frozen_T = jnp.max(T_j * below, axis=1, keepdims=True)
    T_cont = T_run * cp_incl[:, CHUNK - 1:CHUNK]
    T_new = jnp.where(done >= 1.0, T_run,
                      jnp.where(any_stop >= 1.0, frozen_T, T_cont))
    done_new = jnp.maximum(done, any_stop)
    return w, T_new, done_new, alpha_raw, use, T_j, dx, dy


def _tile_pix(t, tiles_x):
    ty = t // tiles_x
    tx = t - ty * tiles_x
    lane = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    pixf_x = (tx * TILE + lane % TILE).astype(jnp.float32)
    pixf_y = (ty * TILE + lane // TILE).astype(jnp.float32)
    return pixf_x, pixf_y


def _fwd_kernel(tile_start_ref, tile_count_ref, pair_hbm, acc_ref, tfin_ref,
                buf, sem, *, tiles_x: int):
    """Double-buffered walk: chunk ci+1's DMA is in flight while ci computes."""
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    pixf_x, pixf_y = _tile_pix(t, tiles_x)
    n_chunks = pl.cdiv(count, CHUNK)

    def dma(ci, slot):
        off = pl.multiple_of(start + ci * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            pair_hbm.at[:, pl.ds(off, CHUNK)], buf.at[slot], sem.at[slot]
        )

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    def cond(carry):
        ci, T_run, done, acc = carry
        return (ci < n_chunks) & (jnp.min(done) < 1.0)

    def body(carry):
        ci, T_run, done, acc = carry
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            dma(ci + 1, 1 - slot).start()

        dma(ci, slot).wait()
        data = buf[slot]
        w, T_new, done_new, _, _, _, _, _ = _chunk_forward(
            data, pixf_x, pixf_y, ci * CHUNK, count, T_run, done
        )
        feat = data[6:6 + NC, :]  # [NC, CHUNK]
        acc = acc + jax.lax.dot_general(
            w, feat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [PIX, NC]
        return ci + 1, T_new, done_new, acc

    T0 = jnp.ones((PIX, 1), jnp.float32)
    done0 = jnp.zeros((PIX, 1), jnp.float32)
    acc0 = jnp.zeros((PIX, NC), jnp.float32)
    ci_fin, T_fin, _, acc = jax.lax.while_loop(cond, body, (0, T0, done0, acc0))
    # drain the prefetched-but-unconsumed DMA after an early exit
    @pl.when((ci_fin < n_chunks) & (ci_fin > 0))
    def _():
        dma(ci_fin, jax.lax.rem(ci_fin, 2)).wait()

    acc_ref[0, :, :] = acc
    tfin_ref[0, :, :] = T_fin


@functools.partial(jax.jit, static_argnames=("cam", "interpret"))
def _composite_pallas_fwd(pair_data, tile_start, tile_count, cam: Camera,
                          interpret: bool = False):
    n_tiles = cam.n_tiles
    kernel = functools.partial(_fwd_kernel, tiles_x=cam.tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=[
            pl.BlockSpec((1, PIX, NC), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NF, CHUNK), jnp.float32),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    acc, tfin = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, PIX, NC), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, PIX, 1), jnp.float32),
        ],
        interpret=interpret,
    )(tile_start, tile_count, pair_data)
    return acc, tfin


def _bwd_kernel(tile_start_ref, tile_count_ref, pair_hbm, dacc_ref, dtfin_ref,
                acc_ref, tfin_ref, dpair_hbm, buf, dpair_buf, sems,
                *, tiles_x: int):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    pixf_x, pixf_y = _tile_pix(t, tiles_x)

    dC = dacc_ref[0]          # [PIX, NC]  (VMEM-blocked input)
    dT_fin = dtfin_ref[0]     # [PIX, 1]
    C_tot = acc_ref[0]        # [PIX, NC]
    T_fin = tfin_ref[0]       # [PIX, 1]
    CdC = jnp.sum(C_tot * dC, axis=1, keepdims=True)  # [PIX, 1]

    n_chunks = pl.cdiv(count, CHUNK)

    def dma_in(ci, slot):
        off = pl.multiple_of(start + ci * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            pair_hbm.at[:, pl.ds(off, CHUNK)], buf.at[slot], sems.at[slot]
        )

    def dma_out(ci, slot):
        off = pl.multiple_of(start + ci * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            dpair_buf.at[slot], dpair_hbm.at[pl.ds(off, CHUNK), :],
            sems.at[2 + slot]
        )

    @pl.when(n_chunks > 0)
    def _():
        dma_in(0, 0).start()

    def body(ci, carry):
        T_run, done, A_pref = carry
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            dma_in(ci + 1, 1 - slot).start()

        dma_in(ci, slot).wait()
        data = buf[slot]
        w, T_new, done_new, alpha_raw, use, T_j, dx, dy = _chunk_forward(
            data, pixf_x, pixf_y, ci * CHUNK, count, T_run, done
        )
        feat = data[6:6 + NC, :]  # [NC, CHUNK]
        one_m = jnp.where(use, 1.0 - jnp.minimum(alpha_raw, 0.99), 1.0)

        # d feat[c, j] = sum_p dC(p, c) w(p, j)  -> [NC, CHUNK]
        dfeat = jax.lax.dot_general(
            dC, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # (feat_j . dC_p) -> [PIX, CHUNK]
        fdc = jax.lax.dot_general(
            dC, feat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        r = w * fdc
        r_incl = _scan_lanes(r, jax.lax.add, 0.0)
        suffix = CdC - A_pref - r_incl           # (C - A_{<=j}) . dC

        inv_onem = 1.0 / one_m
        dalpha = T_j * fdc - suffix * inv_onem - dT_fin * T_fin * inv_onem
        dalpha = jnp.where(use, dalpha, 0.0)

        op = data[5:6, :]
        G = jnp.where(op > 0, alpha_raw / jnp.where(op > 0, op, 1.0), 0.0)
        dop = jnp.sum(G * dalpha, axis=0, keepdims=True)   # [1, CHUNK]
        dpower = alpha_raw * dalpha
        c0 = data[2:3, :]
        c1 = data[3:4, :]
        c2 = data[4:5, :]
        dxy_x = jnp.sum(-(c0 * dx + c1 * dy) * dpower, axis=0, keepdims=True)
        dxy_y = jnp.sum(-(c2 * dy + c1 * dx) * dpower, axis=0, keepdims=True)
        dc0 = jnp.sum(-0.5 * dx * dx * dpower, axis=0, keepdims=True)
        dc1 = jnp.sum(-dx * dy * dpower, axis=0, keepdims=True)
        dc2 = jnp.sum(-0.5 * dy * dy * dpower, axis=0, keepdims=True)

        # double-buffered write-back: before reusing this slot (written two
        # iterations ago), drain its in-flight output DMA
        @pl.when(ci >= 2)
        def _():
            dma_out(ci - 2, slot).wait()

        zeros_pad = jnp.zeros((NF - 6 - NC, CHUNK), jnp.float32)
        block = jnp.concatenate(
            [dxy_x, dxy_y, dc0, dc1, dc2, dop, dfeat, zeros_pad], axis=0
        )
        # emit ROW-major [CHUNK, 128]: the in-VMEM [16,128] transpose is a
        # few tile shuffles, vs ~45 ms for XLA to materialize the
        # [NF, P] -> [P, NF] transpose in HBM that the slot-table gathers
        # would otherwise need. Rows are padded NF -> 128 lanes because
        # Mosaic VMEM slices must be 128-aligned on the lane dim (HBM only
        # pays 8x on this scratch buffer's traffic, ~0.5 ms).
        dpair_buf[slot] = jnp.concatenate(
            [block.T, jnp.zeros((CHUNK, 128 - NF), jnp.float32)], axis=1
        )
        dma_out(ci, slot).start()

        A_new = A_pref + r_incl[:, CHUNK - 1:CHUNK]
        return T_new, done_new, A_new

    T0 = jnp.ones((PIX, 1), jnp.float32)
    done0 = jnp.zeros((PIX, 1), jnp.float32)
    A0 = jnp.zeros((PIX, 1), jnp.float32)
    jax.lax.fori_loop(0, n_chunks, body, (T0, done0, A0))

    # drain the trailing output DMAs (programs run sequentially over tiles,
    # and the next tile reuses the same slots)
    @pl.when(n_chunks >= 2)
    def _():
        dma_out(n_chunks - 2, jax.lax.rem(n_chunks - 2, 2)).wait()

    @pl.when(n_chunks >= 1)
    def _():
        dma_out(n_chunks - 1, jax.lax.rem(n_chunks - 1, 2)).wait()


@functools.partial(jax.jit, static_argnames=("cam", "interpret"))
def _composite_pallas_bwd_rows(pair_data, tile_start, tile_count, acc, tfin,
                               dacc, dtfin, cam: Camera,
                               interpret: bool = False):
    """Backward kernel: per-pair gradients in ROW-major [padded_cap, 128]
    (columns NF: are zero pad — Mosaic lane alignment)."""
    n_tiles = cam.n_tiles
    padded_cap = pair_data.shape[1]
    kernel = functools.partial(_bwd_kernel, tiles_x=cam.tiles_x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # pair data
            pl.BlockSpec((1, PIX, NC), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),             # dacc
            pl.BlockSpec((1, PIX, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),             # dtfin
            pl.BlockSpec((1, PIX, NC), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),             # acc
            pl.BlockSpec((1, PIX, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),             # tfin
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, NF, CHUNK), jnp.float32),   # pair in double-buffer
            pltpu.VMEM((2, CHUNK, 128), jnp.float32),  # dpair out (row-major)
            pltpu.SemaphoreType.DMA((4,)),             # 2 in + 2 out
        ],
    )
    dpair_rows = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((padded_cap, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tile_start, tile_count, pair_data, dacc, dtfin, acc, tfin)
    # Rows beyond the last tile's aligned end are never kernel-written and
    # hold garbage — fine for the slot-table consumers (tables only index
    # kernel-written slots; invalid candidates carry SLOT_SENTINEL, which
    # the fill-mode gather zeroes). Callers that expose dpair as a plain
    # cotangent must mask + transpose (see composite_pairs_pallas).
    return dpair_rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def composite_pairs_pallas(pair_data, tile_start, tile_count, cam: Camera,
                           interpret: bool = False):
    """Differentiable pallas composite over packed pair data.

    Returns (acc [n_tiles, PIX, NC], t_fin [n_tiles, PIX, 1]); background
    and image assembly happen in jnp outside.
    """
    return _composite_pallas_fwd(pair_data, tile_start, tile_count, cam,
                                 interpret)


def _cp_fwd(pair_data, tile_start, tile_count, cam, interpret):
    acc, tfin = _composite_pallas_fwd(pair_data, tile_start, tile_count, cam,
                                      interpret)
    return (acc, tfin), (pair_data, tile_start, tile_count, acc, tfin)


def _cp_bwd(cam, interpret, res, cts):
    pair_data, tile_start, tile_count, acc, tfin = res
    dacc, dtfin = cts
    dpair_rows = _composite_pallas_bwd_rows(
        pair_data, tile_start, tile_count, acc, tfin, dacc, dtfin, cam,
        interpret,
    )
    # This boundary exposes dpair as a plain cotangent of [NF, P] pair data:
    # mask the never-written tail garbage and transpose (slow — the fused
    # tables path below avoids both; this path is for standalone use).
    n_valid = tile_start[-1] + tile_count[-1]
    valid = jnp.arange(dpair_rows.shape[0]) < n_valid
    d = jnp.where(valid[:, None], dpair_rows[:, :NF], 0.0)
    return d.T, None, None


composite_pairs_pallas.defvjp(_cp_fwd, _cp_bwd)


def _table_reduce(dpair_rows, small_slots, big_slots, big_gauss, big_valid):
    """Per-pair row gradients -> per-gaussian [N, NF] via the slot tables.

    Two FLAT wide-row gathers (out-of-range SLOT_SENTINEL slots read as 0)
    followed by fixed-width reductions expressed as MXU matmuls with a
    constant block-sum matrix: [N, D*NF] (a free reshape of the contiguous
    gather output) @ [D*NF, NF]. Measured ~10x cheaper than letting XLA fuse
    the D-axis sum into the gather, and ~25x cheaper than the P-sized
    scatter-add transpose the plain gather VJP would emit."""
    dpair_rows = dpair_rows[:, :NF]  # folds into the gathers' slice_sizes
    n, d1 = small_slots.shape
    big_cap, d2 = big_slots.shape

    def block_sum(slots, rows, d):
        g = dpair_rows.at[slots.reshape(-1)].get(mode="fill", fill_value=0.0)
        summat = jnp.concatenate([jnp.eye(NF, dtype=g.dtype)] * d, axis=0)
        return jax.lax.dot(g.reshape(rows, d * NF), summat,
                           precision=jax.lax.Precision.HIGHEST)

    acc = block_sum(small_slots, n, d1)                  # [N, NF]
    big_sum = block_sum(big_slots, big_cap, d2)          # [big_cap, NF]
    big_sum = jnp.where(big_valid[:, None], big_sum, 0.0)
    return acc.at[big_gauss].add(big_sum)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _composite_packed(packed, pair_gauss, pair_valid, small_slots, big_slots,
                      big_gauss, big_valid, tile_start, tile_count,
                      cam, interpret):
    """Fused pack + composite with the slot-table backward.

    One differentiable unit from per-gaussian packed rows to tile outputs:
    the backward kernel emits per-pair gradients ROW-major straight into the
    slot-table reduction — no [NF, P] <-> [P, NF] HBM transpose anywhere
    (that transpose alone cost ~45 ms at 2.25M pairs)."""
    pair_data = pack_pairs(packed, pair_gauss, pair_valid)
    return _composite_pallas_fwd(pair_data, tile_start, tile_count, cam,
                                 interpret)


def _cpk_fwd(packed, pair_gauss, pair_valid, small_slots, big_slots,
             big_gauss, big_valid, tile_start, tile_count, cam, interpret):
    pair_data = pack_pairs(packed, pair_gauss, pair_valid)
    acc, tfin = _composite_pallas_fwd(pair_data, tile_start, tile_count, cam,
                                      interpret)
    res = (pair_data, acc, tfin, small_slots, big_slots, big_gauss,
           big_valid, tile_start, tile_count)
    return (acc, tfin), res


def _cpk_bwd(cam, interpret, res, cts):
    (pair_data, acc, tfin, small_slots, big_slots, big_gauss, big_valid,
     tile_start, tile_count) = res
    dacc, dtfin = cts
    dpair_rows = _composite_pallas_bwd_rows(
        pair_data, tile_start, tile_count, acc, tfin, dacc, dtfin, cam,
        interpret,
    )
    dpacked = _table_reduce(dpair_rows, small_slots, big_slots, big_gauss,
                            big_valid)
    return (dpacked, None, None, None, None, None, None, None, None)


_composite_packed.defvjp(_cpk_fwd, _cpk_bwd)


def composite_tiles_pallas(proj, bins, cam: Camera, bg: jnp.ndarray,
                           interpret: bool = False):
    """Drop-in replacement for ops.composite.composite_tiles (pallas path)."""
    if bins.small_slots is not None:
        acc, tfin = _composite_packed(
            proj.packed, bins.pair_gauss, bins.pair_valid,
            bins.small_slots, bins.big_slots, bins.big_gauss, bins.big_valid,
            bins.tile_start, bins.tile_count, cam, interpret,
        )
    else:
        pair_data = pack_pairs(proj.packed, bins.pair_gauss, bins.pair_valid)
        acc, tfin = composite_pairs_pallas(
            pair_data, bins.tile_start, bins.tile_count, cam, interpret
        )
    out = acc + tfin * bg[None, None, :]  # [T, PIX, NC]
    tiles_y, tiles_x = cam.tiles_y, cam.tiles_x
    img = out.reshape(tiles_y, tiles_x, TILE, TILE, NC)
    img = img.transpose(4, 0, 2, 1, 3).reshape(NC, tiles_y * TILE, tiles_x * TILE)
    return img[:, : cam.height, : cam.width]

"""Pallas TPU kernel for the tile compositing hot loop.

Replaces ops/composite.py's fixed-round scan with a real per-tile walk:

  * grid = one program per 16x16 pixel tile,
  * each program DMAs its (tile, depth)-sorted pair slab from HBM in
    128-pair chunks and composites front-to-back,
  * the trip count is the tile's true segment length (the XLA fallback must
    pad every tile to max_per_tile), and the walk stops early once every
    pixel's transmittance saturates — the two wins a static-shape XLA
    program cannot express,
  * the within-chunk transmittance recursion runs in LOG space: the
    sequential cumulative product is one [PIX, CHUNK] x [CHUNK, CHUNK]
    upper-triangular matmul on the MXU (an inclusive segmented cumsum of
    log2(1-alpha)), replacing a 7-stage Hillis-Steele lane scan whose
    roll/select/mul trips dominated the VPU instruction count,
  * feature accumulation is a [PIX, CHUNK] x [CHUNK, NC] MXU contraction,
  * per-tile DMA latency is hidden by CROSS-PROGRAM prefetch: program t
    starts tile t+1's first chunk DMA into a parity slot before walking its
    own chunks (grid programs run sequentially on the TensorCore, scratch
    and semaphores persist),
  * backward is analytic: the same walk replayed front-to-back with a prefix
    accumulator (the standard 3DGS gradient rearranged to avoid a
    back-to-front pass) emits per-pair gradients; it EARLY-EXITS at the same
    saturation point as the forward (gradients past the stop are exactly
    zero) and zero-fills the remaining slabs with buffer-reuse DMAs.

Layout: pair data is FIELD-major ``[NF, buf_cap]`` (Mosaic DMA slices must
be 128-aligned along the minor dim, so row-major [P, 16] slabs are
illegal). The pack is one wide row gather straight out of projection's
kernel-ready [N, 16] rows — invalid slots carry a sentinel gaussian id >= N
and gather as zero rows via mode='fill' (no validity where-pass, no concat;
the binning buffer carries the alignment tail pad) — plus one contiguous
transpose.

Field rows: 0 xy_x, 1 xy_y, 2:5 conic, 5 opacity, 6:12 features
(rgb + z/sil/z^2).

Semantics match ops/composite.py exactly (alpha clamp straight-through,
1/255 skip, hard T < 1e-4 stop with frozen transmittance); the log-space
product + split-pass MXU dots differ from the sequential f32 product only
by float re-association / re-rounding (~1e-5 relative worst-case). Tests
cross-check all three compositors (oracle / XLA tiles / pallas).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .camera import TILE, Camera

import os as _os

CHUNK = int(_os.environ.get("MM3DGS_PL_CHUNK", "128"))
# Early tile exit once every pixel saturates: the check is a per-trip
# VREG->scalar min(done) reduction folded into the while cond — exactly the
# data-dependent-branch class gotcha 12 prices at ~0.55 us/branch. Clean
# adjacent A/B on the bench scene (dense pixel-scale map, segments already
# tight post-cull): EXIT OFF tracks at 17.81 ms/iter vs 18.56 ON — the
# check costs more than the skipped chunks save, so the DEFAULT is OFF.
# Scenes with long occluded tails (heavy overdraw, big splats) may flip
# the sign: set tpu.pl_early_exit / MM3DGS_PL_EARLY_EXIT=1 there.
EARLY_EXIT = _os.environ.get("MM3DGS_PL_EARLY_EXIT", "0") != "0"
# Chunks walked per while-loop trip (one W = UNROLL*CHUNK-wide DMA per
# trip). The per-chunk cost is dominated by chunk-pipeline fixed costs —
# DMA issue/wait chains plus the loop's own branch structure (~0.55 us per
# data-dependent branch, PROFILE.md pass 6) — so amortizing them over
# UNROLL chunks attacks exactly that term while keeping every VREG op at
# [PIX, CHUNK] and segment alignment at CHUNK (unlike the CHUNK=256
# experiment, which paid +12% aligned slots and washed out). A trip's
# trailing sub-chunks can cross the segment end into the next tile's
# pairs; they are masked to zero, which reproduces the padding-lane
# semantics bit-exactly (and the binning buffer carries a 4*align tail
# pad so the wide DMA stays in bounds).
                    # pairs per inner step (lanes); larger chunks amortize
                    # per-chunk fixed costs against +CHUNK/2 average padding
                    # per tile segment (bins are aligned to CHUNK)
UNROLL = int(_os.environ.get("MM3DGS_PL_UNROLL", "2"))
# binning's buffer tail pad (buf_cap = P + n_tiles*align + 4*align) covers
# the trip-wide prefetch DMA and the backward's write-back spill only for
# UNROLL <= 4 — larger values would silently read/write past the buffer
assert 1 <= UNROLL <= 4, \
    "MM3DGS_PL_UNROLL must be 1..4 (binning tail pad covers 4*CHUNK)"
W = UNROLL * CHUNK  # pairs per DMA / per while-loop trip
SUB = 128           # triangular-cumsum sub-block (keeps the O(CHUNK*SUB)
                    # MXU cost per pair constant when CHUNK grows)
PIX = TILE * TILE   # 256 pixels per tile (sublanes)
NF = 16             # packed pair fields (12 used + 4 pad; Mosaic DMA
                    # slices must be 8-aligned on sublanes, so 12 is illegal)
NC = 6              # composited channels

LOG2_STOP = -13.287712379549449   # log2(1e-4): the CUDA T<1e-4 stop rule
_NEG = -1e30

# In-kernel f32 matmul precision (TPU decomposes f32 dots into bf16 MXU
# passes: DEFAULT=1, HIGHEST=6; Mosaic's dot lowering rejects HIGH, and a
# manual bf16 operand-split scheme measured SLOWER than HIGHEST — the
# VPU conversions + separate dot issues cost more than the fused passes;
# see PROFILE.md "precision probe"). Modes:
#   highest — every dot HIGHEST: full numerics parity (CLAUDE.md gotcha 10).
#   mixed   — value-path dots (EWA power, transmittance cumsum, feature
#             accumulation) stay HIGHEST; gradient-path dots (dfeat, fdc,
#             r-cumsum, moment reduction S) run DEFAULT. One bf16 pass puts
#             ~0.4% relative rounding on per-pair gradients — the same
#             error class as the e2e-validated grad_bf16 emission knob
#             (accumulation stays f32); the forward image is bit-identical
#             to "highest".
#   default — every dot DEFAULT (fast, ~0.3% image error: probe use only).
_PREC_MODE = _os.environ.get("MM3DGS_PL_PRECISION", "mixed")
_PREC = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
    "mixed": jax.lax.Precision.HIGHEST,
}[_PREC_MODE]
_GPREC = (jax.lax.Precision.DEFAULT if _PREC_MODE == "mixed"
          else _PREC)
# Forward-kernel split-dot variant knob (scripts/probe_fwd_split.py):
#   v0 = HIGHEST everywhere; v1 = power via 3 DEFAULT passes on bf16-split
#   coefs; v2 = v1 + cumsum via 3 passes on bf16-split s; v3 = v2 + acc via
#   3 passes (2-term splits of w and feat). v1/v2 are f32-grade (the split
#   operand is tiny or the other operand is exactly bf16); v3's acc is
#   ~17-bit (image max rel err 7e-6 vs v0 on the bench scene — inside the
#   compositor-agreement tolerance class). Measured fwd 8.74 -> 7.44
#   ms/iter v0 -> v3 (−15%). A "v4" (power + cumsum at 2 bf16 terms, 7 MXU
#   passes/chunk) was probed and REJECTED: 7.23 ms/iter — no faster than
#   v3's 9 passes (the forward is bound by per-chunk fixed costs, not MXU
#   passes) — and image max rel err 0.17 (the tile-origin-folded power
#   coefs reach O(1e3), so a 2^-18 relative split leaves O(4e-3) absolute
#   power error that exp amplifies). Same conclusion as the backward
#   VPU-op cuts: past ~2 us/chunk, only fewer CHUNKS help.
_FWD_SPLIT = _os.environ.get("MM3DGS_PL_FWD_SPLIT", "v3")


def _split3(x):
    """x as 3 f32 arrays each exactly bf16-representable (sum ~= x to
    2^-27 rel): feeding them to DEFAULT dots loses nothing to the bf16
    input conversion, so 3 passes reproduce a HIGHEST dot when the other
    operand is already exact in bf16."""
    h1 = x.astype(jnp.bfloat16).astype(jnp.float32)
    r = x - h1
    h2 = r.astype(jnp.bfloat16).astype(jnp.float32)
    return h1, h2, r - h2


def pack_pairs(proj_packed, pair_gauss, pair_valid=None):
    """Gather per-pair data into pair order, field-major [NF, buf_cap].

    ONE wide row gather from the projection-time packed [N, 16] rows —
    measured ~7x cheaper than four narrow per-field gathers on TPU. Invalid
    (padding) slots carry the sentinel gaussian id N in `pair_gauss`, which
    is out of range for the [N, 16] table and gathers as an all-zero row
    (mode='fill'), so no separate validity mask/where pass is needed
    (`pair_valid` is accepted for API compatibility and unused)."""
    del pair_valid
    rows = proj_packed.at[pair_gauss].get(mode="fill", fill_value=0.0)
    return rows.T


def _triu_ones():
    """[SUB, SUB] upper-triangular (incl. diagonal) ones: the inclusive
    lane-cumsum operator s @ U on the MXU."""
    r = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1)
    return (r <= c).astype(jnp.float32)


def _incl_cumsum(x, triu, prec=None):
    """Inclusive cumsum along lanes of [PIX, CHUNK]: one [PIX, SUB] x
    [SUB, SUB] upper-triangular MXU matmul per sub-block with a [PIX, 1]
    carry between blocks — per-pair MXU cost stays O(SUB) as CHUNK grows.
    `prec`: dot precision (value-path transmittance cumsum runs _PREC,
    the backward's r-cumsum runs _GPREC)."""
    prec = _PREC if prec is None else prec
    if CHUNK == SUB:
        return jax.lax.dot(x, triu, preferred_element_type=jnp.float32,
                           precision=prec)
    parts = []
    carry = jnp.zeros((x.shape[0], 1), jnp.float32)
    for k in range(CHUNK // SUB):
        inc = jax.lax.dot(x[:, k * SUB:(k + 1) * SUB], triu,
                          preferred_element_type=jnp.float32,
                          precision=prec) + carry
        parts.append(inc)
        carry = inc[:, SUB - 1:SUB]
    return jnp.concatenate(parts, axis=1)


def _pix_basis():
    """[PIX, 8] per-pixel quadratic basis in TILE-LOCAL coordinates:
    [1, x, y, x^2, x*y, y^2, 0, 0] for x, y in [0, TILE). Tile-independent —
    the tile origin is folded into the per-pair coefficients instead, which
    also bounds the fp32 cancellation in the expanded quadratic (terms stay
    O(radius^2 * conic) rather than O(image_width^2 * conic))."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    x = (lane % TILE).astype(jnp.float32)
    y = (lane // TILE).astype(jnp.float32)
    one = jnp.ones((PIX, 1), jnp.float32)
    zero = jnp.zeros((PIX, 1), jnp.float32)
    return jnp.concatenate([one, x, y, x * x, x * y, y * y, zero, zero],
                           axis=1)


def _power_coefs(data, ox, oy):
    """Per-pair quadratic coefficients [8, CHUNK] such that
    power = basis @ coefs reproduces -0.5 conic (p - xy)^2 exactly:
    the EWA exponent is degree-2 in the pixel, so the whole [PIX, CHUNK]
    evaluation is ONE MXU matmul instead of 7 VPU passes. (ox, oy) is the
    tile origin (scalars); all coefficient math is [1, CHUNK] rows."""
    xl = data[0:1, :] - ox
    yl = data[1:2, :] - oy
    c0 = data[2:3, :]
    c1 = data[3:4, :]
    c2 = data[4:5, :]
    a = -0.5 * (c0 * xl * xl + c2 * yl * yl) - c1 * xl * yl
    b = c0 * xl + c1 * yl
    c = c2 * yl + c1 * xl
    zero = jnp.zeros_like(xl)
    return jnp.concatenate(
        [a, b, c, -0.5 * c0, -c1, -0.5 * c2, zero, zero], axis=0
    ), xl, yl


def _chunk_forward(data, basis, ox, oy, logT, done, triu,
                   gradient_walk=False, nc: int = NC):
    """Shared per-chunk forward math, transmittance in log2 space.

    `gradient_walk`: the FORWARD kernel always re-walks at HIGHEST (the
    image is the parity surface; gradient_walk=False). The BACKWARD kernel
    reconstructs these values only to weight GRADIENTS, so in mixed mode
    it sets gradient_walk=True, which applies three compensated shortcuts
    (measured together at ~-3 ms/iter on the bench scene, PROFILE.md):

    * power via TWO DEFAULT MXU passes on bf16-split coefs. One plain
      DEFAULT pass rounds coefs to bf16 (rel 2^-9) -> power abs error
      ~0.02-0.08 -> exp turns that into 2-8% alpha error, and 1/(1-alpha)
      amplifies ~100x near the 0.99 clamp (measured 25-32% max dpacked
      error). Splitting the [8, CHUNK] coefs (tiny: the expensive failed
      experiment split the [PIX, CHUNK] operands) restores ~17-bit power
      at +1 cheap pass: alpha rel err ~1e-4, 1/(1-alpha) err ~1% worst.
    * transmittance cumsum at DEFAULT: s rounded to bf16 gives T_j a
      ~1-3% error for pairs deep behind high-alpha splats — plain
      gradient noise at magnitudes Adam's noise floor dwarfs.
    * power clamped to 0 instead of the `power <= 0` skip: the EWA
      exponent is mathematically <= 0 (negative-definite quadratic); the
      skip only catches fp noise (reference CUDA has the same test), but
      under a rounded walk it can FLIP for near-center pixels and drop a
      FULL-magnitude gradient.

    highest mode (and interpret mode) never sets gradient_walk: the
    backward replays the forward bit-exactly.

    data: [NF, CHUNK] field-major slab; basis: [PIX, 8] (see _pix_basis);
    (ox, oy): tile-origin scalars; logT/done: [PIX, 1]. Returns
    (w [PIX, CHUNK], logT_new, done_new, alpha_raw, one_m, use, T_j, xl,
    yl, feat [NC, CHUNK]); `one_m` is 1 - clamped alpha on contributing
    lanes and exactly 1 on padding/skip lanes (the backward divides by it
    only under the `use` mask, so its value elsewhere is don't-care).

    Out-of-segment padding slots need no rank test: their pair rows gather
    as all-zero (sentinel fill), so op = 0 kills `contribute` by itself.
    """
    op = data[5:6, :]
    feat = data[6:6 + nc, :]
    coefs, xl, yl = _power_coefs(data, ox, oy)
    if gradient_walk:
        c_hi = coefs.astype(jnp.bfloat16).astype(jnp.float32)
        c_lo = coefs - c_hi
        power = (
            jax.lax.dot(basis, c_hi, preferred_element_type=jnp.float32)
            + jax.lax.dot(basis, c_lo, preferred_element_type=jnp.float32)
        )
        power = jnp.minimum(power, 0.0)
    elif _FWD_SPLIT != "v0":
        power = sum(jax.lax.dot(basis, c, preferred_element_type=jnp.float32)
                    for c in _split3(coefs))
    else:
        power = jax.lax.dot(basis, coefs,
                            preferred_element_type=jnp.float32,
                            precision=_PREC)  # [PIX, CHUNK]
    alpha_raw = op * jnp.exp(power)
    alpha = jnp.minimum(alpha_raw, 0.99)
    contribute = alpha >= 1.0 / 255.0
    if not gradient_walk:
        contribute = (power <= 0.0) & contribute
    alpha = jnp.where(contribute, alpha, 0.0)

    # log-space transmittance: s = log2(1-alpha) in [log2(0.01), 0];
    # inclusive cumsum along lanes as ONE MXU matmul (vs a 7-stage
    # roll/select/mul Hillis-Steele scan). The TPU's log2 approximation has
    # ~3.5e-4 max relative error (measured; exp2 is ~5e-6), which would
    # accumulate to percent-level T errors over a tile — one Newton step
    # against the accurate exp2 brings s to ~fp32 accuracy:
    #   s <- s0 + (y - 2^s0) / (2^s0 * ln 2).
    one_m = 1.0 - alpha
    s0 = jnp.log2(one_m)
    if gradient_walk:
        # raw hardware log2 (3.5e-4 rel) is inside the gradient error
        # budget — skip the Newton step's exp2 + reciprocal
        s = s0
    else:
        e0 = jnp.exp2(s0)
        # The correction term is ~3.5e-4 relative, so an approximate
        # reciprocal (vs an exact divide) perturbs s by ~1e-7 relative —
        # free accuracy-wise, and the VPU's approx reciprocal is much
        # cheaper than a true divide.
        s = s0 + (one_m - e0) * (pl.reciprocal(e0, approx=True)
                                 * 1.4426950408889634)
    s = jnp.where(alpha > 0.0, s, 0.0)  # padding lanes: exactly no-op
    if gradient_walk:
        incl = _incl_cumsum(s, triu, prec=jax.lax.Precision.DEFAULT)
    elif _FWD_SPLIT in ("v2", "v3"):
        incl = sum(_incl_cumsum(t, triu, prec=jax.lax.Precision.DEFAULT)
                   for t in _split3(s))
    else:
        incl = _incl_cumsum(s, triu, prec=_PREC)
    lT_incl = logT + incl
    lT_excl = lT_incl - s
    T_j = jnp.exp2(lT_excl)
    # CUDA stop rule: pair j contributes unless some k <= j (with alpha_k>0)
    # drove T*(1-alpha) below 1e-4. lT_incl IS that inclusive test value in
    # log space and is monotone non-increasing along j, so "stopped at or
    # before j" == below_j. frozen_T = T at the first crossing = max of the
    # (monotone decreasing) exclusive log-T over the below region.
    below = lT_incl < LOG2_STOP
    use = (alpha > 0.0) & (done < 1.0) & (~below)
    w = jnp.where(use, alpha * T_j, 0.0)

    # `below` is monotone along j (lT_incl is non-increasing), so the last
    # lane IS the "stopped at or before the chunk end" flag. The frozen-T
    # lane-max (7+ cross-lane stages on [PIX, CHUNK]) only matters on the
    # one chunk where a pixel actually crosses the threshold — guard it
    # behind a scalar branch that is almost always false.
    # frozen_T = T at the first crossing = max of the (monotone decreasing)
    # exclusive log-T over the below region. Two cheaper-looking variants
    # were measured SLOWER in the 20-iteration segment loop on v5e: a scalar
    # lax.cond guard (+3.2 ms/iter — the Mosaic branch stalls the chunk
    # pipeline) and a first-below-edge masked row-sum on the MXU (+3.8 —
    # a per-chunk HIGHEST [PIX,CHUNK]x[CHUNK,1] matmul costs more than the
    # lane-max). The plain unconditional cross-lane max wins.
    any_stop = below[:, CHUNK - 1:CHUNK]
    if gradient_walk:
        # A stopped pixel has use=False in every LATER chunk (done >= 1
        # masks w and dalpha to exactly 0), so the gradient walk never
        # consumes the frozen transmittance — skip the 7-stage cross-lane
        # max and carry the (monotone decreasing) inclusive end value;
        # T_j merely underflows toward 0 on masked lanes.
        logT_new = jnp.where(done >= 1.0, logT, lT_incl[:, CHUNK - 1:CHUNK])
    else:
        frozen = jnp.max(jnp.where(below, lT_excl, _NEG), axis=1,
                         keepdims=True)
        logT_new = jnp.where(done >= 1.0, logT,
                             jnp.where(any_stop, frozen,
                                       lT_incl[:, CHUNK - 1:CHUNK]))
    done_new = jnp.maximum(done, any_stop.astype(jnp.float32))
    return w, logT_new, done_new, alpha_raw, one_m, use, T_j, xl, yl, feat


def _tile_origin(t, tiles_x):
    ty = t // tiles_x
    tx = t - ty * tiles_x
    return (tx * TILE).astype(jnp.float32), (ty * TILE).astype(jnp.float32)


def _fwd_kernel(tile_lo_ref, tile_start_ref, tile_count_ref, pair_hbm,
                acc_ref, tfin_ref, buf, sem, *, tiles_x: int, n_tiles: int,
                chan_major: bool = False, nc: int = NC, nf_in: int = NF):
    """Double-buffered walk (slots 0/1) + cross-program chunk-0 prefetch
    (parity slots 2/3): chunk ci+1's DMA is in flight while ci computes, and
    tile t+1's first chunk is in flight while tile t walks.

    `tile_lo_ref` ([1] scalar prefetch) is the GLOBAL index of local tile 0:
    programs/segment tables are window-local (tile sharding over a device
    mesh gives each shard a contiguous range), pixel origins are global."""
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    ox, oy = _tile_origin(t + tile_lo_ref[0], tiles_x)
    n_chunks = pl.cdiv(count, CHUNK)
    n_steps = pl.cdiv(count, W)
    triu = _triu_ones()
    basis = _pix_basis()

    def dma(off_pairs, slot):
        off = pl.multiple_of(off_pairs, CHUNK)
        # The pose-gradient path packs Jacobian extension rows below the
        # standard NF fields ([nf_in, P] with nf_in > NF); the forward walk
        # only reads the standard rows, so DMA just that slab.
        src = (pair_hbm.at[:, pl.ds(off, W)] if nf_in == NF
               else pair_hbm.at[pl.ds(0, NF), pl.ds(off, W)])
        return pltpu.make_async_copy(src, buf.at[slot], sem.at[slot])

    pf = 2 + jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        dma(start, pf).start()

    dma(start, pf).wait()

    @pl.when(t + 1 < n_tiles)
    def _():
        dma(tile_start_ref[t + 1], 2 + jax.lax.rem(t + 1, 2)).start()

    def cond(carry):
        ci, logT, done, acc = carry
        if not EARLY_EXIT:
            return ci < n_steps
        return (ci < n_steps) & (jnp.min(done) < 1.0)

    def body(carry):
        ci, logT, done, acc = carry
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_steps)
        def _():
            dma(start + (ci + 1) * W, 1 - slot).start()

        @pl.when(ci > 0)
        def _():
            dma(start + ci * W, slot).wait()

        data_full = buf[jnp.where(ci == 0, pf, slot)]
        for u in range(UNROLL):
            data = data_full[:, u * CHUNK:(u + 1) * CHUNK]
            if u:
                # trailing sub-chunk may cross the segment end into the
                # next tile's pairs: zero it so it reproduces the
                # padding-lane semantics (op=0 kills every contribution)
                data = jnp.where(ci * UNROLL + u < n_chunks, data, 0.0)
            w, logT, done, _, _, _, _, _, _, feat = _chunk_forward(
                data, basis, ox, oy, logT, done, triu, nc=nc
            )
            if _FWD_SPLIT == "v3":
                wh = w.astype(jnp.bfloat16).astype(jnp.float32)
                wl = w - wh
                fh = feat.astype(jnp.bfloat16).astype(jnp.float32)
                fl = feat - fh
                dims = (((1,), (1,)), ((), ()))
                dg = functools.partial(jax.lax.dot_general,
                                       dimension_numbers=dims,
                                       preferred_element_type=jnp.float32)
                acc = acc + dg(wh, fh) + dg(wh, fl) + dg(wl, fh)
            else:
                acc = acc + jax.lax.dot_general(
                    w, feat, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=_PREC,
                )  # [PIX, NC]
        return ci + 1, logT, done, acc

    logT0 = jnp.zeros((PIX, 1), jnp.float32)
    done0 = jnp.zeros((PIX, 1), jnp.float32)
    acc0 = jnp.zeros((PIX, nc), jnp.float32)
    ci_fin, logT_fin, _, acc = jax.lax.while_loop(
        cond, body, (0, logT0, done0, acc0)
    )
    # drain the prefetched-but-unconsumed DMA after an early exit
    @pl.when((ci_fin < n_steps) & (ci_fin > 0))
    def _():
        dma(start + ci_fin * W, jax.lax.rem(ci_fin, 2)).wait()

    if chan_major:
        # channel-major [1, NC, PIX] blocks ([T, NC, PIX] arrays): PIX
        # stays on the lane dim so downstream elementwise loss ops see
        # full 128-lane vregs instead of an NC=6-wide minor dim padded
        # ~21x (one tiny [PIX, NC] transpose per tile). Mosaic requires
        # the block's trailing two dims to equal the array's, so the tile
        # index leads and channels sit second-from-minor (sublane pad
        # 6->8 only).
        acc_ref[0, :, :] = acc.T
        tfin_ref[0, :, :] = jnp.exp2(logT_fin).T
    else:
        acc_ref[0, :, :] = acc
        tfin_ref[0, :, :] = jnp.exp2(logT_fin)


@functools.partial(jax.jit, static_argnames=("cam", "interpret", "n_local",
                                              "chan_major", "nc"))
def _composite_pallas_fwd(pair_rows, tile_start, tile_count, cam: Camera,
                          interpret: bool = False, tile_lo=None,
                          n_local: int | None = None,
                          chan_major: bool = False, nc: int = NC):
    """`tile_lo`/`n_local`: optional tile WINDOW (global index of local tile
    0 + static local tile count) for tile-sharded compositing; defaults to
    the full camera grid. `chan_major`: emit acc as [n_tiles, NC, PIX] and
    tfin as [n_tiles, 1, PIX] (lane dim = pixels) for the tile-layout loss
    path instead of [n_tiles, PIX, NC]/[n_tiles, PIX, 1]. `nc`: number of
    composited feature channels (a PREFIX of the packed feature rows
    [r, g, b, z, 1, z^2]) — tracking losses never read E[z^2] outside
    splatam, so walking nc=5 drops that channel's accumulate work."""
    n_tiles = cam.n_tiles if n_local is None else n_local
    if tile_lo is None:
        tile_lo = jnp.zeros((1,), jnp.int32)
    else:
        tile_lo = jnp.asarray(tile_lo, jnp.int32).reshape(1)
    kernel = functools.partial(_fwd_kernel, tiles_x=cam.tiles_x,
                               n_tiles=n_tiles, chan_major=chan_major, nc=nc,
                               nf_in=pair_rows.shape[0])
    if chan_major:
        out_specs = [
            pl.BlockSpec((1, nc, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n_tiles, nc, PIX), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 1, PIX), jnp.float32),
        ]
    else:
        out_specs = [
            pl.BlockSpec((1, PIX, nc), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PIX, 1), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n_tiles, PIX, nc), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, PIX, 1), jnp.float32),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((4, NF, W), jnp.float32),  # 0/1 walk, 2/3 prefetch
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    acc, tfin = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tile_lo, tile_start, tile_count, pair_rows)
    return acc, tfin


def _chunk_gradient(data, basis, ox, oy, logT, done, triu, A_pref,
                    dC, CdC, dT_fin, T_fin, gradient_walk, nc):
    """Per-chunk analytic gradient core, shared by the per-pair backward
    (_bwd_kernel, which emits the field gradients to HBM for the slot-table
    reduce) and the fused pose backward (_bwd_pose_kernel, which contracts
    them against packed pose Jacobians in-register).

    Replays the chunk forward and returns
    (logT, done, A_pref, dxy_x, dxy_y, dc0, dc1, dc2, dop, dfeat)
    — gradients of the loss w.r.t. the packed pair fields (screen xy,
    conic, opacity, features)."""
    (w, logT, done, alpha_raw, one_m, use, T_j, xl, yl,
     feat) = _chunk_forward(data, basis, ox, oy, logT, done, triu,
                            gradient_walk=gradient_walk, nc=nc)

    # d feat[c, j] = sum_p dC(p, c) w(p, j)  -> [NC, CHUNK]
    dfeat = jax.lax.dot_general(
        dC, w, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_GPREC,
    )
    # (feat_j . dC_p) -> [PIX, CHUNK]; gradient-path (feeds dalpha)
    fdc = jax.lax.dot_general(
        dC, feat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_GPREC,
    )
    r = w * fdc
    # inclusive lane cumsum via triangular MXU matmuls (no add-scan)
    r_incl = _incl_cumsum(r, triu, prec=_GPREC)
    suffix = CdC - A_pref - r_incl       # (C - A_{<=j}) . dC

    # one_m is don't-care outside `use` (dalpha is masked right
    # after), so the chunk-forward's 1 - alpha is reused as-is, and
    # under the gradient walk the full-precision divide drops to the
    # VPU's approximate reciprocal (~1e-4 rel — gradient budget).
    if gradient_walk:
        inv_onem = pl.reciprocal(one_m, approx=True)
    else:
        inv_onem = 1.0 / one_m
    dalpha = T_j * fdc - (suffix + dT_fin * T_fin) * inv_onem
    dalpha = jnp.where(use, dalpha, 0.0)

    op = data[5:6, :]
    dpower = alpha_raw * dalpha
    # All six per-pair reductions over PIX collapse into ONE MXU
    # matmul against the quadratic pixel basis: with
    # S = basis^T @ dpower the moment rows are
    # [S1, Sx, Sy, Sxx, Sxy, Syy] and every gradient of the EWA
    # exponent is [1, CHUNK] row algebra in those moments
    # (dx = xl - px, so e.g. sum dx*dpower = xl*S1 - Sx). dop is
    # free: G*dalpha = (alpha_raw/op)*dalpha = dpower/op.
    S = jax.lax.dot_general(
        basis, dpower, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_GPREC,
    )  # [8, CHUNK]
    S1 = S[0:1, :]
    Sx = S[1:2, :]
    Sy = S[2:3, :]
    Sxx = S[3:4, :]
    Sxy = S[4:5, :]
    Syy = S[5:6, :]
    dop = jnp.where(op > 0, S1 / jnp.where(op > 0, op, 1.0), 0.0)
    c0 = data[2:3, :]
    c1 = data[3:4, :]
    c2 = data[4:5, :]
    mx = xl * S1 - Sx            # sum dx * dpower
    my = yl * S1 - Sy            # sum dy * dpower
    dxy_x = -(c0 * mx + c1 * my)
    dxy_y = -(c2 * my + c1 * mx)
    dc0 = -0.5 * (xl * xl * S1 - 2.0 * xl * Sx + Sxx)
    dc1 = -(xl * yl * S1 - xl * Sy - yl * Sx + Sxy)
    dc2 = -0.5 * (yl * yl * S1 - 2.0 * yl * Sy + Syy)

    A_pref = A_pref + r_incl[:, CHUNK - 1:CHUNK]
    return logT, done, A_pref, dxy_x, dxy_y, dc0, dc1, dc2, dop, dfeat


def _bwd_kernel(tile_lo_ref, tile_start_ref, tile_count_ref, pair_hbm,
                dacc_ref, dtfin_ref, acc_ref, tfin_ref, dpair_hbm, buf,
                dpair_buf, sems, osems,
                *, tiles_x: int, n_tiles: int, out_dtype=jnp.float32,
                gradient_walk=False, chan_major: bool = False, nc: int = NC):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    ox, oy = _tile_origin(t + tile_lo_ref[0], tiles_x)
    triu = _triu_ones()
    basis = _pix_basis()

    if chan_major:
        dC = dacc_ref[0].T      # [PIX, NC]
        dT_fin = dtfin_ref[0].T  # [PIX, 1]
        C_tot = acc_ref[0].T
        T_fin = tfin_ref[0].T
    else:
        dC = dacc_ref[0]          # [PIX, NC]  (VMEM-blocked input)
        dT_fin = dtfin_ref[0]     # [PIX, 1]
        C_tot = acc_ref[0]        # [PIX, NC]
        T_fin = tfin_ref[0]       # [PIX, 1]
    CdC = jnp.sum(C_tot * dC, axis=1, keepdims=True)  # [PIX, 1]

    n_chunks = pl.cdiv(count, CHUNK)
    n_steps = pl.cdiv(count, W)

    def dma_in(off_pairs, slot):
        off = pl.multiple_of(off_pairs, CHUNK)
        return pltpu.make_async_copy(
            pair_hbm.at[:, pl.ds(off, W)], buf.at[slot], sems.at[slot]
        )

    def dma_out(ci, buf_slot, sem_slot):
        # trip-wide [NF, W] write-back; a trailing masked sub-chunk writes
        # zeros past the segment end — into inter-segment alignment pad or
        # the NEXT tile's first chunk, which that (sequentially later)
        # program rewrites in full before its outputs are consumed
        off = pl.multiple_of(start + ci * W, CHUNK)
        return pltpu.make_async_copy(
            dpair_buf.at[buf_slot], dpair_hbm.at[:, pl.ds(off, W)],
            osems.at[sem_slot]
        )

    pf = 2 + jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        dma_in(start, pf).start()

    dma_in(start, pf).wait()

    @pl.when(t + 1 < n_tiles)
    def _():
        dma_in(tile_start_ref[t + 1], 2 + jax.lax.rem(t + 1, 2)).start()

    def cond(carry):
        ci, logT, done, A_pref = carry
        if not EARLY_EXIT:
            return ci < n_steps
        return (ci < n_steps) & (jnp.min(done) < 1.0)

    def body(carry):
        ci, logT, done, A_pref = carry
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_steps)
        def _():
            dma_in(start + (ci + 1) * W, 1 - slot).start()

        @pl.when(ci > 0)
        def _():
            dma_in(start + ci * W, slot).wait()

        data_full = buf[jnp.where(ci == 0, pf, slot)]
        # double-buffered write-back: before reusing this output slot
        # (written two trips ago), drain its in-flight DMA
        @pl.when(ci >= 2)
        def _():
            dma_out(ci - 2, slot, slot).wait()

        for u in range(UNROLL):
            data = data_full[:, u * CHUNK:(u + 1) * CHUNK]
            if u:
                data = jnp.where(ci * UNROLL + u < n_chunks, data, 0.0)
            (logT, done, A_pref, dxy_x, dxy_y, dc0, dc1, dc2, dop,
             dfeat) = _chunk_gradient(data, basis, ox, oy, logT, done, triu,
                                      A_pref, dC, CdC, dT_fin, T_fin,
                                      gradient_walk, nc)

            zeros_pad = jnp.zeros((NF - 6 - nc, CHUNK), jnp.float32)
            # emit FIELD-major [NF, W] — no in-VMEM transpose, no lane pad,
            # 8x less HBM write traffic than a 128-lane-padded row-major
            # slab; the consumer pays one barriered [NF, P] -> [P, NF] HBM
            # transpose instead (bandwidth-bound). With out_dtype=bfloat16
            # the per-pair gradients are rounded to 8-bit mantissa before
            # the slot-table reduction — halves every downstream byte; the
            # ~0.4% per-pair rounding is far below Adam's gradient-noise
            # floor (the reduction still accumulates f32).
            dpair_buf[slot, :, u * CHUNK:(u + 1) * CHUNK] = jnp.concatenate(
                [dxy_x, dxy_y, dc0, dc1, dc2, dop, dfeat, zeros_pad], axis=0
            ).astype(out_dtype)

        dma_out(ci, slot, slot).start()
        return ci + 1, logT, done, A_pref

    logT0 = jnp.zeros((PIX, 1), jnp.float32)
    done0 = jnp.zeros((PIX, 1), jnp.float32)
    A0 = jnp.zeros((PIX, 1), jnp.float32)
    ci_fin, _, _, _ = jax.lax.while_loop(cond, body, (0, logT0, done0, A0))

    # drain the prefetched-but-unconsumed input DMA after an early exit
    @pl.when((ci_fin < n_steps) & (ci_fin > 0))
    def _():
        dma_in(start + ci_fin * W, jax.lax.rem(ci_fin, 2)).wait()

    # drain the trailing output DMAs (the zero-fill below and the next tile
    # reuse the same slots/semaphores)
    @pl.when(ci_fin >= 2)
    def _():
        dma_out(ci_fin - 2, jax.lax.rem(ci_fin - 2, 2),
                jax.lax.rem(ci_fin - 2, 2)).wait()

    @pl.when(ci_fin >= 1)
    def _():
        dma_out(ci_fin - 1, jax.lax.rem(ci_fin - 1, 2),
                jax.lax.rem(ci_fin - 1, 2)).wait()

    # Early exit (all pixels saturated): gradients for the remaining pairs
    # are exactly zero (use=False => w=0, dalpha=0, dfeat = dC.w = 0), but
    # the slot-table reduction gathers those slots, so their slabs must be
    # ZEROED, not skipped. One zeroed buffer, overlapped writes on the two
    # output semaphores.
    n_rest = n_steps - ci_fin

    @pl.when(n_rest > 0)
    def _():
        dpair_buf[0] = jnp.zeros((NF, W), out_dtype)

        def zbody(j, _):
            @pl.when(j >= 2)
            def _():
                dma_out(ci_fin + j - 2, 0, jax.lax.rem(j, 2)).wait()

            dma_out(ci_fin + j, 0, jax.lax.rem(j, 2)).start()
            return 0

        jax.lax.fori_loop(0, n_rest, zbody, 0)

        @pl.when(n_rest >= 2)
        def _():
            dma_out(ci_fin + n_rest - 2, 0, jax.lax.rem(n_rest - 2, 2)).wait()

        dma_out(ci_fin + n_rest - 1, 0, jax.lax.rem(n_rest - 1, 2)).wait()


@functools.partial(jax.jit,
                   static_argnames=("cam", "interpret", "grad_bf16",
                                    "n_local", "chan_major", "nc"))
def _composite_pallas_bwd_rows(pair_rows, tile_start, tile_count, acc, tfin,
                               dacc, dtfin, cam: Camera,
                               interpret: bool = False,
                               grad_bf16: bool = False, tile_lo=None,
                               n_local: int | None = None,
                               chan_major: bool = False, nc: int = NC):
    """Backward kernel: per-pair gradients FIELD-major [NF, padded_cap]
    (same layout as the pair input; bfloat16 rows when grad_bf16).
    `chan_major`: acc/tfin/dacc/dtfin are channel-major (see
    _composite_pallas_fwd)."""
    n_tiles = cam.n_tiles if n_local is None else n_local
    if tile_lo is None:
        tile_lo = jnp.zeros((1,), jnp.int32)
    else:
        tile_lo = jnp.asarray(tile_lo, jnp.int32).reshape(1)
    padded_cap = pair_rows.shape[1]
    out_dtype = jnp.bfloat16 if grad_bf16 else jnp.float32
    # the rounded gradient walk only compensates the compiled TPU path;
    # interpret mode's dots are f32-exact, so it replays the forward
    # bit-exactly under every mode (what the kernel-vs-oracle tests check)
    kernel = functools.partial(_bwd_kernel, tiles_x=cam.tiles_x,
                               n_tiles=n_tiles, out_dtype=out_dtype,
                               gradient_walk=_PREC_MODE == "mixed"
                               and not interpret, chan_major=chan_major,
                               nc=nc)
    if chan_major:
        spec_nc = pl.BlockSpec((1, nc, PIX), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM)
        spec_1 = pl.BlockSpec((1, 1, PIX), lambda t, *_: (t, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        spec_nc = pl.BlockSpec((1, PIX, nc), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM)
        spec_1 = pl.BlockSpec((1, PIX, 1), lambda t, *_: (t, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # pair rows
            spec_nc,                                           # dacc
            spec_1,                                            # dtfin
            spec_nc,                                           # acc
            spec_1,                                            # tfin
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        scratch_shapes=[
            pltpu.VMEM((4, NF, W), jnp.float32),   # 0/1 walk, 2/3 prefetch
            pltpu.VMEM((2, NF, W), out_dtype),     # dpair out (field-major)
            pltpu.SemaphoreType.DMA((4,)),             # input walk + prefetch
            pltpu.SemaphoreType.DMA((2,)),             # output double-buffer
        ],
    )
    dpair_fm = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NF, padded_cap), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tile_lo, tile_start, tile_count, pair_rows, dacc, dtfin, acc, tfin)
    # Columns beyond the last tile's aligned end are never kernel-written
    # and hold garbage — fine for the slot-table consumers (tables only
    # index kernel-written slots; invalid candidates carry SLOT_SENTINEL,
    # which the fill-mode gather zeroes). Callers that expose dpair as a
    # plain cotangent must mask (see composite_pairs_pallas).
    return dpair_fm


NF_POSE = 2 * NF  # standard fields + [9 conic-Jacobian | 3 world-mean | 4 pad]


def _bwd_pose_kernel(tile_lo_ref, tile_start_ref, tile_count_ref, pair_hbm,
                     dacc_ref, dtfin_ref, acc_ref, tfin_ref, psum_ref, buf,
                     sems, *, tiles_x: int, n_tiles: int,
                     gradient_walk=False, chan_major: bool = True,
                     nc: int = NC, fx: float = 1.0, fy: float = 1.0,
                     bx: float = 0.0, by: float = 0.0):
    """Fused pose-gradient backward: TRACKING only optimizes the 7-DoF
    camera pose, so emitting per-pair field gradients to HBM and reducing
    them per-gaussian (the slot-table reduce, ~6-7 ms/iter at the bench
    scene) computes 16 numbers per gaussian to consume 7 per FRAME. This
    kernel instead contracts the per-pair field gradients against packed
    per-gaussian pose Jacobians IN-REGISTER and accumulates the 12 numbers
    the pose gradient actually needs:

        rows 0:3   sum over pairs of d(mean_cam)            (-> dT)
        rows 3:12  sum over pairs of d(mean_cam) (x) mean_w (-> dL/dR,
                   contracted with the shared dR/dq outside)

    per tile ([n_tiles, 16, CHUNK] output; the cross-tile + cross-lane sum
    and the q-chain happen in XLA). No dpair HBM writes, no transpose, no
    slot-table gather — the whole per-pair->per-gaussian->pose pipeline
    collapses into ~40 extra [1, CHUNK] VPU ops per chunk. This is the
    TPU shape of what the reference's CUDA rasterizer-w-pose fork does by
    accumulating viewmatrix gradients inside its backward kernel
    (slam/renderer.py:196-214's backward).

    In the transform_means_python mode (the shipped configs) every
    pose-dependent packed field is a function of mean_cam alone:
    screen xy (via the projection matrix), conic (via the EWA Jacobian),
    and the z / z^2 feature channels; rgb/sil/opacity are pose-constant
    (sh_degree 0). d(xy)/d(mean_cam) is reconstructed in-kernel from the
    packed xy/z fields and the static intrinsics (fx, fy, bx=cx-0.5,
    by=cy-0.5); d(conic)/d(mean_cam) rides packed Jacobian rows 16:25
    (ops/projection.conic_pose_jacobian_rows), world means rows 25:28.
    """
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    ox, oy = _tile_origin(t + tile_lo_ref[0], tiles_x)
    triu = _triu_ones()
    basis = _pix_basis()

    if chan_major:
        dC = dacc_ref[0].T      # [PIX, NC]
        dT_fin = dtfin_ref[0].T  # [PIX, 1]
        C_tot = acc_ref[0].T
        T_fin = tfin_ref[0].T
    else:
        dC = dacc_ref[0]
        dT_fin = dtfin_ref[0]
        C_tot = acc_ref[0]
        T_fin = tfin_ref[0]
    CdC = jnp.sum(C_tot * dC, axis=1, keepdims=True)  # [PIX, 1]

    n_chunks = pl.cdiv(count, CHUNK)
    n_steps = pl.cdiv(count, W)

    def dma_in(off_pairs, slot):
        off = pl.multiple_of(off_pairs, CHUNK)
        return pltpu.make_async_copy(
            pair_hbm.at[:, pl.ds(off, W)], buf.at[slot], sems.at[slot]
        )

    pf = 2 + jax.lax.rem(t, 2)

    @pl.when(t == 0)
    def _():
        dma_in(start, pf).start()

    dma_in(start, pf).wait()

    @pl.when(t + 1 < n_tiles)
    def _():
        dma_in(tile_start_ref[t + 1], 2 + jax.lax.rem(t + 1, 2)).start()

    def cond(carry):
        ci = carry[0]
        if not EARLY_EXIT:
            return ci < n_steps
        return (ci < n_steps) & (jnp.min(carry[2]) < 1.0)

    def body(carry):
        ci, logT, done, A_pref, pacc = carry
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_steps)
        def _():
            dma_in(start + (ci + 1) * W, 1 - slot).start()

        @pl.when(ci > 0)
        def _():
            dma_in(start + ci * W, slot).wait()

        data_full = buf[jnp.where(ci == 0, pf, slot)]
        for u in range(UNROLL):
            data = data_full[:, u * CHUNK:(u + 1) * CHUNK]
            if u:
                data = jnp.where(ci * UNROLL + u < n_chunks, data, 0.0)
            (logT, done, A_pref, dxy_x, dxy_y, dc0, dc1, dc2, _dop,
             dfeat) = _chunk_gradient(data, basis, ox, oy, logT, done, triu,
                                      A_pref, dC, CdC, dT_fin, T_fin,
                                      gradient_walk, nc)

            # d(xy)/d(mean_cam) from packed fields + static intrinsics:
            # px = fx*x/z + cx - 0.5 (half-pixel ndc2Pix convention), so
            # dpx/dx = fx/z, dpx/dz = (bx - px)/z with bx = cx - 0.5
            # (exactly the general path's autodiff through
            # projection.py's ndc2Pix, re-associated).
            z = data[9:10, :]
            p_w = 1.0 / (z + 1e-7)
            if nc == 6:
                dz_eff = dfeat[3:4, :] + (2.0 * z) * dfeat[5:6, :]
            else:
                dz_eff = dfeat[3:4, :]
            jc = data[NF:NF + 9, :]      # d conic_i / d mcam_k at [3i + k]
            gx = dxy_x * (fx * p_w)
            gy = dxy_y * (fy * p_w)
            dm_x = gx + dc0 * jc[0:1] + dc1 * jc[3:4] + dc2 * jc[6:7]
            dm_y = gy + dc0 * jc[1:2] + dc1 * jc[4:5] + dc2 * jc[7:8]
            dm_z = (dxy_x * (p_w * (bx - data[0:1, :]))
                    + dxy_y * (p_w * (by - data[1:2, :]))
                    + dc0 * jc[2:3] + dc1 * jc[5:6] + dc2 * jc[8:9]
                    + dz_eff)
            mw = data[NF + 9:NF + 12, :]
            pacc = pacc + jnp.concatenate(
                [dm_x, dm_y, dm_z,
                 dm_x * mw[0:1], dm_x * mw[1:2], dm_x * mw[2:3],
                 dm_y * mw[0:1], dm_y * mw[1:2], dm_y * mw[2:3],
                 dm_z * mw[0:1], dm_z * mw[1:2], dm_z * mw[2:3],
                 jnp.zeros((4, CHUNK), jnp.float32)], axis=0)

        return ci + 1, logT, done, A_pref, pacc

    logT0 = jnp.zeros((PIX, 1), jnp.float32)
    done0 = jnp.zeros((PIX, 1), jnp.float32)
    A0 = jnp.zeros((PIX, 1), jnp.float32)
    pacc0 = jnp.zeros((16, CHUNK), jnp.float32)
    ci_fin, _, _, _, pacc = jax.lax.while_loop(
        cond, body, (0, logT0, done0, A0, pacc0)
    )

    # drain the prefetched-but-unconsumed input DMA after an early exit
    # (gradients past the saturation stop are exactly zero — nothing to add)
    @pl.when((ci_fin < n_steps) & (ci_fin > 0))
    def _():
        dma_in(start + ci_fin * W, jax.lax.rem(ci_fin, 2)).wait()

    psum_ref[0, :, :] = pacc


@functools.partial(jax.jit, static_argnames=("cam", "interpret",
                                              "chan_major", "nc", "n_local"))
def _composite_pose_bwd(pair_rows, tile_start, tile_count, acc, tfin,
                        dacc, dtfin, cam: Camera, interpret: bool = False,
                        chan_major: bool = True, nc: int = NC,
                        tile_lo=None, n_local: int | None = None):
    """Fused pose backward: [NF_POSE, P] Jacobian-extended pair rows ->
    per-tile pose-gradient partials [n_tiles, 16, CHUNK] (see
    _bwd_pose_kernel for the row layout). `tile_lo`/`n_local`: optional
    tile WINDOW for the tile-sharded tracking path (same contract as
    _composite_pallas_fwd) — the per-window [16] partial sums are
    psum-ready across shards."""
    n_tiles = cam.n_tiles if n_local is None else n_local
    if tile_lo is None:
        tile_lo = jnp.zeros((1,), jnp.int32)
    else:
        tile_lo = jnp.asarray(tile_lo, jnp.int32).reshape(1)
    kernel = functools.partial(
        _bwd_pose_kernel, tiles_x=cam.tiles_x, n_tiles=n_tiles,
        gradient_walk=_PREC_MODE == "mixed" and not interpret,
        chan_major=chan_major, nc=nc,
        fx=cam.fx, fy=cam.fy, bx=cam.cx - 0.5, by=cam.cy - 0.5)
    if chan_major:
        spec_nc = pl.BlockSpec((1, nc, PIX), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM)
        spec_1 = pl.BlockSpec((1, 1, PIX), lambda t, *_: (t, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        spec_nc = pl.BlockSpec((1, PIX, nc), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM)
        spec_1 = pl.BlockSpec((1, PIX, 1), lambda t, *_: (t, 0, 0),
                              memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),  # pair rows
            spec_nc,                                           # dacc
            spec_1,                                            # dtfin
            spec_nc,                                           # acc
            spec_1,                                            # tfin
        ],
        out_specs=pl.BlockSpec((1, 16, CHUNK), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, NF_POSE, W), jnp.float32),  # 0/1 walk, 2/3 pf
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 16, CHUNK), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(tile_lo, tile_start, tile_count, pair_rows, dacc, dtfin, acc, tfin)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def composite_pairs_pallas(pair_rows, tile_start, tile_count, cam: Camera,
                           interpret: bool = False):
    """Differentiable pallas composite over field-major packed pair data
    [NF, buf_cap].

    Returns (acc [n_tiles, PIX, NC], t_fin [n_tiles, PIX, 1]); background
    and image assembly happen in jnp outside.
    """
    return _composite_pallas_fwd(pair_rows, tile_start, tile_count, cam,
                                 interpret)


def _cp_fwd(pair_rows, tile_start, tile_count, cam, interpret):
    acc, tfin = _composite_pallas_fwd(pair_rows, tile_start, tile_count, cam,
                                      interpret)
    return (acc, tfin), (pair_rows, tile_start, tile_count, acc, tfin)


def _cp_bwd(cam, interpret, res, cts):
    pair_rows, tile_start, tile_count, acc, tfin = res
    dacc, dtfin = cts
    dpair_fm = _composite_pallas_bwd_rows(
        pair_rows, tile_start, tile_count, acc, tfin, dacc, dtfin, cam,
        interpret,
    )
    # This boundary exposes dpair as a plain cotangent of [NF, P] pair data:
    # mask the never-written tail garbage (the fused tables path below
    # masks via the slot tables instead; this path is for standalone use).
    n_valid = tile_start[-1] + tile_count[-1]
    valid = jnp.arange(dpair_fm.shape[1]) < n_valid
    return jnp.where(valid[None, :], dpair_fm, 0.0), None, None


composite_pairs_pallas.defvjp(_cp_fwd, _cp_bwd)


def _table_reduce(dpair_fm, small_slots, big_slots, big_gauss, big_valid,
                  gauss_rank=None):
    """Per-pair row gradients -> per-gaussian [N, NF] via the slot tables.

    Two FLAT wide-row gathers (out-of-range SLOT_SENTINEL slots read as 0)
    and a fixed-width D-axis sum. Fusion control is the whole game here
    (measured on v5e):
      * the kernel's field-major [NF, P] output is transposed to row-major
        behind an optimization barrier (a bare HBM transpose is
        bandwidth-bound; fused or strided-source gathers are pathological),
      * the gather result is barriered too, then reduced with a plain
        reshape+sum — fusing the reduction (or a HIGHEST-precision block-sum
        matmul, which re-reads its fused operand once per pass) back into
        the gather re-executes the gather per output element,
      * clip-mode gathers are ~25x slower than fill-mode on this backend;
        never use plain `x[idx]` at this scale,
      * `gauss_rank` set means small_slots rows are in DEPTH order (see
        binning.TileBins): pairs are (tile, depth)-sorted, so the big
        gather's indices walk d1 quasi-sequential HBM streams instead of
        random rows; the [N, NF] result is un-permuted back to original
        gaussian ids with one cheap row gather at the end.
    ~25x cheaper than the P-sized scatter-add transpose the plain gather
    VJP would emit."""
    dpair16 = jax.lax.optimization_barrier(dpair_fm.T)
    n, d1 = small_slots.shape
    big_cap, d2 = big_slots.shape

    # TWO separate tier gathers: a round-2 pass merged them to save a
    # dispatch, but in-loop (no dispatch cost) the split is ~1 ms/iter
    # FASTER at the bench scene (674k merged 5.78 vs 524k+150k split 4.74,
    # scripts/probe_reduce3.py — the smaller gather pipelines). Both
    # reshape-sums accumulate in f32 regardless of the emitted gradient
    # dtype (bf16 production path).
    gs = dpair16.at[small_slots.reshape(-1)].get(mode="fill", fill_value=0)
    gs = jax.lax.optimization_barrier(gs)
    acc = gs.reshape(n, d1, NF).sum(axis=1, dtype=jnp.float32)
    if gauss_rank is not None:
        acc = acc.at[gauss_rank].get(mode="fill", fill_value=0.0)
    gb = dpair16.at[big_slots.reshape(-1)].get(mode="fill", fill_value=0)
    gb = jax.lax.optimization_barrier(gb)
    big_sum = gb.reshape(big_cap, d2, NF).sum(axis=1, dtype=jnp.float32)
    big_sum = jnp.where(big_valid[:, None], big_sum, 0.0)
    return acc.at[big_gauss].add(big_sum)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(10, 11, 12, 14, 15, 16))
def _composite_packed(packed, pair_gauss, pair_valid, small_slots, big_slots,
                      big_gauss, big_valid, gauss_rank, tile_start,
                      tile_count, cam, interpret, grad_bf16=False,
                      tile_lo=None, n_local=None, chan_major=False,
                      nc=NC):
    """Fused pack + composite with the slot-table backward.

    One differentiable unit from per-gaussian packed rows to tile outputs:
    the backward kernel emits per-pair gradients ROW-major straight into the
    slot-table reduction — no [NF, P] <-> [P, NF] HBM transpose anywhere
    (that transpose alone cost ~45 ms at 2.25M pairs). `tile_lo`/`n_local`
    select a tile window (tile-sharded compositing); the slot tables must
    come from the same-windowed build_bins. `chan_major`: channel-major
    tile outputs (see _composite_pallas_fwd). `nc`: composited channel
    count (see _composite_pallas_fwd); dpacked keeps its [N, 16] shape —
    the un-walked feature columns simply get exact-zero gradients (the
    loss does not read those channels)."""
    pair_rows = pack_pairs(packed, pair_gauss, pair_valid)
    return _composite_pallas_fwd(pair_rows, tile_start, tile_count, cam,
                                 interpret, tile_lo, n_local, chan_major,
                                 nc)


def _cpk_fwd(packed, pair_gauss, pair_valid, small_slots, big_slots,
             big_gauss, big_valid, gauss_rank, tile_start, tile_count, cam,
             interpret, grad_bf16=False, tile_lo=None, n_local=None,
             chan_major=False, nc=NC):
    pair_rows = pack_pairs(packed, pair_gauss, pair_valid)
    acc, tfin = _composite_pallas_fwd(pair_rows, tile_start, tile_count, cam,
                                      interpret, tile_lo, n_local,
                                      chan_major, nc)
    res = (pair_rows, acc, tfin, small_slots, big_slots, big_gauss,
           big_valid, gauss_rank, tile_start, tile_count, tile_lo)
    return (acc, tfin), res


def _cpk_bwd(cam, interpret, grad_bf16, n_local, chan_major, nc, res, cts):
    (pair_rows, acc, tfin, small_slots, big_slots, big_gauss, big_valid,
     gauss_rank, tile_start, tile_count, tile_lo) = res
    dacc, dtfin = cts
    dpair_fm = _composite_pallas_bwd_rows(
        pair_rows, tile_start, tile_count, acc, tfin, dacc, dtfin, cam,
        interpret, grad_bf16, tile_lo, n_local, chan_major, nc,
    )
    dpacked = _table_reduce(dpair_fm, small_slots, big_slots, big_gauss,
                            big_valid, gauss_rank)
    return (dpacked, None, None, None, None, None, None, None, None, None,
            None)


_composite_packed.defvjp(_cpk_fwd, _cpk_bwd)


def composite_tiles_pallas(proj, bins, cam: Camera, bg: jnp.ndarray,
                           interpret: bool = False, grad_bf16: bool = False):
    """Drop-in replacement for ops.composite.composite_tiles (pallas path)."""
    if bins.small_slots is not None:
        acc, tfin = _composite_packed(
            proj.packed, bins.pair_gauss, bins.pair_valid,
            bins.small_slots, bins.big_slots, bins.big_gauss, bins.big_valid,
            bins.gauss_rank, bins.tile_start, bins.tile_count, cam,
            interpret, grad_bf16,
        )
    else:
        pair_rows = pack_pairs(proj.packed, bins.pair_gauss, bins.pair_valid)
        acc, tfin = composite_pairs_pallas(
            pair_rows, bins.tile_start, bins.tile_count, cam, interpret
        )
    out = acc + tfin * bg[None, None, :]  # [T, PIX, NC]
    tiles_y, tiles_x = cam.tiles_y, cam.tiles_x
    img = out.reshape(tiles_y, tiles_x, TILE, TILE, NC)
    img = img.transpose(4, 0, 2, 1, 3).reshape(NC, tiles_y * TILE, tiles_x * TILE)
    return img[:, : cam.height, : cam.width]

"""Shard-local Gaussian-map surgery: prune/densify with NO cross-shard data
movement (SURVEY §7 step 9's "shard-local densify/prune with capacity
rebalance").

Why this exists (measured, scripts/bench_sharded.py append_prune phase): the
global `prune_compact` is a stable argsort over the FULL [CAP] index space —
under a "gauss"-row-sharded map every leaf gather crosses shards, and the
8-device CPU-mesh proxy measured a 12.2x SPMD overhead factor for a
prune+append cycle (mesh-1 11.5 ms vs mesh-8 1123 ms at 16k rows/shard).
The reference has no analogue (single GPU, in-place torch surgery,
gaussian_model.py:380-488); this is the TPU-native design.

Representation: under the mesh, ``GaussianMap.n_alive`` is a ``[S]`` int32
vector of PER-SHARD alive-prefix counts — shard ``s`` owns rows
``[s*B, s*B + n_alive[s])`` of every ``[CAP, ...]`` leaf (``B = CAP // S``).
``GaussianMap.alive_mask()/total_alive()/to_numpy_dict`` understand both
layouts; the single-chip scalar layout is untouched.

  * ``prune_compact_sharded``: each shard stable-compacts ITS rows with a
    local argsort + local gathers inside ``shard_map`` — zero collectives.
  * ``append_gaussians_sharded``: replicated candidate rows are dealt
    round-robin by masked rank, so every shard scatters its own ~M/S rows
    into its local free slots and per-shard load stays balanced to +-1 per
    append (the "capacity rebalance" — new rows fill whichever shards have
    room rather than piling onto the global prefix end).
  * ``grow_capacity_sharded``: pads every shard's block IN PLACE
    (reshape-interleaved) so shard-local prefixes survive growth; the
    global-concat `grow_capacity` would shift shard boundaries and scramble
    ownership.

Semantics vs the global ops: the same SET of gaussians survives/appears,
with the same values and Adam moments; only the row ORDER differs (shard-
interleaved instead of globally stable). Rendering is order-independent up
to equal-depth sort ties, and the PLY schema carries no ordering contract —
the 8-device SLAM e2e bounds the end-to-end effect (tests/
test_multichip_e2e.py tolerances).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..models.gaussians import (
    AdamState,
    GaussianMap,
    NewGaussians,
    _PARAM_FIELDS,
    empty_map,
)
from .mesh import GAUSS_AXIS


def shard_counts(n_alive: jnp.ndarray, n_shards: int,
                 capacity: int) -> jnp.ndarray:
    """Scalar global alive prefix -> per-shard prefix counts [S].

    This is exactly the per-shard live-row layout a globally-compacted map
    has once row-sharded (shard s holds global rows [s*B, (s+1)*B)), so
    converting at mesh-placement time changes nothing about which rows are
    alive. A vector input passes through unchanged."""
    if n_alive.ndim:
        return n_alive.astype(jnp.int32)
    block = capacity // n_shards
    starts = jnp.arange(n_shards, dtype=jnp.int32) * block
    return jnp.clip(n_alive - starts, 0, block).astype(jnp.int32)


def _map_leaves(m: GaussianMap, adam: AdamState):
    fields = []
    for g in (m, adam.mu, adam.nu):
        fields.extend(getattr(g, f) for f in _PARAM_FIELDS)
    return tuple(fields)


def _rebuild(m: GaussianMap, adam: AdamState, leaves, n_alive):
    k = len(_PARAM_FIELDS)
    m2 = m._replace(**dict(zip(_PARAM_FIELDS, leaves[:k])), n_alive=n_alive)
    mu = adam.mu._replace(**dict(zip(_PARAM_FIELDS, leaves[k:2 * k])))
    nu = adam.nu._replace(**dict(zip(_PARAM_FIELDS, leaves[2 * k:3 * k])))
    return m2, AdamState(mu=mu, nu=nu, step=adam.step)


def prune_compact_sharded(
    m: GaussianMap,
    adam: AdamState,
    keep: jnp.ndarray,
    mesh: Mesh,
    extras: tuple = (),
):
    """Shard-local stable compaction (the mesh-path `prune_compact`).

    Each shard argsorts only ITS block and gathers its own leaf rows — no
    cross-shard movement, no global argsort. `extras` are [CAP]-leading
    arrays (densification stats, BA masks) permuted identically so per-row
    attachments survive, replacing the caller-side `x[order]` remaps of the
    global API (slam/map_opt.py prune step).

    Returns (map, adam, extras2) with a per-shard `n_alive` vector."""
    n_shards = mesh.devices.size
    cap = m.capacity
    assert cap % n_shards == 0, (cap, n_shards)
    counts = shard_counts(m.n_alive, n_shards, cap)
    leaves = _map_leaves(m, adam)

    def local_fn(cnt, keep_l, *arrs):
        block = keep_l.shape[0]
        alive = jnp.arange(block) < cnt[0]
        k = keep_l & alive
        order = jnp.argsort(jnp.where(k, 0, 1), stable=True)
        n_new = jnp.sum(k.astype(jnp.int32))
        return (n_new[None],) + tuple(a[order] for a in arrs)

    row = P(GAUSS_AXIS)
    n_arr = len(leaves) + len(extras)
    out = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(row, row) + (row,) * n_arr,
        out_specs=(row,) + (row,) * n_arr,
    )(counts, keep, *leaves, *extras)
    counts2 = out[0]
    leaves2 = out[1:1 + len(leaves)]
    extras2 = out[1 + len(leaves):]
    m2, adam2 = _rebuild(m, adam, leaves2, counts2)
    return m2, adam2, extras2


def _waterfill_quota(counts: jnp.ndarray, block: int, want: jnp.ndarray):
    """Per-shard append quotas [S]: place `want` rows so the final fill
    levels are as even as possible (least-loaded shards first), dropping
    only what exceeds TOTAL free capacity — matching the global op's
    "drop only on full map" semantics.

    Exact water-fill via binary search on the interleaved slot key
    (local_slot * S + shard): keys are distinct integers, so the count of
    in-capacity slots below a threshold is monotone and hits every value —
    the K smallest keys ARE the balanced assignment."""
    n_shards = counts.shape[0]
    free = block - counts
    K = jnp.minimum(want, jnp.sum(free)).astype(jnp.int32)
    s_iota = jnp.arange(n_shards, dtype=jnp.int32)

    def taken(theta):
        # slots (s, j) with j in [counts_s, block), j * S + s < theta
        j_lt = (theta - s_iota + n_shards - 1) // n_shards  # j < this
        return jnp.clip(j_lt - counts, 0, free)

    def body(state):
        lo, hi = state
        mid = (lo + hi) // 2
        ge = jnp.sum(taken(mid)) >= K
        return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

    lo0 = jnp.int32(0)
    hi0 = jnp.int32(block * n_shards + 1)
    lo, hi = jax.lax.while_loop(lambda st: st[0] + 1 < st[1], body,
                                (lo0, hi0))
    # hi = smallest theta with sum(taken) >= K; distinct keys make the sum
    # hit K exactly there (K=0 needs the explicit zero)
    return jnp.where(K > 0, taken(hi), 0)


def append_gaussians_sharded(
    m: GaussianMap,
    adam: AdamState,
    new: NewGaussians,
    mesh: Mesh,
):
    """Shard-local densification (the mesh-path `append_gaussians`).

    Masked candidate rows (replicated — they come from the current frame's
    back-projection, tiny next to the map) are dealt to shards by exact
    water-fill quota (least-loaded first — the "capacity rebalance"), then
    each shard scatters its contiguous rank range into its own free slots.
    Rows are dropped only when the TOTAL map is full, matching the global
    op's clamp semantics (surfaced by the caller via n_added).

    Returns (map, adam, n_added, added_mask[CAP]) — added_mask replaces the
    global path's `arange >= n_alive - n_added` prefix arithmetic for the
    BA always-optimize-new-rows rule (slam/mapper.py run_frame)."""
    n_shards = mesh.devices.size
    cap = m.capacity
    assert cap % n_shards == 0, (cap, n_shards)
    block = cap // n_shards
    counts = shard_counts(m.n_alive, n_shards, cap)
    leaves = _map_leaves(m, adam)
    k = len(_PARAM_FIELDS)

    mask = new.mask
    grank = jnp.cumsum(mask.astype(jnp.int32)) - 1  # rank among masked rows
    n_masked = jnp.sum(mask.astype(jnp.int32))
    quota = _waterfill_quota(counts, block, n_masked)
    off = jnp.cumsum(quota) - quota
    new_leaves = tuple(getattr(new, f) for f in _PARAM_FIELDS)

    def local_fn(cnt, q, o, mask_r, grank_r, news, *arrs):
        s_block = arrs[0].shape[0]
        mine = mask_r & (grank_r >= o[0]) & (grank_r < o[0] + q[0])
        lrank = jnp.cumsum(mine.astype(jnp.int32)) - 1
        tgt = jnp.where(mine, cnt[0] + lrank, s_block)
        outs = []
        for i, dst in enumerate(arrs):
            if i < k:            # parameter leaves: scatter candidate rows
                outs.append(dst.at[tgt].set(news[i], mode="drop"))
            else:                # mu/nu: zero moments on appended rows
                z = jnp.zeros_like(news[i % k])
                outs.append(dst.at[tgt].set(z, mode="drop"))
        li = jnp.arange(s_block)
        added = (li >= cnt[0]) & (li < cnt[0] + q[0])
        return (cnt + q,) + tuple(outs) + (added,)

    row = P(GAUSS_AXIS)
    rep = P()
    out = jax.shard_map(
        local_fn, mesh=mesh,
        in_specs=(row, row, row, rep, rep, rep) + (row,) * len(leaves),
        out_specs=(row,) + (row,) * len(leaves) + (row,),
    )(counts, quota, off, mask, grank, new_leaves, *leaves)
    counts2 = out[0]
    leaves2 = out[1:1 + len(leaves)]
    added_mask = out[-1]
    n_added = jnp.sum(quota)
    m2, adam2 = _rebuild(m, adam, leaves2, counts2)
    return m2, adam2, n_added, added_mask


def grow_capacity_sharded(
    m: GaussianMap,
    state: AdamState,
    new_capacity: int,
    n_shards: int,
):
    """Capacity growth that preserves per-shard blocks (host-level, rare).

    Every leaf [S*B, ...] is reshaped to [S, B, ...] and padded to
    [S, B', ...] so each shard's rows stay contiguous at the start of its
    (bigger) block; the per-shard n_alive prefixes remain valid verbatim.
    The global `grow_capacity` concatenates padding at the global end,
    which under row-sharding would shift every shard boundary and scramble
    row ownership."""
    cap = m.capacity
    assert new_capacity >= cap
    assert cap % n_shards == 0 and new_capacity % n_shards == 0
    if new_capacity == cap:
        return m, state
    block = cap // n_shards
    block2 = new_capacity // n_shards
    extra = block2 - block
    rest = m.features_rest.shape[1]
    tmpl = empty_map(extra, sh_degree=0)._replace(
        features_rest=jnp.zeros((extra, rest, 3), jnp.float32)
    )

    def pad_leaf(x, pad_rows):
        tail = x.shape[1:]
        xs = x.reshape((n_shards, block) + tail)
        pad = jnp.broadcast_to(pad_rows[None], (n_shards, extra) + tail)
        return jnp.concatenate([xs, pad], axis=1).reshape(
            (new_capacity,) + tail)

    n_alive = shard_counts(m.n_alive, n_shards, cap)
    m2 = m._replace(
        **{f: pad_leaf(getattr(m, f), getattr(tmpl, f))
           for f in _PARAM_FIELDS},
        n_alive=n_alive,
    )
    st2 = AdamState(
        mu=state.mu._replace(**{
            f: pad_leaf(getattr(state.mu, f),
                        jnp.zeros_like(getattr(tmpl, f)))
            for f in _PARAM_FIELDS}),
        nu=state.nu._replace(**{
            f: pad_leaf(getattr(state.nu, f),
                        jnp.zeros_like(getattr(tmpl, f)))
            for f in _PARAM_FIELDS}),
        step=state.step,
    )
    return m2, st2

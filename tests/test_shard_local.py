"""Shard-local prune/densify (parallel/shard_local.py) vs the global ops.

Contract: the same SET of gaussians survives/appears with the same values,
Adam moments and per-row stat attachments — only the row ORDER may differ
(shard-interleaved vs globally stable). Verified by key-sorting rows.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm3dgs_slam_tpu.models import gaussians as G
from mm3dgs_slam_tpu.parallel.mesh import make_mesh
from mm3dgs_slam_tpu.parallel.shard_local import (
    append_gaussians_sharded,
    grow_capacity_sharded,
    prune_compact_sharded,
    shard_counts,
)
from mm3dgs_slam_tpu.parallel.sharded import shard_map_state

needs8 = pytest.mark.skipif(len(jax.devices()) < 8,
                            reason="needs 8 virtual devices")

CAP = 256
S = 8


def _random_map(n_alive, seed=0):
    rng = np.random.default_rng(seed)
    m = G.empty_map(CAP)
    idx = jnp.arange(n_alive)
    m = m._replace(
        xyz=m.xyz.at[idx].set(rng.normal(size=(n_alive, 3)).astype(np.float32)),
        opacity=m.opacity.at[idx].set(
            rng.normal(size=(n_alive, 1)).astype(np.float32)),
        scaling=m.scaling.at[idx].set(
            rng.normal(size=(n_alive, 3)).astype(np.float32) - 3),
        n_alive=jnp.asarray(n_alive, jnp.int32),
    )
    adam = G.init_adam(m)
    adam = G.AdamState(
        mu=adam.mu._replace(xyz=jnp.asarray(
            rng.normal(size=(CAP, 3)).astype(np.float32))),
        nu=adam.nu._replace(xyz=jnp.asarray(
            rng.uniform(size=(CAP, 3)).astype(np.float32))),
        step=jnp.asarray(7, jnp.int32),
    )
    return m, adam


def _alive_rows(m, adam, extras=()):
    """Alive rows as a structured, order-independent array (sorted by xyz)."""
    mask = np.asarray(m.alive_mask())
    cols = [np.asarray(m.xyz)[mask], np.asarray(m.opacity)[mask],
            np.asarray(adam.mu.xyz)[mask], np.asarray(adam.nu.xyz)[mask]]
    cols += [np.asarray(e)[mask].reshape(mask.sum(), -1).astype(np.float32)
             for e in extras]
    flat = np.concatenate([c.reshape(mask.sum(), -1) for c in cols], axis=1)
    order = np.lexsort(flat.T[::-1])
    return flat[order]


def test_shard_counts_matches_prefix():
    for n in (0, 1, 31, 32, 100, CAP):
        counts = np.asarray(shard_counts(jnp.asarray(n, jnp.int32), S, CAP))
        assert counts.sum() == n
        # prefix layout: full blocks then one partial then zeros
        block = CAP // S
        expect = np.clip(n - np.arange(S) * block, 0, block)
        np.testing.assert_array_equal(counts, expect)


@needs8
def test_prune_sharded_matches_global_set():
    mesh = make_mesh(S)
    m, adam = _random_map(200, seed=1)
    rng = np.random.default_rng(2)
    keep = jnp.asarray(rng.uniform(size=CAP) > 0.3)
    stats = jnp.asarray(rng.normal(size=CAP).astype(np.float32))

    mg, ag, order = G.prune_compact(m, adam, keep)
    stats_g = stats[order]

    ms, as_ = shard_map_state(m, adam, mesh)
    ms = ms._replace(n_alive=shard_counts(ms.n_alive, S, CAP))
    ms2, as2, (stats_s,) = prune_compact_sharded(ms, as_, keep, mesh,
                                                 extras=(stats,))
    assert int(ms2.total_alive()) == int(mg.n_alive)
    np.testing.assert_array_equal(
        _alive_rows(ms2, as2, (stats_s,)), _alive_rows(mg, ag, (stats_g,)))
    # per-shard counts are consistent with the alive mask
    counts = np.asarray(ms2.n_alive)
    assert counts.shape == (S,)
    assert np.asarray(ms2.alive_mask()).sum() == counts.sum()


@needs8
def test_append_sharded_matches_global_set_and_balances():
    mesh = make_mesh(S)
    m, adam = _random_map(64, seed=3)
    rng = np.random.default_rng(4)
    M = 40
    new = G.NewGaussians(
        xyz=jnp.asarray(rng.normal(size=(M, 3)).astype(np.float32)),
        features_dc=jnp.zeros((M, 1, 3)),
        features_rest=jnp.zeros((M, 1, 3)),
        scaling=jnp.full((M, 3), -2.0),
        rotation=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (M, 1)),
        opacity=jnp.full((M, 1), 0.5),
        rgb=jnp.zeros((M, 3)),
        mask=jnp.asarray(rng.uniform(size=M) > 0.25),
    )
    mg, ag, n_g = G.append_gaussians(m, adam, new)

    ms, as_ = shard_map_state(m, adam, mesh)
    ms = ms._replace(n_alive=shard_counts(ms.n_alive, S, CAP))
    ms2, as2, n_s, added = append_gaussians_sharded(ms, as_, new, mesh)
    assert int(n_s) == int(n_g)
    np.testing.assert_array_equal(_alive_rows(ms2, as2),
                                  _alive_rows(mg, ag))
    # added_mask marks exactly the new rows (zeroed moments on them)
    added = np.asarray(added)
    assert added.sum() == int(n_s)
    assert np.abs(np.asarray(as2.mu.xyz)[added]).max() == 0.0
    # water-fill balance: receiving shards end within +-1 of each other,
    # and any shard left below the water level must have been full already
    before = np.asarray(ms.n_alive)
    after = np.asarray(ms2.n_alive)
    recv = after > before
    assert recv.any()
    level = after[recv].max()
    assert after[recv].min() >= level - 1
    assert (after >= level - 1).all()


@needs8
def test_append_sharded_drops_on_full_shard():
    mesh = make_mesh(S)
    m, adam = _random_map(CAP - 2, seed=5)  # only shard S-1 has 2 free rows
    M = 16
    new = G.NewGaussians(
        xyz=jnp.ones((M, 3)), features_dc=jnp.zeros((M, 1, 3)),
        features_rest=jnp.zeros((M, 1, 3)), scaling=jnp.zeros((M, 3)),
        rotation=jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (M, 1)),
        opacity=jnp.zeros((M, 1)), rgb=jnp.zeros((M, 3)),
        mask=jnp.ones((M,), bool),
    )
    ms, as_ = shard_map_state(m, adam, mesh)
    ms = ms._replace(n_alive=shard_counts(ms.n_alive, S, CAP))
    ms2, _, n_s, _ = append_gaussians_sharded(ms, as_, new, mesh)
    # 7 full shards drop their deals; the last shard fits its first 2
    assert int(n_s) == 2
    assert int(ms2.total_alive()) == CAP


@needs8
def test_grow_sharded_preserves_blocks():
    mesh = make_mesh(S)
    m, adam = _random_map(200, seed=6)
    ms, as_ = shard_map_state(m, adam, mesh)
    ms = ms._replace(n_alive=shard_counts(ms.n_alive, S, CAP))
    rows_before = _alive_rows(ms, as_)
    m2, a2 = grow_capacity_sharded(ms, as_, CAP * 2, S)
    assert m2.capacity == CAP * 2
    assert int(m2.total_alive()) == 200
    np.testing.assert_array_equal(_alive_rows(m2, a2), rows_before)
    # padding rows carry padding semantics (invisible opacity)
    alive = np.asarray(m2.alive_mask())
    assert np.asarray(m2.opacity)[~alive].max() <= -10.0

"""Gaussian map state: Adam parity vs torch, append/prune, densify, PLY IO."""
import jax
import jax.numpy as jnp
import numpy as np

from mm3dgs_slam_tpu.models import gaussians as G
from mm3dgs_slam_tpu.models.densify import densify
from mm3dgs_slam_tpu.models.ply_io import load_ply, save_ply


def small_map(n=10, cap=32, seed=0):
    rng = np.random.default_rng(seed)
    m = G.empty_map(cap)
    idx = jnp.arange(n)
    m = m._replace(
        xyz=m.xyz.at[idx].set(rng.normal(size=(n, 3)).astype(np.float32)),
        features_dc=m.features_dc.at[idx].set(
            rng.normal(size=(n, 1, 3)).astype(np.float32)),
        scaling=m.scaling.at[idx].set(
            rng.uniform(-3, -1, size=(n, 3)).astype(np.float32)),
        rotation=m.rotation.at[idx].set(
            rng.normal(size=(n, 4)).astype(np.float32)),
        opacity=m.opacity.at[idx].set(
            rng.normal(size=(n, 1)).astype(np.float32)),
        rgb=m.rgb.at[idx].set(rng.uniform(size=(n, 3)).astype(np.float32)),
        n_alive=jnp.asarray(n, jnp.int32),
    )
    return m


HYPER = G.MapOptHyper(
    lr_xyz=1e-2, lr_features_dc=2.5e-3, lr_features_rest=1.25e-4,
    lr_scaling=1e-3, lr_rotation=1e-3, lr_opacity=5e-2, lr_rgb=2.5e-3,
)


def test_adam_matches_torch():
    import torch

    m = small_map()
    adam = G.init_adam(m)
    rng = np.random.default_rng(1)
    g_np = rng.normal(size=(32, 3)).astype(np.float32)

    p_t = torch.tensor(np.asarray(m.xyz), requires_grad=True)
    opt = torch.optim.Adam([{"params": [p_t], "lr": HYPER.lr_xyz}], eps=1e-15)

    m_j, adam_j = m, adam
    for step in range(5):
        grads = G.zeros_like_map(m)._replace(xyz=jnp.asarray(g_np * (step + 1)))
        m_j, adam_j = G.adam_update(m_j, grads, adam_j, HYPER)
        p_t.grad = torch.tensor(g_np * (step + 1))
        opt.step()
    assert np.allclose(np.asarray(m_j.xyz), p_t.detach().numpy(), atol=1e-6)


def test_append_zeroes_moments_and_keeps_step():
    m = small_map()
    adam = G.init_adam(m)
    grads = G.zeros_like_map(m)._replace(xyz=jnp.ones_like(m.xyz))
    m, adam = G.adam_update(m, grads, adam, HYPER)
    assert int(adam.step) == 1

    new = G.NewGaussians(
        xyz=jnp.ones((4, 3)), features_dc=jnp.zeros((4, 1, 3)),
        features_rest=jnp.zeros((4, 1, 3)), scaling=jnp.zeros((4, 3)),
        rotation=jnp.tile(jnp.array([1.0, 0, 0, 0]), (4, 1)),
        opacity=jnp.zeros((4, 1)), rgb=jnp.zeros((4, 3)),
        mask=jnp.array([True, False, True, True]),
    )
    m2, adam2, n_added = G.append_gaussians(m, adam, new)
    assert int(n_added) == 3
    assert int(m2.n_alive) == 13
    assert int(adam2.step) == 1  # step persists (torch state surgery)
    # new rows have zero moments
    assert np.allclose(np.asarray(adam2.mu.xyz[10:13]), 0.0)
    # old rows keep theirs
    assert np.abs(np.asarray(adam2.mu.xyz[:10])).max() > 0


def test_prune_compacts_stably():
    m = small_map()
    adam = G.init_adam(m)
    keep = jnp.arange(32) % 2 == 0  # keep even rows among alive
    xyz_before = np.asarray(m.xyz)
    m2, adam2, order = G.prune_compact(m, adam, keep)
    assert int(m2.n_alive) == 5
    expected = xyz_before[[0, 2, 4, 6, 8]]
    assert np.allclose(np.asarray(m2.xyz[:5]), expected)


def test_append_overflow_drops():
    m = small_map(n=30, cap=32)
    adam = G.init_adam(m)
    new = G.NewGaussians(
        xyz=jnp.ones((8, 3)), features_dc=jnp.zeros((8, 1, 3)),
        features_rest=jnp.zeros((8, 1, 3)), scaling=jnp.zeros((8, 3)),
        rotation=jnp.tile(jnp.array([1.0, 0, 0, 0]), (8, 1)),
        opacity=jnp.zeros((8, 1)), rgb=jnp.zeros((8, 3)),
        mask=jnp.ones(8, bool),
    )
    m2, _, n_added = G.append_gaussians(m, adam, new)
    assert int(n_added) == 2
    assert int(m2.n_alive) == 32


def test_grow_capacity_preserves():
    m = small_map()
    adam = G.init_adam(m)
    m2, adam2 = G.grow_capacity(m, adam, 64)
    assert m2.capacity == 64
    assert np.allclose(np.asarray(m2.xyz[:10]), np.asarray(m.xyz[:10]))
    assert int(m2.n_alive) == 10


def test_densify_clone_split():
    m = small_map()
    adam = G.init_adam(m)
    grad_accum = jnp.zeros(32).at[:10].set(1.0)  # all alive rows high-grad
    denom = jnp.ones(32)
    extent = jnp.asarray(1.0)
    m2, adam2, n_added = densify(
        m, adam, grad_accum, denom, max_grad=0.5, extent=extent,
        percent_dense=0.1, key=jax.random.PRNGKey(0),
    )
    # scales exp(-3..-1) in [0.05, 0.37]; threshold 0.1*1.0: some clone, some split
    assert int(n_added) > 0
    assert int(m2.n_alive) == 10 + int(n_added) - int(
        jnp.sum((jnp.max(jnp.exp(m.scaling[:10]), axis=1) > 0.1))
    )


def test_ply_roundtrip(tmp_path):
    m = small_map()
    d = G.to_numpy_dict(m)
    path = str(tmp_path / "pc.ply")
    save_ply(path, d["xyz"], d["features_dc"], d["features_rest"][:, :0],
             d["opacity"], d["scaling"], d["rotation"], d["rgb"])
    back = load_ply(path)
    assert np.allclose(back["xyz"], d["xyz"], atol=1e-6)
    assert np.allclose(back["features_dc"], d["features_dc"], atol=1e-6)
    assert np.allclose(back["rotation"], d["rotation"], atol=1e-6)
    assert np.allclose(back["rgb"], d["rgb"], atol=1e-6)
    assert back["features_rest"].shape == (10, 0, 3)


def test_prune_mask_reference_criteria():
    m = small_map()
    # row 0: tiny opacity -> pruned; row 1: huge scale -> pruned
    m = m._replace(
        opacity=m.opacity.at[0].set(-10.0),
        scaling=m.scaling.at[1].set(jnp.log(jnp.asarray([5.0, 5.0, 5.0]))),
    )
    max_radii = jnp.zeros(32).at[2].set(500.0)
    # extent 10 -> world-size threshold 1.0, above every sampled scale
    pm = G.prune_mask_reference(m, jnp.asarray(10.0), 0.005, max_radii, 100.0)
    pm = np.asarray(pm)
    assert pm[0] and pm[1] and pm[2]
    assert not pm[3]
    assert not pm[15:].any()  # dead rows never "pruned"


def test_reset_opacity():
    m = small_map()
    adam = G.init_adam(m)
    grads = G.zeros_like_map(m)._replace(opacity=jnp.ones_like(m.opacity))
    m, adam = G.adam_update(m, grads, adam, HYPER)
    m2, adam2 = G.reset_opacity(m, adam)
    import jax

    op = jax.nn.sigmoid(m2.opacity[:10, 0])
    assert float(op.max()) <= 0.01 + 1e-6
    assert np.allclose(np.asarray(adam2.mu.opacity), 0.0)
    # dead rows untouched
    assert np.allclose(np.asarray(m2.opacity[10:]), np.asarray(m.opacity[10:]))

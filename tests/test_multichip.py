"""Gaussian-map sharding over an 8-device (virtual CPU) mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mm3dgs_slam_tpu.models import gaussians as G
from mm3dgs_slam_tpu.ops.render import RenderSettings
from mm3dgs_slam_tpu.parallel.mesh import make_mesh
from mm3dgs_slam_tpu.parallel.sharded import (
    make_sharded_train_step,
    shard_map_state,
)

from utils import random_scene, small_camera


def _map_from_scene(g, cap):
    n = g.xyz.shape[0]
    m = G.empty_map(cap)
    idx = jnp.arange(n)
    import jax.numpy as jnp2

    return m._replace(
        xyz=m.xyz.at[idx].set(g.xyz),
        features_dc=m.features_dc.at[idx].set(
            jnp2.swapaxes(g.shs[:, :1, :], 1, 1)
        ),
        scaling=m.scaling.at[idx].set(jnp2.log(g.scales)),
        rotation=m.rotation.at[idx].set(g.rotations),
        opacity=m.opacity.at[idx].set(
            jnp2.log(g.opacity / (1 - g.opacity))[:, None]
        ),
        n_alive=jnp2.asarray(n, jnp2.int32),
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_train_step_matches_single_device():
    cam = small_camera(h=32, w=32, f=40.0)
    scene = random_scene(jax.random.PRNGKey(0), 100, cam)
    cap = 256  # multiple of 8
    m = _map_from_scene(scene, cap)
    adam = G.init_adam(m)
    rs = RenderSettings(cam=cam, pair_cap=1 << 13, max_per_tile=256, chunk=16,
                        max_tiles_per_gaussian=64)
    hyper = G.MapOptHyper(
        lr_xyz=1e-3, lr_features_dc=2.5e-3, lr_features_rest=1.25e-4,
        lr_scaling=1e-3, lr_rotation=1e-3, lr_opacity=5e-2, lr_rgb=2.5e-3,
    )
    pose = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)
    gt = jax.random.uniform(jax.random.PRNGKey(1), (3, 32, 32))

    # 8-device sharded step
    mesh8 = make_mesh(8)
    m8, adam8 = shard_map_state(m, adam, mesh8)
    step8 = make_sharded_train_step(rs, hyper, mesh8)
    m8_out, adam8_out, loss8 = step8(m8, adam8, pose, gt)

    # single-device reference
    mesh1 = make_mesh(1)
    m1, adam1 = shard_map_state(m, adam, mesh1)
    step1 = make_sharded_train_step(rs, hyper, mesh1)
    m1_out, _, loss1 = step1(m1, adam1, pose, gt)

    assert np.allclose(float(loss8), float(loss1), atol=1e-6)
    for f in G._PARAM_FIELDS:
        a = np.asarray(getattr(m8_out, f))
        b = np.asarray(getattr(m1_out, f))
        assert np.allclose(a, b, atol=1e-5), f

    # verify leaves really are sharded across 8 devices
    shard_devs = {s.device for s in m8_out.xyz.addressable_shards}
    assert len(shard_devs) == 8

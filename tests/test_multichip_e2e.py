"""Multichip SLAM e2e: the full pipeline with the Gaussian map row-sharded
over an 8-virtual-device CPU mesh (tpu.mesh_devices=8) must produce the same
trajectory/quality metrics as the single-device run (SURVEY §7 step 9 /
parallel/sharded.py design: shard-local projection + Adam, replicated
compositing, XLA-inserted collectives at the projection boundary).
"""
import os

import numpy as np
import pytest

from tests.test_e2e import make_cfg


def run_slam(tmp_path, mesh_devices, sub):
    from mm3dgs_slam_tpu.slam.slam import SLAM

    cfg = make_cfg(tmp_path)
    cfg["outputdir"] = str(tmp_path / sub)
    cfg["tpu"]["mesh_devices"] = mesh_devices
    slam = SLAM(cfg)
    if mesh_devices > 1:
        assert slam.mesh is not None
        # the map is actually placed across the mesh
        assert len({s.device for s in slam.gaussians.xyz.addressable_shards}) == mesh_devices
    slam.run()
    return np.load(os.path.join(cfg["outputdir"], "results.npz"),
                   allow_pickle=True)


@pytest.mark.slow
def test_sharded_slam_matches_single_device(tmp_path, baseline_slam):
    import jax

    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    # mesh-1 reference = the session-shared baseline run (same make_cfg
    # values; only outputdir differs, which the metrics don't see)
    r1 = np.load(os.path.join(baseline_slam["outputdir"], "results.npz"),
                 allow_pickle=True)
    r8 = run_slam(tmp_path, 8, "mesh8")

    ate1, ate8 = float(r1["ate_rmse"]), float(r8["ate_rmse"])
    print("ATE mesh1:", ate1, "mesh8:", ate8)
    assert np.isfinite(ate8)
    assert ate8 < 0.03
    assert abs(ate8 - ate1) < 5e-3

    p1 = float(np.mean(r1["psnr_list"]))
    p8 = float(np.mean(r8["psnr_list"]))
    print("PSNR mesh1:", p1, "mesh8:", p8)
    assert p8 > 17.0
    assert abs(p8 - p1) < 1.0

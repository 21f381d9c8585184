"""Golden full-budget regression run (BASELINE.md) — env-gated, slow.

Run with `MM3DGS_GOLDEN=1 python -m pytest tests/test_golden.py -x -q`.
On the real TPU this takes ~30 min warm (32 frames x 250 iters at 640x480,
~306k gaussians); on CPU it is impractically slow, so the gate keeps it out
of the default suite. Thresholds are loose floors under the committed
numbers (ATE 0.005289 m, PSNR 32.51 — BASELINE.md golden table).
"""
import os

import numpy as np
import pytest


def _backend_is_tpu() -> bool:
    # Evaluated lazily at collection time (conftest may have forced CPU):
    # the golden gate requires BOTH the env opt-in AND real TPU hardware —
    # otherwise `MM3DGS_GOLDEN=1 pytest tests/ -x -q` (or -k golden) would
    # run the hours-long full budget at CPU speed under the CPU suite's
    # precision=highest override, diverging from the production CLI this
    # test regression-locks.
    import jax

    return jax.default_backend() == "tpu"


pytestmark = pytest.mark.skipif(
    os.environ.get("MM3DGS_GOLDEN") != "1" or not _backend_is_tpu(),
    reason="golden run needs MM3DGS_GOLDEN=1 AND a real TPU backend "
           "(conftest forces CPU unless the invocation targets test_golden)",
)


def test_golden_full_budget(tmp_path):

    from mm3dgs_slam_tpu.config import load_config
    from mm3dgs_slam_tpu.slam.slam import SLAM

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "configs", "synthetic_tum.yml"))
    cfg["outputdir"] = str(tmp_path / "golden")
    slam = SLAM(cfg)
    slam.run()

    r = np.load(os.path.join(cfg["outputdir"], "results.npz"),
                allow_pickle=True)
    ate = float(r["ate_rmse"])
    psnr = float(np.mean(r["psnr_list"]))
    assert ate < 0.01, f"golden ATE regressed: {ate}"
    assert psnr > 30.0, f"golden PSNR regressed: {psnr}"


def test_golden_hard(tmp_path):
    """Harder golden scene (texture + occlusion crossings + photometric
    noise, configs/synthetic_hard.yml) at the same full budgets — stresses
    NIQE keyframing, covisibility, silhouette masks and pruning beyond the
    smooth surfel scene. Thresholds are loose floors under the committed
    round-3 numbers (BASELINE.md golden table, hard-scene row)."""
    import numpy as np

    from mm3dgs_slam_tpu.config import load_config
    from mm3dgs_slam_tpu.slam.slam import SLAM

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "configs", "synthetic_hard.yml"))
    cfg["outputdir"] = str(tmp_path / "golden_hard")
    slam = SLAM(cfg)
    slam.run()

    r = np.load(os.path.join(cfg["outputdir"], "results.npz"),
                allow_pickle=True)
    ate = float(r["ate_rmse"])
    psnr = float(np.mean(r["psnr_list"]))
    assert ate < 0.02, f"hard golden ATE regressed: {ate}"
    # the noise floor alone caps PSNR ~40 at sigma 0.01; the map cannot
    # exceed it and should not fall far below the committed number
    assert psnr > 26.0, f"hard golden PSNR regressed: {psnr}"

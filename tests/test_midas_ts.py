"""MiDaS TorchScript staging-path test (no pretrained weights needed).

The production monocular path loads a TorchScript bundle via MM3DGS_MIDAS_TS
(eval/depth_est.py MiDaS.__init__; the reference loads DPT_Hybrid from
torch.hub, utils/depth_utils.py:102-131). Real DPT weights cannot be staged
in this zero-egress environment, so this test exports a TINY random-weight
TorchScript model with DPT_Hybrid's exact I/O contract — input
[N, 3, 384, 512] normalized to [-1, 1], output [N, 384, 512] inverse/affine
depth — and drives the full consumer chain through it:

  * MiDaS wrapper resize -> model -> resize-back (estimate_depth),
  * a 3-frame monocular SLAM run (depth_fit LS anchoring + per-frame
    scale/shift fits + Pearson losses), the config path the reference's
    TUM.yml:8 use_gt_depth:false exercises.

After this, the only untested link to real DPT is the weight download
itself (scripts/export_midas_weights.py documents that step).
"""
import os

import numpy as np
import pytest

from tests.test_e2e import make_cfg


def _export_tiny_ts(path: str):
    """A tiny conv net with DPT_Hybrid's I/O contract, TorchScript-traced."""
    import torch

    class TinyMidas(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = torch.nn.Conv2d(3, 8, 3, padding=1)
            self.conv2 = torch.nn.Conv2d(8, 1, 3, padding=1)

        def forward(self, x):  # [N, 3, 384, 512] -> [N, 384, 512]
            h = torch.relu(self.conv1(x))
            return torch.nn.functional.softplus(self.conv2(h)).squeeze(1)

    torch.manual_seed(0)
    m = TinyMidas().eval()
    ex = torch.zeros(1, 3, 384, 512)
    ts = torch.jit.trace(m, ex)
    torch.jit.save(ts, path)


def test_midas_ts_wrapper_contract(tmp_path, monkeypatch):
    torch = pytest.importorskip("torch")
    del torch
    ts_path = str(tmp_path / "tiny_midas.pt")
    _export_tiny_ts(ts_path)
    monkeypatch.setenv("MM3DGS_MIDAS_TS", ts_path)

    from mm3dgs_slam_tpu.eval.depth_est import MiDaS, get_dpt

    dpt = get_dpt("midas")
    assert isinstance(dpt, MiDaS)
    img = np.random.default_rng(0).uniform(0, 1, (3, 60, 72)).astype(np.float32)
    inv = dpt.estimate_depth(img)
    assert inv.shape == (60, 72)
    assert inv.dtype == np.float32
    assert np.isfinite(inv).all() and (inv >= 0).all()  # softplus head
    # determinism (frozen weights, eval mode)
    np.testing.assert_array_equal(inv, dpt.estimate_depth(img))


@pytest.mark.slow
def test_slam_monocular_midas_ts(tmp_path, monkeypatch):
    """3 monocular frames end-to-end through the TorchScript staging path:
    SLAM.__init__ constructs the MiDaS wrapper, frame 0 anchors the scale
    with the LS depth_fit, later frames LS-fit against the rendered depth
    (slam/slam.py _fit_est_depth; ref SLAM.py:411-448)."""
    pytest.importorskip("torch")
    ts_path = str(tmp_path / "tiny_midas.pt")
    _export_tiny_ts(ts_path)
    monkeypatch.setenv("MM3DGS_MIDAS_TS", ts_path)

    from mm3dgs_slam_tpu.eval.depth_est import MiDaS
    from mm3dgs_slam_tpu.slam.slam import SLAM

    cfg = make_cfg(tmp_path, use_gt_depth=False, dpt_model="midas",
                   depth_fit="ls")
    cfg["synthetic"]["n_frames"] = 3
    # random-weight depth is garbage as SIGNAL: keep the Pearson losses off
    # (the pipeline under test is the staging/scale-fit plumbing)
    cfg["tracking"]["use_depth_estimate_loss"] = False
    cfg["mapping"]["use_depth_estimate_loss"] = False

    slam = SLAM(cfg)
    assert isinstance(slam.dpt, MiDaS)
    slam.run()

    results = np.load(os.path.join(cfg["outputdir"], "results.npz"),
                      allow_pickle=True)
    assert np.isfinite(float(results["ate_rmse"]))
    assert len(results["pose_est"]) == 3

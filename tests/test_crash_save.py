"""Always-save-on-crash (SURVEY §5): SLAM.run wraps the frame loop in
try/except/finally and saves map + results even when a frame fails
(slam.py run(); reference SLAM.py:494-502). A crash after frame k must
leave a loadable PLY and a results.npz whose pose arrays cover the frames
that completed."""
import glob
import os

import numpy as np

from tests.test_e2e import make_cfg


def test_crash_mid_run_saves_artifacts(tmp_path, capsys):
    from mm3dgs_slam_tpu.slam.slam import SLAM

    cfg = make_cfg(tmp_path)
    cfg["tracking"]["iters"] = 2
    cfg["mapping"]["iters"] = 2
    cfg["synthetic"]["n_frames"] = 4
    slam = SLAM(cfg)

    real_step = slam._step
    def exploding_step(idx):
        if idx == 2:
            raise RuntimeError("injected frame failure")
        return real_step(idx)
    slam._step = exploding_step

    slam.run()  # must NOT raise: the except path prints and saves

    out = capsys.readouterr().out
    assert "SLAM failed. Saving map and results." in out

    r = np.load(os.path.join(cfg["outputdir"], "results.npz"),
                allow_pickle=True)
    # 2 frames completed before the injected failure on idx==2
    assert r["pose_est"].shape == (2, 7)
    assert np.all(np.isfinite(r["pose_est"]))

    plys = glob.glob(os.path.join(
        cfg["outputdir"], "point_cloud", "iteration_*", "point_cloud.ply"))
    assert plys, "crash save must write the map PLY"
    from mm3dgs_slam_tpu.models.ply_io import load_ply
    d = load_ply(sorted(plys)[-1])
    assert d["xyz"].shape[0] > 0


def test_jax_profiler_trace_hook(tmp_path):
    """debug.jax_profiler_dir writes a TensorBoard-readable trace of the
    run (SURVEY §5's deep-profiling hook; off by default)."""
    from mm3dgs_slam_tpu.slam.slam import SLAM

    cfg = make_cfg(tmp_path)
    cfg["tracking"]["iters"] = 2
    cfg["mapping"]["iters"] = 2
    cfg["synthetic"]["n_frames"] = 2
    trace_dir = tmp_path / "trace"
    cfg["debug"]["jax_profiler_dir"] = str(trace_dir)
    SLAM(cfg).run()
    files = list(trace_dir.rglob("*"))
    assert any(f.is_file() for f in files), "no profiler trace written"

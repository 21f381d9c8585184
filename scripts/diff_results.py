#!/usr/bin/env python
"""Cross-system parity diff: compare two SLAM run outputs (this framework
vs the CUDA reference, or any two runs) metric by metric against the 1%
north-star thresholds (BASELINE.md; reference metrics defined at
/root/reference/slam/SLAM.py:294-373).

Both systems write the same artifact contract, so this script runs
unmodified on either's output directory:
  <dir>/results.npz           pose_est [N,7] w2c, pose_gt [N,7], ate_rmse,
                              psnr_list/ssim_list/lpips_list
  <dir>/point_cloud/iteration_<k>/point_cloud.ply   (optional, map diff)

Usage:
  python scripts/diff_results.py RUN_A_DIR RUN_B_DIR [--rel-tol 0.01] \
      [--ate-abs-floor 0.002]

Checks (PASS/FAIL each, exit code 1 on any FAIL):
  * headline metrics (ate_rmse, mean psnr/ssim/lpips) agree within
    --rel-tol relative (ATE additionally passes when |a-b| is under
    --ate-abs-floor meters: two sub-millimeter-accuracy runs should not
    fail on a 1% relative test of a near-zero number),
  * trajectory cross-ATE: B's estimated trajectory Umeyama-aligned onto
    A's must sit within max(rel_tol * traj_extent, ate_abs_floor),
  * PLY maps (when both exist): gaussian counts within rel_tol, and
    summary statistics (mean/std of opacity, scale norms, position
    extents) within 5 * rel_tol (optimizer-order noise makes per-gaussian
    diffs meaningless across frameworks; distributional agreement is the
    testable claim).

NaN handling: a metric that is NaN on BOTH sides is reported SKIP (e.g.
LPIPS without pretrained weights); NaN on one side only is FAIL.
"""
from __future__ import annotations

import argparse
import glob
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# offline numpy tool — keep the quaternion helpers (jnp) off any
# accelerator; must run before the first jax backend init
try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass


def _load_results(d):
    p = os.path.join(d, "results.npz")
    if not os.path.exists(p):
        raise SystemExit(f"missing {p}")
    return np.load(p, allow_pickle=True)


def _latest_ply(d):
    cands = sorted(
        glob.glob(os.path.join(d, "point_cloud", "iteration_*",
                               "point_cloud.ply")),
        key=lambda s: int(s.split("iteration_")[1].split(os.sep)[0]),
    )
    return cands[-1] if cands else None


def _mean_list(res, key):
    if key not in res:
        return float("nan")
    v = np.asarray(res[key], dtype=np.float64).ravel()
    v = v[np.isfinite(v)]
    return float(v.mean()) if v.size else float("nan")


class Report:
    def __init__(self):
        self.failed = False

    def check(self, name, a, b, rel_tol, abs_floor=0.0):
        both_nan = np.isnan(a) and np.isnan(b)
        if both_nan:
            print(f"  SKIP {name}: NaN on both sides")
            return
        if np.isnan(a) != np.isnan(b):
            print(f"  FAIL {name}: {a} vs {b} (NaN on one side only)")
            self.failed = True
            return
        denom = max(abs(a), abs(b), 1e-12)
        rel = abs(a - b) / denom
        ok = rel <= rel_tol or abs(a - b) <= abs_floor
        tag = "ok  " if ok else "FAIL"
        print(f"  {tag} {name}: {a:.6g} vs {b:.6g} "
              f"(rel {rel * 100:.3f}%, tol {rel_tol * 100:.2f}%)")
        self.failed |= not ok


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_a")
    ap.add_argument("run_b")
    ap.add_argument("--rel-tol", type=float, default=0.01,
                    help="relative tolerance for headline metrics (1%%)")
    ap.add_argument("--ate-abs-floor", type=float, default=0.002,
                    help="absolute ATE agreement floor in meters")
    args = ap.parse_args()

    from mm3dgs_slam_tpu.eval.ate import camera_centers, evaluate_ate_rmse

    ra, rb = _load_results(args.run_a), _load_results(args.run_b)
    rep = Report()

    print(f"[headline metrics]  A={args.run_a}  B={args.run_b}")
    rep.check("ate_rmse (w2c, umeyama)",
              float(ra.get("ate_rmse", np.nan)),
              float(rb.get("ate_rmse", np.nan)),
              args.rel_tol, args.ate_abs_floor)
    for key in ("psnr_list", "ssim_list", "lpips_list"):
        rep.check(f"mean {key[:-5]}", _mean_list(ra, key),
                  _mean_list(rb, key), args.rel_tol)

    print("[trajectory cross-ATE]")
    pa, pb = np.asarray(ra["pose_est"]), np.asarray(rb["pose_est"])
    if pa.shape != pb.shape:
        print(f"  FAIL pose_est shapes differ: {pa.shape} vs {pb.shape}")
        rep.failed = True
    else:
        _, cross = evaluate_ate_rmse(pb, pa, method="umeyama")
        ca = camera_centers(pa)
        extent = float(np.linalg.norm(ca.max(0) - ca.min(0)))
        thr = max(args.rel_tol * extent, args.ate_abs_floor)
        tag = "ok  " if cross <= thr else "FAIL"
        print(f"  {tag} cross-ATE(B->A): {cross:.6f} m "
              f"(threshold {thr:.6f}, traj extent {extent:.3f} m)")
        rep.failed |= cross > thr

    ply_a, ply_b = _latest_ply(args.run_a), _latest_ply(args.run_b)
    if ply_a and ply_b:
        print("[map PLY]")
        from mm3dgs_slam_tpu.models.ply_io import load_ply

        ma, mb = load_ply(ply_a), load_ply(ply_b)
        xa, xb = np.asarray(ma["xyz"]), np.asarray(mb["xyz"])
        rep.check("gaussian count", float(len(xa)), float(len(xb)),
                  args.rel_tol)
        for name, va, vb in (
            ("opacity mean", np.asarray(ma["opacity"]).mean(),
             np.asarray(mb["opacity"]).mean()),
            ("scale mean", np.asarray(ma["scaling"]).mean(),
             np.asarray(mb["scaling"]).mean()),
            ("xyz extent", np.linalg.norm(xa.max(0) - xa.min(0)),
             np.linalg.norm(xb.max(0) - xb.min(0))),
        ):
            rep.check(name, float(va), float(vb), 5 * args.rel_tol)
    else:
        print("[map PLY] skipped "
              f"(A: {ply_a or 'none'}, B: {ply_b or 'none'})")

    print("PARITY:", "FAIL" if rep.failed else "PASS")
    sys.exit(1 if rep.failed else 0)


if __name__ == "__main__":
    main()

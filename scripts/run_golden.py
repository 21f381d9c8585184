#!/usr/bin/env python
"""Golden full-budget runner (BASELINE.md) with optional per-frame wall
decomposition — the round-5 instrument for the non-iteration seconds.

Usage:
  python scripts/run_golden.py [--config configs/synthetic_tum.yml]
                               [--outdir output/golden_r5] [--decomp]

Prints the per-frame stats the golden table tracks and, with --decomp, the
phase table (debug.frame_decomp; phases end at host fetches so attribution
is truthful through the async queue — see slam/slam.py).
"""
import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/synthetic_tum.yml")
    ap.add_argument("--outdir", default=None)
    ap.add_argument("--decomp", action="store_true")
    ap.add_argument("--frames", type=int, default=None,
                    help="override synthetic n_frames (short profiling runs)")
    args = ap.parse_args()

    from mm3dgs_slam_tpu.config import load_config
    from mm3dgs_slam_tpu.slam.slam import SLAM

    cfg = load_config(args.config)
    if args.outdir:
        cfg["outputdir"] = args.outdir
    if args.decomp:
        cfg["debug"]["frame_decomp"] = True
    if args.frames is not None:
        cfg["synthetic"]["n_frames"] = args.frames
    os.makedirs(cfg["outputdir"], exist_ok=True)
    SLAM(cfg).run()


if __name__ == "__main__":
    main()

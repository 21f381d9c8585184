#!/usr/bin/env python
"""CLI entry: run SLAM from a YAML config (reference surface: slam_top.py).

Usage: python slam_top.py --config configs/TUM.yml
"""
import argparse
import random

import numpy as np


def seed_everything(seed: int = 0):
    """Deterministic runs (reference slam_top.py:13-27). JAX randomness is
    key-based and host RNGs drive keyframe scheduling, so seeding numpy +
    python random reproduces a run exactly."""
    random.seed(seed)
    np.random.seed(seed)


def main():
    parser = argparse.ArgumentParser(description="TPU-native MM3DGS-SLAM")
    parser.add_argument("--config", type=str, required=True, help="Path to config file")
    args = parser.parse_args()

    seed_everything()
    print("Running with config:", args.config)

    from mm3dgs_slam_tpu.config import apply_tpu_env, load_config

    cfg = load_config(args.config)
    # export cfg.tpu kernel knobs BEFORE the kernel modules import (their
    # module constants are traced into every compiled program) — the YAML
    # file fully determines the run
    apply_tpu_env(cfg)

    from mm3dgs_slam_tpu.slam.slam import SLAM

    SLAM(cfg).run()


if __name__ == "__main__":
    main()

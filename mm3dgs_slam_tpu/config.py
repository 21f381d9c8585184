"""Config loading: same YAML schema as the reference (configs/TUM.yml,
configs/UTMM.yml), loaded into a plain nested dict (configs/config.py:4-18)
plus validation of the required keys and defaulting of the optional ones, so
downstream code can index `cfg["..."]` without probing.
"""
from __future__ import annotations

import copy
from typing import Any

import yaml

# Required top-level keys (union of TUM.yml:1-91 / UTMM.yml:1-88).
_REQUIRED_TOP = [
    "dataset", "method", "scene", "outputdir", "use_gt_depth",
    "white_background", "scene_radius_depth_ratio", "start_idx", "stride",
    "desired_height", "desired_width", "eval_every",
    "debug", "pipeline", "tracking", "mapping", "cam",
]

_DEFAULTS: dict[str, Any] = {
    "device": "tpu",
    "dataloader": "gradslam",
    "dpt_model": "midas",
    "inputdir": None,
    "save_iterations": [],
    # TPU-specific rasterizer/runtime knobs (absent from the reference; all
    # have conservative defaults and can be set in YAML under `tpu:`).
    "tpu": {
        "pair_cap": 1 << 21,
        "max_per_tile": 2048,
        "chunk": 32,
        "max_tiles_per_gaussian": 64,
        "bin_d1": 8,                   # binning small-tier slots/gaussian
        "bin_big_frac": 8,             # binning big-tier capacity divisor
        "bin_d2_live": 0,              # post-cull big-tier width cap
                                       # (0 = full max_tiles_per_gaussian)
        "max_new_per_frame": -1,       # -1 = one candidate per pixel
        "imu_pad": 64,                 # static IMU sample capacity per frame
        "use_pallas": "auto",          # auto | never | always
        "grad_bf16": False,            # bfloat16 per-pair backward grads
                                       # (f32 accumulation; a memory-
                                       # bandwidth knob — no measured speed
                                       # win at 131k gaussians, so exact f32
                                       # is the default)
        "rebin_every": 1,              # tracking binning refresh cadence
        "map_rebin_every": 1,          # mapping binning refresh cadence
        "group_mapping_schedule": False,  # contiguous per-keyframe blocks
        "mesh_devices": 1,             # gaussian-shard mesh size (1 = off)
    },
}

_BLOCK_DEFAULTS: dict[str, dict[str, Any]] = {
    "debug": {"get_runtime_stats": False, "create_video": False,
              "save_keyframes": False},
    "pipeline": {"convert_SHs_python": False, "compute_cov3D_python": False,
                 "transform_means_python": True, "force_isotropic": False,
                 "use_rgb": False},
    "tracking": {"use_imu_loss": False, "imu_T_weight": 0.0,
                 "imu_q_weight": 0.0, "use_depth_estimate_loss": False,
                 "pearson_weight": 0.0, "dynamics_model": None,
                 "use_gt_pose": False},
    "mapping": {"do_BA": False, "use_depth_estimate_loss": False,
                "pearson_weight": 0.0, "niqe_kf": False,
                "niqe_window_size": 5, "size_threshold": None},
}


def load_config(path: str) -> dict:
    """Load a YAML config with validation + defaults."""
    with open(path, "r") as f:
        cfg = yaml.safe_load(f)
    return normalize_config(cfg)


def normalize_config(cfg: dict) -> dict:
    cfg = copy.deepcopy(cfg)
    missing = [k for k in _REQUIRED_TOP if k not in cfg]
    if missing:
        raise ValueError(f"config missing required keys: {missing}")
    for k, v in _DEFAULTS.items():
        if k not in cfg or cfg[k] is None:
            cfg[k] = copy.deepcopy(v)
        elif isinstance(v, dict):
            merged = copy.deepcopy(v)
            merged.update(cfg[k])
            cfg[k] = merged
    for blk, defaults in _BLOCK_DEFAULTS.items():
        for k, v in defaults.items():
            cfg[blk].setdefault(k, v)
    if cfg["save_iterations"] is None:
        cfg["save_iterations"] = []
    return cfg

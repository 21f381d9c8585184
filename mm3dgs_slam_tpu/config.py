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
    # How monocular depth estimates are scaled to metric on frame 0
    # (SLAM.py:411-448): "ls" = closed-form LS fit against GT depth (the
    # reference's UTMM branch), "tum_heuristic" = the fixed
    # png_depth_scale/10 magnitude heuristic tuned for MiDaS on TUM.
    # None resolves from the dataset name for the reference's own datasets
    # (utmm/synthetic -> ls, tum -> tum_heuristic) and FAILS LOUDLY for any
    # other dataset running monocular — set it explicitly there.
    "depth_fit": None,
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
        "check_overflow": True,        # host-check binning caps per frame
                                       # (one cheap fetch; warns + counts
                                       # breaches — slam.py run loop)
        "prefetch": True,              # decode frame i+1 on a background
                                       # thread while frame i's dispatches
                                       # run (SURVEY §7 step 7; the
                                       # reference loads synchronously,
                                       # SLAM.py:384)
        # Kernel-module constants, exported to the MM3DGS_* environment by
        # apply_tpu_env() BEFORE the kernel modules import (they are traced
        # into compiled programs, so they cannot vary per-call). A YAML file
        # fully determines a run; an explicitly-set env var still wins as
        # the A/B-measurement escape hatch.
        "tile": 16,                    # MM3DGS_TILE: tile edge in pixels
        "pl_chunk": 128,               # MM3DGS_PL_CHUNK: pairs per chunk
        "pl_unroll": 2,                # MM3DGS_PL_UNROLL: chunks per trip
        "pl_precision": "mixed",       # MM3DGS_PL_PRECISION:
                                       #   highest|mixed|default (PROFILE.md)
        "pl_fwd_split": "v3",          # MM3DGS_PL_FWD_SPLIT: v0..v3
        "pl_early_exit": False,        # MM3DGS_PL_EARLY_EXIT: saturation
                                       # early-exit; the per-trip check
                                       # measured NET-SLOWER on dense maps
                                       # (17.81 vs 18.56 ms/iter) — enable
                                       # for heavy-overdraw scenes
        "map_tiles": True,             # tile-layout mapping loss: nc=3/4
                                       # channel-slim walk + rgb-only
                                       # assembly for SSIM (the mapping
                                       # analogue of track_tiles); a
                                       # MapOptSettings field —
                                       # MM3DGS_MAP_TILES overrides
        "track_tiles": True,           # tile-layout tracking loss (1.1
                                       # ms/iter faster than image assembly
                                       # on v5e); a TrackSettings field —
                                       # MM3DGS_TRACK_TILES overrides
        "pose_kernel": True,           # fused in-kernel pose gradients for
                                       # tracking (no per-pair emission /
                                       # slot-table reduce); auto-gated to
                                       # transform_means_python + sh_degree
                                       # 0 + single-device pallas tracking;
                                       # a TrackSettings field —
                                       # MM3DGS_POSE_KERNEL overrides
    },
}

# cfg["tpu"] key -> (env var, to-env-string, module attr to cross-check)
_TPU_ENV_KNOBS: dict[str, tuple[str, Any, tuple[str, str] | None]] = {
    "tile": ("MM3DGS_TILE", str, ("mm3dgs_slam_tpu.ops.camera", "TILE")),
    "pl_chunk": ("MM3DGS_PL_CHUNK", str,
                 ("mm3dgs_slam_tpu.ops.pallas_composite", "CHUNK")),
    "pl_unroll": ("MM3DGS_PL_UNROLL", str,
                  ("mm3dgs_slam_tpu.ops.pallas_composite", "UNROLL")),
    "pl_precision": ("MM3DGS_PL_PRECISION", str,
                     ("mm3dgs_slam_tpu.ops.pallas_composite", "_PREC_MODE")),
    "pl_fwd_split": ("MM3DGS_PL_FWD_SPLIT", str,
                     ("mm3dgs_slam_tpu.ops.pallas_composite", "_FWD_SPLIT")),
    "pl_early_exit": ("MM3DGS_PL_EARLY_EXIT", lambda b: "1" if b else "0",
                      ("mm3dgs_slam_tpu.ops.pallas_composite", "EARLY_EXIT")),
    # tpu.track_tiles / tpu.pose_kernel are NOT env-exported: they are
    # TrackSettings fields resolved in SLAM.__init__ (env var overrides cfg
    # there; the import-time env default only seeds directly-constructed
    # TrackSettings in probes/tests — slam/tracker.py).
}


def apply_tpu_env(cfg: dict) -> None:
    """Export cfg['tpu'] kernel knobs to the MM3DGS_* environment.

    The Pallas kernel modules read these at import (module constants traced
    into every compiled program), so SLAM.__init__ calls this before any
    lazy kernel import. If a kernel module is ALREADY imported with a
    conflicting value the config cannot take effect — that is an error, not
    a silent ignore. Env vars the user set explicitly take precedence over
    YAML (documented escape hatch for A/B probes)."""
    import os
    import sys

    tpu = cfg.get("tpu", {})
    for key, (env, to_str, check) in _TPU_ENV_KNOBS.items():
        if key not in tpu:
            continue
        want = to_str(tpu[key])
        if env in os.environ:
            continue  # explicit env wins
        if check is not None:
            mod = sys.modules.get(check[0])
            if mod is not None:
                have = getattr(mod, check[1])
                have_s = (("1" if have else "0") if isinstance(have, bool)
                          else str(have))
                if have_s != want:
                    raise RuntimeError(
                        f"tpu.{key}={tpu[key]!r} but {check[0]}.{check[1]} "
                        f"was already imported as {have!r}; set the config "
                        f"before importing kernel modules (slam_top.py "
                        f"does) or export {env} explicitly")
                continue  # already imported, consistent — nothing to do
        os.environ[env] = want

_BLOCK_DEFAULTS: dict[str, dict[str, Any]] = {
    "debug": {"get_runtime_stats": False, "create_video": False,
              "save_keyframes": False,
              # Directory for a jax.profiler trace of the whole run
              # (TensorBoard / xprof readable). None = off. The reference
              # has wall-clock counters only (SLAM.py:352-370); this is
              # the TPU-native deep-profiling hook (SURVEY §5).
              "jax_profiler_dir": None,
              # Per-frame wall decomposition (data/track/depth_fit/mapper
              # phases; printed at save_results + results.npz
              # ["frame_decomp"]). Adds host syncs at phase boundaries —
              # a diagnostic, not a production default.
              "frame_decomp": False},
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

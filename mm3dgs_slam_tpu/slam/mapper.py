"""Mapper: keyframe management, covisibility graph, Gaussian growth, and the
jitted map-optimization loop (TPU rebuild of slam/mapper.py:36-1014).

Host/device split (the TPU-first redesign of the reference's single-GPU
control flow):
  * keyframe bookkeeping — NIQE-window, covisibility BFS, schedules — is
    tiny host logic operating on scalars/sets,
  * keyframe images/poses live in a DEVICE-side ring store (uploaded once
    when a keyframe is added) so the 150-iteration optimization never
    re-uploads the window,
  * all heavy math (renders, losses, Adam, prune) is inside jitted
    static-shape functions; the window is a fixed-size gather so keyframe
    count never recompiles the hot loop.
"""
from __future__ import annotations

import time
from collections import defaultdict, deque
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..eval.quality import FrameQuality
from ..models import gaussians as G
from ..ops.render import RenderSettings
from .map_opt import MapCarry, MapOptSettings, optimize_map
from .map_ops import (
    covis_check_last_kf,
    covisibility_fraction,
    covisibility_fractions_batch,
    keyframe_world_points,
    kf_world_points,
    new_gaussian_candidates,
    render_depth_sil,
)

KF_STORE_QUANTUM = 64


@jax.jit
def _gather_window(colors, depths, ests, poses, rows_arr):
    """Fused window gather (+ the carry's pose-moment zeros): one dispatch
    instead of 6 eager ops per frame."""
    kp = poses[rows_arr]
    return (colors[rows_arr], depths[rows_arr], ests[rows_arr], kp,
            jnp.zeros_like(kp), jnp.zeros_like(kp))


@jax.jit
def _store_set_row(colors, depths, ests, poses, row, color, depth, est, pose):
    """Fused keyframe-store row write: ONE dispatch instead of ~6 eager ops
    (each eager op is a separate ~30 ms tunnel round trip — round-5 golden
    decomposition). Runs every frame for the current-frame scratch row."""
    return (colors.at[row].set(color), depths.at[row].set(depth),
            ests.at[row].set(est), poses.at[row].set(pose))


@dataclass
class KeyFrame:
    """Host-side keyframe record (images also live in the device store)."""

    idx: int
    gt_color: np.ndarray              # [3, H, W] float in [0, 1]
    pose: np.ndarray                  # [7]
    gt_depth: Optional[np.ndarray]    # [H, W]
    est_depth: Optional[np.ndarray]   # [H, W]
    niqe: Optional[float] = None


class KeyframeStore:
    """Device-resident keyframe tensors; row 0 is the current-frame scratch."""

    def __init__(self, cam_hw):
        self.h, self.w = cam_hw
        self.capacity = 0
        self.n = 1  # row 0 reserved for the current frame
        self.colors = None
        self.depths = None
        self.ests = None
        self.poses = None
        self._grow(KF_STORE_QUANTUM)

    def _grow(self, new_cap: int):
        h, w = self.h, self.w
        extra = new_cap - self.capacity

        def pad(x, shape):
            blk = jnp.zeros((extra,) + shape, jnp.float32)
            return blk if x is None else jnp.concatenate([x, blk], axis=0)

        self.colors = pad(self.colors, (3, h, w))
        self.depths = pad(self.depths, (h, w))
        self.ests = pad(self.ests, (h, w))
        self.poses = pad(self.poses, (7,))
        self.capacity = new_cap
        self._zeros_hw = jnp.zeros((h, w), jnp.float32)

    def set_row(self, row: int, color, depth, est, pose):
        if row >= self.capacity:
            self._grow(self.capacity + KF_STORE_QUANTUM)
        z = self._zeros_hw
        self.colors, self.depths, self.ests, self.poses = _store_set_row(
            self.colors, self.depths, self.ests, self.poses, np.int32(row),
            color, z if depth is None else depth, z if est is None else est,
            pose,
        )

    def append(self, color, depth, est, pose) -> int:
        row = self.n
        self.set_row(row, color, depth, est, pose)
        self.n += 1
        return row


class Mapper:
    def _env_else_cfg(self, env: str, key: str) -> bool:
        """Explicitly-set env var wins (the A/B escape hatch, same
        precedence as apply_tpu_env); otherwise cfg['tpu'] decides."""
        import os

        v = os.environ.get(env)
        return v == "1" if v is not None else bool(self.cfg["tpu"][key])

    def __init__(self, cfg: dict, rs: RenderSettings, mesh=None):
        self.cfg = cfg
        self.rs = rs
        self.mesh = mesh
        self.cam = rs.cam
        mp = cfg["mapping"]
        self.num_iter = mp["iters"]
        self.camera_extent = 0.0
        self.method = cfg["method"].lower()

        self.keyframes: List[KeyFrame] = []
        self.covisibility_graph = defaultdict(set)
        self.kf_store = KeyframeStore((self.cam.height, self.cam.width))

        self.quality = FrameQuality()
        if mp["niqe_kf"]:
            self.niqe_window: deque[KeyFrame] = deque(maxlen=mp["niqe_window_size"])

        self.rng = np.random.default_rng(cfg.get("seed", 0))
        self.mapping_time_sum = 0.0
        self.mapping_iter_count = 0
        # per-frame wall decomposition (debug.frame_decomp): SLAM.__init__
        # shares its dict + flag; phases end at host fetches so attribution
        # is truthful through the async dispatch queue
        self.decomp_on = False
        self.decomp = defaultdict(float)
        self.last_n_added = 0
        self._last_added_mask = None  # mesh path: exact appended-row mask

        # Persistent densification stats (gaussian_model.py:62-66): live
        # across frames, zeroed whenever new Gaussians are appended
        # (densification_postfix, gaussian_model.py:482-488).
        self.max_radii = jnp.zeros((0,), jnp.float32)
        self.grad_accum = jnp.zeros((0,), jnp.float32)
        self.denom = jnp.zeros((0,), jnp.float32)

        self.opt_settings = MapOptSettings(
            rs=rs,
            iters=self.num_iter,
            method=self.method,
            use_gt_depth=cfg["use_gt_depth"],
            use_depth_estimate_loss=mp["use_depth_estimate_loss"],
            pearson_weight=float(mp["pearson_weight"]),
            lambda_dssim=float(mp["lambda_dssim"]),
            min_opacity=float(mp["min_opacity"]),
            size_threshold=(
                float(mp["size_threshold"]) if mp["size_threshold"] is not None else None
            ),
            pruning_interval=int(mp["pruning_interval"]),
            densify_from_iter=int(mp["densify_from_iter"]),
            densify_until_iter=int(mp["densify_until_iter"]),
            do_BA=bool(mp["do_BA"]),
            cam_t_lr=float(mp["cam_t_lr"]),
            cam_q_lr=float(mp["cam_q_lr"]),
            hyper=G.MapOptHyper.from_cfg(mp),
            rebin_every=int(cfg["tpu"].get("map_rebin_every", 1)),
            mesh=mesh,
            map_tiles=self._env_else_cfg("MM3DGS_MAP_TILES", "map_tiles"),
        )
        self.window_size = int(mp["kf_window_size"])
        # Optional TPU-side divergence from the reference's interleaved
        # stack-sampling: give each window entry the same quota but as
        # CONTIGUOUS blocks, so cached tile bins survive across iterations.
        self.group_schedule = bool(cfg["tpu"].get("group_mapping_schedule", False))

    # ------------------------------------------------------------------
    # Keyframe decision logic (host; mirrors mapper.py:103-173)
    # ------------------------------------------------------------------
    def need_new_keyframe(self, idx, g_act, est_pose, gt_color_np, gt_depth_np,
                          est_depth_np, n_img) -> bool:
        mp = self.cfg["mapping"]
        if self.method == "splatam":
            return (
                idx == 0
                or (idx + 1) % mp["kf_every"] == 0
                or idx == n_img - 2
            )

        if mp["niqe_kf"]:
            _t0 = time.perf_counter()
            score = self.quality(gt_color_np)
            if self.decomp_on:
                self.decomp["map.niqe"] += time.perf_counter() - _t0
            curr = KeyFrame(idx, gt_color_np, np.asarray(est_pose), gt_depth_np,
                            est_depth_np, score)
            # evict frames that left the window (mapper.py:126-132)
            if idx >= mp["niqe_window_size"]:
                while (self.niqe_window
                       and self.niqe_window[0].idx <= idx - mp["niqe_window_size"]):
                    self.niqe_window.popleft()
            # monotonic min-deque (mapper.py:133-136)
            while self.niqe_window and score < self.niqe_window[-1].niqe:
                self.niqe_window.pop()
            self.niqe_window.append(curr)

        if len(self.keyframes) == 0 or idx == 0:
            return True

        # Covisibility with the last keyframe (mapper.py:141-167) — one
        # fused dispatch + one fetch (poses ride the call as numpy)
        last = self.keyframes[-1]
        frac = covis_check_last_kf(
            g_act, np.asarray(last.pose, np.float32),
            np.asarray(est_pose, np.float32), self.rs,
        )
        if float(frac) > mp["min_covisibility"]:
            return False
        if idx - last.idx >= mp["kf_every"]:
            return True
        return False

    def add_keyframe(self, idx, est_pose, gt_color_np, gt_depth_np, est_depth_np,
                     g_act) -> KeyFrame:
        """mapper.py:88-101: with niqe_kf the *lowest-score window frame*
        becomes the keyframe (possibly an earlier frame than idx)."""
        if self.cfg["mapping"]["niqe_kf"]:
            kf = self.niqe_window[0]
        else:
            kf = KeyFrame(idx, gt_color_np, np.asarray(est_pose), gt_depth_np,
                          est_depth_np)
        self.keyframes.append(kf)
        self.kf_store.append(kf.gt_color, kf.gt_depth, kf.est_depth, kf.pose)
        if idx > 0:
            self.update_covisibility_graph(len(self.keyframes) - 1, g_act)
        if self.cfg["debug"]["save_keyframes"]:
            # keyframe image dump (mapper.py:991-1000)
            import os

            import imageio.v2 as imageio

            render_path = os.path.join(self.cfg["outputdir"], "keyframes")
            os.makedirs(render_path, exist_ok=True)
            img = (np.clip(kf.gt_color, 0, 1) * 255).astype(np.uint8)
            imageio.imwrite(
                os.path.join(render_path, f"{kf.idx:05d}.png"),
                img.transpose(1, 2, 0),
            )
        return kf

    def update_covisibility_graph(self, key: int, g_act):
        """mapper.py:242-277: link the new keyframe to covisible ones."""
        kf = self.keyframes[key]
        pts, valid = kf_world_points(
            g_act, np.asarray(kf.pose, np.float32), self.rs
        )
        if len(self.keyframes) > 1:
            others = np.stack(
                [k.pose for k in self.keyframes[:-1]]
            ).astype(np.float32)
            fracs = np.asarray(
                covisibility_fractions_batch(pts, valid, others, self.cam)
            )
            thr = self.cfg["mapping"]["kf_covisibility"]
            for kid, f in enumerate(fracs):
                if f > thr:
                    self.covisibility_graph[key].add(kid)
                    self.covisibility_graph[kid].add(key)

    def get_covisible_set(self, idx, g_act, est_pose, gt_depth_dev, N=1):
        """mapper.py:279-407. Returns keyframe indices (window; curr KF last)."""
        if idx == 0:
            return []

        mp = self.cfg["mapping"]
        if self.method == "splatam":
            # depth-overlap ranking (mapper.py:289-374)
            if self.cfg["use_gt_depth"]:
                depth = gt_depth_dev
                sil = jnp.full_like(depth, 1.0)
            else:
                depth, sil, _ = render_depth_sil(g_act, jnp.asarray(est_pose), self.rs)
            presence = np.asarray(sil) > 0.99
            d = np.asarray(depth) * presence
            valid_yx = np.argwhere(d > 0)
            if len(valid_yx) == 0:
                return [len(self.keyframes) - 1] if self.keyframes else []
            pick = self.rng.integers(0, len(valid_yx), size=1600)
            sampled = valid_yx[pick]
            sub_valid = np.zeros(d.shape, bool)
            sub_valid[sampled[:, 0], sampled[:, 1]] = True
            pts, valid = keyframe_world_points(
                jnp.asarray(d * sub_valid), jnp.full(d.shape, 1.0),
                jnp.asarray(est_pose), self.cam,
            )
            if len(self.keyframes) > 1:
                others = jnp.asarray(np.stack([k.pose for k in self.keyframes[:-1]]))
                fracs = np.asarray(
                    covisibility_fractions_batch(pts, valid, others, self.cam, edge=20)
                )
                ranked = sorted(
                    range(len(fracs)), key=lambda i: fracs[i], reverse=True
                )
                selected = [i for i in ranked if fracs[i] > 0.0]
                selected = list(self.rng.permutation(selected)[: self.window_size - 2])
                selected = [int(s) for s in selected]
            else:
                selected = []
            if self.keyframes:
                selected.append(len(self.keyframes) - 1)
            return selected

        # vigs/mm3dgs: covisibility-graph BFS (mapper.py:375-407)
        curr = len(self.keyframes) - 1
        covisible = {curr}
        for _ in range(N):
            frontier = set(covisible)
            for k in frontier:
                covisible |= set(self.covisibility_graph[k]) - covisible
            if frontier == covisible:
                break
        covisible.discard(curr)
        selected = list(self.rng.permutation(sorted(covisible))[: self.window_size - 2])
        selected = [int(s) for s in selected]
        selected.append(curr)
        return selected

    # ------------------------------------------------------------------
    def _build_schedule(self, n_window: int) -> np.ndarray:
        """Replacement-stack sampling (mapper.py:801-807): each window entry
        is drawn equally often, uniformly without replacement per pass.

        With tpu.group_mapping_schedule the same per-entry quotas are laid
        out as contiguous randomized blocks (bin-cache friendly; diverges
        from the reference's interleaving but not from its quotas)."""
        if self.group_schedule:
            passes: list[np.ndarray] = []
            remaining = self.num_iter
            while remaining > 0:
                perm = self.rng.permutation(n_window)
                take = min(remaining, n_window)
                passes.append(perm[:take])
                remaining -= take
            counts = np.zeros(n_window, np.int64)
            for p in passes:
                for e in p:
                    counts[e] += 1
            blocks = self.rng.permutation(n_window)
            out = np.concatenate([np.full(counts[b], b, np.int32) for b in blocks])
            return out.astype(np.int32)
        out = np.empty(self.num_iter, np.int32)
        stack: list[int] = []
        for i in range(self.num_iter):
            if not stack:
                stack = list(range(n_window))
            out[i] = stack.pop(int(self.rng.integers(0, len(stack))))
        return out

    def run_frame(
        self,
        idx: int,
        m: G.GaussianMap,
        adam: G.AdamState,
        est_pose: np.ndarray,
        gt_color_dev,         # [3, H, W] device
        gt_depth_dev,         # [H, W] device or None
        est_depth_dev,        # [H, W] device or None
        gt_color_np: np.ndarray,
        gt_depth_np,
        est_depth_np,
        n_img: int,
    ):
        """One mapping step (mapper.py:952-1014). Returns (map, adam,
        new_points_mask_or_None, updated_est_pose, binning_overflow) —
        the last a [] bool device scalar ORing every rebin's real
        `bins.overflow` flag (fetched once per frame by the SLAM loop)."""
        def _ph(name: str, t0: float) -> float:
            t1 = time.perf_counter()
            if self.decomp_on:
                self.decomp[name] += t1 - t0
            return t1

        t0 = time.perf_counter()
        g_act = G.activate(m)
        mp = self.cfg["mapping"]
        depth_for_init = gt_depth_dev if self.cfg["use_gt_depth"] else est_depth_dev

        window = self.get_covisible_set(
            idx, g_act, est_pose, gt_depth_dev, N=mp["covisibility_level"]
        )
        t0 = _ph("map.covis_set", t0)

        if self.max_radii.shape[0] != m.capacity:
            self.max_radii = jnp.zeros((m.capacity,), jnp.float32)
            self.grad_accum = jnp.zeros((m.capacity,), jnp.float32)
            self.denom = jnp.zeros((m.capacity,), jnp.float32)

        new_vis_mask = None
        niqe_before = self.decomp["map.niqe"] if self.decomp_on else 0.0
        is_new_kf = self.need_new_keyframe(
            idx, g_act, est_pose, gt_color_np, gt_depth_np, est_depth_np, n_img
        )
        if self.decomp_on:
            # NIQE seconds inside the call are booked to map.niqe; book the
            # remainder (covisibility render + frac fetch) here
            self.decomp["map.kf_decision"] += (
                time.perf_counter() - t0
                - (self.decomp["map.niqe"] - niqe_before))
        t0 = time.perf_counter()
        if is_new_kf:
            stats = new_gaussian_candidates(
                g_act, np.asarray(est_pose, np.float32), gt_color_dev,
                depth_for_init,
                self.rs, first_frame=(idx == 0 and len(self.keyframes) == 0),
                method=self.method,
            )
            n_new = int(stats.n_new)
            need = int(m.total_alive()) + n_new
            self._last_added_mask = None
            if self.mesh is not None:
                # shard-local growth + densification: per-shard blocks are
                # padded in place and candidates water-fill the least-loaded
                # shards — no cross-shard row movement (measured 12.2x SPMD
                # overhead for the global ops, scripts/bench_sharded.py)
                from ..parallel.shard_local import (append_gaussians_sharded,
                                                    grow_capacity_sharded)
                from ..parallel.sharded import shard_map_state

                n_shards = self.mesh.devices.size
                if need > m.capacity:
                    m, adam = grow_capacity_sharded(
                        m, adam, G.required_capacity(need), n_shards)
                    m, adam = shard_map_state(m, adam, self.mesh)
                m, adam, n_added, added_mask = append_gaussians_sharded(
                    m, adam, stats.candidates, self.mesh)
                self._last_added_mask = added_mask
            else:
                if need > m.capacity:
                    m, adam = G.grow_capacity(m, adam,
                                              G.required_capacity(need))
                m, adam, n_added = G.append_gaussians(m, adam,
                                                      stats.candidates)
            self.last_n_added = int(n_added)
            new_vis_mask = np.asarray(stats.non_presence)
            # densification resets the stats (gaussian_model.py:482-488)
            self.max_radii = jnp.zeros((m.capacity,), jnp.float32)
            self.grad_accum = jnp.zeros((m.capacity,), jnp.float32)
            self.denom = jnp.zeros((m.capacity,), jnp.float32)
            if self.decomp_on:
                jax.block_until_ready(m.xyz)
            t0 = _ph("map.candidates", t0)
            self.add_keyframe(idx, est_pose, gt_color_np, gt_depth_np,
                              est_depth_np, G.activate(m))
            t0 = _ph("map.add_keyframe", t0)

        # window rows in the device store; -1 (current frame) -> scratch row 0
        self.kf_store.set_row(0, gt_color_dev,
                              None if gt_depth_dev is None else gt_depth_dev,
                              None if est_depth_dev is None else est_depth_dev,
                              est_pose)
        rows = [k + 1 for k in window] + [0]
        K = self.window_size + 1  # static window capacity (selected + current)
        rows_padded = rows + [0] * (K - len(rows))
        rows_arr = np.asarray(rows_padded, np.int32)

        kf_colors, kf_depths, kf_ests, kf_poses, pose_m0, pose_v0 = (
            _gather_window(self.kf_store.colors, self.kf_store.depths,
                           self.kf_store.ests, self.kf_store.poses, rows_arr)
        )

        schedule = np.asarray(self._build_schedule(len(rows)), np.int32)
        if self.decomp_on:
            jax.block_until_ready(kf_colors)
        t0 = _ph("map.window_upload", t0)

        cap = m.capacity
        ones = getattr(self, "_ones_cap", None)
        if ones is None or ones.shape[0] != cap:
            ones = jnp.ones((cap,), bool)
            self._ones_cap = ones
        ba_mask = ones
        if self.opt_settings.do_BA and idx > 0:
            from .map_ops import covisible_gaussian_mask

            pose_valid = jnp.asarray(
                [True] * len(rows) + [False] * (K - len(rows))
            )
            ba_mask = covisible_gaussian_mask(
                G.activate(m), kf_poses, pose_valid, self.rs, 2
            )
            if new_vis_mask is not None:
                # rows actually appended this frame: append_gaussians can clamp
                # candidates on capacity overflow, so use its returned count,
                # not the candidate-pixel count (mapper.py:931-936 marks the
                # newly added tail as always-optimizable)
                if getattr(self, "_last_added_mask", None) is not None:
                    # shard-local append: rows live at per-shard positions,
                    # not a global prefix tail — use the exact mask it built
                    alive_new = self._last_added_mask
                else:
                    alive_new = jnp.arange(cap) >= (
                        m.n_alive - self.last_n_added)
                ba_mask = ba_mask | (alive_new & m.alive_mask())

        carry = MapCarry(
            m=m,
            adam=adam,
            max_radii=self.max_radii,
            grad_accum=self.grad_accum,
            denom=self.denom,
            ba_mask=ba_mask,
            kf_poses=kf_poses,
            pose_m=pose_m0,
            pose_v=pose_v0,
            pose_step=np.int32(0),
            last_loss=np.float32(0.0),
        )
        t0 = _ph("map.ba_mask", t0)
        out, map_overflow = optimize_map(
            carry, kf_colors, kf_depths, kf_ests, schedule,
            jnp.asarray(self.camera_extent, jnp.float32), self.opt_settings
        )
        if self.decomp_on:
            float(out.last_loss)  # host fetch ends the phase
        t0 = _ph("map.optimize", t0)
        self.max_radii = out.max_radii
        self.grad_accum = out.grad_accum
        self.denom = out.denom

        updated_pose = est_pose
        if self.opt_settings.do_BA and idx > 0:
            # write optimized window poses back (reference optimizes views
            # in place; mapper.py:749-788)
            new_poses = np.asarray(out.kf_poses)
            for slot, kf_idx in enumerate(window):
                self.keyframes[kf_idx].pose = new_poses[slot]
                self.kf_store.poses = self.kf_store.poses.at[kf_idx + 1].set(
                    out.kf_poses[slot]
                )
            updated_pose = new_poses[len(window)]  # current frame slot

        return out.m, out.adam, new_vis_mask, updated_pose, map_overflow

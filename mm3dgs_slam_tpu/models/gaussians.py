"""The Gaussian map as a fixed-capacity functional pytree.

TPU-native replacement for the reference's growable torch parameter store
(slam/gaussian_model.py:31-598). XLA wants static shapes, so the map lives in
padded ``[CAP, ...]`` arrays with an "alive prefix" invariant: slots
``[0, n_alive)`` are live, the rest are padding. Growth re-materializes the
pytree at a larger capacity on the host (a rare, amortized recompile);
densify = scatter-append into free slots; prune = stable compaction.

Adam optimizer state (one moment pair per parameter leaf + a shared step
count) mirrors torch.optim.Adam semantics exactly, including the reference's
optimizer-state surgery: appended rows get zeroed moments while the step
count persists (gaussian_model.py:419-488), and pruning gathers moments
alongside parameters (gaussian_model.py:380-417).
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.render import ActivatedGaussians

CAP_QUANTUM = 1 << 16  # capacity granularity; bounds recompile count


class GaussianMap(NamedTuple):
    """Parameter leaves, pre-activation (cf. gaussian_model.py:53-61)."""

    xyz: jnp.ndarray            # [CAP, 3]
    features_dc: jnp.ndarray    # [CAP, 1, 3]
    features_rest: jnp.ndarray  # [CAP, R, 3]  (R = (deg+1)^2 - 1, >= 1 padded)
    scaling: jnp.ndarray        # [CAP, 3] log-scale
    rotation: jnp.ndarray       # [CAP, 4] unnormalized wxyz
    opacity: jnp.ndarray        # [CAP, 1] logit
    rgb: jnp.ndarray            # [CAP, 3] extra channel (saved to PLY, unused
                                #          by the renderer, cf. SURVEY §2.2)
    n_alive: jnp.ndarray        # [] int32 (single-chip: global alive prefix)
                                # or [S] int32 (mesh path: PER-SHARD alive
                                # prefix — shard s owns rows
                                # [s*CAP/S, s*CAP/S + n_alive[s]); see
                                # parallel/shard_local.py)

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def alive_mask(self) -> jnp.ndarray:
        n = self.n_alive
        if n.ndim == 0:
            return jnp.arange(self.capacity) < n
        # per-shard alive prefixes (shard-local prune/densify): row r is
        # alive iff its SHARD-LOCAL index clears its shard's count. The
        # [S] -> [CAP] expansion is a broadcast-reshape (static block), not
        # a gather.
        shards = n.shape[0]
        block = self.capacity // shards
        local = jnp.arange(self.capacity) - (
            jnp.arange(self.capacity) // block) * block
        return local < jnp.repeat(n, block, total_repeat_length=self.capacity)

    def total_alive(self) -> jnp.ndarray:
        """[] int32 live-row count, whichever n_alive layout is in play."""
        return self.n_alive if self.n_alive.ndim == 0 else jnp.sum(self.n_alive)

    def activated(self) -> ActivatedGaussians:
        """Apply activations (gaussian_model.py:32-47)."""
        shs = jnp.concatenate([self.features_dc, self.features_rest], axis=1)
        rot = self.rotation / jnp.maximum(
            jnp.linalg.norm(self.rotation, axis=-1, keepdims=True), 1e-12
        )
        return ActivatedGaussians(
            xyz=self.xyz,
            scales=jnp.exp(self.scaling),
            rotations=rot,
            opacity=jax.nn.sigmoid(self.opacity[:, 0]),
            shs=shs,
            alive=self.alive_mask(),
        )


_PARAM_FIELDS = (
    "xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity", "rgb"
)


class AdamState(NamedTuple):
    mu: GaussianMap          # first moments (n_alive field unused)
    nu: GaussianMap          # second moments
    step: jnp.ndarray        # [] int32, shared across leaves


class MapOptHyper(NamedTuple):
    """Per-group learning rates (mapping.* of the config; see
    gaussian_model.py:143-195)."""

    lr_xyz: float
    lr_features_dc: float
    lr_features_rest: float
    lr_scaling: float
    lr_rotation: float
    lr_opacity: float
    lr_rgb: float
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-15

    @staticmethod
    def from_cfg(mapping_cfg: dict) -> "MapOptHyper":
        return MapOptHyper(
            lr_xyz=mapping_cfg["position_lr_init"] * mapping_cfg["spatial_lr_scale"],
            lr_features_dc=mapping_cfg["feature_lr"],
            lr_features_rest=mapping_cfg["feature_lr"] / 20.0,
            lr_scaling=mapping_cfg["scaling_lr"],
            lr_rotation=mapping_cfg["rotation_lr"],
            lr_opacity=mapping_cfg["opacity_lr"],
            lr_rgb=mapping_cfg["rgb_lr"],
        )

    def lr_for(self, field: str) -> float:
        return getattr(self, "lr_" + field)


def required_capacity(n: int) -> int:
    """Smallest capacity quantum covering n (with 25% headroom)."""
    want = int(math.ceil(n * 1.25))
    return max(CAP_QUANTUM, int(math.ceil(want / CAP_QUANTUM)) * CAP_QUANTUM)


def empty_map(capacity: int, sh_degree: int = 0) -> GaussianMap:
    rest = max((sh_degree + 1) ** 2 - 1, 1)
    f32 = jnp.float32
    return GaussianMap(
        xyz=jnp.zeros((capacity, 3), f32),
        features_dc=jnp.zeros((capacity, 1, 3), f32),
        features_rest=jnp.zeros((capacity, rest, 3), f32),
        scaling=jnp.full((capacity, 3), -10.0, f32),  # tiny scale for padding
        rotation=jnp.tile(jnp.array([1.0, 0, 0, 0], f32), (capacity, 1)),
        opacity=jnp.full((capacity, 1), -20.0, f32),  # ~0 opacity for padding
        rgb=jnp.zeros((capacity, 3), f32),
        n_alive=jnp.asarray(0, jnp.int32),
    )


def zeros_like_map(m: GaussianMap) -> GaussianMap:
    return GaussianMap(
        *(jnp.zeros_like(getattr(m, f)) for f in _PARAM_FIELDS),
        n_alive=m.n_alive,
    )


def init_adam(m: GaussianMap) -> AdamState:
    return AdamState(mu=zeros_like_map(m), nu=zeros_like_map(m),
                     step=jnp.asarray(0, jnp.int32))


def adam_update(
    m: GaussianMap,
    grads: GaussianMap,
    state: AdamState,
    hyper: MapOptHyper,
    row_mask: jnp.ndarray | None = None,
) -> tuple[GaussianMap, AdamState]:
    """One torch-semantics Adam step over all parameter leaves.

    Args:
      row_mask: optional [CAP] bool; rows with False get zeroed gradients
        (the reference's BA gradient masking, slam/mapper.py:931-936).
    """
    step = state.step + 1
    bc1 = 1.0 - hyper.b1 ** step.astype(jnp.float32)
    bc2 = 1.0 - hyper.b2 ** step.astype(jnp.float32)

    new_params, new_mu, new_nu = {}, {}, {}
    for f in _PARAM_FIELDS:
        p = getattr(m, f)
        g = getattr(grads, f)
        if row_mask is not None:
            shape = (-1,) + (1,) * (g.ndim - 1)
            g = g * row_mask.reshape(shape).astype(g.dtype)
        mu = hyper.b1 * getattr(state.mu, f) + (1 - hyper.b1) * g
        nu = hyper.b2 * getattr(state.nu, f) + (1 - hyper.b2) * g * g
        denom = jnp.sqrt(nu) / jnp.sqrt(bc2) + hyper.eps
        p = p - hyper.lr_for(f) * (mu / bc1) / denom
        new_params[f] = p
        new_mu[f] = mu
        new_nu[f] = nu

    m2 = m._replace(**new_params)
    return m2, AdamState(
        mu=state.mu._replace(**new_mu),
        nu=state.nu._replace(**new_nu),
        step=step,
    )


class NewGaussians(NamedTuple):
    """Candidate rows to append, one per source pixel, with a validity mask."""

    xyz: jnp.ndarray            # [M, 3]
    features_dc: jnp.ndarray    # [M, 1, 3]
    features_rest: jnp.ndarray  # [M, R, 3]
    scaling: jnp.ndarray        # [M, 3]
    rotation: jnp.ndarray       # [M, 4]
    opacity: jnp.ndarray        # [M, 1]
    rgb: jnp.ndarray            # [M, 3]
    mask: jnp.ndarray           # [M] bool — which candidates to actually add


@jax.jit
def activate(m: GaussianMap) -> ActivatedGaussians:
    """Jitted `m.activated()` for HOST call sites: eagerly, each of its ~8
    ops is a separate ~30 ms tunnel round trip (round-5 golden
    decomposition); inside jitted consumers use `.activated()` directly."""
    return m.activated()


@jax.jit
def append_gaussians(
    m: GaussianMap, state: AdamState, new: NewGaussians
) -> tuple[GaussianMap, AdamState, jnp.ndarray]:
    """Scatter masked candidate rows into free slots (densification_postfix,
    gaussian_model.py:453-488). New rows get zeroed Adam moments; step
    persists. Returns (map, adam, n_added). Overflow rows are dropped."""
    cap = m.capacity
    maskf = new.mask
    rank = jnp.cumsum(maskf.astype(jnp.int32)) - 1
    target = jnp.where(maskf, m.n_alive + rank, cap)  # cap = dropped
    n_added = jnp.minimum(jnp.sum(maskf.astype(jnp.int32)),
                          cap - m.n_alive)

    upd_p, upd_mu, upd_nu = {}, {}, {}
    for f in _PARAM_FIELDS:
        dst = getattr(m, f)
        src = getattr(new, f)
        upd_p[f] = dst.at[target].set(src, mode="drop")
        z = jnp.zeros_like(src)
        upd_mu[f] = getattr(state.mu, f).at[target].set(z, mode="drop")
        upd_nu[f] = getattr(state.nu, f).at[target].set(z, mode="drop")

    n_new = m.n_alive + n_added
    m2 = m._replace(**upd_p, n_alive=n_new)
    st2 = AdamState(mu=state.mu._replace(**upd_mu),
                    nu=state.nu._replace(**upd_nu), step=state.step)
    return m2, st2, n_added


@jax.jit
def prune_compact(
    m: GaussianMap, state: AdamState, keep: jnp.ndarray
) -> tuple[GaussianMap, AdamState, jnp.ndarray]:
    """Drop rows where ``keep`` is False (among alive rows), compacting
    survivors to the front in stable order (prune_points,
    gaussian_model.py:402-417). Returns (map, adam, perm) where perm is the
    gather order applied to rows (useful to remap external masks)."""
    alive = m.alive_mask()
    keep = keep & alive
    # stable partition: survivors first, in original order
    order = jnp.argsort(jnp.where(keep, 0, 1), stable=True)
    n_new = jnp.sum(keep.astype(jnp.int32))

    def gather_map(g: GaussianMap) -> dict:
        return {f: getattr(g, f)[order] for f in _PARAM_FIELDS}

    m2 = m._replace(**gather_map(m), n_alive=n_new)
    st2 = AdamState(
        mu=state.mu._replace(**gather_map(state.mu)),
        nu=state.nu._replace(**gather_map(state.nu)),
        step=state.step,
    )
    return m2, st2, order


def grow_capacity(
    m: GaussianMap, state: AdamState, new_capacity: int
) -> tuple[GaussianMap, AdamState]:
    """Host-side capacity growth (pads every leaf). Triggers recompilation of
    jitted consumers — called rarely thanks to CAP_QUANTUM granularity."""
    assert new_capacity >= m.capacity
    if new_capacity == m.capacity:
        return m, state
    extra = new_capacity - m.capacity
    tmpl = empty_map(extra, sh_degree=0)
    # features_rest width must match
    rest = m.features_rest.shape[1]
    tmpl = tmpl._replace(features_rest=jnp.zeros((extra, rest, 3), jnp.float32))

    def cat(g: GaussianMap, pad: GaussianMap) -> dict:
        return {
            f: jnp.concatenate([getattr(g, f), getattr(pad, f)], axis=0)
            for f in _PARAM_FIELDS
        }

    zpad = zeros_like_map(tmpl)
    m2 = m._replace(**cat(m, tmpl))
    st2 = AdamState(
        mu=state.mu._replace(**cat(state.mu, zpad), n_alive=state.mu.n_alive),
        nu=state.nu._replace(**cat(state.nu, zpad), n_alive=state.nu.n_alive),
        step=state.step,
    )
    return m2, st2


def reset_opacity(m: GaussianMap, state: AdamState,
                  ceiling: float = 0.01) -> tuple[GaussianMap, AdamState]:
    """Clamp opacities to at most `ceiling` (in probability space) and zero
    the opacity Adam moments — GaussianModel.reset_opacity
    (gaussian_model.py:259-264 + replace_tensor_to_optimizer :365-378).
    Present-but-unscheduled in the reference SLAM loop (opacity_reset_interval
    exists in the configs but is never consumed)."""
    op = jax.nn.sigmoid(m.opacity)
    new_op = jnp.log(jnp.minimum(op, ceiling) / (1 - jnp.minimum(op, ceiling)))
    new_op = jnp.where(m.alive_mask()[:, None], new_op, m.opacity)
    m2 = m._replace(opacity=new_op)
    st2 = AdamState(
        mu=state.mu._replace(opacity=jnp.zeros_like(state.mu.opacity)),
        nu=state.nu._replace(opacity=jnp.zeros_like(state.nu.opacity)),
        step=state.step,
    )
    return m2, st2


def prune_mask_reference(
    m: GaussianMap,
    extent: jnp.ndarray,
    min_opacity: float,
    max_radii2d: jnp.ndarray | None = None,
    max_screen_size: float | None = None,
) -> jnp.ndarray:
    """The reference prune criterion (gaussian_model.py:574-588): opacity
    below threshold OR world size > 0.1*extent OR screen size > threshold.
    Returns the mask of rows to REMOVE (True = prune)."""
    op = jax.nn.sigmoid(m.opacity[:, 0])
    prune = op < min_opacity
    big_ws = jnp.max(jnp.exp(m.scaling), axis=1) > 0.1 * extent
    if max_screen_size is not None and max_radii2d is not None:
        big_vs = max_radii2d > max_screen_size
        prune = prune | big_ws | big_vs
    else:
        prune = prune | big_ws
    return prune & m.alive_mask()


def to_numpy_dict(m: GaussianMap) -> dict:
    """Alive rows as numpy (host-side; for PLY export etc.).

    With a per-shard n_alive vector (mesh path) the live rows are the
    concatenated shard prefixes, in shard order — the same SET of gaussians
    as the single-chip compaction, in a shard-dependent order (rendering is
    order-independent; the PLY schema carries no ordering contract)."""
    counts = np.asarray(m.n_alive)
    if counts.ndim == 0:
        n = int(counts)
        return {f: np.asarray(getattr(m, f))[:n] for f in _PARAM_FIELDS}
    shards = counts.shape[0]
    block = m.capacity // shards
    sel = np.concatenate([
        np.arange(s * block, s * block + int(counts[s])) for s in range(shards)
    ]) if counts.sum() else np.zeros((0,), np.int64)
    return {f: np.asarray(getattr(m, f))[sel] for f in _PARAM_FIELDS}


def capture(m: GaussianMap, state: AdamState, path: str) -> None:
    """Full training-state snapshot incl. optimizer moments — the pytree
    version of GaussianModel.capture (gaussian_model.py:72-86)."""
    blob = {f"m_{f}": np.asarray(getattr(m, f)) for f in _PARAM_FIELDS}
    blob.update({f"mu_{f}": np.asarray(getattr(state.mu, f)) for f in _PARAM_FIELDS})
    blob.update({f"nu_{f}": np.asarray(getattr(state.nu, f)) for f in _PARAM_FIELDS})
    blob["n_alive"] = np.asarray(m.n_alive)
    blob["step"] = np.asarray(state.step)
    np.savez(path, **blob)


def restore(path: str) -> tuple[GaussianMap, AdamState]:
    """Inverse of capture (gaussian_model.py:88-106)."""
    blob = np.load(path)
    n_alive = jnp.asarray(blob["n_alive"], jnp.int32)
    m = GaussianMap(
        **{f: jnp.asarray(blob[f"m_{f}"]) for f in _PARAM_FIELDS},
        n_alive=n_alive,
    )
    mu = GaussianMap(
        **{f: jnp.asarray(blob[f"mu_{f}"]) for f in _PARAM_FIELDS}, n_alive=n_alive
    )
    nu = GaussianMap(
        **{f: jnp.asarray(blob[f"nu_{f}"]) for f in _PARAM_FIELDS}, n_alive=n_alive
    )
    return m, AdamState(mu=mu, nu=nu, step=jnp.asarray(blob["step"], jnp.int32))

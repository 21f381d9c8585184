"""Gradient-driven densification: clone + split (gaussian_model.py:490-592).

The reference pipeline accumulates screen-space gradient stats every mapping
iteration but its periodic densification call is commented out
(mapper.py:914-928) — only pruning runs. These ops complete the API for
offline refinement / future schedules, as static-shape functional updates:

  * clone: small Gaussians with large accumulated screen-gradient are
    duplicated in place,
  * split: large ones are replaced by N samples drawn inside their own
    ellipsoid with scales shrunk by 1/(0.8 N).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.projection import quat_to_rotmat_batch
from .gaussians import (
    AdamState,
    GaussianMap,
    NewGaussians,
    _PARAM_FIELDS,
    append_gaussians,
    prune_compact,
)


def densify_stats_grads(grad_accum: jnp.ndarray, denom: jnp.ndarray) -> jnp.ndarray:
    """Average screen-space gradient magnitude (gaussian_model.py:567-569)."""
    g = grad_accum / jnp.maximum(denom, 1e-12)
    return jnp.where(jnp.isnan(g) | (denom <= 0), 0.0, g)


def _rows_as_new(m: GaussianMap, mask: jnp.ndarray, **overrides) -> NewGaussians:
    fields = {f: getattr(m, f) for f in _PARAM_FIELDS}
    fields.update(overrides)
    return NewGaussians(**fields, mask=mask)


def densify_and_clone(
    m: GaussianMap, adam: AdamState, grads: jnp.ndarray,
    grad_threshold: float, scene_extent, percent_dense: float,
):
    """Duplicate small high-gradient Gaussians (gaussian_model.py:538-565)."""
    sel = (
        (grads >= grad_threshold)
        & (jnp.max(jnp.exp(m.scaling), axis=1) <= percent_dense * scene_extent)
        & m.alive_mask()
    )
    new = _rows_as_new(m, sel)
    return append_gaussians(m, adam, new)


def densify_and_split(
    m: GaussianMap, adam: AdamState, grads: jnp.ndarray,
    grad_threshold: float, scene_extent, percent_dense: float,
    key: jax.Array, n_split: int = 2,
):
    """Split large high-gradient Gaussians into n_split samples
    (gaussian_model.py:490-536). Returns (map, adam, n_added)."""
    scales = jnp.exp(m.scaling)
    sel = (
        (grads >= grad_threshold)
        & (jnp.max(scales, axis=1) > percent_dense * scene_extent)
        & m.alive_mask()
    )
    cap = m.capacity
    R = quat_to_rotmat_batch(m.rotation)

    m2, adam2 = m, adam
    total_added = jnp.asarray(0, jnp.int32)
    for i in range(n_split):
        samples = scales * jax.random.normal(jax.random.fold_in(key, i), (cap, 3))
        new_xyz = m.xyz + jnp.einsum("nij,nj->ni", R, samples)
        new_scaling = jnp.log(scales / (0.8 * n_split))
        new = _rows_as_new(m, sel, xyz=new_xyz, scaling=new_scaling)
        m2, adam2, added = append_gaussians(m2, adam2, new)
        total_added = total_added + added

    # remove the originals that were split
    m2, adam2, _ = prune_compact(m2, adam2, ~sel)
    return m2, adam2, total_added


def densify(
    m: GaussianMap, adam: AdamState, grad_accum, denom,
    max_grad: float, extent, percent_dense: float, key: jax.Array,
):
    """clone + split (gaussian_model.py:567-572)."""
    grads = densify_stats_grads(grad_accum, denom)
    m, adam, n1 = densify_and_clone(m, adam, grads, max_grad, extent, percent_dense)
    # stats arrays are zeroed by densification in the reference; split's
    # selection therefore re-derives from the same pre-clone grads padded out
    grads2 = jnp.zeros((m.capacity,), jnp.float32).at[: grads.shape[0]].set(grads)
    m, adam, n2 = densify_and_split(
        m, adam, grads2, max_grad, extent, percent_dense, key
    )
    return m, adam, n1 + n2

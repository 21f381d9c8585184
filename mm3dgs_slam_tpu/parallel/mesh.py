"""Device-mesh abstraction.

The reference is strictly single-GPU (SURVEY.md §2.3: no distributed backend
of any kind); the TPU rebuild's scaling dimension is the number of Gaussians
in the map, so the canonical mesh is 1-D with a named ``"gauss"`` axis: map
parameter leaves are sharded on axis 0 across chips over ICI, and the render
pipeline gathers the (much smaller) projected screen-space attributes before
tile-parallel compositing.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

GAUSS_AXIS = "gauss"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (GAUSS_AXIS,))


def gauss_sharding(mesh: Mesh) -> NamedSharding:
    """Row-sharding for [CAP, ...] Gaussian-map leaves."""
    return NamedSharding(mesh, P(GAUSS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())

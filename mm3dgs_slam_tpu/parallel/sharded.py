"""Sharded Gaussian-map training/render step over a ``("gauss",)`` mesh.

Design (SURVEY.md §2.3 / BASELINE config #5 "Gaussian map sharded across
chips over ICI"):

  * map parameter leaves ``[CAP, ...]`` are row-sharded across chips —
    memory AND projection compute scale with the mesh,
  * per-Gaussian projection runs shard-local (elementwise, no comm),
  * the compact projected attributes (~16 floats/Gaussian) are gathered
    across ICI (one all-gather per render — the only communication on the
    forward path), then binning + tile compositing run tile-parallel,
  * the backward path reverses the gather into a reduce-scatter of
    per-Gaussian gradients back to their home shards — XLA's SPMD
    partitioner inserts these collectives from the sharding constraints;
    no hand-written NCCL-style code, per the scaling-book recipe,
  * the Adam update is purely shard-local.

All of this is expressed as ordinary jnp + `with_sharding_constraint`, so
the same code runs single-chip (mesh of 1) with zero overhead.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.gaussians import (
    AdamState,
    GaussianMap,
    MapOptHyper,
    _PARAM_FIELDS,
    adam_update,
)
from ..ops.binning import build_bins
from ..ops.composite import composite_tiles
from ..ops.losses import l1_loss, ssim
from ..ops.render import RenderSettings, background, project_for_pose


def shard_map_state(m: GaussianMap, adam: AdamState, mesh: Mesh):
    """Place map + optimizer leaves row-sharded on the mesh.

    `n_alive` becomes the PER-SHARD prefix-count vector [S] (replicated —
    it is S scalars) so prune/densify can run shard-local with no
    cross-shard row movement (parallel/shard_local.py). Converting at
    placement time is a pure re-description: a scalar global prefix and
    its per-shard split mark exactly the same rows alive."""
    from .shard_local import shard_counts

    row = NamedSharding(mesh, P("gauss"))
    rep = NamedSharding(mesh, P())
    n_shards = mesh.devices.size
    counts = shard_counts(m.n_alive, n_shards, m.capacity)

    def place(g: GaussianMap) -> GaussianMap:
        return g._replace(
            **{f: jax.device_put(getattr(g, f), row) for f in _PARAM_FIELDS},
            n_alive=jax.device_put(counts, rep),
        )

    return (
        place(m),
        AdamState(mu=place(adam.mu), nu=place(adam.nu),
                  step=jax.device_put(adam.step, rep)),
    )


def replicate_proj(proj, mesh: Mesh | None):
    """Force the projected attributes to be replicated: this is the ICI
    all-gather boundary between gaussian-parallel and tile-parallel work.
    No-op when mesh is None (single-chip paths pay nothing)."""
    if mesh is None:
        return proj
    rep = NamedSharding(mesh, P())
    return proj._replace(
        **{k: jax.lax.with_sharding_constraint(v, rep)
           for k, v in proj._asdict().items()}
    )


_replicate_proj = replicate_proj  # backward-compat alias


def sharded_render_loss(
    params: dict,
    n_alive: jnp.ndarray,
    pose: jnp.ndarray,
    gt_color: jnp.ndarray,
    rs: RenderSettings,
    mesh: Mesh,
    lambda_dssim: float = 0.2,
):
    m = GaussianMap(**params, n_alive=n_alive)
    g = m.activated()
    proj = project_for_pose(g, pose, rs)       # shard-local, elementwise
    proj = replicate_proj(proj, mesh)          # <- all-gather over ICI
    bins = build_bins(proj, rs.cam, rs.pair_cap, rs.max_tiles_per_gaussian)
    img6 = composite_tiles(proj, bins, rs.cam, background(rs),
                           rs.max_per_tile, rs.chunk)
    image = img6[:3]
    loss = (1 - lambda_dssim) * l1_loss(image, gt_color) + lambda_dssim * (
        1.0 - ssim(image, gt_color)
    )
    return loss


def make_sharded_train_step(rs: RenderSettings, hyper: MapOptHyper, mesh: Mesh):
    """One render->loss->grad->Adam step with the map sharded over `mesh`.

    Returns a jitted function (m, adam, pose, gt_color) -> (m, adam, loss).
    """

    def step(m: GaussianMap, adam: AdamState, pose, gt_color):
        params = {f: getattr(m, f) for f in _PARAM_FIELDS}
        loss, grads = jax.value_and_grad(sharded_render_loss)(
            params, m.n_alive, pose, gt_color, rs, mesh
        )
        gm = GaussianMap(**grads, n_alive=m.n_alive)
        m2, adam2 = adam_update(m, gm, adam, hyper)
        return m2, adam2, loss

    row = NamedSharding(mesh, P("gauss"))
    rep = NamedSharding(mesh, P())

    def map_shardings(g_template):
        return GaussianMap(
            **{f: row for f in _PARAM_FIELDS}, n_alive=rep
        )

    m_sh = map_shardings(None)
    adam_sh = AdamState(mu=m_sh, nu=m_sh, step=rep)
    return jax.jit(
        step,
        in_shardings=(m_sh, adam_sh, rep, rep),
        out_shardings=(m_sh, adam_sh, rep),
    )

#!/usr/bin/env python
"""Diagnose the bench kernel_grad_check divergence: compare compiled Pallas
bwd grads vs XLA under both precision modes, reporting error *distributions*
(abs-vs-global-max and rel) instead of asserting, to tell a miscalibrated
tolerance (mixed gradient-walk envelope) from real Mosaic corruption."""
import os
import sys

mode = sys.argv[1] if len(sys.argv) > 1 else "mixed"
os.environ["MM3DGS_PL_PRECISION"] = mode

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from __graft_entry__ import _build_scene
from mm3dgs_slam_tpu.ops.pallas_composite import CHUNK, UNROLL
from mm3dgs_slam_tpu.ops.render import RenderSettings, render

m, cam = _build_scene(1 << 11, cam_hw=(120, 160))
g = m.activated()
rs_pl = RenderSettings(cam=cam, pair_cap=1 << 18, max_per_tile=512,
                       chunk=32, max_tiles_per_gaussian=16,
                       use_pallas=True, bin_d1=4, bin_big_frac=7,
                       bin_d2_live=8)
rs_xla = rs_pl._replace(use_pallas=False)
pose = jnp.array([1.0, 0, 0, 0, 0, 0, 0], jnp.float32)


def loss(opacity, use_pallas):
    out = render(g._replace(opacity=opacity), pose,
                 rs_pl if use_pallas else rs_xla)
    img6 = jnp.concatenate([out["render"], out["depth"]], axis=0)
    w = (1.0 + jnp.arange(6.0))[:, None, None]
    return jnp.sum(img6 * w), out["bins"]


(_, bins), g_pl = jax.jit(
    jax.value_and_grad(lambda o: loss(o, True), has_aux=True))(g.opacity)
(_, _), g_xla = jax.jit(
    jax.value_and_grad(lambda o: loss(o, False), has_aux=True))(g.opacity)
g_pl, g_xla = map(np.asarray, jax.device_get((g_pl, g_xla)))

counts = np.asarray(bins.tile_count)
chunks = -(-counts // CHUNK)
print(f"mode={mode} backend={jax.default_backend()} "
      f"odd_trip_tiles={(chunks % UNROLL != 0).sum()}/{(counts > 0).sum()}")
scale = float(np.abs(g_xla).max())
err = np.abs(g_pl - g_xla)
print(f"|g_xla| max={scale:.4e}  abs err: max={err.max():.4e} "
      f"({err.max()/scale:.2%} of max) p99={np.percentile(err,99):.3e} "
      f"p50={np.percentile(err,50):.3e}")
for thr in (1e-3, 1e-2, 1e-1):
    mask = np.abs(g_xla) > thr * scale
    if mask.sum():
        rel = err[mask] / np.abs(g_xla)[mask]
        print(f"  mask>|{thr:g}*max| n={mask.sum()}  rel max={rel.max():.3f} "
              f"p99={np.percentile(rel,99):.4f}")
# where is the worst error? big or small tier? saturated tile?
i = int(np.argmax(err))
print(f"worst idx={i} g_xla={g_xla[i]:.4e} g_pl={g_pl[i]:.4e}")

#!/usr/bin/env python
"""Does gather index ORDER matter on this backend? (PROFILE.md lever 1)

The slot-table reduce gathers ~0.7M 64-byte rows from the dpair buffer.
Lever 1 proposes laying the small tier out in depth order so adjacent rows
gather adjacent buffer slots. That only pays if the TPU row-gather is
locality-sensitive; the measured ~34 GB/s effective gather throughput
(vs ~800 GB/s HBM) suggests it is issue-bound, not bandwidth-bound, in
which case index order is irrelevant and lever 1 is dead.

Probe: one wide-row gather of K indices from a [P, 16] f32 table, with
  a) uniform random indices (status quo upper bound on disorder),
  b) block-local indices (random within 1k-row windows — the depth-order
     layout's realistic locality),
  c) fully sorted indices (best case),
  d) arange (perfectly contiguous — the hardware ceiling).
Chained-dispatch methodology per scripts/probe_layouts.py.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

REPS = 20
_overhead_ms = 0.0


def timeit(name, fn, variants):
    acc = fn(variants[0]) * 0.0
    for v in variants[:3]:
        acc = acc + fn(v) * 0.0
    float(acc)
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for i in range(REPS):
        acc = acc + fn(variants[i % len(variants)]).astype(jnp.float32)
    float(acc)
    ms = (time.perf_counter() - t0) / REPS * 1e3 - _overhead_ms
    print(f"| {name} | {ms:8.3f} |", flush=True)
    return ms


def main():
    global _overhead_ms
    print(f"backend={jax.default_backend()}")
    P = 1 << 20          # dpair buffer rows (~bench aligned cap)
    K = 700_000          # reduce gather size at the bench scene
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.standard_normal((P, 16), dtype=np.float32))
    scales = [jnp.float32(1.0 + 1e-4 * i) for i in range(REPS)]
    for s in scales:
        s.block_until_ready()

    idx_rand = jnp.asarray(rng.integers(0, P, K, dtype=np.int32))
    # block-local: sorted block bases + random offset within 1k rows
    base = np.sort(rng.integers(0, P - 1024, K, dtype=np.int32))
    idx_block = jnp.asarray(base + rng.integers(0, 1024, K, dtype=np.int32))
    idx_sorted = jnp.asarray(np.sort(rng.integers(0, P, K, dtype=np.int32)))
    idx_seq = jnp.arange(K, dtype=jnp.int32)

    print("| probe | ms |\n|---|---|")
    null = jax.jit(lambda s: s * 2.0)
    _overhead_ms = timeit("null dispatch (overhead/rep)", null, scales)

    def mk(idx):
        @jax.jit
        def f(s):
            g = (src * s).at[idx].get(mode="fill", fill_value=0.0)
            g = jax.lax.optimization_barrier(g)
            return g.sum()
        return f

    timeit(f"fill-gather rows16 x{K//1000}k RANDOM", mk(idx_rand), scales)
    timeit(f"fill-gather rows16 x{K//1000}k BLOCK-1k", mk(idx_block), scales)
    timeit(f"fill-gather rows16 x{K//1000}k SORTED", mk(idx_sorted), scales)
    timeit(f"fill-gather rows16 x{K//1000}k ARANGE", mk(idx_seq), scales)

    # and the downstream reduce shape: gather + [n, d, 16] sum
    n, d = 131072, 4

    def mkred(idx):
        tbl = idx[: n * d]

        @jax.jit
        def f(s):
            g = (src * s).at[tbl].get(mode="fill", fill_value=0.0)
            g = jax.lax.optimization_barrier(g)
            return g.reshape(n, d, 16).sum(axis=1, dtype=jnp.float32).sum()
        return f

    timeit("gather+reshape-sum [131k,4] RANDOM", mkred(idx_rand), scales)
    timeit("gather+reshape-sum [131k,4] BLOCK-1k", mkred(idx_block), scales)


if __name__ == "__main__":
    main()

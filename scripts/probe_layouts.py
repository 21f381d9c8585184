#!/usr/bin/env python
"""TPU layout probes for the round-2 perf work.

Timing method: per-dispatch tunnel overhead here is ~tens of ms, so naive
time-one-call-and-fetch loops measure the tunnel, not the op. Instead each
probe chains REPS dispatches with VARIED inputs (dedup trap) whose scalar
results accumulate into one value fetched ONCE; the enqueue is async so
wall-clock ≈ sum of device times + one round trip. A null probe measures
the residual overhead to subtract.

Run with an OTHERWISE IDLE host (the single weak CPU core corrupts timings
under any concurrent load).
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
    """fn(v) -> scalar jax value. Chains REPS varied calls, fetches once."""
    acc = fn(variants[0]) * 0.0
    for v in variants[:3]:  # warm/compile (incl. the accumulate graph)
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
    N = 1 << 17
    P = 2 << 20
    key = jax.random.PRNGKey(0)
    scales = [jnp.float32(1.0 + 1e-4 * i) for i in range(REPS)]
    for s in scales:
        s.block_until_ready()

    print("| probe | ms |\n|---|---|")

    # 0. null probe: per-dispatch overhead in the chained scheme
    null = jax.jit(lambda s: s * 2.0)
    _overhead_ms = timeit("null dispatch (overhead/rep)", null, scales)

    # 1. [N,3,3] batched matmul vs componentwise
    A = jax.random.normal(key, (N, 3, 3))

    @jax.jit
    def mm33(s):
        B = A * s
        return (B @ jnp.swapaxes(B, -1, -2)).sum()

    timeit("[N,3,3] batched matmul AAt", mm33, scales)

    Ac = [jnp.asarray(A[:, i, j]) for i in range(3) for j in range(3)]

    @jax.jit
    def mm33_soa(s):
        a = [x * s for x in Ac]
        tot = jnp.float32(0.0)
        for i in range(3):
            for j in range(3):
                tot += sum(a[3 * i + k] * a[3 * j + k] for k in range(3)).sum()
        return tot

    timeit("same math on SoA [N] components", mm33_soa, scales)

    # 2. Adam-like elementwise over bench-map-like leaves
    F3 = jax.random.normal(key, (N, 16, 3))
    F2 = jnp.asarray(F3.reshape(N, 48))

    @jax.jit
    def adamish3(s):
        x = F3
        m = x * 0.9 + s
        v = x * x * 0.999 + s
        return (x - 0.01 * m / (jnp.sqrt(v) + 1e-8)).sum()

    @jax.jit
    def adamish2(s):
        x = F2
        m = x * 0.9 + s
        v = x * x * 0.999 + s
        return (x - 0.01 * m / (jnp.sqrt(v) + 1e-8)).sum()

    timeit("adam-ish on [N,16,3]", adamish3, scales)
    timeit("adam-ish on [N,48]", adamish2, scales)

    leaves = [jax.random.normal(key, (N, k)) for k in (3, 3, 4, 1, 3)] + [
        jax.random.normal(key, (N, 1, 3)), jax.random.normal(key, (N, 1, 3))]

    @jax.jit
    def adamish_map(s):
        tot = jnp.float32(0.0)
        for x in leaves:
            m = x * 0.9 + s
            v = x * x * 0.999 + s
            tot += (x - 0.01 * m / (jnp.sqrt(v) + 1e-8)).sum()
        return tot

    timeit("adam-ish on 7 bench map leaves", adamish_map, scales)

    # 3. transpose [16,P] <-> [P,16]
    D = jax.random.normal(key, (16, P))
    Dt = jnp.asarray(D.T)

    timeit("transpose [16,2M]->[2M,16]", jax.jit(lambda s: (D * s).T[::97, :].sum()), scales)
    timeit("transpose [2M,16]->[16,2M]", jax.jit(lambda s: (Dt * s).T[:, ::97].sum()), scales)

    # 4. gather granularity
    src16 = jax.random.normal(key, (N, 16))
    idx = jax.random.randint(key, (P,), 0, N)

    timeit("1 gather rows16 x2M", jax.jit(lambda s: (src16 * s)[idx].sum()), scales)

    src2 = jnp.asarray(src16[:, :2])
    src3 = jnp.asarray(src16[:, 2:5])
    src1 = jnp.asarray(src16[:, 5])
    src6 = jnp.asarray(src16[:, 6:12])

    @jax.jit
    def gather4(s):
        return ((src2 * s)[idx].sum() + (src3 * s)[idx].sum()
                + (src1 * s)[idx].sum() + (src6 * s)[idx].sum())

    timeit("4 gathers (2+3+1+6 cols) x2M", gather4, scales)

    idx_half = idx[: P // 2]
    timeit("1 gather rows16 x1M", jax.jit(lambda s: (src16 * s)[idx_half].sum()), scales)

    # 5. pack-bwd-like: row gather [N,8] from [P,16] + sum
    slots = jax.random.randint(key, (N, 8), 0, P)
    big = jax.random.normal(key, (P, 16))

    timeit("gather [N,8]x rows16 from [2M,16] + sum",
           jax.jit(lambda s: (big * s)[slots].sum(axis=1).sum()), scales)

    # 6. scatter vs gather relayout of [P]
    vals = jax.random.randint(key, (P,), 0, N).astype(jnp.float32)
    perm = jax.random.permutation(key, P)

    timeit("scatter [2M] .at[perm].set",
           jax.jit(lambda s: jnp.zeros((P,), jnp.float32).at[perm].set(vals * s).sum()), scales)
    timeit("gather [2M] [perm]",
           jax.jit(lambda s: (vals * s)[perm].sum()), scales)

    # 7. sort costs
    keys1 = jax.random.randint(key, (P,), 0, 1 << 30)
    v1 = jnp.arange(P, dtype=jnp.int32)

    def mksort(kk, vv):
        @jax.jit
        def f(s):
            k, a, b = jax.lax.sort(
                (kk + (s * 0).astype(jnp.int32), vv, vv), num_keys=1,
                is_stable=True)
            return (k[0] + a[0] + b[0]).astype(jnp.float32)
        return f

    timeit("sort 2M keys + 2 payloads", mksort(keys1, v1), scales)
    timeit("sort 1M keys + 2 payloads", mksort(keys1[: P // 2], v1[: P // 2]), scales)
    timeit("sort 0.5M keys + 2 payloads", mksort(keys1[: P // 4], v1[: P // 4]), scales)

    @jax.jit
    def argsortN(s):
        return jnp.argsort(keys1[:N] + (s * 0).astype(jnp.int32))[0].astype(jnp.float32)

    timeit("argsort 131k", argsortN, scales)

    # 8. SSIM conv: dense 11x11 vs separable
    img = jax.random.normal(key, (1, 3, 480, 640))
    k2d = jnp.ones((3, 1, 11, 11)) / 121.0
    k1a = jnp.ones((3, 1, 11, 1)) / 11.0
    k1b = jnp.ones((3, 1, 1, 11)) / 11.0

    @jax.jit
    def conv2d(s):
        return jax.lax.conv_general_dilated(
            img * s, k2d, (1, 1), "SAME", feature_group_count=3,
            dimension_numbers=("NCHW", "OIHW", "NCHW")).sum()

    timeit("depthwise 11x11 conv 3x480x640", conv2d, scales)

    @jax.jit
    def convsep(s):
        h = jax.lax.conv_general_dilated(
            img * s, k1a, (1, 1), "SAME", feature_group_count=3,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return jax.lax.conv_general_dilated(
            h, k1b, (1, 1), "SAME", feature_group_count=3,
            dimension_numbers=("NCHW", "OIHW", "NCHW")).sum()

    timeit("separable 11x1+1x11 conv", convsep, scales)

    # HWC layout alternative (pixels on sublane/lane, channels... NHWC)
    imgh = jnp.asarray(img.transpose(0, 2, 3, 1))
    k2dh = jnp.ones((11, 11, 1, 3)) / 121.0

    @jax.jit
    def conv2dh(s):
        return jax.lax.conv_general_dilated(
            imgh * s, k2dh, (1, 1), "SAME", feature_group_count=3,
            dimension_numbers=("NHWC", "HWIO", "NHWC")).sum()

    timeit("depthwise 11x11 conv NHWC", conv2dh, scales)


if __name__ == "__main__":
    main()

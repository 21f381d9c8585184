#!/usr/bin/env python
"""Map the gather-cost-vs-source-size cliff for the slot-table reduce.

probe_reduce2 showed the reduce's 674k-slot row gather costs ~6.7 ns/idx
from a 63 MB source while the pack's gather costs ~1.5 ns/idx from an
8.4 MB source — hypothesis: XLA stages small gather sources in VMEM and
falls back to latency-chained HBM row fetches above some size. This probe
holds the INDEX COUNT fixed (the real reduce's 674k) and sweeps source
rows x dtype x field-split to find the cliff and the best real-reduce
formulation."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N_ITERS = 20
REPS = 6


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    N_IDX = 674_000

    def loop(body, tag):
        def seg(s0):
            def b(j, c):
                s, acc = c
                return (s + 1e-12 * body(s), acc)

            return jax.lax.fori_loop(0, N_ITERS, b, (s0, jnp.float32(0.0)))[0]

        f = jax.jit(seg)
        float(f(jnp.float32(1.0)))
        times = []
        for i in range(REPS):
            t0 = time.perf_counter()
            float(f(jnp.float32(1.0 + 1e-4 * (i + 1))))
            times.append((time.perf_counter() - t0) / N_ITERS * 1e3)
        print(f"{tag}: {sorted(times)[len(times)//2]:.2f} ms/iter "
              f"(min {min(times):.2f})", flush=True)

    for rows, width, dtype in [
        (978_000, 16, jnp.float32),   # real reduce shape, 63 MB
        (978_000, 16, jnp.bfloat16),  # 31 MB
        (524_288, 16, jnp.float32),   # 33 MB
        (524_288, 16, jnp.bfloat16),  # 16.8 MB
        (262_144, 16, jnp.float32),   # 16.8 MB
        (131_072, 16, jnp.float32),   # 8.4 MB (the pack-fast size)
        (131_072, 16, jnp.bfloat16),  # 4.2 MB
    ]:
        src = jax.random.normal(key, (rows, width)).astype(dtype)
        idx = jax.random.randint(key, (N_IDX,), 0, rows)
        jax.block_until_ready(src)
        mb = rows * width * src.dtype.itemsize / 1e6

        def g(s, src=src, idx=idx):
            y = jax.lax.optimization_barrier(
                src * jnp.asarray(s, src.dtype))
            gth = jax.lax.optimization_barrier(
                y.at[idx].get(mode="fill", fill_value=0))
            return (gth[0, 0] + gth[-1, -1]).astype(jnp.float32)

        loop(g, f"gather 674k from [{rows:>7},{width}] {src.dtype.name:<9}"
                f" ({mb:6.1f} MB)")

    # field-split variants at the real buffer size: 2 x [P, 8] halves
    src16 = jax.random.normal(key, (978_000, 16))
    idx = jax.random.randint(key, (N_IDX,), 0, 978_000)

    for dtype, tag in [(jnp.float32, "f32 "), (jnp.bfloat16, "bf16")]:
        s8a = src16[:, :8].astype(dtype)
        s8b = src16[:, 8:].astype(dtype)
        jax.block_until_ready((s8a, s8b))
        mb = 2 * 978_000 * 8 * s8a.dtype.itemsize / 1e6

        def g2(s, a=s8a, b=s8b, idx=idx):
            sa = jax.lax.optimization_barrier(a * jnp.asarray(s, a.dtype))
            sb = jax.lax.optimization_barrier(b * jnp.asarray(s, b.dtype))
            ga = jax.lax.optimization_barrier(
                sa.at[idx].get(mode="fill", fill_value=0))
            gb = jax.lax.optimization_barrier(
                sb.at[idx].get(mode="fill", fill_value=0))
            return (ga[0, 0] + gb[-1, -1]).astype(jnp.float32)

        loop(g2, f"2-split gathers [978k,8]x2 {tag}     ({mb:6.1f} MB)")

    # split small/big tier gathers (do independent gathers overlap?)
    src = jax.random.normal(key, (978_000, 16))
    idx_a = jax.random.randint(key, (524_288,), 0, 978_000)
    idx_b = jax.random.randint(jax.random.fold_in(key, 1), (149_800,), 0,
                               978_000)

    def gsplit(s):
        y = jax.lax.optimization_barrier(src * s)
        ga = jax.lax.optimization_barrier(
            y.at[idx_a].get(mode="fill", fill_value=0))
        gb = jax.lax.optimization_barrier(
            y.at[idx_b].get(mode="fill", fill_value=0))
        return ga[0, 0] + gb[-1, -1]

    loop(gsplit, "small+big as TWO gathers (524k+150k) f32 (62.6 MB)")


if __name__ == "__main__":
    main()

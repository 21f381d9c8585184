#!/usr/bin/env python
"""What does ONE host->TPU dispatch cost through the axon tunnel, by kind?

Round-5 question: the golden decomposition showed the per-frame host glue
(eager jnp ops, tiny uploads, jitted-call dispatches) costs seconds per
frame. This probe prices each dispatch KIND so the glue fixes target the
right ones:

  eager_op        x = x + c          (eager jnp op, chained, no fetch)
  upload          jnp.asarray(i)     (host->device scalar transfer)
  jit_nofetch     f(x, np.int32(i))  (jitted call, arg device_put inline,
                                      chained, no fetch)
  jit_fetch       float(f(x, i))     (jitted call + host fetch round trip)

Method per CLAUDE.md gotchas 2/5: vary inputs every rep (the tunnel dedupes
identical dispatches), chain results into one accumulated value, ONE final
fetch per timed block, subtract nothing (absolute per-op costs are the
object here, tunnel drift ±30% accepted — we need orders of magnitude).
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

N = 60


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    x0 = jnp.arange(1024.0)
    float(jnp.sum(x0))  # first contact

    @jax.jit
    def f(x, i):
        return x * 1.000001 + i

    # warm the jit
    float(f(x0, np.int32(0))[0])

    results = {}

    # eager ops, chained, one fetch
    x = x0
    t0 = time.perf_counter()
    for i in range(N):
        x = x + float(i)  # eager add with varying operand
    v = float(x[0])
    results["eager_op"] = (time.perf_counter() - t0) / N

    # uploads (host->device scalar), consumed once at the end
    t0 = time.perf_counter()
    acc = []
    for i in range(N):
        acc.append(jnp.asarray(np.float32(i * 1.5)))
    v += float(sum(acc[-1:][0].reshape(()) for _ in range(1)))
    results["upload"] = (time.perf_counter() - t0) / N

    # jitted calls with a host numpy scalar arg, chained, no per-call fetch
    x = x0
    t0 = time.perf_counter()
    for i in range(N):
        x = f(x, np.int32(i))
    v += float(x[0])
    results["jit_nofetch"] = (time.perf_counter() - t0) / N

    # jitted call + fetch each time (the known ~25-35 ms round trip)
    t0 = time.perf_counter()
    s = 0.0
    for i in range(N):
        s += float(f(x0, np.int32(i))[0])
    results["jit_fetch"] = (time.perf_counter() - t0) / N

    print(f"(consumed {v + s:.3f})")
    for k, dt in results.items():
        print(f"{k:<12s} {dt * 1e3:8.2f} ms/op over {N}")


if __name__ == "__main__":
    main()

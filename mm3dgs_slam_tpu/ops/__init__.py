"""Pure-jnp / Pallas compute primitives: pose math, SH, losses, rasterizer."""

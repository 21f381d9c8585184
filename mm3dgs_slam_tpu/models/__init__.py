"""Gaussian map state: fixed-capacity pytree, functional optimizer, PLY I/O."""

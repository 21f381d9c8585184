"""Learning-rate schedules and covariance helpers (utils/general_utils.py).

`expon_lr` mirrors get_expon_lr_func (general_utils.py:29-62): log-linear
interpolation from lr_init to lr_final over max_steps with an optional
sigmoid-ramped delay. The reference wires it to the xyz group
(gaussian_model.py:190-195) but never calls update_learning_rate in the SLAM
loop — we expose the same hook for parity and for offline refinement.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def expon_lr(step, lr_init: float, lr_final: float, lr_delay_steps: int = 0,
             lr_delay_mult: float = 1.0, max_steps: int = 1000000):
    """Log-lerp LR decay with optional delayed ramp-up. Works on scalars or
    traced step arrays."""
    step = jnp.asarray(step, jnp.float32)
    if lr_init == lr_final == 0.0:
        return jnp.zeros_like(step)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1)
        )
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(
        math.log(max(lr_init, 1e-30)) * (1 - t) + math.log(max(lr_final, 1e-30)) * t
    )
    out = delay_rate * log_lerp
    return jnp.where(step < 0, 0.0, out)


def inverse_sigmoid(x):
    """logit (general_utils.py:18)."""
    return jnp.log(x / (1 - x))


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """[N,3,3] covariance -> packed upper triangle [N,6]
    (general_utils.py:64-76); the `compute_cov3D_python` pipeline format."""
    return jnp.stack(
        [cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2],
         cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]], axis=-1
    )


def covariance_activation(scales, scaling_modifier, rotations):
    """build R S S^T R^T and pack (gaussian_model.py:32-37)."""
    from ..ops.projection import build_cov3d

    return strip_symmetric(build_cov3d(scales * scaling_modifier, rotations))

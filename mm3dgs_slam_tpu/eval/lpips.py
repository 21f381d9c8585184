"""LPIPS perceptual metric — gated on pretrained weights.

The reference computes LPIPS-VGG via a bundled lpipsPyTorch copy that
downloads torchvision VGG16 weights + linear heads at call time
(lpipsPyTorch/__init__.py:6-21, modules/utils.py:11-30). This environment
has no torchvision and no egress, so:

  * if `MM3DGS_LPIPS_WEIGHTS` points at an .npz with VGG16 conv weights and
    LPIPS linear-head weights, a pure-JAX VGG16 LPIPS is evaluated,
  * otherwise `lpips()` returns NaN and evaluation reports PSNR/SSIM only
    (results.npz keeps the `lpips_list` key for artifact compatibility).
"""
from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_VGG_LAYERS = [2, 2, 3, 3, 3]  # conv counts per block (VGG16)
_FEAT_CHANNELS = [64, 128, 256, 512, 512]
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


@lru_cache(maxsize=1)
def _load_weights():
    path = os.environ.get("MM3DGS_LPIPS_WEIGHTS")
    if not path or not os.path.exists(path):
        return None
    return dict(np.load(path))


def _vgg_features(x, w):
    """x: [3, H, W] in [-1ish] normalized; returns the 5 relu feature maps."""
    feats = []
    h = x[None]
    li = 0
    for block, n_conv in enumerate(_VGG_LAYERS):
        for c in range(n_conv):
            kernel = w[f"conv{li}_w"]  # [O, I, 3, 3]
            bias = w[f"conv{li}_b"]
            h = jax.lax.conv_general_dilated(
                h, jnp.asarray(kernel), (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + jnp.asarray(bias)[None, :, None, None]
            h = jax.nn.relu(h)
            li += 1
        feats.append(h)
        if block < 4:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            )
    return feats


def lpips(img1, img2, net_type: str = "vgg") -> float:
    """Perceptual distance; NaN when pretrained weights are unavailable.

    Matches the reference's vendored lpipsPyTorch exactly, including its
    quirks: inputs are z-scored directly in [0, 1] (BaseNet.z_score,
    modules/networks.py:50-51 — the vendored copy never applies richzhang's
    [0,1]->[-1,1] rescale and SLAM.py passes [0,1] images), and activations
    are normalized by x / (||x|| + eps) (modules/utils.py:6-8)."""
    w = _load_weights()
    if w is None:
        return float("nan")
    return float(_lpips_value(jnp.asarray(img1), jnp.asarray(img2), w))


@jax.jit
def _lpips_value(img1, img2, w):
    shift = jnp.asarray(_SHIFT)[:, None, None]
    scale = jnp.asarray(_SCALE)[:, None, None]
    x = (img1 - shift) / scale
    y = (img2 - shift) / scale
    fx = _vgg_features(x, w)
    fy = _vgg_features(y, w)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        lin = jnp.asarray(w[f"lin{i}_w"])  # [C]
        total = total + jnp.mean(jnp.sum(d * lin[None, :, None, None], axis=1))
    return total

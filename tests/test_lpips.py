"""LPIPS fixture test: the pure-JAX VGG16 LPIPS matches an independent torch
re-implementation of the reference's math (lpipsPyTorch/modules/lpips.py:38-44,
networks.py:50-61, utils.py:6-8) on RANDOM weights in the npz schema that
scripts/export_lpips_weights.py produces.
"""
import importlib
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

_VGG_LAYERS = [2, 2, 3, 3, 3]
_CHANNELS = [64, 128, 256, 512, 512]


def random_weights(rng, scale=0.2):
    w = {}
    li = 0
    cin = 3
    for block, n_conv in enumerate(_VGG_LAYERS):
        cout = _CHANNELS[block]
        for _ in range(n_conv):
            w[f"conv{li}_w"] = rng.normal(0, scale / np.sqrt(cin * 9),
                                          (cout, cin, 3, 3)).astype(np.float32)
            w[f"conv{li}_b"] = rng.normal(0, 0.01, (cout,)).astype(np.float32)
            cin = cout
            li += 1
    for k, c in enumerate(_CHANNELS):
        w[f"lin{k}_w"] = rng.uniform(0, 0.1, (c,)).astype(np.float32)
    return w


def torch_lpips(img1, img2, w):
    """Independent re-implementation of the reference's LPIPS forward."""
    mean = torch.tensor([-0.030, -0.088, -0.188])[None, :, None, None]
    std = torch.tensor([0.458, 0.448, 0.450])[None, :, None, None]

    def features(x):
        h = (x[None] - mean) / std  # z_score on [0,1] input (networks.py:50)
        feats = []
        li = 0
        for block, n_conv in enumerate(_VGG_LAYERS):
            for _ in range(n_conv):
                h = torch.nn.functional.conv2d(
                    h, torch.from_numpy(w[f"conv{li}_w"]),
                    torch.from_numpy(w[f"conv{li}_b"]), padding=1)
                h = torch.relu(h)
                li += 1
            norm = torch.sqrt(torch.sum(h ** 2, dim=1, keepdim=True))
            feats.append(h / (norm + 1e-10))  # utils.py:6-8
            if block < 4:
                h = torch.nn.functional.max_pool2d(h, 2)
        return feats

    fx = features(torch.from_numpy(img1))
    fy = features(torch.from_numpy(img2))
    total = 0.0
    for k, (a, b) in enumerate(zip(fx, fy)):
        d = (a - b) ** 2
        lin = torch.from_numpy(w[f"lin{k}_w"])[None, :, None, None]
        total = total + torch.sum(d * lin, dim=1).mean()  # 1x1 conv + mean
    return float(total)


def test_lpips_matches_torch(tmp_path, monkeypatch):
    rng = np.random.default_rng(7)
    w = random_weights(rng)
    path = str(tmp_path / "lpips_rand.npz")
    np.savez(path, **w)
    monkeypatch.setenv("MM3DGS_LPIPS_WEIGHTS", path)

    from mm3dgs_slam_tpu.eval import lpips as L

    L._load_weights.cache_clear()
    img1 = rng.uniform(0, 1, (3, 64, 80)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(0, 0.08, img1.shape), 0, 1).astype(np.float32)

    ours = L.lpips(img1, img2)
    ref = torch_lpips(img1, img2, w)
    L._load_weights.cache_clear()
    assert np.isfinite(ours)
    assert ours > 0
    assert abs(ours - ref) < 1e-4 * max(1.0, abs(ref)), (ours, ref)


def test_lpips_nan_without_weights(monkeypatch):
    from mm3dgs_slam_tpu.eval import lpips as L

    monkeypatch.delenv("MM3DGS_LPIPS_WEIGHTS", raising=False)
    L._load_weights.cache_clear()
    assert np.isnan(L.lpips(np.zeros((3, 8, 8), np.float32),
                            np.zeros((3, 8, 8), np.float32)))
    L._load_weights.cache_clear()


def test_lpips_proxy_orders_degradations():
    """The shipped random-VGG proxy must behave like a perceptual metric,
    not noise: zero at identity, strictly increasing along blur and noise
    severity ladders (the same fixture pattern that locks the NIQE
    ordering claim in test_quality.py). This is the substance behind
    reporting it as a REGRESSION signal."""
    import numpy as np
    from scipy.ndimage import gaussian_filter

    from mm3dgs_slam_tpu.eval.lpips import lpips_proxy

    rng = np.random.default_rng(7)
    base = gaussian_filter(rng.uniform(size=(3, 96, 128)), 2.0)
    base += 0.3 * gaussian_filter(rng.uniform(size=(3, 96, 128)), 0.8)
    base = ((base - base.min()) / np.ptp(base)).astype(np.float32)

    assert lpips_proxy(base, base) == 0.0

    blur_scores = [lpips_proxy(
        np.stack([gaussian_filter(c, s) for c in base]), base)
        for s in (0.5, 1.5, 3.0, 6.0)]
    assert all(np.isfinite(blur_scores))
    assert all(b > 0 for b in blur_scores)
    assert blur_scores == sorted(blur_scores), blur_scores

    noise_scores = [lpips_proxy(
        np.clip(base + rng.normal(0, s, base.shape).astype(np.float32),
                0, 1), base)
        for s in (0.01, 0.05, 0.15, 0.4)]
    assert all(np.isfinite(noise_scores))
    assert noise_scores == sorted(noise_scores), noise_scores

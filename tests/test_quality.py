"""NIQE scorer tests: both the full Mahalanobis pipeline (with a locally
fitted pristine model — same recipe as scripts/fit_niqe_model.py) and the
no-model MSCN proxy must rank progressively blurred frames monotonically
worse, which is what the mapper's window-min keyframe selection consumes
(slam/mapper.py:74-78,119-136).
"""
import numpy as np
import pytest
from scipy.ndimage import gaussian_filter

from mm3dgs_slam_tpu.eval.quality import (
    FrameQuality,
    niqe_patch_features,
    niqe_score,
)


def textured_image(rng, h=128, w=160):
    """Sharp natural-ish texture: multi-octave smoothed noise + edges."""
    img = np.zeros((h, w))
    for octave, s in [(1.0, 60), (2.0, 30), (4.0, 15), (8.0, 8)]:
        img += gaussian_filter(rng.normal(0, 1, (h, w)), octave) * s
    img += (np.linspace(0, 1, w)[None, :] > 0.5) * 40.0  # a hard edge
    img -= img.min()
    img *= 255.0 / max(img.max(), 1e-9)
    return img


@pytest.fixture(scope="module")
def pristine_model():
    rng = np.random.default_rng(3)
    feats = [niqe_patch_features(textured_image(rng), patch_size=32)
             for _ in range(8)]
    f = np.concatenate(feats, axis=0)
    return f.mean(axis=0), np.cov(f, rowvar=False)


def test_full_niqe_monotone_under_blur(pristine_model):
    mu, cov = pristine_model
    rng = np.random.default_rng(11)
    img = textured_image(rng)
    scores = [niqe_score(gaussian_filter(img, s), mu, cov, patch_size=32)
              for s in [0.0, 1.0, 2.5, 5.0]]
    assert all(b > a for a, b in zip(scores, scores[1:])), scores


def test_full_niqe_via_framequality_env(tmp_path, monkeypatch, pristine_model):
    mu, cov = pristine_model
    path = str(tmp_path / "niqe.npz")
    np.savez(path, mu=mu, cov=cov, patch_size=32)
    monkeypatch.setenv("MM3DGS_NIQE_MODEL", path)
    fq = FrameQuality()
    assert fq._model is not None
    rng = np.random.default_rng(5)
    img = textured_image(rng) / 255.0
    rgb = np.stack([img, img, img])
    sharp = fq(rgb)
    blurred = fq(np.stack([gaussian_filter(img, 3.0)] * 3))
    assert np.isfinite(sharp) and blurred > sharp


def test_shipped_model_is_default(monkeypatch):
    """With no env var and no explicit path, the packaged pristine model
    (assets/niqe_model.npz) loads and the full Mahalanobis NIQE runs."""
    monkeypatch.delenv("MM3DGS_NIQE_MODEL", raising=False)
    fq = FrameQuality()
    assert fq._model is not None and fq._patch == 96
    rng = np.random.default_rng(7)
    img = textured_image(rng, h=192, w=192) / 255.0
    sharp = fq(np.stack([img] * 3))
    blurred = fq(np.stack([gaussian_filter(img, 3.0)] * 3))
    assert np.isfinite(sharp) and blurred > sharp


def test_proxy_monotone_under_blur(monkeypatch):
    monkeypatch.delenv("MM3DGS_NIQE_MODEL", raising=False)
    fq = FrameQuality(model_path="/nonexistent/niqe.npz")
    assert fq._model is None
    rng = np.random.default_rng(9)
    img = textured_image(rng) / 255.0
    scores = [fq(np.stack([gaussian_filter(img, s)] * 3))
              for s in [0.0, 1.0, 2.5]]
    assert all(b > a for a, b in zip(scores, scores[1:])), scores

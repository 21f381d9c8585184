"""Loss parity tests: SSIM/L1/Pearson vs torch reference formulations."""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from mm3dgs_slam_tpu.ops import losses as L


def torch_ssim(img1, img2, window_size=11):
    """The reference SSIM (utils/loss_utils.py:95-154) re-expressed in torch
    for cross-checking."""
    from math import exp

    channel = img1.size(-3)
    gauss = torch.tensor(
        [exp(-((x - window_size // 2) ** 2) / (2 * 1.5**2)) for x in range(window_size)]
    )
    g = (gauss / gauss.sum()).unsqueeze(1)
    window = g.mm(g.t()).float().unsqueeze(0).unsqueeze(0)
    window = window.expand(channel, 1, window_size, window_size).contiguous()
    mu1 = F.conv2d(img1, window, padding=window_size // 2, groups=channel)
    mu2 = F.conv2d(img2, window, padding=window_size // 2, groups=channel)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    s1 = F.conv2d(img1 * img1, window, padding=window_size // 2, groups=channel) - mu1_sq
    s2 = F.conv2d(img2 * img2, window, padding=window_size // 2, groups=channel) - mu2_sq
    s12 = F.conv2d(img1 * img2, window, padding=window_size // 2, groups=channel) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    smap = ((2 * mu1_mu2 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return smap.mean()


def test_ssim_matches_torch():
    rng = np.random.default_rng(0)
    a = rng.uniform(size=(3, 40, 56)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.normal(size=a.shape).astype(np.float32), 0, 1)
    ours = float(L.ssim(jnp.asarray(a), jnp.asarray(b)))
    ref = float(torch_ssim(torch.tensor(a)[None], torch.tensor(b)[None]))
    assert ours == pytest.approx(ref, abs=2e-5)


def test_l1_masked_matches_fancy_indexing():
    rng = np.random.default_rng(1)
    a = rng.uniform(size=(3, 16, 20)).astype(np.float32)
    b = rng.uniform(size=(3, 16, 20)).astype(np.float32)
    mask = rng.uniform(size=(16, 20)) > 0.6
    ours = float(L.l1_loss(jnp.asarray(a), jnp.asarray(b), jnp.asarray(mask)))
    ref = np.abs(a - b)[:, mask].mean()
    assert ours == pytest.approx(float(ref), abs=1e-6)


def test_pearson_matches_numpy():
    rng = np.random.default_rng(2)
    x = rng.uniform(size=(30, 40)).astype(np.float32)
    y = (0.7 * x + 0.3 * rng.uniform(size=x.shape)).astype(np.float32)
    ours = float(L.pearson_corrcoef(jnp.asarray(x), jnp.asarray(y)))
    ref = np.corrcoef(x.ravel(), y.ravel())[0, 1]
    assert ours == pytest.approx(float(ref), abs=1e-5)


def test_pearson_masked():
    rng = np.random.default_rng(3)
    x = rng.uniform(size=(30, 40)).astype(np.float32)
    y = rng.uniform(size=(30, 40)).astype(np.float32)
    mask = rng.uniform(size=x.shape) > 0.5
    ours = float(L.pearson_corrcoef(jnp.asarray(x), jnp.asarray(y), jnp.asarray(mask)))
    ref = np.corrcoef(x[mask], y[mask])[0, 1]
    assert ours == pytest.approx(float(ref), abs=1e-5)


def test_pearson_loss_dual_hypothesis():
    """invert_estimate takes the min over (-est) and 1/(est+200)
    (utils/loss_utils.py:54-58)."""
    rng = np.random.default_rng(4)
    depth = rng.uniform(1, 5, size=(20, 20)).astype(np.float32)
    inv_est = (1.0 / depth).astype(np.float32)  # perfect inverse depth
    loss = float(L.pearson_loss(jnp.asarray(depth), jnp.asarray(inv_est),
                                invert_estimate=True))
    # -est correlates perfectly in rank but not linearly; 1/(est+200) is
    # nearly affine in depth... just assert the min-hypothesis is small
    assert loss < 0.2


def test_rel_pose_loss_zero_at_identity():
    p = jnp.array([0.9, 0.1, -0.2, 0.3, 1.0, 2.0, 3.0], jnp.float32)
    t_err, a_err = L.rel_pose_loss(p, p)
    assert float(t_err) == pytest.approx(0.0, abs=1e-6)
    assert float(a_err) == pytest.approx(0.0, abs=1e-3)


def test_scale_shift_ls_recovers_affine():
    from mm3dgs_slam_tpu.ops.depth import get_scale_shift_ls

    rng = np.random.default_rng(5)
    render_depth = rng.uniform(1, 5, size=(40, 50)).astype(np.float32)
    s_true, b_true = 0.8, 0.1
    est = ((1.0 / render_depth) - b_true) / s_true  # inverse-affine estimate
    s, b = get_scale_shift_ls(jnp.asarray(est), jnp.asarray(render_depth))
    assert float(s) == pytest.approx(s_true, abs=1e-4)
    assert float(b) == pytest.approx(b_true, abs=1e-4)
    # masked variant with zeros outside mask
    mask = rng.uniform(size=render_depth.shape) > 0.3
    rd = render_depth * mask  # invalid pixels have depth 0 -> inf inverse
    s2, b2 = get_scale_shift_ls(jnp.asarray(est), jnp.asarray(rd),
                                jnp.asarray(mask))
    assert float(s2) == pytest.approx(s_true, abs=1e-4)


def test_torch_style_median():
    from mm3dgs_slam_tpu.ops.depth import torch_style_median

    x = jnp.asarray(np.array([5.0, 1.0, 3.0, 2.0]))  # even count
    ours = float(torch_style_median(x))
    ref = float(torch.tensor([5.0, 1.0, 3.0, 2.0]).median())
    assert ours == ref == 2.0


def test_ate_umeyama_recovers_sim3():
    from mm3dgs_slam_tpu.eval.ate import align_umeyama, evaluate_ate_rmse

    rng = np.random.default_rng(6)
    traj = rng.normal(size=(50, 3))
    from scipy.spatial.transform import Rotation

    R = Rotation.from_euler("xyz", [0.3, -0.2, 0.5]).as_matrix()
    s, t = 1.7, np.array([1.0, -2.0, 0.5])
    traj2 = (s * (R @ traj.T)).T + t
    s_e, R_e, t_e = align_umeyama(traj2, traj)
    assert s_e == pytest.approx(s, abs=1e-6)
    assert np.allclose(R_e, R, atol=1e-6)

    # full pose-list ATE: zero after alignment
    poses_a = np.concatenate([np.tile([1, 0, 0, 0], (50, 1)), traj], axis=1)
    poses_b = np.concatenate([np.tile([1, 0, 0, 0], (50, 1)), traj2], axis=1)
    _, ate = evaluate_ate_rmse(poses_a, poses_b, method="umeyama")
    assert ate == pytest.approx(0.0, abs=1e-6)

"""Monocular depth estimation — MiDaS (gated on weights) + offline options.

The reference loads MiDaS DPT_Hybrid from torch.hub (utils/depth_utils.py:
102-131) and uses its *inverse/affine* depth output, rescaled per frame by
the LS scale/shift fit. Offline options, in decreasing fidelity:

  * ``MM3DGS_MIDAS_TS`` env var pointing at a TorchScript bundle produced by
    scripts/export_midas_weights.py — the real DPT_Hybrid, loadable with the
    baked-in torch-cpu, no egress needed,
  * ``dpt_model: "tiny_dpt"`` — a small JAX conv encoder/decoder trained on
    a target sequence via scripts/train_tiny_dpt.py; a genuinely *learned*
    estimator (image -> inverse depth) for end-to-end monocular runs where
    DPT weights can't be staged,
  * ``dpt_model: "synthetic_affine"`` — deterministic affine-inverse-depth
    oracle from GT depth, for tests of the scale-shift + Pearson plumbing.
"""
from __future__ import annotations

import os

import numpy as np


class MiDaS:
    """MiDaS DPT_Hybrid wrapper (CPU ok). estimate_depth(img[3,H,W] in [0,1])
    -> inverse depth [H, W] (float32 numpy). Prefers the offline TorchScript
    bundle (MM3DGS_MIDAS_TS) over torch.hub."""

    def __init__(self, device: str = "cpu"):
        import torch

        self.torch = torch
        ts_path = os.environ.get("MM3DGS_MIDAS_TS")
        if ts_path and os.path.exists(ts_path):
            self.model = torch.jit.load(ts_path, map_location="cpu")
        else:
            try:
                self.model = torch.hub.load("intel-isl/MiDaS", "DPT_Hybrid")
            except Exception as e:  # no egress / no cache
                raise RuntimeError(
                    "MiDaS weights unavailable (offline environment). Export "
                    "a TorchScript bundle with scripts/export_midas_weights.py "
                    "and set MM3DGS_MIDAS_TS, or use use_gt_depth: true, "
                    "dpt_model: 'tiny_dpt' (scripts/train_tiny_dpt.py), or "
                    "dpt_model: 'synthetic_affine' for pipeline testing."
                ) from e
        self.model.eval()
        for p in self.model.parameters():
            p.requires_grad = False

    def estimate_depth(self, img_chw: np.ndarray) -> np.ndarray:
        torch = self.torch
        t = torch.from_numpy(np.asarray(img_chw, dtype=np.float32))
        h, w = t.shape[1:3]
        norm = (t[None] - 0.5) / 0.5
        norm = torch.nn.functional.interpolate(
            norm, size=(384, 512), mode="bilinear", align_corners=False
        )
        with torch.no_grad():
            pred = self.model(norm)
            pred = torch.nn.functional.interpolate(
                pred.unsqueeze(1), size=(h, w), mode="bilinear", align_corners=False
            ).squeeze()
        return pred.numpy().astype(np.float32)


class TinyDPT:
    """Small JAX conv encoder/decoder monocular inverse-depth estimator.

    A genuinely learned image->inverse-depth net (3 stride-2 encoder stages,
    skip-connected nearest-upsample decoder, softplus head) standing in for
    DPT_Hybrid where its weights can't be staged. Train with
    scripts/train_tiny_dpt.py; weights are an .npz whose path comes from the
    ``dpt_weights`` config key or ``MM3DGS_TINY_DPT_WEIGHTS``. Output feeds
    the same LS scale-shift + Pearson pipeline as MiDaS output (SLAM.py:
    411-448) — both are affine-invariant inverse depth.
    """

    CH = (16, 32, 64)

    def __init__(self, weights_path: str | None = None):
        path = weights_path or os.environ.get("MM3DGS_TINY_DPT_WEIGHTS")
        if not path or not os.path.exists(path):
            raise RuntimeError(
                "tiny_dpt weights not found; train them with "
                "scripts/train_tiny_dpt.py and set dpt_weights / "
                "MM3DGS_TINY_DPT_WEIGHTS."
            )
        self.params = {k: np.asarray(v) for k, v in np.load(path).items()}
        self._fwd = None

    @staticmethod
    def init_params(rng: np.random.Generator) -> dict:
        p = {}
        cin = 3
        for i, c in enumerate(TinyDPT.CH):
            p[f"enc{i}_w"] = (rng.normal(0, 1, (c, cin, 3, 3))
                              / np.sqrt(cin * 9)).astype(np.float32)
            p[f"enc{i}_b"] = np.zeros((c,), np.float32)
            cin = c
        chs = TinyDPT.CH
        for i in range(len(chs) - 1, 0, -1):
            cin_d = chs[i] + chs[i - 1]  # upsampled + skip
            p[f"dec{i}_w"] = (rng.normal(0, 1, (chs[i - 1], cin_d, 3, 3))
                              / np.sqrt(cin_d * 9)).astype(np.float32)
            p[f"dec{i}_b"] = np.zeros((chs[i - 1],), np.float32)
        p["head_w"] = (rng.normal(0, 1, (1, chs[0], 3, 3))
                       / np.sqrt(chs[0] * 9)).astype(np.float32)
        p["head_b"] = np.zeros((1,), np.float32)
        return p

    @staticmethod
    def forward(params: dict, img: "object"):
        """img: [3, H, W] in [0,1] (H, W multiples of 8) -> inv depth [H, W]."""
        import jax
        import jax.numpy as jnp

        def conv(x, w, b, stride=1):
            return jax.lax.conv_general_dilated(
                x, w, (stride, stride), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + b[None, :, None, None]

        h = (jnp.asarray(img)[None] - 0.5) * 2.0
        skips = []
        for i in range(len(TinyDPT.CH)):
            h = jax.nn.relu(conv(h, jnp.asarray(params[f"enc{i}_w"]),
                                 jnp.asarray(params[f"enc{i}_b"]), stride=2))
            skips.append(h)
        for i in range(len(TinyDPT.CH) - 1, 0, -1):
            up = jnp.repeat(jnp.repeat(h, 2, axis=2), 2, axis=3)
            h = jnp.concatenate([up, skips[i - 1]], axis=1)
            h = jax.nn.relu(conv(h, jnp.asarray(params[f"dec{i}_w"]),
                                 jnp.asarray(params[f"dec{i}_b"])))
        out = conv(h, jnp.asarray(params["head_w"]),
                   jnp.asarray(params["head_b"]))
        out = jax.nn.softplus(out)[0, 0]
        return jnp.repeat(jnp.repeat(out, 2, axis=0), 2, axis=1)

    def estimate_depth(self, img_chw: np.ndarray) -> np.ndarray:
        import jax

        if self._fwd is None:
            self._fwd = jax.jit(lambda p, x: TinyDPT.forward(p, x))
        h, w = img_chw.shape[1:]
        h8, w8 = -(-h // 8) * 8, -(-w // 8) * 8
        img = np.zeros((3, h8, w8), np.float32)
        img[:, :h, :w] = img_chw
        out = np.asarray(self._fwd(self.params, img))
        return out[:h, :w].astype(np.float32)

    @staticmethod
    def fit(imgs: np.ndarray, invs: np.ndarray, steps: int = 600,
            lr: float = 3e-3, seed: int = 0, verbose: bool = False) -> dict:
        """Fit TinyDPT on [N,3,H,W] images / [N,H,W] inverse depths (H, W
        multiples of 8) with a scale/shift-invariant loss; returns the best
        params dict (numpy). Used by scripts/train_tiny_dpt.py and tests."""
        import jax
        import jax.numpy as jnp
        import optax

        rng = np.random.default_rng(seed)
        params = {k: jnp.asarray(v) for k, v in TinyDPT.init_params(rng).items()}
        imgs = jnp.asarray(imgs)
        invs = jnp.asarray(invs)

        def ssi_loss(pred, target):
            x = pred.reshape(-1)
            y = target.reshape(-1)
            xs = (x - x.mean()) / jnp.sqrt(jnp.var(x) + 1e-6)
            ys = (y - y.mean()) / jnp.sqrt(jnp.var(y) + 1e-6)
            return jnp.mean((xs - ys) ** 2)

        opt = optax.adam(lr)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, img, inv):
            loss, g = jax.value_and_grad(
                lambda p: ssi_loss(TinyDPT.forward(p, img), inv))(params)
            updates, opt_state = opt.update(g, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        n = imgs.shape[0]
        best = (np.inf, params)
        for it in range(steps):
            i = int(rng.integers(0, n))
            params, opt_state, loss = step(params, opt_state, imgs[i], invs[i])
            lf = float(loss)
            if lf < best[0]:
                best = (lf, params)
            if verbose and (it % 100 == 0 or it == steps - 1):
                print(f"step {it}: ssi_loss={lf:.6f} (best {best[0]:.6f})")
        return {k: np.asarray(v) for k, v in best[1].items()}


class SyntheticAffineDepth:
    """Affine inverse-depth oracle for offline testing: 1/(a*z + b) + noise.

    Exercises exactly the code paths MiDaS output flows through
    (scale-shift LS fit, Pearson losses) without pretrained weights.
    """

    def __init__(self, a: float = 0.8, b: float = 0.1, noise: float = 0.0, seed=0):
        self.a, self.b, self.noise = a, b, noise
        self.rng = np.random.default_rng(seed)
        self.gt_depth: np.ndarray | None = None  # set per frame by the caller

    def estimate_depth(self, img_chw: np.ndarray) -> np.ndarray:
        assert self.gt_depth is not None, "set .gt_depth before calling"
        z = np.maximum(self.gt_depth, 1e-3)
        inv = self.a * (1.0 / z) + self.b
        if self.noise:
            inv = inv + self.noise * self.rng.standard_normal(inv.shape)
        return inv.astype(np.float32)


def get_dpt(model: str, device: str = "cpu", weights: str | None = None):
    m = model.lower()
    if m == "midas":
        return MiDaS(device)
    if m == "tiny_dpt":
        return TinyDPT(weights)
    if m == "synthetic_affine":
        return SyntheticAffineDepth()
    raise ValueError(f"Unknown depth estimate model {model}")

#!/usr/bin/env python
"""Export LPIPS-VGG weights to the npz schema eval/lpips.py consumes.

The reference bundles lpipsPyTorch, which downloads torchvision VGG16
IMAGENET1K_V1 features (lpipsPyTorch/modules/networks.py:90-96) and the
richzhang v0.1 linear heads (modules/utils.py:11-30) at call time. This
environment has no egress, so run this script ONCE on a machine with
internet + torchvision, then point `MM3DGS_LPIPS_WEIGHTS` at the output:

    python scripts/export_lpips_weights.py --out lpips_vgg.npz
    export MM3DGS_LPIPS_WEIGHTS=/path/to/lpips_vgg.npz

Schema (consumed by mm3dgs_slam_tpu/eval/lpips.py):
  conv{i}_w  [O, I, 3, 3] float32   13 VGG16 conv kernels, in feature order
  conv{i}_b  [O] float32
  lin{k}_w   [C_k] float32          5 linear-head weights (1x1 conv, squeezed)
"""
import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg.npz")
    args = ap.parse_args()

    import torch
    from torchvision import models

    feats = models.vgg16(weights=models.VGG16_Weights.IMAGENET1K_V1).features
    out = {}
    li = 0
    for layer in feats:
        if isinstance(layer, torch.nn.Conv2d):
            out[f"conv{li}_w"] = layer.weight.detach().numpy().astype(np.float32)
            out[f"conv{li}_b"] = layer.bias.detach().numpy().astype(np.float32)
            li += 1
    assert li == 13, f"expected 13 VGG16 convs, got {li}"

    url = ("https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
           "master/lpips/weights/v0.1/vgg.pth")
    sd = torch.hub.load_state_dict_from_url(url, progress=True,
                                            map_location="cpu")
    # keys: lin{k}.model.1.weight [1, C, 1, 1]
    for k in range(5):
        w = sd[f"lin{k}.model.1.weight"].detach().numpy()
        out[f"lin{k}_w"] = w.reshape(-1).astype(np.float32)

    np.savez(args.out, **out)
    print(f"wrote {args.out} ({len(out)} arrays)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Export MiDaS DPT_Hybrid as a self-contained TorchScript bundle.

The reference loads DPT_Hybrid from torch.hub at runtime
(utils/depth_utils.py:102-110), which needs internet for both the model code
(intel-isl/MiDaS repo) and the checkpoint. Run this ONCE on a machine with
egress; the traced .pt bundles code + weights, so the zero-egress runtime
can load it with plain torch (which is baked into the TPU image):

    python scripts/export_midas_weights.py --out midas_dpt_hybrid.pt
    export MM3DGS_MIDAS_TS=/path/to/midas_dpt_hybrid.pt

mm3dgs_slam_tpu/eval/depth_est.py's MiDaS wrapper prefers this file over
torch.hub and feeds it the reference's exact preprocessing (x2-1 normalize +
bilinear resize to 384x512, depth_utils.py:116-131).
"""
import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="midas_dpt_hybrid.pt")
    args = ap.parse_args()

    import torch

    model = torch.hub.load("intel-isl/MiDaS", "DPT_Hybrid")
    model.eval()
    for p in model.parameters():
        p.requires_grad = False
    example = torch.zeros(1, 3, 384, 512)
    with torch.no_grad():
        traced = torch.jit.trace(model, example)
    traced.save(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

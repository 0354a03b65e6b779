"""Convert torchvision VGG16 + lpips 'vgg.pth' linear heads into the .npz
format materialrefgs_tpu.train.lpips consumes.

Usage:
  python scripts/convert_lpips_weights.py \
      --vgg16 vgg16-397923af.pth --lin vgg.pth --out assets/lpips_vgg.npz

The two input files are the standard public checkpoints (torchvision
`VGG16_Weights.IMAGENET1K_V1` state dict; `lpips` package
`lpips/weights/v0.1/vgg.pth`). This environment has no network access, so
they must be supplied by the user.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vgg16", required=True)
    ap.add_argument("--lin", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import torch

    vgg = torch.load(args.vgg16, map_location="cpu", weights_only=True)
    lin = torch.load(args.lin, map_location="cpu", weights_only=True)

    out = {}
    # torchvision vgg16 'features.{idx}.weight' indices of the 13 convs.
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    for i, ci in enumerate(conv_idx):
        w = vgg[f"features.{ci}.weight"].numpy()  # (Cout, Cin, kh, kw)
        b = vgg[f"features.{ci}.bias"].numpy()
        out[f"conv{i}_w"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)  # HWIO
        out[f"conv{i}_b"] = b.astype(np.float32)
    for j in range(5):
        # lpips lin layers: 'lin{j}.model.1.weight' (1, C, 1, 1)
        key = f"lin{j}.model.1.weight"
        w = lin[key].numpy().reshape(-1)
        out[f"lin{j}"] = w.astype(np.float32)

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **out)
    print(f"wrote {args.out} ({len(out)} arrays)")


if __name__ == "__main__":
    main()

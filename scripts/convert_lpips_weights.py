#!/usr/bin/env python
"""Convert torch LPIPS(vgg) weights to the framework's npz format.

The reference's eval_color uses lpips.LPIPS(net='vgg')
(ref scenerf/scripts/evaluation/eval_color.py:16), whose weights are a
torchvision VGG16 backbone + 5 linear calibration heads. This environment has
no network egress, so acquisition is offline:

  on a machine WITH network access:
    python - <<'EOF'
    import torch, torchvision, lpips
    torch.save(torchvision.models.vgg16(weights='IMAGENET1K_V1').state_dict(),
               'vgg16.pth')
    torch.save(lpips.LPIPS(net='vgg').state_dict(), 'lpips_vgg.pth')
    EOF

  then here:
    python scripts/convert_lpips_weights.py \
        --vgg vgg16.pth --lpips lpips_vgg.pth --out lpips_vgg.npz

  and pass --lpips_weights lpips_vgg.npz to scenerf-eval-color[-bf].
"""
from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--vgg", required=True,
                    help="torchvision vgg16 state dict (.pth)")
    ap.add_argument("--lpips", required=True,
                    help="lpips.LPIPS(net='vgg') state dict (.pth)")
    ap.add_argument("--out", required=True, help="output .npz path")
    args = ap.parse_args()

    from scenerf_tpu.utils.lpips import LPIPS

    metric = LPIPS.from_torch_checkpoint(args.vgg, args.lpips)
    metric.to_npz(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Offline body-mask generation for uncovered RGB frames.

Reference parity (reference: get_mask.py:32-105): the reference runs
torchvision's deeplabv3_resnet101 person segmentation, gaussian-blurs and
binarizes, writing masks/uncover/*.png.  torchvision is not available in
this image, so this tool uses deeplab when importable and otherwise a
luminance/background-model segmentation fallback (adequate for the
synthetic smoke datasets; real SLP masks should be produced with deeplab).
"""

from __future__ import annotations

import argparse
import os
from os.path import join

import numpy as np

parser = argparse.ArgumentParser()
parser.add_argument("--slp_root", default=None, help="SLP danaLab root (default: config)")
parser.add_argument("--subjects", default="1-101", help="subject range, e.g. 1-101")


def _deeplab_mask(img):  # pragma: no cover - requires torchvision
    import torch
    import torchvision

    model = torchvision.models.segmentation.deeplabv3_resnet101(pretrained=True).eval()
    x = torch.from_numpy(img.astype(np.float32) / 255.0).permute(2, 0, 1)[None]
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    with torch.no_grad():
        out = model((x - mean) / std)["out"][0]
    return (out.argmax(0) == 15).numpy().astype(np.uint8) * 255  # class 15 = person


def _fallback_mask(img):
    """Background-difference segmentation: works when the bed background
    dominates the frame borders."""
    from scipy.ndimage import gaussian_filter

    gray = img.mean(axis=2)
    border = np.concatenate([gray[:10].ravel(), gray[-10:].ravel(),
                             gray[:, :10].ravel(), gray[:, -10:].ravel()])
    bg = np.median(border)
    diff = gaussian_filter(np.abs(gray - bg), 3)
    thr = max(diff.mean() + diff.std(), 10.0)
    return (diff > thr).astype(np.uint8) * 255


def main():
    import cv2

    from inbed_pose_estimation_tpu import config

    args = parser.parse_args()
    root = args.slp_root or config.SLP_ROOT
    lo, hi = (int(x) for x in args.subjects.split("-"))

    try:
        import torchvision  # noqa: F401

        segment = _deeplab_mask
        print("Using deeplabv3_resnet101 segmentation")
    except ImportError:
        segment = _fallback_mask
        print("torchvision unavailable: using background-difference fallback")

    for s in range(lo, hi + 1):
        sub = f"{s:05d}"
        rgb_dir = join(root, sub, "RGB", "uncover")
        if not os.path.isdir(rgb_dir):
            continue
        out_dir = join(root, sub, "masks", "uncover")
        os.makedirs(out_dir, exist_ok=True)
        for fn in sorted(os.listdir(rgb_dir)):
            img = cv2.imread(join(rgb_dir, fn))
            if img is None:
                continue
            mask = segment(img[:, :, ::-1])
            cv2.imwrite(join(out_dir, fn.replace("image_", "")), mask)
        print(f"subject {sub}: masks written to {out_dir}")


if __name__ == "__main__":
    main()

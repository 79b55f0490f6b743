"""Build the offline pre-decoded crop cache (data/crop_cache.py).

Decodes every image a split will ever read (9 per sample:
dataset.py:278-345) ONCE, stores worst-case-augmentation-sized uint8
patches in a packed memmap, and lets train.py/eval.py replace all per-step
cv2.imread calls with memmap reads via ``--crop_cache DIR``.  The cache is
bit-exact versus the disk path (see data/crop_cache.py module doc).

Usage:
    python -m inbed_pose_estimation_tpu.tools.build_crop_cache \
        --dataset slp-4mod-train --out /path/to/cache [--eval] \
        [--scale_factor 0.15]

The reference has no analogue (its loader decodes per epoch,
datasets/base_dataset.py:255-353); this is the TPU-native answer to
SURVEY §3.3's input-pipeline bound.
"""

from __future__ import annotations

import argparse
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--dataset", required=True,
                   help="Dataset name (config.DATASET_FILES key), e.g. "
                        "slp-4mod-train or slp-4mod-uncover")
    p.add_argument("--out", required=True, help="Cache output directory")
    p.add_argument("--eval", action="store_true",
                   help="Build for the eval split (default: train split)")
    p.add_argument("--img_res", type=int, default=224)
    p.add_argument("--scale_factor", type=float, default=0.15,
                   help="Augmentation scale range the margin must cover "
                        "(must be >= the --scale_factor used in training)")
    p.add_argument("--progress_every", type=int, default=500)
    args = p.parse_args(argv)

    from ..data.crop_cache import build_crop_cache
    from ..data.dataset import BaseDataset

    class _Opt:
        img_res = args.img_res
        scale_factor = args.scale_factor

    ds = BaseDataset(_Opt(), args.dataset, is_train=not args.eval)
    t0 = time.time()
    path = build_crop_cache(
        ds, args.out,
        scale_margin=1.0 + args.scale_factor,
        progress_every=args.progress_every,
    )
    dt = time.time() - t0
    print(f"built {path} ({len(ds)} samples) in {dt:.1f}s")


if __name__ == "__main__":
    main()

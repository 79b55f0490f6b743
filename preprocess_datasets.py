#!/usr/bin/env python
"""Offline dataset preprocessing orchestrator.

Reference parity (reference: preprocess_datasets.py:29-57):
    python preprocess_datasets.py --train_files   # slp_4mod_train.npz
    python preprocess_datasets.py --eval_files    # slp_4mod_{uncover,cover1,cover2}.npz
"""

from __future__ import annotations

import argparse

from inbed_pose_estimation_tpu import config
from inbed_pose_estimation_tpu.tools.preprocess import (
    TEST_SUBJECTS,
    TRAIN_SUBJECTS,
    slp_multi_mod,
)

parser = argparse.ArgumentParser()
parser.add_argument("--train_files", default=False, action="store_true")
parser.add_argument("--eval_files", default=False, action="store_true")


def main():
    args = parser.parse_args()
    out_path = config.DATASET_NPZ_PATH

    if args.eval_files:
        for out_name, cover in [
            ("slp_4mod_uncover.npz", ["uncover"]),
            ("slp_4mod_cover1.npz", ["cover1"]),
            ("slp_4mod_cover2.npz", ["cover2"]),
        ]:
            slp_multi_mod(config.SLP_ROOT, out_path, out_name, cover, TEST_SUBJECTS)

    if args.train_files:
        slp_multi_mod(
            config.SLP_ROOT, out_path, "slp_4mod_train.npz",
            ["uncover", "cover1", "cover2"], TRAIN_SUBJECTS,
        )


if __name__ == "__main__":
    main()

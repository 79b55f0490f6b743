#!/usr/bin/env python
"""Loader-only A/B microbenchmark for the host input pipeline.

Measures ONLY the data-production cost (decode + crop/resize + augment +
collate) that `--crop_cache` and `--fast_preprocess` change, with no TPU
dispatch/sync or checkpointing in the loop — the full-`train.py` A/Bs are
hopelessly noisy on this 1-core shared host because any concurrent process
(including the build agent itself) perturbs a multi-second wall step.

Protocol: the requested configs are built once, then timed in interleaved
rounds (A,B,C,A,B,C,...) so slow drift in host load cancels across configs;
per-batch times are reported as median/IQR over all rounds.  Augmentation
RNG is reseeded per round so every config draws the same augmentation
sequence (the crop-cache path must do the same work, just from pre-decoded
pixels; reference per-step work: datasets/base_dataset.py __getitem__).

Usage (env INBED_DATA_ROOT/INBED_NPZ_PATH must point at a dataset tree):

    python -m inbed_pose_estimation_tpu.tools.loader_bench \
        --dataset SLP-4mod-train --batch_size 32 --batches 6 --rounds 5 \
        --crop_cache /tmp/ab_cache
"""

from __future__ import annotations

import argparse
import json
import time
import types

import numpy as np


def build_dataset(ds_name: str, img_res: int, cache_dir, fast: bool, noise_factor,
                  rot_factor, scale_factor):
    from inbed_pose_estimation_tpu.data import BaseDataset

    options = types.SimpleNamespace(
        img_res=img_res,
        noise_factor=noise_factor,
        rot_factor=rot_factor,
        scale_factor=scale_factor,
        ignore_3d=False,
        uint8_feed=True,
        fast_preprocess=fast,
        crop_cache=cache_dir,
    )
    return BaseDataset(options, ds_name, is_train=True)


def time_config(ds, indices_per_batch, seed: int) -> list:
    """Produce the given batches synchronously, one timed call per batch."""
    from inbed_pose_estimation_tpu.data.loader import collate

    # Reseed augmentation draws so configs compare on identical work
    # (BaseDataset.__getitem__ accepts an explicit rng).
    rng = np.random.default_rng(seed)
    times = []
    for indices in indices_per_batch:
        t0 = time.perf_counter()
        batch = collate([ds.__getitem__(int(i), rng=rng) for i in indices])
        # Touch the big array so lazy work (none expected) can't hide.
        _ = batch["img"].ravel()[0]
        times.append(time.perf_counter() - t0)
    return times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="SLP-4mod-train")
    ap.add_argument("--img_res", type=int, default=224)
    ap.add_argument("--batch_size", type=int, default=32)
    ap.add_argument("--batches", type=int, default=6, help="batches per round per config")
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--crop_cache", default=None, help="cache dir for the cache configs")
    # Defaults mirror train/options.py so a cache built for a train run
    # is accepted (the cache refuses smaller-margin builds).
    ap.add_argument("--noise_factor", type=float, default=0.4)
    ap.add_argument("--rot_factor", type=float, default=15.0)
    ap.add_argument("--scale_factor", type=float, default=0.15)
    args = ap.parse_args()

    specs = [("disk", None, False), ("disk+fast", None, True)]
    if args.crop_cache:
        specs += [("cache", args.crop_cache, False), ("cache+fast", args.crop_cache, True)]

    datasets = {}
    for name, cache, fast in specs:
        datasets[name] = build_dataset(args.dataset, args.img_res, cache, fast,
                                       args.noise_factor, args.rot_factor,
                                       args.scale_factor)
    n = len(datasets["disk"])
    rng = np.random.default_rng(0)

    # One warmup batch per config (imports, file handles, memmap pagein).
    warm = rng.integers(0, n, size=args.batch_size)
    for name in datasets:
        time_config(datasets[name], [warm], seed=999)

    results = {name: [] for name in datasets}
    for r in range(args.rounds):
        batches = [rng.integers(0, n, size=args.batch_size) for _ in range(args.batches)]
        for name in datasets:  # interleave configs inside each round
            results[name] += time_config(datasets[name], batches, seed=1000 + r)

    out = {}
    for name, ts in results.items():
        ms = np.asarray(ts) * 1e3
        out[name] = {
            "median_ms": round(float(np.median(ms)), 1),
            "iqr_ms": [round(float(np.percentile(ms, 25)), 1),
                       round(float(np.percentile(ms, 75)), 1)],
            "n": len(ms),
        }
    base = out["disk"]["median_ms"]
    for name in out:
        out[name]["speedup_vs_disk"] = round(base / out[name]["median_ms"], 2)
    print(json.dumps({"batch_size": args.batch_size, "img_res": args.img_res,
                      "dataset": args.dataset, "configs": out}))


if __name__ == "__main__":
    main()

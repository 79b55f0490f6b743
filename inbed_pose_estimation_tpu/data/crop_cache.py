"""Offline pre-decoded crop cache: kills the host JPEG/PNG decode bound.

The steady train step reads 9 images per sample (4 covered + 4 uncovered +
the uncover mask — dataset.py:278-345); at batch 32 that is 288
`cv2.imread` calls per step, which dominates the data phase on few-core
hosts (PARITY.md input-pipeline table: 220-350 ms/step of decode).  The
reference has the same bound (datasets/base_dataset.py:255-353, cv2.imread
per item per epoch) and no cache.

TPU-native fix: decode ONCE offline.  For every sample we store the uint8
pixels of a patch that covers the *worst-case* augmented crop box — the
box `crop()` (transforms.py:100-127) can touch for any draw of the
augmentation distribution (scale <= 1+scale_factor, |rot| <= 2*rot_factor;
dataset.py:132-146) — packed into one flat memmap plus an npz index.  At
train time the patch is pasted into a zero canvas of the original image
shape and fed through the UNCHANGED processing path, which makes the fast
path bit-exact by construction:

  * `crop()` only reads pixels inside its ul..br box, which the margin
    guarantees lies inside the patch;
  * pixels outside the original image are zero both in the paste canvas
    and in `crop()`'s own zero padding (transforms.py:115-121);
  * `bytescale`'s min/max is computed over that box only, so the contrast
    stretch sees identical bytes.

Covered/uncovered patches dedupe automatically: when the cover->uncover
filename rewrite (dataset.py:331-332) is a no-op (uncover splits), the
uncovered modality points at the covered patch's bytes.

Build with ``python -m inbed_pose_estimation_tpu.tools.build_crop_cache``;
consume via ``--crop_cache DIR`` (train/options.py).  The index records the
margin factors it was built for; a dataset whose augmentation range
exceeds them refuses the cache (falls back to disk reads) rather than
silently under-covering.
"""

from __future__ import annotations

import hashlib
import json
import os
from os.path import join
from typing import Dict, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

# Modality order in the packed file.  *_unc are the uncovered counterparts
# (filename-rewritten reads, dataset.py:331-345); mask_unc is the uncover
# body mask (PM_aligned -> masks rewrite).
MODALITIES = (
    "img", "ir", "depth", "pm",
    "img_unc", "ir_unc", "depth_unc", "pm_unc", "mask_unc",
)
_RGB = {"img", "img_unc"}


def patch_half_extent(scale: float, scale_margin: float, rotating: bool) -> int:
    """Worst-case half-side of the crop box around `center`.

    crop()'s box is ul..br with side ~= 200*scale*sc (+-2px of corner
    rounding, transforms.py:104-105); under rotation the box is extended by
    `pad` to side*sqrt(2) before rotating (transforms.py:107-110).
    """
    half = 100.0 * float(scale) * float(scale_margin)
    if rotating:
        half *= np.sqrt(2.0)
    return int(np.ceil(half)) + 6


def cache_paths(cache_dir: str, dataset_name: str, is_train: bool) -> Tuple[str, str]:
    stem = join(cache_dir, f"{dataset_name}_{'train' if is_train else 'test'}")
    return stem + ".bin", stem + ".idx.npz"


def index_fingerprint(center, scale, imgname) -> str:
    """Hash of the npz-index fields the patch extents depend on.  A
    re-extracted index with the same length but shifted boxes must refuse
    the cache (the stored patches would under-cover), so the cache records
    this at build time and the dataset compares at load time."""
    h = hashlib.sha1()
    h.update(np.ascontiguousarray(np.asarray(center, np.float64)).tobytes())
    h.update(np.ascontiguousarray(np.asarray(scale, np.float64)).tobytes())
    h.update("\n".join(str(n) for n in imgname).encode())
    return h.hexdigest()


def source_paths(dataset):
    """Deduped resolved paths of every file the cache build can read: the
    four covered modalities, their cover->uncover rewrites, and the uncover
    body mask (same resolution logic as build_crop_cache).  Deliberately
    independent of the has* fallback flags so the fingerprint is stable
    across flag toggles (a superset of what any configuration reads)."""
    paths = set()
    for i in range(len(dataset)):
        img_p = join(dataset.img_dir, str(dataset.imgname[i]))
        ir_p = join(dataset.img_dir, str(dataset.irimgname[i]))
        depth_p = join(dataset.img_dir, str(dataset.depthname[i]))
        pm_p = join(dataset.img_dir, str(dataset.pmname[i]))
        for p in (img_p, ir_p, depth_p, pm_p):
            paths.add(p)
            paths.add(p.replace("cover1", "uncover").replace("cover2", "uncover"))
        paths.add(pm_p.replace("cover1", "uncover").replace("cover2", "uncover")
                  .replace("PM_aligned", "masks"))
    return sorted(paths)


def dataset_fingerprint(dataset) -> str:
    """index_fingerprint + per-file (size, mtime_ns) of every source image.

    Folding file stats in means images re-generated or re-aligned ON DISK
    under the same names invalidate the cache instead of silently serving
    stale pixels (ADVICE r4).  mtime is deliberately conservative: a
    touched-but-identical file refuses the cache (one rebuild) rather than
    risking stale serves."""
    h = hashlib.sha1()
    h.update(index_fingerprint(
        dataset.center, dataset.scale, dataset.imgname).encode())
    for p in source_paths(dataset):
        try:
            st = os.stat(p)
            h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}\n".encode())
        except OSError:
            h.update(f"{p}:missing\n".encode())
    return h.hexdigest()


def build_crop_cache(
    dataset,
    cache_dir: str,
    scale_margin: Optional[float] = None,
    progress_every: int = 0,
) -> str:
    """Pre-decode `dataset` (a BaseDataset) into `<dir>/<name>_<split>`.

    `scale_margin` defaults to 1 + scale_factor from the dataset's options
    (the augmentation's max scale draw); eval datasets (no augmentation)
    still get the full margin so one cache serves both.
    """
    if scale_margin is None:
        scale_margin = 1.0 + float(getattr(dataset.options, "scale_factor", 0.15))
    os.makedirs(cache_dir, exist_ok=True)
    bin_path, idx_path = cache_paths(cache_dir, dataset.dataset, dataset.is_train)

    n = len(dataset)
    offsets = np.zeros((n, len(MODALITIES)), np.int64)
    shapes = np.zeros((n, len(MODALITIES), 3), np.int32)
    orig_shapes = np.zeros((n, len(MODALITIES), 2), np.int32)
    # Patch (x0, y0) per modality: the stored patch is the crop-box margin
    # CLAMPED to the image bounds (pixels outside the image are zero in
    # both crop()'s padding and the paste canvas, so storing them would be
    # pure waste — and modalities can have different image sizes).
    origins = np.zeros((n, len(MODALITIES), 2), np.int32)

    def read_u8(path, gray):
        img = cv2.imread(path, 0) if gray else cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        return img if gray else img[:, :, ::-1]  # BGR->RGB like _read_rgb

    pos = 0
    with open(bin_path, "wb") as f:
        for i in range(n):
            center = dataset.center[i]
            half = patch_half_extent(dataset.scale[i], scale_margin, rotating=True)
            cx, cy = int(round(float(center[0]))), int(round(float(center[1])))
            x0, y0, x1, y1 = cx - half, cy - half, cx + half, cy + half

            def unc(p):
                return p.replace("cover1", "uncover").replace("cover2", "uncover")

            img_p = join(dataset.img_dir, str(dataset.imgname[i]))
            ir_p = join(dataset.img_dir, str(dataset.irimgname[i]))
            depth_p = join(dataset.img_dir, str(dataset.depthname[i]))
            pm_p = join(dataset.img_dir, str(dataset.pmname[i]))
            names = {
                "img": (img_p, False),
                "ir": (ir_p, dataset.hasIR),
                "depth": (depth_p, dataset.hasDEPTH),
                "pm": (pm_p, dataset.hasPM),
            }
            # Missing COVERED modalities fall back to the RGB read
            # (dataset.py:313-315: `... if self.hasIR else _read_rgb(imgname)`).
            for k in ("ir", "depth", "pm"):
                if not names[k][1]:
                    names[k] = (img_p, False)
            # The UNCOVERED reads are NOT gated on has* — the dataset always
            # does `_read_gray(unc(<modality name>))` on the ORIGINAL path
            # (dataset.py:378-380), so the unc entries must use the original
            # paths with gray=True (img_unc stays an RGB read).
            names["img_unc"] = (unc(img_p), False)
            names["ir_unc"] = (unc(ir_p), True)
            names["depth_unc"] = (unc(depth_p), True)
            names["pm_unc"] = (unc(pm_p), True)
            # The mask read is unconditionally grayscale (dataset.py:381).
            names["mask_unc"] = (unc(pm_p).replace("PM_aligned", "masks"), True)

            written: Dict[Tuple[str, bool], int] = {}
            for m, modality in enumerate(MODALITIES):
                path, gray = names[modality]
                key = (path, gray)
                if key in written:  # dedupe identical reads (uncover splits)
                    j = written[key]
                    offsets[i, m] = offsets[i, j]
                    shapes[i, m] = shapes[i, j]
                    orig_shapes[i, m] = orig_shapes[i, j]
                    origins[i, m] = origins[i, j]
                    continue
                img = read_u8(path, gray)
                H, W = img.shape[:2]
                px0, py0 = max(0, x0), max(0, y0)
                px1, py1 = min(W, max(px0, x1)), min(H, max(py0, y1))
                patch = np.ascontiguousarray(img[py0:py1, px0:px1])
                if patch.ndim == 2:
                    patch = patch[:, :, None]
                offsets[i, m] = pos
                shapes[i, m] = patch.shape
                orig_shapes[i, m] = (H, W)
                origins[i, m] = (px0, py0)
                f.write(patch.tobytes())
                pos += patch.nbytes
                written[key] = m
            if progress_every and (i + 1) % progress_every == 0:
                print(f"crop cache: {i + 1}/{n} samples, {pos / 1e6:.1f} MB")

    np.savez(
        idx_path,
        offsets=offsets,
        shapes=shapes,
        orig_shapes=orig_shapes,
        origins=origins,
        total_bytes=np.int64(pos),
        meta=np.bytes_(json.dumps({
            "dataset": dataset.dataset,
            "is_train": bool(dataset.is_train),
            "num_samples": int(n),
            "scale_margin": float(scale_margin),
            "rot_covered": True,
            "modalities": list(MODALITIES),
            "index_fingerprint": dataset_fingerprint(dataset),
        }).encode()),
    )
    return bin_path


class CropCache:
    """Memmap-backed reader returning full-canvas float32 images that are
    byte-identical (inside any admissible crop box) to the disk reads they
    replace."""

    def __init__(self, cache_dir: str, dataset_name: str, is_train: bool):
        bin_path, idx_path = cache_paths(cache_dir, dataset_name, is_train)
        idx = np.load(idx_path)
        self.meta = json.loads(bytes(idx["meta"]).decode())
        self.offsets = idx["offsets"]
        self.shapes = idx["shapes"]
        self.orig_shapes = idx["orig_shapes"]
        self.origins = idx["origins"]
        self.buf = np.memmap(bin_path, dtype=np.uint8, mode="r",
                             shape=(int(idx["total_bytes"]),))
        self._mod_index = {m: i for i, m in enumerate(MODALITIES)}

    def __len__(self) -> int:
        return int(self.meta["num_samples"])

    def covers(self, options) -> bool:
        """True if the cache margin covers this options' augmentation range.

        scale_factor=0 (augmentation disabled) is honored, matching
        augm_params — no falsy-coercion to the default."""
        sf = 1.0 + float(getattr(options, "scale_factor", 0.15))
        return sf <= float(self.meta["scale_margin"]) + 1e-9

    def matches_index(self, dataset) -> bool:
        """True if the npz index AND the source image files the cache was
        built from are unchanged (boxes, names, per-file size/mtime).
        Pre-fingerprint caches (no recorded hash) conservatively refuse."""
        want = self.meta.get("index_fingerprint")
        return want is not None and want == dataset_fingerprint(dataset)

    def _patch(self, index: int, m: int) -> np.ndarray:
        off = int(self.offsets[index, m])
        shp = tuple(int(s) for s in self.shapes[index, m])
        size = shp[0] * shp[1] * shp[2]
        return self.buf[off:off + size].reshape(shp)

    def full(self, index: int, modality: str) -> np.ndarray:
        """Full-size float32 canvas: original pixels inside the patch, zero
        outside — exactly the set `crop()` can read (see module doc).  The
        stored patch is pre-clamped to the image bounds, so the paste is a
        single in-bounds block copy."""
        m = self._mod_index[modality]
        patch = self._patch(index, m)
        H, W = (int(v) for v in self.orig_shapes[index, m])
        x0, y0 = (int(v) for v in self.origins[index, m])
        gray = patch.shape[2] == 1
        canvas = np.zeros((H, W) if gray else (H, W, 3), np.float32)
        ph, pw = patch.shape[:2]
        if ph and pw:
            canvas[y0:y0 + ph, x0:x0 + pw] = patch[..., 0] if gray else patch
        return canvas

    def orig_shape(self, index: int) -> np.ndarray:
        return self.orig_shapes[index, 0].copy()

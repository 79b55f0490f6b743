"""SLP multi-modal dataset: npz index reader + per-sample host decode.

Re-design of the reference data layer (reference: datasets/base_dataset.py:
18-451): loads the npz index (imgname/irimgname/depthname/pmname, center,
scale, pose, shape, S, part, openpose, gender), reads the 4 covered images +
4 uncovered counterparts + the uncover body mask via the reference's
filename-rewriting convention (cover1/cover2 -> uncover, PM_aligned ->
masks), applies the same augmentation distributions, and emits an
NHWC-layout dict of numpy arrays (TPU-native layout — the single deliberate
departure from the reference's NCHW tensors).

Normalization stays host-side float math identical to torchvision Normalize
(x/255 - mean)/std per modality (base_dataset.py:381-389).
"""

from __future__ import annotations

from os.path import join
from typing import Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None
from scipy import ndimage
from scipy.ndimage import gaussian_filter

from .. import config, constants
from .transforms import crop, flip_img, flip_kp, flip_pose, rot_aa, transform


def _normalize(img01: np.ndarray, mean, std) -> np.ndarray:
    return (img01 - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


class BaseDataset:
    """Map-style dataset over an npz index (reference parity API).

    Emits per-sample dicts with the reference's key set
    (base_dataset.py:373-448) in NHWC float32.
    """

    def __init__(
        self,
        options=None,
        dataset: str = "slp-4mod-uncover",
        ignore_3d: bool = False,
        use_augmentation: bool = True,
        is_train: bool = True,
    ):
        self.dataset = dataset
        self.is_train = is_train
        self.options = options
        # Crop resolution: constants.IMG_RES unless options overrides
        # (tests use small crops to keep CPU compile times sane).
        self.img_res = int(getattr(options, "img_res", constants.IMG_RES) or constants.IMG_RES)
        # Opt-in native C++ fused crop+resize+noise path (ops/native): ~an
        # order of magnitude faster host preprocessing than the PIL
        # bit-parity path, used when no rotation augmentation was drawn.
        self.fast_preprocess = bool(getattr(options, "fast_preprocess", False))
        # Raw-decode mode: emit uint8 raw modalities + metadata only, for
        # the fused device preprocess (eval driver --device_preprocess).
        self.return_raw = bool(getattr(options, "device_preprocess", False)) and not is_train
        # uint8 training feed: emit post-crop/flip uint8 images + the drawn
        # channel-noise factors, and let the train step apply
        # noise/normalize on device (data/device_preprocess.py::
        # decode_uint8_batch).  4x less H2D traffic per step; the math
        # matches the host path to one float32 ulp (same clip(u8*pn)/255 ->
        # (x-m)/s, device-side in f32 where the host rounds through f64).
        # Under --fast_preprocess the native kernel's interpolated float
        # output is re-quantized to bytes first (rint), adding up to
        # 0.5/255 per pixel — consistent with that path's documented
        # not-bit-exact contract, but NOT 1-ulp.
        self.uint8_feed = bool(getattr(options, "uint8_feed", False)) and is_train
        if self.fast_preprocess:
            from ..ops import native as _native

            self._native = _native if _native.available() else None
        else:
            self._native = None
        self.img_dir = config.DATASET_FOLDERS[dataset]
        self.data = np.load(config.DATASET_FILES[int(is_train)][dataset], allow_pickle=True)
        self.imgname = self.data["imgname"]

        def _names(key):
            if key in self.data:
                return self.data[key], True
            return self.data["imgname"], False

        self.irimgname, self.hasIR = _names("irimgname")
        self.depthname, self.hasDEPTH = _names("depthname")
        self.pmname, self.hasPM = _names("pmname")
        self.maskname = self.data["maskname"] if "maskname" in self.data else None
        self.partname = self.data["partname"] if "partname" in self.data else None

        self.scale = self.data["scale"]
        self.center = self.data["center"]
        self.use_augmentation = use_augmentation

        if "pose" in self.data:
            self.pose = self.data["pose"].astype(np.float64)
            self.betas = self.data["shape"].astype(np.float64)
            self.has_smpl = (
                self.data["has_smpl"] if "has_smpl" in self.data else np.ones(len(self.imgname))
            )
        else:
            self.pose = None
            self.betas = None
            self.has_smpl = np.zeros(len(self.imgname))
        if ignore_3d:
            self.has_smpl = np.zeros(len(self.imgname))

        self.pose_3d = self.data["S"] if "S" in self.data else None
        self.has_pose_3d = int(self.pose_3d is not None and not ignore_3d)

        kp_gt = self.data["part"] if "part" in self.data else np.zeros((len(self.imgname), 24, 3))
        kp_op = (
            self.data["openpose"] if "openpose" in self.data else np.zeros((len(self.imgname), 25, 3))
        )
        self.keypoints = np.concatenate([kp_op, kp_gt], axis=1)

        if "gender" in self.data:
            self.gender = np.asarray(self.data["gender"]).astype(np.int32)
        else:
            self.gender = -1 * np.ones(len(self.imgname), np.int32)

        self.length = self.scale.shape[0]

        # Offline pre-decoded crop cache (data/crop_cache.py): replaces the
        # 9 cv2.imread calls per item with memmap patch reads, bit-exact by
        # construction.  Opt-in via options.crop_cache (a directory built by
        # tools/build_crop_cache.py); refused (with a warning) if the cache
        # was built for a smaller augmentation range or a different split
        # length.
        self._cache = None
        cache_dir = getattr(options, "crop_cache", None)
        if cache_dir and not self.return_raw:
            from .crop_cache import CropCache

            try:
                cc = CropCache(cache_dir, dataset, is_train)
            except FileNotFoundError:
                print(f"crop cache: no cache for {dataset} "
                      f"({'train' if is_train else 'test'}) in {cache_dir}; "
                      "reading from disk")
                cc = None
            except Exception as e:  # corrupt/partial cache: fall back, like
                # every other refusal path, instead of aborting construction
                print(f"crop cache: unreadable ({type(e).__name__}: {e}); "
                      "reading from disk")
                cc = None
            if cc is not None:
                if len(cc) != self.length:
                    print(f"crop cache: stale ({len(cc)} samples cached, "
                          f"split has {self.length}); reading from disk")
                elif not cc.matches_index(self):
                    print("crop cache: stale (npz index or source image "
                          "files changed since the cache was built); "
                          "reading from disk")
                elif self.is_train and self.use_augmentation and not cc.covers(options):
                    print("crop cache: built for a smaller augmentation "
                          "range than options request; reading from disk")
                else:
                    self._cache = cc

    # -- augmentation sampling (base_dataset.py:128-155) --------------------
    def augm_params(self, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        flip, pn, rot, sc = 0, np.ones(3), 0.0, 1.0
        if self.is_train and self.use_augmentation:
            noise_factor = getattr(self.options, "noise_factor", 0.4)
            rot_factor = getattr(self.options, "rot_factor", 15.0)
            scale_factor = getattr(self.options, "scale_factor", 0.15)
            if rng.uniform() <= 0.5:
                flip = 1
            pn = rng.uniform(1 - noise_factor, 1 + noise_factor, 3)
            rot = min(2 * rot_factor, max(-2 * rot_factor, rng.normal() * rot_factor))
            sc = min(1 + scale_factor, max(1 - scale_factor, rng.normal() * scale_factor + 1))
            if rng.uniform() <= 0.6:
                rot = 0.0
        return flip, pn, rot, sc

    # -- per-modality processing (base_dataset.py:157-183), NHWC outputs ----
    def _native_crop(self, img_u8, center, scale, flip, pn, rot=0.0):
        """Fused crop+resize+rotate+noise (+flip) via the C++ kernel, in
        [0, 1].  The rotation path means the fast lane covers 100% of the
        train augmentation distribution."""
        C = img_u8.shape[-1]
        out = self._native.preprocess_batch(
            img_u8[None],
            np.asarray(center, np.float32)[None],
            np.asarray([scale], np.float32),
            np.asarray([float(flip)], np.float32),
            np.tile(np.asarray(pn, np.float32)[:3], (1, 1)),
            self.img_res,
            np.zeros(C, np.float32),
            np.ones(C, np.float32),
            num_threads=1,
            rots=np.asarray([float(rot)], np.float32),
        )[0]
        return out

    def rgb_processing(self, rgb_img, center, scale, rot, flip, pn, as_uint8=False):
        if self._native is not None:
            out = self._native_crop(
                np.ascontiguousarray(rgb_img).astype(np.uint8), center, scale, flip,
                np.ones(3, np.float32) if as_uint8 else pn,
                rot=rot,
            )
            if as_uint8:  # requantize the kernel's [0,1] float output
                return np.rint(out * 255.0).astype(np.uint8)
            return out
        img = crop(rgb_img, center, scale, [self.img_res, self.img_res], rot=rot)
        if flip:
            img = np.ascontiguousarray(flip_img(img))
        if as_uint8:  # noise/normalize happen on device (uint8 feed)
            return img.astype(np.uint8)
        img = img.astype(np.float32)
        for c in range(3):
            img[:, :, c] = np.clip(img[:, :, c] * pn[c], 0, 255)
        return img / 255.0  # [H, W, 3]

    def gray_processing(self, gray_img, center, scale, rot, flip, pn, as_uint8=False):
        if self._native is not None:
            out = self._native_crop(
                np.ascontiguousarray(gray_img).astype(np.uint8)[:, :, None],
                center, scale, flip,
                np.ones(3, np.float32) if as_uint8 else pn, rot=rot,
            )
            if as_uint8:
                return np.rint(out * 255.0).astype(np.uint8)
            return out
        img = crop(gray_img, center, scale, [self.img_res, self.img_res], rot=rot)
        if flip:
            img = np.ascontiguousarray(flip_img(img))
        if as_uint8:
            return img.astype(np.uint8)[:, :, None]
        img = img.astype(np.float32)
        img = np.clip(img * pn[0], 0, 255)
        return img[:, :, None] / 255.0  # [H, W, 1]

    def j2d_processing(self, kp, center, scale, r, f):
        kp = kp.copy()
        for i in range(kp.shape[0]):
            kp[i, 0:2] = transform(
                kp[i, 0:2] + 1, center, scale, [self.img_res, self.img_res], rot=r
            )
        kp[:, :-1] = 2.0 * kp[:, :-1] / self.img_res - 1.0
        if f:
            kp = flip_kp(kp)
        return kp.astype(np.float32)

    def j3d_processing(self, S, r, f):
        S = S.copy()
        rot_mat = np.eye(3)
        if r != 0:
            rot_rad = -r * np.pi / 180
            sn, cs = np.sin(rot_rad), np.cos(rot_rad)
            rot_mat[0, :2] = [cs, -sn]
            rot_mat[1, :2] = [sn, cs]
        S[:, :-1] = np.einsum("ij,kj->ki", rot_mat, S[:, :-1])
        if f:
            S = flip_kp(S)
        return S.astype(np.float32)

    def pose_processing(self, pose, r, f):
        pose = pose.copy()
        pose[:3] = rot_aa(pose[:3], r)
        if f:
            pose = flip_pose(pose)
        return pose.astype(np.float32)

    def gen_contact(self, pm_img, mask, sigma=1, edges=True):
        """Pressure contact + sobel edge channels, NHWC
        (base_dataset.py:227-245)."""
        pm_contact = np.copy(pm_img)
        pm_contact[pm_contact > 0] = 1
        pm_contact[mask == 0] = 0
        pm_contact = gaussian_filter(pm_contact, sigma=sigma)
        if not edges:
            return pm_contact
        sx = ndimage.sobel(pm_contact, axis=0, mode="constant")
        sy = ndimage.sobel(pm_contact, axis=1, mode="constant")
        p_map = np.hypot(sx, sy)
        denom = np.max(p_map)
        if denom > 0:
            p_map = p_map / denom
        return np.concatenate((pm_contact, p_map), axis=-1)  # [H, W, 2]

    def _read_rgb(self, path):
        img = cv2.imread(path)
        if img is None:
            raise FileNotFoundError(path)
        return img[:, :, ::-1].copy().astype(np.float32)

    def _read_gray(self, path):
        img = cv2.imread(path, 0)
        if img is None:
            raise FileNotFoundError(path)
        return img.copy().astype(np.float32)

    def __getitem__(self, index, rng: Optional[np.random.Generator] = None):
        item = {}
        scale = self.scale[index].copy()
        center = self.center[index].copy()
        flip, pn, rot, sc = self.augm_params(rng)

        imgname = join(self.img_dir, str(self.imgname[index]))
        irname = join(self.img_dir, str(self.irimgname[index]))
        depthname = join(self.img_dir, str(self.depthname[index]))
        pmname = join(self.img_dir, str(self.pmname[index]))

        cache = self._cache
        if cache is not None:
            img = cache.full(index, "img")
            ir_img = cache.full(index, "ir")
            depth_img = cache.full(index, "depth")
            pm_img = cache.full(index, "pm")
        else:
            img = self._read_rgb(imgname)
            ir_img = self._read_gray(irname) if self.hasIR else self._read_rgb(imgname)
            depth_img = self._read_gray(depthname) if self.hasDEPTH else self._read_rgb(imgname)
            pm_img = self._read_gray(pmname) if self.hasPM else self._read_rgb(imgname)
        orig_shape = np.array(img.shape)[:2]

        if self.has_smpl[index]:
            pose = self.pose[index].copy()
            betas = self.betas[index].copy()
        else:
            pose = np.zeros(72)
            betas = np.zeros(10)

        if self.return_raw:
            # Raw-decode mode for the fused device preprocess
            # (data/device_preprocess.py): skip ALL host crop/normalize work
            # and the uncover/mask reads — the eval driver runs crop+resize+
            # normalize as one jit program per batch.  Eval-only (no
            # augmentation geometry to replicate on device).
            item["raw_img"] = img.astype(np.uint8)
            item["raw_ir_img"] = ir_img.astype(np.uint8)[:, :, None]
            item["raw_depth_img"] = depth_img.astype(np.uint8)[:, :, None]
            item["raw_pm_img"] = pm_img.astype(np.uint8)[:, :, None]
            item["pose"] = self.pose_processing(pose, rot, flip)
            item["betas"] = betas.astype(np.float32)
            item["imgname"] = imgname
            if self.has_pose_3d:
                item["pose_3d"] = self.j3d_processing(self.pose_3d[index].copy(), rot, flip)
            else:
                item["pose_3d"] = np.zeros((24, 4), np.float32)
            item["keypoints"] = self.j2d_processing(
                self.keypoints[index].copy(), center, sc * scale, rot, flip
            )
            item["has_smpl"] = np.float32(self.has_smpl[index])
            item["has_pose_3d"] = np.float32(self.has_pose_3d)
            item["scale"] = np.float32(sc * scale)
            item["center"] = center.astype(np.float32)
            item["orig_shape"] = orig_shape
            item["is_flipped"] = np.float32(flip)
            item["rot_angle"] = np.float32(rot)
            item["gender"] = self.gender[index]
            item["sample_index"] = index
            item["dataset_name"] = self.dataset
            return item

        u8 = self.uint8_feed
        img = self.rgb_processing(img, center, sc * scale, rot, flip, pn, as_uint8=u8)
        ir_img = self.gray_processing(ir_img, center, sc * scale, rot, flip, pn, as_uint8=u8)
        depth_img = self.gray_processing(depth_img, center, sc * scale, rot, flip, pn, as_uint8=u8)
        pm_img = self.gray_processing(pm_img, center, sc * scale, rot, flip, pn, as_uint8=u8)

        # Uncovered counterparts via filename rewriting
        # (base_dataset.py:327-353).
        def unc(p):
            return p.replace("cover1", "uncover").replace("cover2", "uncover")

        if cache is not None:
            img_unc_raw = cache.full(index, "img_unc")
            ir_unc_raw = cache.full(index, "ir_unc")
            depth_unc_raw = cache.full(index, "depth_unc")
            pm_unc_raw = cache.full(index, "pm_unc")
            mask_unc_raw = cache.full(index, "mask_unc")
        else:
            img_unc_raw = self._read_rgb(unc(imgname))
            ir_unc_raw = self._read_gray(unc(irname))
            depth_unc_raw = self._read_gray(unc(depthname))
            pm_unc_raw = self._read_gray(unc(pmname))
            mask_unc_raw = self._read_gray(unc(pmname).replace("PM_aligned", "masks"))
        img_unc = self.rgb_processing(img_unc_raw, center, sc * scale, rot, flip, pn)
        ir_unc = self.gray_processing(ir_unc_raw, center, sc * scale, rot, flip, pn, as_uint8=u8)
        depth_unc = self.gray_processing(depth_unc_raw, center, sc * scale, rot, flip, pn, as_uint8=u8)
        pm_unc = self.gray_processing(pm_unc_raw, center, sc * scale, rot, flip, pn, as_uint8=u8)
        mask_unc = self.gray_processing(mask_unc_raw, center, sc * scale, rot, flip, pn, as_uint8=u8)
        if u8:
            # gen_contact needs the noised [0,1] float views; derive them
            # with the exact device-side decode math.
            pm_f = np.clip(pm_img.astype(np.float32) * pn[0], 0, 255) / 255.0
            mask_f = np.clip(mask_unc.astype(np.float32) * pn[0], 0, 255) / 255.0
            pm_contact = self.gen_contact(pm_f, mask_f, sigma=1, edges=True)
        else:
            pm_contact = self.gen_contact(pm_img, mask_unc, sigma=1, edges=True)

        if u8:
            # uint8 feed: ship the post-crop/flip uint8 images + the noise
            # factors; decode_uint8_batch applies clip(u8*pn)/255 and the
            # per-modality normalization inside the jitted train step.
            item["img"] = img
            item["ir_img"] = ir_img
            item["depth_img"] = depth_img
            item["pm_img"] = pm_img
            item["img_uncover"] = img_unc
            item["ir_img_uncover"] = ir_unc
            item["depth_img_uncover"] = depth_unc
            item["pm_img_uncover"] = pm_unc
            item["mask_uncover"] = mask_unc
            item["pixel_noise"] = np.asarray(pn[:3], np.float32)
        else:
            item["img"] = _normalize(img, constants.IMG_NORM_MEAN, constants.IMG_NORM_STD)
            item["ir_img"] = _normalize(ir_img, constants.IR_NORM_MEAN, constants.IR_NORM_STD)
            item["depth_img"] = _normalize(depth_img, constants.DEPTH_NORM_MEAN, constants.DEPTH_NORM_STD)
            item["pm_img"] = _normalize(pm_img, constants.PM_NORM_MEAN, constants.PM_NORM_STD)
            item["img_uncover"] = img_unc
            item["ir_img_uncover"] = _normalize(ir_unc, constants.IR_NORM_MEAN, constants.IR_NORM_STD)
            item["depth_img_uncover"] = _normalize(
                depth_unc, constants.DEPTH_NORM_MEAN, constants.DEPTH_NORM_STD
            )
            item["pm_img_uncover"] = _normalize(pm_unc, constants.PM_NORM_MEAN, constants.PM_NORM_STD)
            item["mask_uncover"] = mask_unc.astype(np.float32)
        item["pm_contact"] = pm_contact.astype(np.float32)

        item["pose"] = self.pose_processing(pose, rot, flip)
        item["betas"] = betas.astype(np.float32)
        item["imgname"] = imgname
        if self.has_pose_3d:
            item["pose_3d"] = self.j3d_processing(self.pose_3d[index].copy(), rot, flip)
        else:
            item["pose_3d"] = np.zeros((24, 4), np.float32)
        item["keypoints"] = self.j2d_processing(self.keypoints[index].copy(), center, sc * scale, rot, flip)
        item["has_smpl"] = np.float32(self.has_smpl[index])
        item["has_pose_3d"] = np.float32(self.has_pose_3d)
        item["scale"] = np.float32(sc * scale)
        item["center"] = center.astype(np.float32)
        item["orig_shape"] = orig_shape
        item["is_flipped"] = np.float32(flip)
        item["rot_angle"] = np.float32(rot)
        item["gender"] = self.gender[index]
        item["sample_index"] = index
        item["dataset_name"] = self.dataset
        item["maskname"] = str(self.maskname[index]) if self.maskname is not None else ""
        item["partname"] = str(self.partname[index]) if self.partname is not None else ""
        return item

    def __len__(self):
        return self.length


class MixedDataset:
    """Multi-dataset batch mixture.

    Default behavior matches the reference's current single-dataset mode
    (reference: datasets/mixed_dataset.py:31-46 — 100% options.data_train).
    Ratio mixing — the reference's commented-out 30% H36M / 60% ITW / 10%
    MPI-INF intent (mixed_dataset.py:11-29,48-70) — is supported via
    `options.data_train = "name1:0.3+name2:0.7"`: each virtual index draws a
    source dataset by the given partition, so an epoch over `len(self)`
    indices realizes the requested mixture.
    """

    def __init__(self, options, **kwargs):
        spec = getattr(options, "data_train", "slp-4mod-train")
        parts = []
        for token in spec.split("+"):
            if ":" in token:
                name, ratio = token.split(":")
                parts.append((name, float(ratio)))
            else:
                parts.append((token, 1.0))
        total = sum(r for _, r in parts)
        self.partition = [(name, r / total) for name, r in parts]

        self.datasets = [BaseDataset(options, name, **kwargs) for name, _ in self.partition]
        self.dataset_dict = {name: i for i, (name, _) in enumerate(self.partition)}
        self.dataset = self.datasets[0]
        self.length = max(len(ds) for ds in self.datasets)

        # Per-dataset fits layout: the FitsStore concatenates one [N_i, 82]
        # block per source dataset (reference keys fits by (dataset, index),
        # train/fits_dict.py:19-32), and items carry GLOBAL sample indices
        # (block offset + local index) so mixture fits never collide.
        self.fits_layout = [(name, len(ds)) for (name, _), ds in
                            zip(self.partition, self.datasets)]
        self.fits_offsets = np.cumsum([0] + [n for _, n in self.fits_layout])[:-1]

        # Cumulative partition boundaries over the virtual index space.
        bounds = np.cumsum([r for _, r in self.partition])
        self._bounds = bounds / bounds[-1]

    def __getitem__(self, index):
        frac = (index % self.length) / self.length
        ds_idx = int(np.searchsorted(self._bounds, frac, side="right"))
        ds_idx = min(ds_idx, len(self.datasets) - 1)
        ds = self.datasets[ds_idx]
        item = ds[index % len(ds)]
        item["sample_index"] = int(self.fits_offsets[ds_idx]) + int(item["sample_index"])
        return item

    def __len__(self):
        return self.length

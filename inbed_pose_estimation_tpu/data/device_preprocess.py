"""Fused on-device preprocessing for the training hot path.

BASELINE.json's north star calls for "the 4-modality crop/normalize/stack
preprocessing ... as fused JAX transforms".  Image *decode* stays host-side
(SURVEY.md §2.4); everything after decode — crop-resize, flip, channel
noise, per-modality normalization — can run as one vmapped device function,
removing the per-sample python/PIL work from the input pipeline when the
host is the bottleneck.

`crop_resize` uses jax.image.scale_and_translate with a bilinear kernel over
the same affine the host `crop` computes (transforms.get_transform); exact
uint8-quantization parity with scipy.misc lives only in the host path — the
device path trades bit-parity for throughput and is opt-in.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .. import constants


def crop_resize(img: jnp.ndarray, center: jnp.ndarray, scale: jnp.ndarray, res: int) -> jnp.ndarray:
    """Crop a (center, 200*scale) box and resize to res x res, bilinear.

    img: [H, W, C] float; center: [2] (x, y); scale: [] bbox scale.

    Matches the host path's integer-snapped box (transforms.crop truncates
    ul/br through `.astype(int)`, i.e. trunc-toward-zero): output pixel u
    maps to input x = ul_x + (u + .5) * (br_x - ul_x) / res - .5, with
    ul/br truncated like the host — floor would shift the device crop one
    source pixel for bboxes crossing the top/left edge (negative ul).
    """
    h = 200.0 * scale
    ul = jnp.trunc(center - h / 2.0)          # [2] (x, y), host's int trunc
    br = jnp.trunc(center + h / 2.0)
    bw = jnp.maximum(br - ul, 1.0)            # box size per axis
    sxy = res / bw
    txy = -ul * res / bw
    return jax.image.scale_and_translate(
        img, (res, res, img.shape[-1]),
        spatial_dims=(1, 0),  # (x, y) scale/translation ordering
        scale=sxy, translation=txy, method="linear",
    )


def _apply_one(img, center, scale, flip, noise, mean, std, res):
    out = crop_resize(img, center, scale, res)
    out = jnp.where(flip > 0, out[:, ::-1, :], out)
    out = jnp.clip(out * noise, 0.0, 1.0)
    return (out - mean) / std


def make_device_preprocess(res: int = constants.IMG_RES):
    """Build the fused batch preprocess:
    fn(raw: dict of [B, H, W, C] float in [0,1], center [B,2], scale [B],
       flip [B], noise [B,3]) -> dict of normalized [B,res,res,C]."""

    stats = {
        "img": (jnp.asarray(constants.IMG_NORM_MEAN), jnp.asarray(constants.IMG_NORM_STD)),
        "ir_img": (jnp.asarray(constants.IR_NORM_MEAN), jnp.asarray(constants.IR_NORM_STD)),
        "depth_img": (jnp.asarray(constants.DEPTH_NORM_MEAN), jnp.asarray(constants.DEPTH_NORM_STD)),
        "pm_img": (jnp.asarray(constants.PM_NORM_MEAN), jnp.asarray(constants.PM_NORM_STD)),
    }

    @jax.jit
    def preprocess(raw: Dict[str, jnp.ndarray], center, scale, flip, noise):
        out = {}
        for key, (mean, std) in stats.items():
            if key not in raw:
                continue
            imgs = raw[key]
            if imgs.dtype == jnp.uint8:
                # uint8 H2D transfer (4x less PCIe/tunnel traffic); the
                # [0,1] conversion fuses into the crop kernel.
                imgs = imgs.astype(jnp.float32) / 255.0
            n = noise[:, :1] if key != "img" else noise
            out[key] = jax.vmap(
                lambda im, c, s, f, pn, m=mean, sd=std: _apply_one(im, c, s, f, pn, m, sd, res)
            )(imgs, center, scale, flip, n)
        return out

    return preprocess


# Per-key normalization stats for the uint8 training feed.  None = no
# normalization (the mask is compared in [0,1]).  The uncover recovery
# targets are normalized with their modality's stats exactly like the host
# path (dataset.py item assembly).
_UINT8_FEED_STATS = {
    "img": ("IMG_NORM_MEAN", "IMG_NORM_STD"),
    "ir_img": ("IR_NORM_MEAN", "IR_NORM_STD"),
    "depth_img": ("DEPTH_NORM_MEAN", "DEPTH_NORM_STD"),
    "pm_img": ("PM_NORM_MEAN", "PM_NORM_STD"),
    "ir_img_uncover": ("IR_NORM_MEAN", "IR_NORM_STD"),
    "depth_img_uncover": ("DEPTH_NORM_MEAN", "DEPTH_NORM_STD"),
    "pm_img_uncover": ("PM_NORM_MEAN", "PM_NORM_STD"),
    "mask_uncover": None,
}


def decode_uint8_batch(batch):
    """Device-side decode of the uint8 training feed (jittable, a no-op on
    float batches).

    The dataset's uint8 feed ships post-crop/flip uint8 images plus the
    drawn channel-noise factors `pixel_noise` [B, 3]; this applies
    clip(u8 * pn, 0, 255)/255 and the per-modality normalization — the
    same ops, in the same order, as the host path
    (dataset.rgb_processing/gray_processing + _normalize); the only
    difference is that the host's noise multiply rounds through float64,
    so results agree to one float32 ulp while H2D traffic shrinks 4x.  Fused into the train
    step by the trainer (one jit program: decode + fwd + bwd + Adam).
    """
    if "pixel_noise" not in batch:
        return batch
    out = dict(batch)
    pn = batch["pixel_noise"]  # [B, 3]
    for key, stat_names in _UINT8_FEED_STATS.items():
        x = out.get(key)
        if x is None or x.dtype != jnp.uint8:
            continue
        nch = x.shape[-1]
        n = pn[:, :nch] if nch == 3 else pn[:, :1]
        xf = jnp.clip(x.astype(jnp.float32) * n[:, None, None, :], 0.0, 255.0) / 255.0
        if stat_names is not None:
            mean = jnp.asarray(getattr(constants, stat_names[0]))
            std = jnp.asarray(getattr(constants, stat_names[1]))
            xf = (xf - mean) / std
        out[key] = xf
    return out

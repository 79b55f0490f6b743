"""Best-fit dictionary as a device-resident array with in-graph get/set.

Re-design of the reference FitsDict (reference: train/fits_dict.py:10-94),
which keeps a host dict of [N, 82] tensors and per-sample cv2.Rodrigues
rotations on the CPU — two host round-trips per training step.  Here:
  * the store is one [N, 82] device array (72 axis-angle pose + 10 betas),
    gathered/scattered inside the jitted train step,
  * the augmentation undo/redo (rotate global orient by the augmentation
    angle, flip) is batched device math (geometry.aa_rotate_z / flip_pose),
  * persistence matches the reference's `<ds>_fits.npy` layout so static
    fits seed files interoperate (fits_dict.py:19-32).

Get semantics (fits_dict.py:44-48):  pose' = flip(rotate(pose, rot), flip)
Set semantics (fits_dict.py:55-60):  pose' = rotate(flip(pose, flip), -rot),
stored only where `update`.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from .. import constants
from ..geometry import aa_rotate_z
from ..geometry.rotations import flip_pose as flip_pose_dev

_FLIP_PERM = np.asarray(constants.SMPL_POSE_FLIP_PERM, np.int32)


def _flip_where(pose: jnp.ndarray, is_flipped: jnp.ndarray) -> jnp.ndarray:
    flipped = flip_pose_dev(pose, jnp.asarray(_FLIP_PERM))
    return jnp.where(is_flipped[:, None] > 0, flipped, pose)


def _rotate(pose: jnp.ndarray, rot_deg: jnp.ndarray) -> jnp.ndarray:
    global_aa = aa_rotate_z(pose[:, :3], rot_deg)
    return jnp.concatenate([global_aa, pose[:, 3:]], axis=1)


def fits_get(
    fits: jnp.ndarray, indices: jnp.ndarray, rot: jnp.ndarray, is_flipped: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather per-sample best fits and apply the batch's augmentation.

    Args:
      fits: [N, 82] store.  indices: [B].  rot: [B] degrees.  is_flipped: [B].
    Returns:
      (pose [B, 72], betas [B, 10]).
    """
    params = fits[indices]
    pose = _flip_where(_rotate(params[:, :72], rot), is_flipped)
    return pose, params[:, 72:]


def fits_set(
    fits: jnp.ndarray,
    indices: jnp.ndarray,
    rot: jnp.ndarray,
    is_flipped: jnp.ndarray,
    update: jnp.ndarray,
    pose: jnp.ndarray,
    betas: jnp.ndarray,
) -> jnp.ndarray:
    """Undo augmentation and scatter improved fits where `update`."""
    pose_canon = _rotate(_flip_where(pose, is_flipped), -rot)
    new_params = jnp.concatenate([pose_canon, betas], axis=1)
    old_params = fits[indices]
    merged = jnp.where(update[:, None] > 0, new_params, old_params)
    return fits.at[indices].set(merged)


class FitsStore:
    """Host-side lifecycle: seed from static fits / checkpoint dir, hold the
    device array, persist on finalize (reference fits_dict.py:19-32).

    Multi-dataset layouts (MixedDataset mixtures) concatenate one
    [N_i, 82] block per source dataset — the reference keys its dict by
    (dataset, index) (train/fits_dict.py:19-32); here each dataset gets a
    contiguous offset range, items carry global indices, and persistence
    stays one `<name>_fits.npy` per dataset so static seed files and
    checkpoints interoperate per-dataset.
    """

    def __init__(self, dataset_name, num_samples: int | None = None,
                 checkpoint_dir: str | None = None,
                 static_fits_dir: str | None = None):
        # Accept a single (name, num_samples) pair or a layout
        # [(name, size), ...].
        if isinstance(dataset_name, str):
            layout = [(dataset_name, int(num_samples))]
        else:
            layout = [(n, int(s)) for n, s in dataset_name]
        self.layout = layout
        self.dataset_name = layout[0][0]
        self.checkpoint_dir = checkpoint_dir
        self.offsets = {}
        blocks = []
        total = 0
        for name, size in layout:
            self.offsets[name] = total
            arr = None
            for d in (checkpoint_dir, static_fits_dir):
                if d:
                    path = os.path.join(d, f"{name}_fits.npy")
                    if os.path.exists(path):
                        arr = np.load(path)
                        break
            if arr is None:
                arr = np.zeros((size, 82), np.float32)
            if arr.shape[0] != size:
                raise ValueError(
                    f"fits store for {name} has {arr.shape[0]} rows, dataset has {size}"
                )
            blocks.append(arr.astype(np.float32))
            total += size
        self.array = jnp.asarray(np.concatenate(blocks, axis=0))

    @property
    def num_rows(self) -> int:
        return sum(s for _, s in self.layout)

    def save(self):
        if self.checkpoint_dir:
            os.makedirs(self.checkpoint_dir, exist_ok=True)
            full = np.asarray(self.array)
            for name, size in self.layout:
                off = self.offsets[name]
                np.save(
                    os.path.join(self.checkpoint_dir, f"{name}_fits.npy"),
                    full[off:off + size],
                )

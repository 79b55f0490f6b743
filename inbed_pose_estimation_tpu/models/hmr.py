"""The HMR model family: SMPL regressors over 1-4 sensing modalities.

TPU-native re-design of the reference model zoo (reference: models/hmr.py,
2881 LoC).  Instead of ~28 near-duplicate torch classes, the zoo is built
from three orthogonal pieces:
  * `ResNet50Trunk`  — shared encoder (backbone.py),
  * `IEFHead`        — iterative-error-feedback regressor (heads.py),
  * `Reconstruct`    — image-recovery decoder (decoder.py),
composed by a small number of flax modules.  Registered names (SURVEY.md
§2.2) map onto these in `factory.py`.

All inputs are NHWC float arrays; multi-modal models take a tuple
(rgb [B,H,W,3], ir [B,H,W,1], depth [B,H,W,1], pm [B,H,W,1]) and concatenate
on the channel axis exactly like the reference's torch.cat on dim 1
(models/hmr.py:794).

Outputs: `HMROutput(rotmat [B,24,3,3], betas [B,10], cam [B,3],
pose6d [B,144], recon: dict of recovered images)`.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..geometry import rot6d_to_rotmat
from .attention import CrossAttention
from .backbone import ResNet50Trunk
from .decoder import Reconstruct
from .heads import IEFHead

Dtype = Any


class HMROutput(NamedTuple):
    rotmat: jnp.ndarray          # [B, 24, 3, 3]
    betas: jnp.ndarray           # [B, 10]
    cam: jnp.ndarray             # [B, 3] weak-perspective (s, tx, ty)
    pose6d: jnp.ndarray          # [B, 144]
    recon: dict                  # name -> [B, H, W, C] recovered images
    pyramid: Optional[tuple] = None  # (x0..x4) skip features if requested


def _broadcast_init(mean_np: np.ndarray, batch: int, dtype) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.asarray(mean_np, dtype=dtype), (batch, mean_np.shape[-1]))


class HMRCore(nn.Module):
    """Generic encoder + optional decoders + IEF head.

    `recon_heads` names the image-recovery decoders attached to the skip
    pyramid: () reproduces plain HMR (models/hmr.py:138-243), ("depth",)
    reproduces RECHMR/CASHMR/cashmrV2 (models/hmr.py:461-604,723-837),
    ("depth","ir","pm") reproduces REC3HMR (models/hmr.py:607-720).
    """

    mean_pose: Tuple[float, ...]     # length 144 (6d)
    mean_shape: Tuple[float, ...]    # length 10
    mean_cam: Tuple[float, ...]      # length 3
    recon_heads: Tuple[str, ...] = ()
    n_iter: int = 3
    return_pyramid: bool = False
    # Rematerialize ONLY the reconstruction decoders on the backward pass
    # (`--remat decoder`): their 112^2-224^2 x 128-ch activations dominate
    # training memory while their FLOPs are a minority (conv_efficiency:
    # HBM-bound), so decoder-scoped remat buys most of whole-stage remat's
    # memory relief at a fraction of its recompute tax.
    remat_decoder: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        init_pose: Optional[jnp.ndarray] = None,
        init_shape: Optional[jnp.ndarray] = None,
        init_cam: Optional[jnp.ndarray] = None,
        train: bool = False,
        compute_recon: bool = True,
    ) -> HMROutput:
        batch = x.shape[0]
        if init_pose is None:
            init_pose = _broadcast_init(np.asarray(self.mean_pose, np.float32), batch, self.dtype)
        if init_shape is None:
            init_shape = _broadcast_init(np.asarray(self.mean_shape, np.float32), batch, self.dtype)
        if init_cam is None:
            init_cam = _broadcast_init(np.asarray(self.mean_cam, np.float32), batch, self.dtype)

        x0, x1, x2, x3, x4 = ResNet50Trunk(dtype=self.dtype, name="trunk")(x, train)

        # The decoders are ~half the model FLOPs; the final cascade stage's
        # reconstruction is a discarded byproduct in eval (the reference
        # always computes it — eval.py:175 — a cost XLA cannot elide because
        # torch executes eagerly).  compute_recon=False skips them; flax
        # still initializes their params via the init-time call.
        recon = {}
        # nn.remat preserves the param-tree structure, so checkpoints are
        # interchangeable across remat settings (static_argnums counts self,
        # so 6 == `train`).
        dec_cls = (nn.remat(Reconstruct, static_argnums=(6,))
                   if self.remat_decoder else Reconstruct)
        for head in self.recon_heads:
            dec = dec_cls(dtype=self.dtype, name=f"reconstruct_{head}")
            if compute_recon or self.is_initializing():
                recon[head] = dec(x0, x1, x2, x3, x4, train)
        if not compute_recon:
            recon = {}

        xf = jnp.mean(x4, axis=(1, 2))  # GAP == AvgPool2d(7) on 7x7 maps
        pose6d, betas, cam = IEFHead(
            n_iter=self.n_iter, dtype=self.dtype, name="head"
        )(xf, init_pose, init_shape, init_cam, train)

        rotmat = rot6d_to_rotmat(pose6d.astype(jnp.float32)).reshape(batch, 24, 3, 3)
        return HMROutput(
            rotmat=rotmat,
            betas=betas.astype(jnp.float32),
            cam=cam.astype(jnp.float32),
            pose6d=pose6d.astype(jnp.float32),
            recon={k: v.astype(jnp.float32) for k, v in recon.items()},
            pyramid=(x0, x1, x2, x3, x4) if self.return_pyramid else None,
        )


def concat_modalities(inputs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """Channel-concatenate a modality tuple (NHWC)."""
    if isinstance(inputs, (list, tuple)):
        return jnp.concatenate(list(inputs), axis=-1)
    return inputs


class MultiTrunkCore(nn.Module):
    """Late-fusion variants: one ResNet-50 trunk per modality, features fused
    at the pyramid level (feature concat), optional decoder on the fused
    pyramid.

    Reproduces MULHMRFeatCat (models/hmr.py:884-962, 2 trunks, no decoder),
    FeatCatCASHMR (models/hmr.py:965-1075, 4 trunks + depth decoder: decoder
    consumes the *depth* trunk's skip pyramid with the fused x4, head pools
    the fused x4) and, with `cross_attention=True`, FeatAttCASHMR
    (models/hmr.py:1283-1397) whose x4 features are fused by shared spatial
    cross-attention before concatenation.

    Note: the reference FeatCatCASHMR decoder has a latent channel-width
    mismatch (Reconstruct(num_feat=4) expects 1024*(4+1)-wide skips but gets
    the single-trunk 1024+1024) which would crash if run; our width-agnostic
    decoder stages fix this (SURVEY.md §7.3: reference bugs not replicated).
    """

    mean_pose: Tuple[float, ...]
    mean_shape: Tuple[float, ...]
    mean_cam: Tuple[float, ...]
    num_trunks: int = 4
    recon_heads: Tuple[str, ...] = ()
    cross_attention: bool = False
    skip_trunk: int = 2  # decoder skip source: depth trunk in (rgb,ir,depth,pm)
    n_iter: int = 3
    remat_decoder: bool = False  # see HMRCore.remat_decoder
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        inputs: Sequence[jnp.ndarray],
        init_pose: Optional[jnp.ndarray] = None,
        init_shape: Optional[jnp.ndarray] = None,
        init_cam: Optional[jnp.ndarray] = None,
        train: bool = False,
        compute_recon: bool = True,
    ) -> HMROutput:
        assert len(inputs) == self.num_trunks
        batch = inputs[0].shape[0]
        if init_pose is None:
            init_pose = _broadcast_init(np.asarray(self.mean_pose, np.float32), batch, self.dtype)
        if init_shape is None:
            init_shape = _broadcast_init(np.asarray(self.mean_shape, np.float32), batch, self.dtype)
        if init_cam is None:
            init_cam = _broadcast_init(np.asarray(self.mean_cam, np.float32), batch, self.dtype)

        pyramids = []
        for i, inp in enumerate(inputs):
            pyramids.append(
                ResNet50Trunk(dtype=self.dtype, name=f"trunk{i}")(inp, train)
            )
        if self.cross_attention:
            x4 = CrossAttention(dtype=self.dtype, name="cross_att")(
                [p[4] for p in pyramids]
            )
        else:
            x4 = jnp.concatenate([p[4] for p in pyramids], axis=-1)

        recon = {}
        if self.recon_heads:
            skips = pyramids[min(self.skip_trunk, self.num_trunks - 1)]
            dec_cls = (nn.remat(Reconstruct, static_argnums=(6,))
                       if self.remat_decoder else Reconstruct)
            for head in self.recon_heads:
                dec = dec_cls(
                    num_feat=self.num_trunks, dtype=self.dtype, name=f"reconstruct_{head}"
                )
                if compute_recon or self.is_initializing():
                    recon[head] = dec(skips[0], skips[1], skips[2], skips[3], x4, train)
            if not compute_recon:
                recon = {}

        xf = jnp.mean(x4, axis=(1, 2))  # [B, 2048*num_trunks]
        pose6d, betas, cam = IEFHead(
            feat_dim=2048 * self.num_trunks, n_iter=self.n_iter, dtype=self.dtype, name="head"
        )(xf, init_pose, init_shape, init_cam, train)

        rotmat = rot6d_to_rotmat(pose6d.astype(jnp.float32)).reshape(batch, 24, 3, 3)
        return HMROutput(
            rotmat=rotmat,
            betas=betas.astype(jnp.float32),
            cam=cam.astype(jnp.float32),
            pose6d=pose6d.astype(jnp.float32),
            recon={k: v.astype(jnp.float32) for k, v in recon.items()},
        )

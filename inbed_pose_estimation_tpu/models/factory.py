"""Model registry / factory: registered architecture names -> flax modules.

Mirrors the reference factory surface (reference: models/hmr.py:2833-2880)
including every *registered, exercised* name (SURVEY.md §2.2).  Each entry
also records how the training/eval drivers feed it (`input_mode`), replacing
the reference's per-model if/elif dispatch in train/trainer.py:250-595 and
eval.py:163-288 with data-driven plumbing.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import jax.numpy as jnp

from ..smpl.assets import mean_params
from .bodies_at_rest import BodiesAtRest
from .fusion import FrozenGuidedFusion, TwoStageFusion
from .hmr import HMRCore, MultiTrunkCore

# How the driver assembles the network input from the per-modality batch:
#   concat:<mods>  — channel-concatenate listed modalities into one tensor
#   multi:<mods>   — one tensor per modality (multi-trunk late fusion)
#   pm_contact     — pressure map + contact/edge channels (Bodies-At-Rest)
MODALITY_SETS = {
    "rgb": ("img",),
    "ir": ("ir_img",),
    "depth": ("depth_img",),
    "pm": ("pm_img",),
    "all4": ("img", "ir_img", "depth_img", "pm_img"),
    "ir_depth": ("ir_img", "depth_img"),
    "ir_pm": ("ir_img", "pm_img"),
    "rgb_depth": ("img", "depth_img"),
    "rgb_pm": ("img", "pm_img"),
    "ir_depth_pm": ("ir_img", "depth_img", "pm_img"),
}


@dataclass(frozen=True)
class ModelSpec:
    name: str
    input_mode: str              # "concat" | "multi" | "pm_contact" | "fusion"
    modalities: Tuple[str, ...]  # batch keys in feed order
    cascade: bool = False        # driver runs the num_cas_iters cascade
    recon_heads: Tuple[str, ...] = ()
    # recon-head -> input-slot replacements applied between cascade stages
    # (cashmrV2 replaces the depth slot; ir_depth variants replace both).
    cascade_feed_map: Tuple[Tuple[str, int], ...] = (("depth", 2),)

    @property
    def cascade_feed_index(self) -> int:
        return self.cascade_feed_map[0][1]


_SPECS = {
    # name: (input_mode, modality set, cascade, recon heads)
    "hmr": ModelSpec("hmr", "concat", MODALITY_SETS["rgb"]),
    "hmr4mod": ModelSpec("hmr4mod", "concat", MODALITY_SETS["all4"]),
    "irhmr": ModelSpec("irhmr", "concat", MODALITY_SETS["ir"]),
    "depthhmr": ModelSpec("depthhmr", "concat", MODALITY_SETS["depth"]),
    "pmhmr": ModelSpec("pmhmr", "concat", MODALITY_SETS["pm"]),
    "mulhmr": ModelSpec("mulhmr", "concat", MODALITY_SETS["ir_depth_pm"]),
    "rechmr": ModelSpec("rechmr", "concat", MODALITY_SETS["all4"], recon_heads=("depth",)),
    "cashmr": ModelSpec("cashmr", "concat", MODALITY_SETS["all4"], cascade=True, recon_heads=("depth",)),
    "cashmrV2": ModelSpec("cashmrV2", "concat", MODALITY_SETS["all4"], cascade=True, recon_heads=("depth",)),
    "rec3hmr": ModelSpec("rec3hmr", "concat", MODALITY_SETS["all4"], recon_heads=("depth", "ir", "pm")),
    "cas3hmr": ModelSpec("cas3hmr", "concat", MODALITY_SETS["all4"], cascade=True, recon_heads=("depth", "ir", "pm")),
    "featcat": ModelSpec("featcat", "multi", ("img", "ir_img")),
    "featcat_cashmr": ModelSpec(
        "featcat_cashmr", "multi", MODALITY_SETS["all4"], cascade=True, recon_heads=("depth",)
    ),
    "featatt_cashmr": ModelSpec(
        "featatt_cashmr", "multi", MODALITY_SETS["all4"], cascade=True, recon_heads=("depth",)
    ),
    # Registered in the reference factory (models/hmr.py:2858) but its torch
    # implementation would crash (wrong-class super() chain, SURVEY.md §2.2);
    # here it is a working 2-trunk cross-attention model with depth+ir
    # recovery, cascading both recovered modalities.
    "ir_depth_featatt_cashmrV2": ModelSpec(
        "ir_depth_featatt_cashmrV2", "multi", MODALITY_SETS["ir_depth"],
        cascade=True, recon_heads=("depth", "ir"),
        cascade_feed_map=(("ir", 0), ("depth", 1)),
    ),
    "ir_depth_fusion": ModelSpec("ir_depth_fusion", "fusion", MODALITY_SETS["ir_depth"]),
    "ir_pm_fusion": ModelSpec("ir_pm_fusion", "fusion", MODALITY_SETS["ir_pm"]),
    "rgb_depth_fusion": ModelSpec("rgb_depth_fusion", "fusion", MODALITY_SETS["rgb_depth"]),
    "rgb_pm_fusion": ModelSpec("rgb_pm_fusion", "fusion", MODALITY_SETS["rgb_pm"]),
    # Frozen-guided pipelines: a pretrained ir_depth_fusion runs frozen
    # in-graph, its recovered ir/depth + pose warm-start feed the 5-ch
    # second stage (reference train/trainer.py:30-46,440-446,
    # models/hmr.py:1949-2072).
    "ir_depth_pm_fusion": ModelSpec("ir_depth_pm_fusion", "fusion", MODALITY_SETS["ir_depth_pm"]),
    # The rgb chain follows the reference class's intent (input_dim=6,
    # models/hmr.py:2215); its torch implementation cannot run (wrong-class
    # super() + strict=Ture NameError at train/trainer.py:34).
    "ir_depth_pm_rgb_fusion": ModelSpec(
        "ir_depth_pm_rgb_fusion", "fusion",
        ("ir_img", "depth_img", "pm_img", "img"),
    ),
    "bodiesAtRest": ModelSpec("bodiesAtRest", "pm_contact", ("pm_img",)),
    "bodiesAtRest4mod": ModelSpec("bodiesAtRest4mod", "pm_contact", MODALITY_SETS["all4"]),
}


def model_names() -> list[str]:
    return sorted(_SPECS)


def get_spec(name: str) -> ModelSpec:
    if name not in _SPECS:
        raise ValueError(f"Unknown model '{name}'. Known: {model_names()}")
    return _SPECS[name]


def build_model(
    name: str,
    smpl_mean_params: Optional[str] = None,
    dtype: Any = jnp.float32,
    n_iter: int = 3,
    remat_decoder: bool = False,
):
    """Construct the flax module for a registered architecture.

    Returns (module, spec).  Parity table vs reference factory
    (models/hmr.py:2833-2874):
      hmr/hmr4mod/irhmr/depthhmr/pmhmr/mulhmr -> HMRCore (no decoder)
      rechmr/cashmr/cashmrV2 -> HMRCore + depth decoder
      rec3hmr/cas3hmr -> HMRCore + depth/ir/pm decoders
      featcat -> MultiTrunkCore(2)
      featcat_cashmr -> MultiTrunkCore(4) + depth decoder
      featatt_cashmr -> MultiTrunkCore(4, cross_attention) + depth decoder
      *_fusion -> TwoStageFusion (mask-gated appearance recovery, 2 HMR passes)
      ir_depth_pm_fusion / ir_depth_pm_rgb_fusion -> FrozenGuidedFusion
        (frozen pretrained ir_depth_fusion guide + warm-started 5/6-ch stage)
      bodiesAtRest(4mod) -> BodiesAtRest CNN
    """
    spec = get_spec(name)
    mp = mean_params(smpl_mean_params)
    mean_kw = dict(
        mean_pose=tuple(float(v) for v in mp["pose"]),
        mean_shape=tuple(float(v) for v in mp["shape"]),
        mean_cam=tuple(float(v) for v in mp["cam"]),
    )

    if spec.input_mode == "concat":
        module = HMRCore(recon_heads=spec.recon_heads, n_iter=n_iter, dtype=dtype,
                         remat_decoder=remat_decoder, **mean_kw)
    elif spec.input_mode == "multi":
        module = MultiTrunkCore(
            num_trunks=len(spec.modalities),
            recon_heads=spec.recon_heads,
            cross_attention=name in ("featatt_cashmr", "ir_depth_featatt_cashmrV2"),
            skip_trunk=min(2, len(spec.modalities) - 1),
            n_iter=n_iter,
            remat_decoder=remat_decoder,
            dtype=dtype,
            **mean_kw,
        )
    elif spec.input_mode == "fusion":
        if name in ("ir_depth_pm_fusion", "ir_depth_pm_rgb_fusion"):
            module = FrozenGuidedFusion(
                with_rgb=(name == "ir_depth_pm_rgb_fusion"),
                n_iter=n_iter, dtype=dtype, **mean_kw,
            )
        else:
            recover, slots = {
                "ir_depth_fusion": (("ir", "depth"), (0, 1)),
                "ir_pm_fusion": (("ir", "pm"), (0, 1)),
                "rgb_depth_fusion": (("depth",), (1,)),
                "rgb_pm_fusion": (("pm",), (1,)),
            }[name]
            module = TwoStageFusion(
                recover_heads=recover, recover_slots=slots, n_iter=n_iter, dtype=dtype, **mean_kw
            )
    elif spec.input_mode == "pm_contact":
        in_ch = {"bodiesAtRest": 3, "bodiesAtRest4mod": 8}[name]
        module = BodiesAtRest(mod1_input_dim=in_ch, mod2_input_dim=in_ch + 1, dtype=dtype, **mean_kw)
    else:
        raise AssertionError(spec.input_mode)
    return module, spec

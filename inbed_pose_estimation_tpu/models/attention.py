"""Spatial self/cross attention over the 7x7 feature grid.

Re-design of the SAGAN-style attention fusion used by featatt_cashmr
(reference: models/hmr.py:1078-1168).  The attention span is the 49 spatial
positions of the final feature map; energies/softmax over 49x49 are tiny and
fuse entirely into the surrounding program.

Note on fidelity: the reference `Cross_Attn.adding` loop *overwrites* its
accumulator every iteration (models/hmr.py:1135-1145), discarding the input
feature and all but the last attention map — a latent defect (SURVEY.md
§7.3 "reference bugs to not replicate").  We implement the evident intent:
    out = x + sum_i gamma_i * (value(x) @ att_i)
with per-modality learnable gammas initialized to zero, which reduces to the
identity map at init exactly like the reference's Self_Attn.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class CrossAttention(nn.Module):
    """Shared-attention fusion across modality feature maps.

    Each modality computes its own 49x49 spatial attention map; every
    modality's values are then propagated through *all* maps and blended with
    learnable zero-init gains, and the results are channel-concatenated.
    """

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
        n = len(feats)
        B, H, W, C = feats[0].shape
        gamma = self.param("gamma", nn.initializers.zeros, (n,), jnp.float32)

        q_conv = nn.Conv(C, (1, 1), dtype=self.dtype, name="query")
        k_conv = nn.Conv(C, (1, 1), dtype=self.dtype, name="key")
        v_conv = nn.Conv(C, (1, 1), dtype=self.dtype, name="value")

        def att_map(x):
            q = q_conv(x).reshape(B, H * W, C)
            k = k_conv(x).reshape(B, H * W, C)
            energy = jnp.einsum("bnc,bmc->bnm", q, k)
            return nn.softmax(energy, axis=-1)

        atts = [att_map(x) for x in feats]

        outs = []
        for x in feats:
            v = v_conv(x).reshape(B, H * W, C)
            acc = x.reshape(B, H * W, C)
            for i, att in enumerate(atts):
                acc = acc + gamma[i] * jnp.einsum("bnc,bmn->bmc", v, att)
            outs.append(acc.reshape(B, H, W, C))
        return jnp.concatenate(outs, axis=-1)


class SelfAttention(nn.Module):
    """Single-map spatial self-attention: out = gamma * (V @ att) + x
    (reference: models/hmr.py:1078-1110)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        gamma = self.param("gamma", nn.initializers.zeros, (1,), jnp.float32)
        q = nn.Conv(C, (1, 1), dtype=self.dtype, name="query")(x).reshape(B, H * W, C)
        k = nn.Conv(C, (1, 1), dtype=self.dtype, name="key")(x).reshape(B, H * W, C)
        v = nn.Conv(C, (1, 1), dtype=self.dtype, name="value")(x).reshape(B, H * W, C)
        att = nn.softmax(jnp.einsum("bnc,bmc->bnm", q, k), axis=-1)
        out = jnp.einsum("bnc,bmn->bmc", v, att).reshape(B, H, W, C)
        return gamma[0] * out + x

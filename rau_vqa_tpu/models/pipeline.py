"""From-pixels VQA pipeline: backbone + RAU in one jitted program.

Covers BASELINE.json configs[3] ("Ours_ResNet run on-TPU end-to-end,
features not precomputed") and the VGG variants: uint8 images enter the
device, normalization + feature extraction + the answering units compile to
a single XLA program, so preprocessing fuses into the first convolution
(north-star: on-device batched preprocessing).
"""

from __future__ import annotations

import functools
from typing import Dict, Literal, Tuple

import jax
import jax.numpy as jnp

from rau_vqa_tpu.config import ModelConfig
from rau_vqa_tpu.models.backbones.resnet import resnet101_apply
from rau_vqa_tpu.models.backbones.vgg import vgg16_pool5_apply
from rau_vqa_tpu.models.rau import rau_forward
from rau_vqa_tpu.ops import transforms as T

Backbone = Literal["vgg16", "resnet101", "vit"]


def extract_features(backbone: Backbone, bb_params: Dict,
                     images_u8: jax.Array, vit_cfg=None,
                     fused_stages=(), fused_block_b: int = 0,
                     remat: bool = False,
                     feat_norm: bool = False) -> jax.Array:
    """uint8 [B, H, W, 3] RGB -> [B, S, D] features, normalization included
    (the two schemes of vqa_prepro_loader.lua:1061-1067; ViT uses ImageNet
    mean/std).  ``fused_stages`` routes those ResNet stages' identity
    blocks through the Pallas stage kernel (ops/fused_resnet.py).
    ``remat=True`` checkpoints the backbone blockwise — identical values,
    bounded activation memory — for fine-tuning (train/trainer.py
    --train-backbone), where the backward pass runs through here.

    ``feat_norm=True`` RMS-normalizes each [b, s] cell over D — a
    SCALE-INVARIANT backbone/head interface for fine-tuning
    (TrainConfig.backbone_feat_norm): the reference-pinned stacked-tanh
    head saturates to an exactly-zero f32 gradient on std≳3 features, so
    an inflating backbone can kill training irrecoverably (BASELINE.md
    fine-tuning notes); under RMS-norm no backbone scale drift can
    saturate it.  Must match between training and eval/serving — the
    Trainer threads it everywhere and snapshots record it."""
    x = images_u8.astype(jnp.float32) / 255.0
    if backbone == "vgg16":
        feats = vgg16_pool5_apply(bb_params, T.vgg_preprocess(x),
                                  remat=remat)
    elif backbone == "resnet101":
        feats = resnet101_apply(bb_params, T.color_normalize(x),
                                fused_stages=tuple(fused_stages),
                                fused_block_b=fused_block_b, remat=remat)
    elif backbone == "vit":
        from rau_vqa_tpu.models.backbones.vit import VIT_L14, vit_apply
        feats = vit_apply(bb_params, vit_cfg or VIT_L14,
                          T.color_normalize(x), remat=remat)
    else:
        raise ValueError(f"unknown backbone {backbone!r}")
    if feat_norm:
        ms = jnp.mean(jnp.square(feats), axis=-1, keepdims=True)
        feats = feats * jax.lax.rsqrt(ms + 1e-6)
    return feats


@functools.partial(jax.jit, static_argnames=("cfg", "backbone"))
def pixels_forward(params: Dict, bb_params: Dict, cfg: ModelConfig,
                   backbone: Backbone, images_u8: jax.Array,
                   tokens: jax.Array, lengths: jax.Array):
    """Full pixels->answers forward (eval): returns RAUOutput."""
    feats = extract_features(backbone, bb_params, images_u8)
    return rau_forward(params, cfg, tokens, lengths, feats, train=False)


def answer_pixels(params: Dict, bb_params: Dict, cfg: ModelConfig,
                  backbone: Backbone, images_u8, tokens, lengths
                  ) -> Tuple[jax.Array, jax.Array]:
    """Convenience: (oe_answer_ids [H+2, B], attention [H+2, B, S])."""
    from rau_vqa_tpu.models.aggregate import select_aggregate

    out = pixels_forward(params, bb_params, cfg, backbone, images_u8,
                         tokens, lengths)
    select_pred, gates = select_aggregate(out.scores, out.do_pred,
                                          force_final=True)
    uni = jnp.mean(out.scores, axis=0)
    tab_pred = jnp.concatenate([out.scores, uni[None], select_pred[None]])
    select_att = jnp.einsum("hbs,hb->bs", out.attprob, gates)
    uni_att = jnp.mean(out.attprob, axis=0)
    tab_att = jnp.concatenate([out.attprob, uni_att[None], select_att[None]])
    return jnp.argmax(tab_pred, axis=-1), tab_att

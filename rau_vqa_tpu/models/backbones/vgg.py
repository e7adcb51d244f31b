"""VGG16 feature extractor through pool5, functional JAX (NHWC).

The reference consumes *precomputed* VGG16-pool5 features (448x448 inputs ->
14x14x512 maps, downloaded by data/get_vgg16_pool5_448.sh).  This module
makes the extraction on-TPU so Ours_SS/MS/Full run end-to-end from pixels
(BASELINE.json configs; SURVEY.md §7.8).

Input convention: Caffe-VGG preprocessing — BGR, 0..255, mean-subtracted
(ops/transforms.vgg_preprocess; matches vqa_prepro_loader.lua:1061-1064) —
the convention the released features were extracted under.

``vgg16_from_torch_state`` converts a torchvision-format ``state_dict``
(``features.{i}.weight/bias``) when pretrained weights are available on disk;
there is no network access here, so weights ship with the user.
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# channel plan, 'M' = 2x2/2 max-pool (13 conv layers -> pool5)
VGG16_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]


def _conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b


def _maxpool2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")


def vgg16_pool5_init(key: jax.Array, dtype=jnp.float32) -> Dict:
    params: List[Dict] = []
    c_in = 3
    for v in VGG16_CFG:
        if v == "M":
            continue
        key, k = jax.random.split(key)
        fan_in = 3 * 3 * c_in
        # Python float: a NumPy scalar is strong-typed and would upcast
        # bf16 weights to f32 (see resnet._conv_init)
        std = float(np.sqrt(2.0 / fan_in))
        params.append({
            "w": jax.random.normal(k, (3, 3, c_in, v), dtype) * std,
            "b": jnp.zeros((v,), dtype),
        })
        c_in = v
    return {"convs": params}


def _stage(x, seg):
    """One pool stage: the convs between pools, then the 2x2 max-pool."""
    for p in seg:
        x = jax.nn.relu(_conv(x, p["w"], p["b"]))
    return _maxpool2(x)


def vgg16_pool5_apply(params: Dict, x: jax.Array,
                      remat: bool = False) -> jax.Array:
    """x [B, H, W, 3] (Caffe-BGR preprocessed) -> pool5 features
    [B, (H/32)*(W/32), 512] in the model's [B, S, D] layout.

    ``remat=True`` checkpoints each pool stage (fine-tuning: only the 5
    stage inputs are saved for the backward pass; conv activations inside
    a stage are recomputed — identical values, ~4x less live activation
    memory at 448 px)."""
    x = x.astype(params["convs"][0]["w"].dtype)  # follow param dtype (bf16 ok)
    stage_fn = jax.checkpoint(_stage) if remat else _stage
    i = 0
    seg: List[Dict] = []
    for v in VGG16_CFG:
        if v == "M":
            x = stage_fn(x, seg)
            seg = []
        else:
            seg.append(params["convs"][i])
            i += 1
    B, h, w, c = x.shape
    return x.reshape(B, h * w, c)


def vgg16_from_torch_state(state: Dict[str, "np.ndarray"]) -> Dict:
    """torchvision vgg16 ``state_dict`` (features.{idx}.weight [out,in,kh,kw])
    -> our params.  Accepts numpy arrays or torch tensors."""
    conv_indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    convs = []
    for idx in conv_indices:
        w = np.asarray(state[f"features.{idx}.weight"])
        b = np.asarray(state[f"features.{idx}.bias"])
        convs.append({
            "w": jnp.asarray(w.transpose(2, 3, 1, 0)),  # OIHW -> HWIO
            "b": jnp.asarray(b),
        })
    return {"convs": convs}

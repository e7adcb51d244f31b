"""ViT visual backbone (stretch config: BASELINE.json configs[4] — "ViT-L /
SigLIP visual backbone swapped into the RAU loop").

A functional pre-LN Vision Transformer producing *spatial* tokens [B, S, D]
(no class token) that drop into the RAU model as its feature map: set
``cnn_dim = vit.dim`` and ``cnn_w = cnn_h = image_size / patch`` and the
answering units attend over ViT patches instead of CNN cells.  The RAU
attention math is length-agnostic (scores/softmax over S), which is why
SURVEY.md §2d keeps the design blockwise-friendly for growing S.

``vit_from_timm_state`` converts timm-style state dicts (``blocks.N.attn.qkv
.weight`` naming — the common release format for ViT/SigLIP weights).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch: int = 14
    dim: int = 1024
    depth: int = 24
    heads: int = 16
    mlp_ratio: float = 4.0
    ln_eps: float = 1e-6

    @property
    def grid(self) -> int:
        assert self.image_size % self.patch == 0
        return self.image_size // self.patch

    @property
    def seq(self) -> int:
        return self.grid * self.grid


VIT_L14 = ViTConfig(image_size=224, patch=14, dim=1024, depth=24, heads=16)
VIT_B16 = ViTConfig(image_size=224, patch=16, dim=768, depth=12, heads=12)


def _linear_init(key, d_in, d_out, dtype):
    kw, kb = jax.random.split(key)
    std = (2.0 / (d_in + d_out)) ** 0.5
    return {"w": jax.random.normal(kw, (d_in, d_out), dtype) * std,
            "b": jnp.zeros((d_out,), dtype)}


def _ln_init(d, dtype):
    return {"scale": jnp.ones((d,), dtype), "offset": jnp.zeros((d,), dtype)}


def vit_init(key: jax.Array, cfg: ViTConfig, dtype=jnp.float32) -> Dict:
    keys = iter(jax.random.split(key, 8 * cfg.depth + 8))
    params: Dict = {
        "patch_embed": {
            "w": jax.random.normal(
                next(keys), (cfg.patch, cfg.patch, 3, cfg.dim), dtype)
            * (2.0 / (cfg.patch * cfg.patch * 3)) ** 0.5,
            "b": jnp.zeros((cfg.dim,), dtype),
        },
        "pos_embed": jax.random.normal(next(keys), (cfg.seq, cfg.dim),
                                       dtype) * 0.02,
        "blocks": [],
        "ln_final": _ln_init(cfg.dim, dtype),
    }
    mlp_dim = int(cfg.dim * cfg.mlp_ratio)
    for _ in range(cfg.depth):
        params["blocks"].append({
            "ln1": _ln_init(cfg.dim, dtype),
            "qkv": _linear_init(next(keys), cfg.dim, 3 * cfg.dim, dtype),
            "proj": _linear_init(next(keys), cfg.dim, cfg.dim, dtype),
            "ln2": _ln_init(cfg.dim, dtype),
            "fc1": _linear_init(next(keys), cfg.dim, mlp_dim, dtype),
            "fc2": _linear_init(next(keys), mlp_dim, cfg.dim, dtype),
        })
    return params


def _ln(x, p, eps):
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["offset"]


def _mhsa(x, blk, heads):
    B, S, D = x.shape
    hd = D // heads
    qkv = x @ blk["qkv"]["w"] + blk["qkv"]["b"]          # [B, S, 3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_split(t):
        return t.reshape(B, S, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = map(heads_split, (q, k, v))
    # Python-float scale: np.sqrt is a strong f32 scalar under jax
    # promotion — it upcast the [B, h, S, S] score tensor AND (via the
    # residual) every later layer to f32, doubling HBM traffic across
    # all 24 blocks (measured 3% MFU before the fix)
    att = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (1.0 / float(np.sqrt(hd)))
    att = jax.nn.softmax(att, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", att, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
    return out @ blk["proj"]["w"] + blk["proj"]["b"]


def _block(x, blk, cfg: ViTConfig):
    x = x + _mhsa(_ln(x, blk["ln1"], cfg.ln_eps), blk, cfg.heads)
    h = _ln(x, blk["ln2"], cfg.ln_eps)
    # exact (erf) GELU: timm/torch ViT weights were trained with
    # nn.GELU's erf form; jax.nn.gelu defaults to the tanh
    # approximation, which accumulates a systematic delta over the
    # 24-block stack
    h = jax.nn.gelu(h @ blk["fc1"]["w"] + blk["fc1"]["b"],
                    approximate=False)
    return x + (h @ blk["fc2"]["w"] + blk["fc2"]["b"])


def vit_apply(params: Dict, cfg: ViTConfig, x: jax.Array,
              remat: bool = False) -> jax.Array:
    """x [B, H, W, 3] normalized -> patch tokens [B, S, D].

    ``remat=True`` checkpoints each transformer block (fine-tuning: the
    backward keeps one [B, S, D] residual per block instead of every
    attention/MLP intermediate)."""
    B = x.shape[0]
    x = x.astype(params["patch_embed"]["w"].dtype)  # follow param dtype
    x = jax.lax.conv_general_dilated(
        x, params["patch_embed"]["w"],
        window_strides=(cfg.patch, cfg.patch), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    x = x.reshape(B, -1, cfg.dim) + params["patch_embed"]["b"]
    x = x + params["pos_embed"]
    block_fn = (jax.checkpoint(lambda x_, blk: _block(x_, blk, cfg))
                if remat else (lambda x_, blk: _block(x_, blk, cfg)))
    for blk in params["blocks"]:
        x = block_fn(x, blk)
    return _ln(x, params["ln_final"], cfg.ln_eps)


def vit_from_timm_state(state: Dict[str, "np.ndarray"],
                        cfg: ViTConfig) -> Dict:
    """timm ViT state_dict -> our params.  Drops the class token (RAU
    attends over spatial tokens); position embeddings keep the patch part."""
    def arr(k):
        return np.asarray(state[k])

    pos = arr("pos_embed")
    pos = pos[0]
    if pos.shape[0] == cfg.seq + 1:   # [cls + patches]
        pos = pos[1:]
    params: Dict = {
        "patch_embed": {
            # timm: [D, 3, P, P] conv -> HWIO
            "w": jnp.asarray(arr("patch_embed.proj.weight")
                             .transpose(2, 3, 1, 0)),
            "b": jnp.asarray(arr("patch_embed.proj.bias")),
        },
        "pos_embed": jnp.asarray(pos),
        "blocks": [],
        "ln_final": {"scale": jnp.asarray(arr("norm.weight")),
                     "offset": jnp.asarray(arr("norm.bias"))},
    }
    for i in range(cfg.depth):
        p = f"blocks.{i}"
        params["blocks"].append({
            "ln1": {"scale": jnp.asarray(arr(f"{p}.norm1.weight")),
                    "offset": jnp.asarray(arr(f"{p}.norm1.bias"))},
            "qkv": {"w": jnp.asarray(arr(f"{p}.attn.qkv.weight").T),
                    "b": jnp.asarray(arr(f"{p}.attn.qkv.bias"))},
            "proj": {"w": jnp.asarray(arr(f"{p}.attn.proj.weight").T),
                     "b": jnp.asarray(arr(f"{p}.attn.proj.bias"))},
            "ln2": {"scale": jnp.asarray(arr(f"{p}.norm2.weight")),
                    "offset": jnp.asarray(arr(f"{p}.norm2.bias"))},
            "fc1": {"w": jnp.asarray(arr(f"{p}.mlp.fc1.weight").T),
                    "b": jnp.asarray(arr(f"{p}.mlp.fc1.bias"))},
            "fc2": {"w": jnp.asarray(arr(f"{p}.mlp.fc2.weight").T),
                    "b": jnp.asarray(arr(f"{p}.mlp.fc2.bias"))},
        })
    return params

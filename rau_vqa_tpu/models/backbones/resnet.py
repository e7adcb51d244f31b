"""ResNet-101 feature extractor (pre-avgpool), functional JAX (NHWC).

The Ours_ResNet config consumes precomputed ResNet-101 features "before
average pooling" at 448x448 -> 14x14x2048 (data/get_resnet_101_448.sh;
run script passes -cnnout_dim 2048).  This module computes them on-TPU:
conv1 7x7/2 -> maxpool/2 -> bottleneck stages [3, 4, 23, 3] with strides
[1, 2, 2, 2], batch-norm in inference mode (feature extraction is frozen in
the reference pipeline; the RAU head is what trains).

Input convention: RGB 0..1 normalized by ImageNet mean/std
(ops/transforms.color_normalize; matches vqa_prepro_loader.lua:56-62).

``resnet_from_torch_state`` converts a torchvision resnet101 state_dict when
pretrained weights are available on disk.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

RESNET101_BLOCKS = (3, 4, 23, 3)
STAGE_WIDTH = (64, 128, 256, 512)   # bottleneck inner widths; out = 4x
BN_EPS = 1e-5


def _conv_init(key, kh, kw, c_in, c_out, dtype):
    fan_in = kh * kw * c_in
    # Python float, NOT np.sqrt: a NumPy f64 scalar is a strong f32 under
    # jax promotion and silently upcast every bf16 conv weight to f32
    # (every "bf16" resnet bench through round 3 actually ran f32 tensors)
    std = float(np.sqrt(2.0 / fan_in))
    return jax.random.normal(key, (kh, kw, c_in, c_out), dtype) * std


def _bn_init(c, dtype):
    return {"scale": jnp.ones((c,), dtype), "offset": jnp.zeros((c,), dtype),
            "mean": jnp.zeros((c,), dtype), "var": jnp.ones((c,), dtype)}


def _conv(x, w, stride=1):
    # explicit torch-style symmetric padding ((k-1)//2): XLA's "SAME" picks a
    # different sampling grid for strided convs on even inputs
    kh, kw = w.shape[0], w.shape[1]
    pad = ((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _bn(x, p):
    inv = jax.lax.rsqrt(p["var"] + BN_EPS) * p["scale"]
    return x * inv + (p["offset"] - p["mean"] * inv)


def resnet101_init(key: jax.Array, dtype=jnp.float32) -> Dict:
    keys = iter(jax.random.split(key, 512))
    params: Dict = {
        "conv1": {"w": _conv_init(next(keys), 7, 7, 3, 64, dtype)},
        "bn1": _bn_init(64, dtype),
        "stages": [],
    }
    c_in = 64
    for stage, (n_blocks, width) in enumerate(zip(RESNET101_BLOCKS,
                                                  STAGE_WIDTH)):
        blocks: List[Dict] = []
        c_out = width * 4
        for b in range(n_blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            blk = {
                "conv1": {"w": _conv_init(next(keys), 1, 1, c_in, width, dtype)},
                "bn1": _bn_init(width, dtype),
                "conv2": {"w": _conv_init(next(keys), 3, 3, width, width, dtype)},
                "bn2": _bn_init(width, dtype),
                "conv3": {"w": _conv_init(next(keys), 1, 1, width, c_out, dtype)},
                "bn3": _bn_init(c_out, dtype),
            }
            if b == 0:
                blk["down"] = {
                    "w": _conv_init(next(keys), 1, 1, c_in, c_out, dtype)}
                blk["down_bn"] = _bn_init(c_out, dtype)
            blocks.append(blk)
            c_in = c_out
        params["stages"].append(blocks)
    return params


def _bottleneck(x, blk, stride):
    y = jax.nn.relu(_bn(_conv(x, blk["conv1"]["w"]), blk["bn1"]))
    y = jax.nn.relu(_bn(_conv(y, blk["conv2"]["w"], stride), blk["bn2"]))
    y = _bn(_conv(y, blk["conv3"]["w"]), blk["bn3"])
    if "down" in blk:
        x = _bn(_conv(x, blk["down"]["w"], stride), blk["down_bn"])
    return jax.nn.relu(x + y)


def _fold_conv_bn(conv: Dict, bn: Dict) -> Dict:
    """conv{w [kh,kw,ci,co]} + inference BN -> conv{w', b'} with
    w' = w * g, b' = offset - mean * g, g = scale / sqrt(var + eps):
    numerically the same affine map, one op instead of two."""
    g = np.asarray(bn["scale"], np.float32) / np.sqrt(
        np.asarray(bn["var"], np.float32) + BN_EPS)
    w = np.asarray(conv["w"], np.float32) * g[None, None, None, :]
    b = (np.asarray(bn["offset"], np.float32)
         - np.asarray(bn["mean"], np.float32) * g)
    dtype = jnp.asarray(conv["w"]).dtype
    return {"w": jnp.asarray(w, dtype), "b": jnp.asarray(b, dtype)}


def fold_batchnorm(params: Dict) -> Dict:
    """Fold every inference-mode BN into its preceding conv (serving-path
    optimization: ~104 normalize chains become conv bias adds, guaranteeing
    the epilogue fusion and dropping the 4x per-channel BN tensors).  The
    fold happens in f32 then casts back to the conv dtype; use the unfolded
    tree for torch-parity tests.

    The tree carries NO flag leaves: apply derives 'folded' from the
    absence of 'bn1' (a python bool in the pytree would become a traced
    0-d array whenever the tree rides as a jit ARGUMENT — the serving
    benches and the sharded predict pass it exactly that way — and
    `if folded:` would raise TracerBoolConversionError)."""
    out: Dict = {
        "conv1": _fold_conv_bn(params["conv1"], params["bn1"]),
        "stages": [],
    }
    for blocks in params["stages"]:
        fb = []
        for blk in blocks:
            nb = {
                "conv1": _fold_conv_bn(blk["conv1"], blk["bn1"]),
                "conv2": _fold_conv_bn(blk["conv2"], blk["bn2"]),
                "conv3": _fold_conv_bn(blk["conv3"], blk["bn3"]),
            }
            if "down" in blk:
                nb["down"] = _fold_conv_bn(blk["down"], blk["down_bn"])
            fb.append(nb)
        out["stages"].append(fb)
    return out


def _conv_b(x, p, stride=1):
    return _conv(x, p["w"], stride) + p["b"]


def space_to_depth_stem(params: Dict) -> Dict:
    """Rewrite conv1 (7x7/2 on 3 channels — MXU-hostile: the reduction dim
    is 3*49=147 laid out over C=3) as an EXACTLY equivalent 4x4/1 conv on a
    2x2 space-to-depth input (C=12), the standard TPU ResNet stem
    transform.  Derivation: pad the 7-tap kernel to 8 taps (zero at offset
    -4, the symmetric pad-3 layout), split the tap index ky = 2a + dy - 4;
    then out(i) = sum_a w8[2a+dy] x[2(i+a-2)+dy] is a 4-tap stride-1 conv
    over the s2d grid with spatial padding (2, 1).  Apply to a FOLDED tree
    (fold_batchnorm) — conv1 must carry its bias."""
    conv1 = params["conv1"]
    w = np.asarray(conv1["w"], np.float32)          # [7, 7, 3, 64]
    assert w.shape[:2] == (7, 7), "stem transform expects the 7x7 conv1"
    w8 = np.zeros((8, 8) + w.shape[2:], np.float32)
    w8[1:, 1:] = w                                   # offset -4 row/col = 0
    # s2d channel layout: idx = dy*6 + dx*3 + c  (matches _s2d's reshape)
    ws = np.zeros((4, 4, 12, w.shape[3]), np.float32)
    for dy in range(2):
        for dx in range(2):
            for a in range(4):
                for b in range(4):
                    ws[a, b, dy * 6 + dx * 3:dy * 6 + dx * 3 + 3] = \
                        w8[2 * a + dy, 2 * b + dx]
    dtype = jnp.asarray(conv1["w"]).dtype
    out = dict(params)
    # no flag leaf: apply recognizes the s2d stem by conv1's static 4x4x12
    # weight shape (jit-arg safe; see fold_batchnorm docstring)
    out["conv1"] = {"w": jnp.asarray(ws, dtype),
                    "b": jnp.asarray(np.asarray(conv1["b"], np.float32),
                                     dtype)}
    return out


def _s2d(x):
    """[B, H, W, C] -> [B, H/2, W/2, 4C] with channel = (dy, dx, c)."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H // 2, W // 2, 4 * C)


def _bottleneck_folded(x, blk, stride):
    y = jax.nn.relu(_conv_b(x, blk["conv1"]))
    y = jax.nn.relu(_conv_b(y, blk["conv2"], stride))
    y = _conv_b(y, blk["conv3"])
    if "down" in blk:
        x = _conv_b(x, blk["down"], stride)
    return jax.nn.relu(x + y)


def resnet101_apply(params: Dict, x: jax.Array,
                    fused_stages: Tuple[int, ...] = (),
                    fused_block_b: int = 0,
                    fused_interpret=None,
                    remat: bool = False) -> jax.Array:
    """x [B, H, W, 3] (ImageNet-normalized RGB) -> pre-avgpool features
    [B, (H/32)*(W/32), 2048] in the model's [B, S, D] layout.  Accepts the
    plain (conv+BN) tree or a ``fold_batchnorm`` tree.

    ``fused_stages`` (STATIC, folded trees only) runs those stages' runs
    of identity blocks through the VMEM-resident Pallas stage kernel
    (ops/fused_resnet.py) — the block-fusion experiment of VERDICT r3 #2;
    the stage-opening downsample block stays on XLA."""
    # flags derive from STATIC structure (keys/shapes), never bool leaves,
    # so the tree can ride as a jit argument (fold_batchnorm docstring)
    folded = "bn1" not in params
    x = x.astype(params["conv1"]["w"].dtype)  # follow param dtype (bf16 ok)
    if folded and params["conv1"]["w"].shape[:3] == (4, 4, 12):
        # space-to-depth stem: 4x4/1 conv on the 2x2-s2d grid, asymmetric
        # (2, 1) padding — exact equivalent of conv1 7x7/2 pad 3
        xs = _s2d(x)
        y = jax.lax.conv_general_dilated(
            xs, params["conv1"]["w"], window_strides=(1, 1),
            padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = jax.nn.relu(y + params["conv1"]["b"])
    elif folded:
        x = jax.nn.relu(_conv_b(x, params["conv1"], stride=2))
    else:
        x = jax.nn.relu(_bn(_conv(x, params["conv1"]["w"], stride=2),
                            params["bn1"]))
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
    block_fn = _bottleneck_folded if folded else _bottleneck
    if remat:
        # fine-tuning: checkpoint each bottleneck block — the backward
        # pass keeps only the ~33 block-boundary activations (~71 MB/img
        # bf16 at 448 px) and recomputes the 3 conv intermediates inside
        # the active block (identical values, jax.checkpoint)
        if fused_stages:
            raise ValueError("remat and fused_stages are exclusive (the "
                             "Pallas stage kernel is a serving path)")
        base_fn = block_fn

        def block_fn(x, blk, stride, _base=base_fn):  # noqa: F811
            return jax.checkpoint(
                lambda x_, blk_: _base(x_, blk_, stride))(x, blk)
    if fused_stages and not folded:
        raise ValueError("fused_stages requires a fold_batchnorm tree")
    for stage, blocks in enumerate(params["stages"]):
        if stage in fused_stages and len(blocks) > 1:
            from rau_vqa_tpu.ops.fused_resnet import (
                fused_identity_stage,
                pick_block_b,
                stack_identity_blocks,
            )
            x = block_fn(x, blocks[0], 2 if stage > 0 else 1)
            # block_b=0 is auto: target ~2k matmul rows per grid step
            # (bb*H*W) — enough sublane tiles to shape the MXU operands
            # while keeping stage 2's nominal VMEM well inside the 2-3x
            # headroom Mosaic's allocator needs (docs/mosaic_notes.md #5);
            # push higher explicitly via --fused-block-b once the rig
            # confirms the fit
            if fused_block_b and x.shape[0] % fused_block_b:
                # an explicit tile that silently shrank would mislabel
                # A/B ledger entries (the bench reports the requested one)
                raise ValueError(
                    f"fused_block_b {fused_block_b} does not divide "
                    f"batch {x.shape[0]} (use 0 for auto)")
            want = fused_block_b or max(
                1, min(8, 2048 // (x.shape[1] * x.shape[2])))
            x = fused_identity_stage(
                x, stack_identity_blocks(blocks[1:]),
                block_b=pick_block_b(x.shape[0], want),
                interpret=fused_interpret)
            continue
        for b, blk in enumerate(blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            x = block_fn(x, blk, stride)
    B, h, w, c = x.shape
    return x.reshape(B, h * w, c)


# ---------------------------------------------------------------------------
# int8 serving mode (experimental): v5e's int8 MXU peaks at ~394 TOPS, 2x
# bf16 — weights quantize per-output-channel, activations dynamically
# per-tensor, convs accumulate in int32 (s8s8s32), dequant fuses into the
# bias/ReLU epilogue.  Residual adds stay float.  Measured verdict in
# BASELINE.md decides whether this is a win on this toolchain.
# ---------------------------------------------------------------------------

def quantize_resnet(folded: Dict) -> Dict:
    """fold_batchnorm tree -> int8 tree: per-output-channel symmetric
    weight quantization (w_q int8, w_scale f32 [co]); biases stay f32."""
    if ("bn1" in folded or "w" not in folded["conv1"]
            or "b" not in folded["conv1"]):
        raise ValueError("quantize_resnet expects a fold_batchnorm tree")

    def q(conv):
        w = np.asarray(conv["w"], np.float32)
        absmax = np.abs(w).reshape(-1, w.shape[-1]).max(axis=0)
        scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
        wq = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
        return {"wq": jnp.asarray(wq), "wscale": jnp.asarray(scale),
                "b": jnp.asarray(np.asarray(conv["b"], np.float32))}

    out: Dict = {"conv1": q(folded["conv1"]), "stages": []}
    for blocks in folded["stages"]:
        out["stages"].append([
            {k: q(blk[k]) for k in ("conv1", "conv2", "conv3", "down")
             if k in blk} for blk in blocks])
    return out


def _conv_int8(x: jax.Array, p: Dict, stride: int = 1) -> jax.Array:
    """f32 activations -> dynamic per-tensor int8 -> s8s8s32 conv ->
    fused dequant + bias.  Returns f32."""
    ax = jnp.max(jnp.abs(x))
    xscale = jnp.maximum(ax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x / xscale), -127, 127).astype(jnp.int8)
    kh, kw = p["wq"].shape[0], p["wq"].shape[1]
    pad = ((kh - 1) // 2, (kh - 1) // 2), ((kw - 1) // 2, (kw - 1) // 2)
    acc = jax.lax.conv_general_dilated(
        xq, p["wq"], window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * (xscale * p["wscale"])
            + p["b"].astype(jnp.float32))


def _bottleneck_int8(x, blk, stride):
    y = jax.nn.relu(_conv_int8(x, blk["conv1"]))
    y = jax.nn.relu(_conv_int8(y, blk["conv2"], stride))
    y = _conv_int8(y, blk["conv3"])
    if "down" in blk:
        x = _conv_int8(x, blk["down"], stride)
    return jax.nn.relu(x + y)


def resnet101_apply_int8(params: Dict, x: jax.Array) -> jax.Array:
    """int8 twin of resnet101_apply over a quantize_resnet tree."""
    x = jax.nn.relu(_conv_int8(x.astype(jnp.float32), params["conv1"],
                               stride=2))
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)),
                constant_values=-jnp.inf)
    x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                              (1, 3, 3, 1), (1, 2, 2, 1), "VALID")
    for stage, blocks in enumerate(params["stages"]):
        for b, blk in enumerate(blocks):
            stride = 2 if (stage > 0 and b == 0) else 1
            x = _bottleneck_int8(x, blk, stride)
    B, h, w, c = x.shape
    return x.reshape(B, h * w, c)


def _bn_from_torch(state, prefix):
    return {"scale": jnp.asarray(np.asarray(state[f"{prefix}.weight"])),
            "offset": jnp.asarray(np.asarray(state[f"{prefix}.bias"])),
            "mean": jnp.asarray(np.asarray(state[f"{prefix}.running_mean"])),
            "var": jnp.asarray(np.asarray(state[f"{prefix}.running_var"]))}


def _conv_from_torch(state, key):
    w = np.asarray(state[key])
    return {"w": jnp.asarray(w.transpose(2, 3, 1, 0))}  # OIHW -> HWIO


def resnet_from_torch_state(state: Dict[str, "np.ndarray"],
                            blocks: Tuple[int, ...] = RESNET101_BLOCKS) -> Dict:
    """torchvision resnet state_dict -> our params."""
    params: Dict = {
        "conv1": _conv_from_torch(state, "conv1.weight"),
        "bn1": _bn_from_torch(state, "bn1"),
        "stages": [],
    }
    for stage, n_blocks in enumerate(blocks):
        stage_blocks = []
        for b in range(n_blocks):
            p = f"layer{stage + 1}.{b}"
            blk = {
                "conv1": _conv_from_torch(state, f"{p}.conv1.weight"),
                "bn1": _bn_from_torch(state, f"{p}.bn1"),
                "conv2": _conv_from_torch(state, f"{p}.conv2.weight"),
                "bn2": _bn_from_torch(state, f"{p}.bn2"),
                "conv3": _conv_from_torch(state, f"{p}.conv3.weight"),
                "bn3": _bn_from_torch(state, f"{p}.bn3"),
            }
            if f"{p}.downsample.0.weight" in state:
                blk["down"] = _conv_from_torch(state,
                                               f"{p}.downsample.0.weight")
                blk["down_bn"] = _bn_from_torch(state, f"{p}.downsample.1")
            stage_blocks.append(blk)
        params["stages"].append(stage_blocks)
    return params

"""Stage-fused ResNet identity bottlenecks as ONE Pallas kernel.

The measured 448-px from-pixels gap (BASELINE.md: ResNet-101 37.9% MFU vs
VGG's 47.8%) localizes to the bottleneck stages: between the three convs
of every block, XLA materializes the [B, H, W, C] activations to HBM —
~9.6 MB/image/block of traffic of which only the block input and output
(3.2 MB) are fundamental.  This kernel keeps a batch tile's activations
VMEM-RESIDENT across an entire run of identity blocks (stride 1, no
downsample): grid = (batch_tiles, n_blocks) with the block index
innermost, per-block weights streamed as windowed inputs from a stacked
[N, ...] tree, and the running activation carried in the OUTPUT ref's
VMEM window (its index map ignores the block axis, so Mosaic fetches the
input once per batch tile and flushes the output once — the same
carry-across-grid-steps pattern as ops/rau_train_hops.py).

Per mid-network stage at 448 px (28x28x1024, 22 identity blocks), HBM
traffic drops from ~22 x 9.6 MB to ~3.2 MB + streamed weights per image.

Mosaic constraints honored (docs/mosaic_notes.md): the block loop is a
grid dimension, not a kernel-body loop (#1); no 1-D reductions (#2); no
mixed newaxis+int indexing (#3); no cross-grid accumulation outputs (#6).
The 3x3 conv is 9 shifted [bb*H*W, Cw] @ [Cw, Cw] MXU matmuls over a
zero-padded VMEM scratch plane.

Kill criterion (VERDICT r3 #2): paired same-hour A/B at B=64; retire at
<=1.0x like s2d and int8 were.
"""

from __future__ import annotations

import functools
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def stack_identity_blocks(blocks: List[Dict]) -> Dict:
    """Stack a run of FOLDED identity-block param dicts (no 'down') into
    the [N, ...] tree the kernel streams per grid step.  1x1 convs lose
    their unit spatial dims; the 3x3 becomes 9 stacked taps."""
    assert blocks and all("down" not in b for b in blocks)

    def cat(get):
        return jnp.stack([get(b) for b in blocks])

    return {
        "w1": cat(lambda b: b["conv1"]["w"].reshape(
            b["conv1"]["w"].shape[2], b["conv1"]["w"].shape[3])),
        "b1": cat(lambda b: b["conv1"]["b"].reshape(
            1, b["conv1"]["b"].shape[0])),
        "w2": cat(lambda b: b["conv2"]["w"].reshape(
            9, b["conv2"]["w"].shape[2], b["conv2"]["w"].shape[3])),
        "b2": cat(lambda b: b["conv2"]["b"].reshape(
            1, b["conv2"]["b"].shape[0])),
        "w3": cat(lambda b: b["conv3"]["w"].reshape(
            b["conv3"]["w"].shape[2], b["conv3"]["w"].shape[3])),
        "b3": cat(lambda b: b["conv3"]["b"].reshape(
            1, b["conv3"]["b"].shape[0])),
    }


def _stage_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                  o_ref, y1p_ref):
    h = pl.program_id(1)
    bb, H, W, C = o_ref.shape
    Cw = w1_ref.shape[2]
    Wp = y1p_ref.shape[2]
    f32 = jnp.float32

    @pl.when(h == 0)
    def _():
        # adopt the stage input; also zero the padded plane's borders
        # (only the y1 region is written below, every step)
        o_ref[...] = x_ref[...]
        y1p_ref[...] = jnp.zeros_like(y1p_ref)

    xv = o_ref[...]                                  # [bb, H, W, C]
    dt = xv.dtype
    xf = xv.reshape(bb * H * W, C)

    # 1x1 reduce: [bb*H*W, C] @ [C, Cw], bias+ReLU epilogue.  y1 lands at
    # W-offset 0 — Mosaic requires 8-aligned offsets on the second-minor
    # (sublane) dim; columns W..Wp-1 stay zero and double as the conv's
    # zero padding via roll wraparound below.  The plane is f32: Mosaic's
    # dynamic rotate only handles 32-bit lanes ("Rotate with non-32-bit
    # data"); operands are cast back to the serving dtype AT the matmul,
    # so the MXU still runs bf16 and the rounding matches the unfused
    # path (which also materializes y1 in the serving dtype).
    y1 = jnp.dot(xf, w1_ref[0], preferred_element_type=f32)
    y1 = jnp.maximum(y1 + b1_ref[0].astype(f32), 0.0)
    y1p_ref[:, 1:H + 1, 0:W, :] = y1.reshape(bb, H, W, Cw)

    # 3x3 as 9 shifted MXU matmuls over the zero-padded plane.  A
    # fori_loop, NOT a Python unroll: unrolled matmul loops in kernel
    # bodies have been Mosaic compile pathologies on this rig
    # (CLAUDE.md; docs/mosaic_notes.md #1).  The H shift is a dynamic
    # ref offset (untiled dim — allowed); the W shift CANNOT be a ref
    # offset (sublane dim, must be 8-aligned: mosaic_notes.md #7), so it
    # is a dynamic circular roll whose wraparound pulls the zero columns
    # W..Wp-1 in at the borders — exactly the conv's zero padding, since
    # Wp >= W + 2 leaves >= 1 zero column for each of dx in {0, 2}.
    def tap(t, acc):
        dy = t // 3
        dx = t - dy * 3
        rows = y1p_ref[:, pl.ds(dy, H), :, :]        # [bb, H, Wp, Cw] f32
        # want sl[w] = rows[w + dx - 1] (zero off both ends): roll right
        # by (1 - dx) mod Wp, then keep columns 0..W-1
        rolled = pltpu.roll(rows, (1 - dx) % Wp, 2)
        sl = rolled[:, :, 0:W, :].astype(dt)
        w = w2_ref[0, pl.ds(t, 1)].reshape(Cw, Cw)
        return acc + jnp.dot(sl.reshape(bb * H * W, Cw), w,
                             preferred_element_type=f32)
    acc = jax.lax.fori_loop(
        0, 9, tap, jnp.zeros((bb * H * W, Cw), f32) + b2_ref[0].astype(f32))
    y2 = jnp.maximum(acc, 0.0).astype(dt)

    # 1x1 expand + residual + ReLU; the result is the next block's input
    y3 = jnp.dot(y2, w3_ref[0], preferred_element_type=f32)
    o = jnp.maximum(xf.astype(f32) + y3 + b3_ref[0].astype(f32), 0.0)
    o_ref[...] = o.astype(dt).reshape(bb, H, W, C)


@functools.partial(jax.jit,
                   static_argnames=("block_b", "interpret"))
def fused_identity_stage(x: jax.Array, stack: Dict, *, block_b: int = 2,
                         interpret=None) -> jax.Array:
    """Run N stacked identity bottlenecks over x [B, H, W, C] in one
    pallas_call.  B must divide by block_b (callers pick a divisor).

    ``interpret=None`` (auto) runs the Pallas interpreter on a CPU
    backend (Mosaic only targets TPU — same math, parity-pinned);
    pass False explicitly to force the Mosaic lowering regardless
    (the no-hardware TPU-lowering smoke test does)."""
    B, H, W, C = x.shape
    N, _, Cw = stack["w1"].shape
    if B % block_b:
        raise ValueError(f"batch {B} not divisible by block_b {block_b}")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    act = pl.BlockSpec((block_b, H, W, C), lambda i, h: (i, 0, 0, 0))
    per_block = [
        pl.BlockSpec((1, C, Cw), lambda i, h: (h, 0, 0)),        # w1
        pl.BlockSpec((1, 1, Cw), lambda i, h: (h, 0, 0)),        # b1
        pl.BlockSpec((1, 9, Cw, Cw), lambda i, h: (h, 0, 0, 0)),  # w2
        pl.BlockSpec((1, 1, Cw), lambda i, h: (h, 0, 0)),        # b2
        pl.BlockSpec((1, Cw, C), lambda i, h: (h, 0, 0)),        # w3
        pl.BlockSpec((1, 1, C), lambda i, h: (h, 0, 0)),         # b3
    ]
    flops = 2 * B * N * H * W * (C * Cw * 2 + 9 * Cw * Cw)
    return pl.pallas_call(
        _stage_kernel,
        grid=(B // block_b, N),
        in_specs=[act] + per_block,
        out_specs=act,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        scratch_shapes=[
            # W-pad rounded up to the 8-sublane tile so y1 stores at
            # offset 0; the extra zero columns feed the roll wraparound.
            # f32: Mosaic dynamic rotate is 32-bit-only (see kernel)
            pltpu.VMEM((block_b, H + 2, -(-(W + 2) // 8) * 8, Cw),
                       jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=int(x.size * x.dtype.itemsize * 2
                               + sum(np.prod(v.shape) * v.dtype.itemsize
                                     for v in stack.values())),
            transcendentals=0),
        # the default 16 MB scoped-vmem budget rejects the stage-2 shape
        # (~20 MB working set at block_b=2); this chip has ~128 MB VMEM
        # of which a 96 MB single scratch measures allocatable
        # (docs/mosaic_notes.md #5) — leave the allocator 2x headroom
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, stack["w1"], stack["b1"], stack["w2"], stack["b2"],
      stack["w3"], stack["b3"])


def pick_block_b(batch: int, want: int) -> int:
    """Largest divisor of ``batch`` that is <= want (>=1)."""
    b = max(1, min(want, batch))
    while batch % b:
        b -= 1
    return b

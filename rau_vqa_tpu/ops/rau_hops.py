"""Fused multi-hop answering-unit kernel (Pallas TPU) — the serving hot loop.

The recurrent answering units are serial in the hop dimension (each hop's
LSTM state feeds the next), so XLA executes nHop sequential clusters, each
re-reading the per-image feature tensors ``ifeat [B, S, M]`` and ``iatt
[B, S, F]`` from HBM: ~8x600KB/question of redundant traffic for the 8-hop
models (SURVEY.md §3.2 hot-loop #1; north-star kernel, BASELINE.json).

The Pallas kernel tiles the batch and keeps one tile's image features plus
ALL hop weights resident in VMEM while the whole hop loop runs, so HBM sees
each feature byte once.  Weights and activations are bf16 (halving the VMEM
footprint and feeding the MXU at full rate); every dot accumulates in f32
via ``preferred_element_type``.

The big hop-invariant image embeddings (``i_embed``/``att_i`` — two large
MXU matmuls) stay OUTSIDE the kernel where XLA already schedules them
optimally; the kernel fuses everything downstream: q-embed, content+memory
attention scores, softmax, attention pooling, the ATTLSTM state update, the
residual merge, the classifier and the confidence head — per hop
(reference graph: Ours_SS/LstmAttCtrlGradNoiseDontSelect.lua:229-307).

``rau_hops_reference`` is the numerically identical pure-XLA path used for
validation and as the CPU/debug fallback.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rau_vqa_tpu.config import ModelConfig


def _hop_body(mp, q, ifeat, iatt, c, h, *, dot_dtype):
    """One answering-unit hop on loaded values (shared by both paths).

    q [B, Q], ifeat [B, S, M], iatt [B, S, F], c/h [B, R].
    Weights in ``mp`` are [in, out]."""
    f32 = jnp.float32

    def dot(x, w):
        return jax.lax.dot_general(
            x.astype(dot_dtype), w.astype(dot_dtype),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=f32)

    qfeat = jnp.tanh(dot(q, mp["q_proj"]["w"]) + mp["q_proj"]["b"]
                     + dot(h, mp["h_proj"]["w"]) + mp["h_proj"]["b"])
    qatt = dot(qfeat, mp["att_q"]["w"]) + mp["att_q"]["b"]          # [B, F]
    addfeat = jnp.tanh(iatt.astype(f32) + qatt[:, None, :])         # [B, S, F]
    B, S, F = addfeat.shape
    score_c = dot(addfeat.reshape(B * S, F),
                  mp["att_score"]["w"]).reshape(B, S)
    # 1-element biases added as scalars (mosaic can't lower a (1,)->(B,S)
    # vector broadcast with replicated layout)
    attscore = (score_c + mp["att_score"]["b"].astype(f32)[0]
                + dot(h, mp["att_mem"]["w"]) + mp["att_mem"]["b"])
    attprob = jax.nn.softmax(attscore, axis=-1)                     # [B, S]
    attfeat = jnp.sum(ifeat.astype(f32) * attprob[:, :, None], axis=1)
    join = (qfeat + attfeat
            + dot(attprob, mp["attprob_proj"]["w"]) + mp["attprob_proj"]["b"])
    lp = mp["attlstm"]["layers"][0]
    R = c.shape[-1]
    gates = (dot(join, lp["wi"]) + lp["bi"] + dot(h, lp["wh"]) + lp["bh"])
    i_g = jax.nn.sigmoid(gates[:, :R])
    g_t = jnp.tanh(gates[:, R:2 * R])
    f_g = jax.nn.sigmoid(gates[:, 2 * R:3 * R])
    o_g = jax.nn.sigmoid(gates[:, 3 * R:])
    c = f_g * c + i_g * g_t
    h = o_g * jnp.tanh(c)
    merge = join + dot(h, mp["merge"]["w"]) + mp["merge"]["b"]
    score = dot(merge, mp["cls"]["w"]) + mp["cls"]["b"]
    do_pred = jax.nn.sigmoid(dot(merge, mp["do_pred"]["w"])[:, 0]
                             + mp["do_pred"]["b"].astype(f32)[0])
    return score, do_pred, attprob, c, h


def rau_hops_reference(mp: Dict, cfg: ModelConfig, q, ifeat, iatt,
                       *, dot_dtype=jnp.float32):
    """Pure-XLA hop loop on precomputed image embeddings (eval mode)."""
    B = q.shape[0]
    c = jnp.zeros((B, cfg.att_state_dim), jnp.float32)
    h = jnp.zeros((B, cfg.att_state_dim), jnp.float32)
    scores, do_preds, attprobs = [], [], []
    for _ in range(cfg.n_hops):
        s, d, a, c, h = _hop_body(mp, q, ifeat, iatt, c, h,
                                  dot_dtype=dot_dtype)
        scores.append(s)
        do_preds.append(d)
        attprobs.append(a)
    return jnp.stack(scores), jnp.stack(do_preds), jnp.stack(attprobs)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------

_WEIGHT_ORDER = [
    ("q_proj", "w"), ("q_proj", "b"), ("h_proj", "w"), ("h_proj", "b"),
    ("att_q", "w"), ("att_q", "b"), ("att_score", "w"), ("att_score", "b"),
    ("att_mem", "w"), ("att_mem", "b"),
    ("attprob_proj", "w"), ("attprob_proj", "b"),
    ("attlstm", "layers", 0, "wi"), ("attlstm", "layers", 0, "bi"),
    ("attlstm", "layers", 0, "wh"), ("attlstm", "layers", 0, "bh"),
    ("merge", "w"), ("merge", "b"), ("cls", "w"), ("cls", "b"),
    ("do_pred", "w"), ("do_pred", "b"),
]


from rau_vqa_tpu.ops.treeflat import pluck as _pluck, rebuild


def _rebuild(flat) -> Dict:
    return rebuild(_WEIGHT_ORDER, flat)


def _kernel(n_hops: int, q_ref, ifeat_ref, iatt_ref, *refs):
    weight_refs = refs[:len(_WEIGHT_ORDER)]
    scores_ref, dopred_ref, attprob_ref = refs[len(_WEIGHT_ORDER):]
    mp = _rebuild([r[:] for r in weight_refs])
    q = q_ref[:]
    ifeat = ifeat_ref[:]
    iatt = iatt_ref[:]
    B = q.shape[0]
    R = mp["attlstm"]["layers"][0]["wh"].shape[0]

    # fori_loop (not a Python unroll): n_hops-times smaller program for the
    # Mosaic layout solver — the unrolled variant compiled pathologically
    def body(hop, carry):
        c, h = carry
        s, d, a, c, h = _hop_body(mp, q, ifeat, iatt, c, h,
                                  dot_dtype=jnp.bfloat16)
        scores_ref[pl.ds(hop, 1), :, :] = s[None]
        # do_pred is [B]; TPU blocks need a 128-wide lane dim — broadcast
        # into a padded [B, 128] row, sliced back to [H, B] by the caller
        dopred_ref[pl.ds(hop, 1), :, :] = jnp.broadcast_to(
            d[:, None], (B, 128))[None]
        attprob_ref[pl.ds(hop, 1), :, :] = a[None]
        return (c, h)

    c0 = jnp.zeros((B, R), jnp.float32)
    h0 = jnp.zeros((B, R), jnp.float32)
    jax.lax.fori_loop(0, n_hops, body, (c0, h0))


@functools.partial(jax.jit, static_argnames=("cfg", "block_b", "interpret"))
def rau_hops_pallas(mp: Dict, cfg: ModelConfig, q, ifeat, iatt, *,
                    block_b: int = 16, interpret: bool = False
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Fused hop loop: q [B, Q], ifeat [B, S, M], iatt [B, S, F] ->
    (scores [H, B, A], do_pred [H, B], attprob [H, B, S]).

    B must be a multiple of ``block_b``.  Weights are cast to bf16 once at
    the call boundary; per-tile VMEM footprint at the default config
    (S=196, M=512, F=256, A=1000, block_b=16) is ~12 MB."""
    B, S, M = ifeat.shape
    H, A = cfg.n_hops, cfg.answer_size
    if B % block_b:
        raise ValueError(f"batch {B} not divisible by block_b {block_b}")
    grid = (B // block_b,)

    bf16 = jnp.bfloat16
    weights = [_pluck(mp, path) for path in _WEIGHT_ORDER]
    weights = [w.astype(bf16) for w in weights]

    in_specs = [
        pl.BlockSpec((block_b, q.shape[1]), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, S, M), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, S, iatt.shape[2]), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    for w in weights:
        in_specs.append(pl.BlockSpec(
            w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
            memory_space=pltpu.VMEM))

    out_shape = (
        jax.ShapeDtypeStruct((H, B, A), jnp.float32),
        jax.ShapeDtypeStruct((H, B, 128), jnp.float32),  # do_pred, lane-padded
        jax.ShapeDtypeStruct((H, B, S), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((H, block_b, A), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, block_b, 128), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, block_b, S), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    )

    kernel = functools.partial(_kernel, cfg.n_hops)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            # empirical probe (round 2): ~96-128 MB VMEM usable on this v5e
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(q.astype(bf16), ifeat.astype(bf16), iatt.astype(bf16), *weights)
    scores, dopred_padded, attprob = out
    return scores, dopred_padded[:, :, 0], attprob

"""Fused question-encoder LSTM scan (Pallas TPU) — SURVEY.md hot-loop #2.

The question encoder runs a 2-layer LSTM over <=26 tokens (the reference
time-unrolls 26 weight-shared clones, Ours_SS/...lua:331-342, :448-462).
The XLA `lax.scan` version dispatches 26 small sequential steps; this kernel
runs the whole scan for a batch tile inside one Pallas program — the four
gate matrices stay VMEM-resident across all timesteps, gates compute in bf16
on the MXU with f32 state, and the per-example last-token gather
(reference's per-k Python loop, :455-461) becomes an in-register masked
select per step.

Eval/serving path only (training uses the differentiable XLA scan).
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rau_vqa_tpu.config import ModelConfig


def _cell_step(layers, x, state, R, n_layers):
    """Packed-state DeepLSTM step on loaded values (gate layout
    [in, forget, out | in_transform], DeepLSTM.lua:47-54)."""
    f32 = jnp.float32

    def dot(a, w):
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())), preferred_element_type=f32)

    inp = x
    outs = []
    for L in range(n_layers):
        wi, bi, wh, bh = layers[L]
        c = state[:, 2 * L * R:(2 * L + 1) * R]
        h = state[:, (2 * L + 1) * R:(2 * L + 2) * R]
        gates = dot(inp, wi) + bi + dot(h, wh) + bh
        sig = jax.nn.sigmoid(gates[:, :3 * R])
        i_g = sig[:, :R]
        f_g = sig[:, R:2 * R]
        o_g = sig[:, 2 * R:3 * R]
        g_t = jnp.tanh(gates[:, 3 * R:])
        nc = f_g * c + i_g * g_t
        nh = o_g * jnp.tanh(nc)
        outs += [nc, nh]
        inp = nh
    return jnp.concatenate(outs, axis=1)


def _kernel(T: int, R: int, n_layers: int, emb_ref, len_ref, *refs):
    weight_refs = refs[:4 * n_layers]
    out_ref = refs[-1]
    layers = []
    for L in range(n_layers):
        layers.append(tuple(weight_refs[4 * L + k][:] for k in range(4)))
    lens = len_ref[:, 0]                                 # [Bt] int32
    Bt = lens.shape[0]
    D = out_ref.shape[-1]

    def body(t, carry):
        state, rnn_out = carry
        x = emb_ref[:, t, :]                             # [Bt, E]
        state = _cell_step(layers, x, state, R, n_layers)
        take = (lens == t + 1)[:, None]                  # question ends here
        rnn_out = jnp.where(take, state, rnn_out)
        return state, rnn_out

    zeros = jnp.zeros((Bt, D), jnp.float32)
    _, rnn_out = jax.lax.fori_loop(0, T, body, (zeros, zeros))
    out_ref[:] = rnn_out


@functools.partial(jax.jit, static_argnames=("cfg", "block_b", "interpret"))
def lstm_encode_pallas(rnn_params: Dict, cfg: ModelConfig, emb: jax.Array,
                       lengths: jax.Array, *, block_b: int = 16,
                       interpret: bool = False) -> jax.Array:
    """emb [B, T, E] (post word-embed tanh), lengths [B] -> rnn_out
    [B, 2*n*R].  B must divide by block_b."""
    B, T, E = emb.shape
    R = cfg.rnn_size
    n_layers = cfg.rnn_layers
    if B % block_b:
        raise ValueError(f"batch {B} not divisible by block_b {block_b}")

    bf16 = jnp.bfloat16
    weights = []
    for lp in rnn_params["layers"]:
        weights += [lp["wi"].astype(bf16), lp["bi"].astype(bf16),
                    lp["wh"].astype(bf16), lp["bh"].astype(bf16)]

    # lengths lane-padded to a [B, 128] int32 block (SMEM-free masking)
    len_pad = jnp.broadcast_to(lengths.astype(jnp.int32)[:, None], (B, 128))

    in_specs = [
        pl.BlockSpec((block_b, T, E), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, 128), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    for w in weights:
        in_specs.append(pl.BlockSpec(
            w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
            memory_space=pltpu.VMEM))

    kernel = functools.partial(_kernel, T, R, n_layers)
    return pl.pallas_call(
        kernel,
        grid=(B // block_b,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_b, cfg.rnnout_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, cfg.rnnout_dim), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(emb, len_pad, *weights)


def encode_question_fused(params: Dict, cfg: ModelConfig, tokens: jax.Array,
                          lengths: jax.Array, *, block_b: int = 16,
                          interpret: bool = False) -> jax.Array:
    """Embedding gather + tanh in XLA, LSTM scan in the fused kernel."""
    emb = jnp.tanh(jnp.take(params["embed"]["lookup"], tokens, axis=0))
    return lstm_encode_pallas(params["rnn"], cfg, emb, lengths,
                              block_b=block_b, interpret=interpret)

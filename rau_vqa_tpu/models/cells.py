"""LSTM cells for the RAU model, as pure functions over explicit pytrees.

Two distinct cells, matching the reference's two distinct gate conventions:

- ``deep_lstm_cell``: the question LSTM (reference model/DeepLSTM.lua).
  Packed state ``[B, 2*n*R]`` holding per-layer ``(c, h)`` pairs; gate layout
  ``[in, forget, out | in_transform]`` — the first 3R columns go through one
  sigmoid, the last R through tanh (DeepLSTM.lua:47-54).  Dropout is applied
  to the *input of layers >= 2 only* (DeepLSTM.lua:39).

- ``att_lstm_cell``: the answering-unit LSTM (reference model/ATTLSTM.lua).
  Separate ``c`` / ``h`` state tensors; gate layout ``[in, in_transform,
  forget, out]`` after a ``(4, R)`` reshape (ATTLSTM.lua:12-19).  Dropout is
  applied to the input of *every* layer including the first (ATTLSTM.lua:52).

Weights are stored ``[in, out]`` (JAX row-major ``x @ W``); the Torch
checkpoint converter transposes from Torch's ``[out, in]`` Linear layout.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp


Params = Dict


def dropout(x: jax.Array, rate: float, rng: jax.Array, train: bool) -> jax.Array:
    """Inverted dropout (scale-at-train), matching torch nn.Dropout semantics."""
    if not train or rate <= 0.0:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def _uniform(key: jax.Array, shape, scale: float, dtype) -> jax.Array:
    return jax.random.uniform(key, shape, dtype, minval=-scale, maxval=scale)


def _linear_init(key: jax.Array, d_in: int, d_out: int, scale: float, dtype) -> Params:
    kw, kb = jax.random.split(key)
    return {
        "w": _uniform(kw, (d_in, d_out), scale, dtype),
        "b": _uniform(kb, (d_out,), scale, dtype),
    }


def lstm_layer_init(key: jax.Array, d_in: int, rnn_size: int,
                    scale: float = 0.08, dtype=jnp.float32) -> Params:
    """One LSTM layer: fused 4-gate input and hidden projections
    (i2h/h2h at DeepLSTM.lua:43-44, ATTLSTM.lua:6-7)."""
    ki, kh = jax.random.split(key)
    p_i = _linear_init(ki, d_in, 4 * rnn_size, scale, dtype)
    p_h = _linear_init(kh, rnn_size, 4 * rnn_size, scale, dtype)
    return {"wi": p_i["w"], "bi": p_i["b"], "wh": p_h["w"], "bh": p_h["b"]}


# ---------------------------------------------------------------------------
# DeepLSTM — question encoder cell (model/DeepLSTM.lua)
# ---------------------------------------------------------------------------

def deep_lstm_init(key: jax.Array, input_size: int, rnn_size: int,
                   n_layers: int, scale: float = 0.08, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, n_layers)
    layers: List[Params] = []
    d_in = input_size
    for L in range(n_layers):
        layers.append(lstm_layer_init(keys[L], d_in, rnn_size, scale, dtype))
        d_in = rnn_size
    return {"layers": layers}


def deep_lstm_cell(params: Params, x: jax.Array, state: jax.Array, *,
                   rnn_size: int, dropout_rate: float = 0.0,
                   train: bool = False, rng: jax.Array | None = None,
                   l1_in_gates: jax.Array | None = None) -> jax.Array:
    """One timestep of the packed-state question LSTM.

    state layout per layer L (0-based): ``[c_L | h_L]`` at offset ``2*L*R``
    (DeepLSTM.lua:23-24); output packs ``(next_c, next_h)`` per layer in the
    same order (DeepLSTM.lua:63-68).

    ``l1_in_gates``: optional precomputed ``x @ wi + bi`` for layer 1 [B, 4R].
    Layer 1's input projection has no serial dependency, so the encoder
    hoists it out of the scan as one [B*T, E] x [E, 4R] matmul — exact same
    math, MXU-batched instead of 26 small serial matmuls (layer 1's input
    is never dropout-ed: DeepLSTM.lua:39 drops layers >= 2 only).
    """
    R = rnn_size
    inp = x
    outs: List[jax.Array] = []
    for L, lp in enumerate(params["layers"]):
        c = state[:, 2 * L * R:(2 * L + 1) * R]
        h = state[:, (2 * L + 1) * R:(2 * L + 2) * R]
        if L > 0 and train and dropout_rate > 0.0:
            inp = dropout(inp, dropout_rate, jax.random.fold_in(rng, L), train)
        if L == 0 and l1_in_gates is not None:
            gates = l1_in_gates + (h @ lp["wh"] + lp["bh"])
        else:
            gates = (inp @ lp["wi"] + lp["bi"]) + (h @ lp["wh"] + lp["bh"])
        # gate layout [in, forget, out, in_transform] (DeepLSTM.lua:47-54)
        sig = jax.nn.sigmoid(gates[:, :3 * R])
        i_g = sig[:, :R]
        f_g = sig[:, R:2 * R]
        o_g = sig[:, 2 * R:3 * R]
        g_t = jnp.tanh(gates[:, 3 * R:])
        next_c = f_g * c + i_g * g_t
        next_h = o_g * jnp.tanh(next_c)
        outs.append(next_c)
        outs.append(next_h)
        inp = next_h
    return jnp.concatenate(outs, axis=1)


# ---------------------------------------------------------------------------
# ATTLSTM — answering-unit cell (model/ATTLSTM.lua)
# ---------------------------------------------------------------------------

def att_lstm_init(key: jax.Array, input_size: int, rnn_size: int,
                  n_layers: int, scale: float = 0.08, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, n_layers)
    layers: List[Params] = []
    d_in = input_size
    for L in range(n_layers):
        layers.append(lstm_layer_init(keys[L], d_in, rnn_size, scale, dtype))
        d_in = rnn_size
    return {"layers": layers}


def att_lstm_cell(params: Params, x: jax.Array, prev_c: jax.Array,
                  prev_h: jax.Array, *, rnn_size: int,
                  dropout_rate: float = 0.0, train: bool = False,
                  rng: jax.Array | None = None) -> Tuple[jax.Array, jax.Array]:
    """One step of the answering-unit LSTM with separate (c, h) state.

    state slicing per layer at offset ``L*R`` (ATTLSTM.lua:43-44); gate layout
    after the (4, R) reshape is ``[in, in_transform, forget, out]``
    (ATTLSTM.lua:16-19) — note this differs from DeepLSTM's layout.
    """
    R = rnn_size
    inp = x
    next_cs: List[jax.Array] = []
    next_hs: List[jax.Array] = []
    for L, lp in enumerate(params["layers"]):
        c = prev_c[:, L * R:(L + 1) * R]
        h = prev_h[:, L * R:(L + 1) * R]
        if train and dropout_rate > 0.0:
            # ATTLSTM applies dropout on every layer's input (ATTLSTM.lua:52)
            inp = dropout(inp, dropout_rate, jax.random.fold_in(rng, L), train)
        gates = (inp @ lp["wi"] + lp["bi"]) + (h @ lp["wh"] + lp["bh"])
        i_g = jax.nn.sigmoid(gates[:, :R])
        g_t = jnp.tanh(gates[:, R:2 * R])
        f_g = jax.nn.sigmoid(gates[:, 2 * R:3 * R])
        o_g = jax.nn.sigmoid(gates[:, 3 * R:])
        next_c = f_g * c + i_g * g_t
        next_h = o_g * jnp.tanh(next_c)
        next_cs.append(next_c)
        next_hs.append(next_h)
        inp = next_h
    return jnp.concatenate(next_cs, axis=1), jnp.concatenate(next_hs, axis=1)

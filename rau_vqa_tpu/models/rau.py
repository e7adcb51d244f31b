"""The RAU (Recurrent Answering Units) VQA model as pure functional JAX.

Reconstructs the behaviour of the reference nngraph model
(Ours_SS/LstmAttCtrlGradNoiseDontSelect.lua:198-320) TPU-first:

- question encoding is a single ``lax.scan`` over tokens with a vectorized
  last-token gather (``states[lengths-1, arange(B)]``), replacing the
  reference's seq_len weight-shared clones and per-example Python gather
  (reference :331-347, :455-461);
- the nHop answering units are a statically unrolled loop over ONE shared
  parameter set (the reference clones share storage, :343-347);
- image features are laid out ``[B, S, D]`` (spatial-major, feature in lanes)
  so every 1x1 "conv" in the reference becomes a lane-aligned matmul on the
  MXU;
- at eval, the hop-invariant image embedding AND question projection are
  hoisted out of the hop loop (the reference recomputes both per clone),
  and the encoder's layer-1 input projection is hoisted out of the scan.

Parameters are plain nested dicts in three groups — ``embed``, ``rnn``,
``mult`` — mirroring the reference's three flat param vectors
(reference :322-324) so Torch snapshots can be converted losslessly.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rau_vqa_tpu.config import ModelConfig
from rau_vqa_tpu.models.cells import (
    _linear_init,
    _uniform,
    att_lstm_cell,
    att_lstm_init,
    deep_lstm_cell,
    deep_lstm_init,
    dropout,
)

Params = Dict


class RAUOutput(NamedTuple):
    """Per-hop predictions of one forward pass.

    scores:   [H, B, A]  raw answer logits per hop (reference `pred[1]`)
    do_pred:  [H, B]     answer-confidence sigmoid outputs (reference `pred[2]`)
    attprob:  [H, B, S]  spatial attention distributions (reference `pred[3]`)
    final_c:  [B, att_state_dim]
    final_h:  [B, att_state_dim]
    """

    scores: jax.Array
    do_pred: jax.Array
    attprob: jax.Array
    final_c: jax.Array
    final_h: jax.Array


# ---------------------------------------------------------------------------
# Initialization — uniform(-0.08, 0.08) over every weight and bias
# (reference :349-355 applies :uniform to the flat param vectors)
# ---------------------------------------------------------------------------

def init_params(key: jax.Array, cfg: ModelConfig) -> Params:
    dtype = jnp.dtype(cfg.param_dtype)
    scale = 0.08
    k_embed, k_rnn, *k_mult = jax.random.split(key, 14)

    embed = {"lookup": _uniform(k_embed, (cfg.vocab_size, cfg.embed_dim), scale, dtype)}
    rnn = deep_lstm_init(k_rnn, cfg.embed_dim, cfg.rnn_size, cfg.rnn_layers,
                         scale, dtype)

    S = cfg.cnn_spat
    M = cfg.multfeat_dim
    mult = {
        # [q_embed] (reference :231-236)
        "q_proj": _linear_init(k_mult[0], cfg.rnnout_dim, M, scale, dtype),
        "h_proj": _linear_init(k_mult[1], cfg.att_state_dim, M, scale, dtype),
        # [i_embed] 1x1 conv == per-cell linear (reference :238-242)
        "i_embed": _linear_init(k_mult[2], cfg.cnn_dim, M, scale, dtype),
        # [attbycontent] (reference :244-252)
        "att_q": _linear_init(k_mult[3], M, cfg.attfeat_dim, scale, dtype),
        "att_i": _linear_init(k_mult[4], M, cfg.attfeat_dim, scale, dtype),
        "att_score": _linear_init(k_mult[5], cfg.attfeat_dim, 1, scale, dtype),
        # [attbymemory] (reference :285-290)
        "att_mem": _linear_init(k_mult[6], cfg.att_state_dim, S, scale, dtype),
        # [classifier] (reference :265-283)
        "attprob_proj": _linear_init(k_mult[7], S, M, scale, dtype),
        "attlstm": att_lstm_init(k_mult[8], M, cfg.att_rnn_size,
                                 cfg.att_rnn_layers, scale, dtype),
        "merge": _linear_init(k_mult[9], cfg.att_state_dim, M, scale, dtype),
        "cls": _linear_init(k_mult[10], M, cfg.answer_size, scale, dtype),
        "do_pred": _linear_init(k_mult[11], M, 1, scale, dtype),
    }
    return {"embed": embed, "rnn": rnn, "mult": mult}


# ---------------------------------------------------------------------------
# Question encoder — word embed + 2-layer LSTM scan + last-token gather
# ---------------------------------------------------------------------------

def encode_question(params: Params, cfg: ModelConfig, tokens: jax.Array,
                    lengths: jax.Array, *, train: bool = False,
                    rng: Optional[jax.Array] = None) -> jax.Array:
    """tokens [B, T] int32 (0 = ZEROPAD), lengths [B] int32 in [1, T].

    Returns rnn_out [B, rnnout_dim]: the packed (c, h) LSTM state at each
    question's last real token (reference :448-461 gathers `lst[k]` where
    `x_len[k] == t`; here it is one vectorized gather over the scanned states).
    """
    B, T = tokens.shape
    emb = jnp.take(params["embed"]["lookup"], tokens, axis=0)  # [B, T, E]
    if train and cfg.embed_dropout > 0.0 and rng is not None:
        # (train=True with dropout and rng=None is rejected up front in
        # rau_forward; this guard covers direct encode_question callers)
        # position-indexed masks (one key per timestep, like the reference's
        # per-clone dropout): drawing a single [B, T, E] mask would make the
        # mask depend on T, breaking the exactness of train-time length
        # truncation (TrainConfig.length_buckets)
        k_emb = jax.random.fold_in(rng, 0)
        keys_t = jax.vmap(lambda t: jax.random.fold_in(k_emb, t))(
            jnp.arange(T))
        emb = jax.vmap(
            lambda k, x: dropout(x, cfg.embed_dropout, k, True),
            in_axes=(0, 1), out_axes=1)(keys_t, emb)
    emb = jnp.tanh(emb)  # word_embed = LookupTable→Dropout→Tanh (reference :203-206)

    init_state = jnp.zeros((B, cfg.rnnout_dim), emb.dtype)
    step_rng = jax.random.fold_in(rng, 1) if rng is not None else None

    # layer 1's input projection has no serial dependency: hoist it out of
    # the scan as ONE [B*T, E] x [E, 4R] MXU matmul (the scan then runs 2
    # serial matmuls/step instead of 3 — the encoder is latency-bound)
    l1 = params["rnn"]["layers"][0]
    l1_gates = (emb.reshape(B * T, -1) @ l1["wi"]
                + l1["bi"]).reshape(B, T, -1)

    def step(state, xs):
        x_t, g1_t, t = xs
        rng_t = jax.random.fold_in(step_rng, t) if step_rng is not None else None
        new_state = deep_lstm_cell(params["rnn"], x_t, state,
                                   rnn_size=cfg.rnn_size,
                                   dropout_rate=cfg.rnn_dropout,
                                   train=train, rng=rng_t,
                                   l1_in_gates=g1_t)
        return new_state, new_state

    xs = (jnp.swapaxes(emb, 0, 1), jnp.swapaxes(l1_gates, 0, 1),
          jnp.arange(T))
    _, states = jax.lax.scan(step, init_state, xs)          # [T, B, D]
    rnn_out = states[lengths - 1, jnp.arange(B)]            # [B, D]
    return rnn_out


# ---------------------------------------------------------------------------
# Answering unit — one hop of attention + ATTLSTM + classifier
# ---------------------------------------------------------------------------

def embed_image(mp: Params, cfg: ModelConfig, feats: jax.Array, *,
                train: bool = False,
                rng: Optional[jax.Array] = None) -> Tuple[jax.Array, jax.Array]:
    """[i_embed] + the image half of [attbycontent] (reference :238-242, :247-249).

    feats [B, S, Dc] -> (ifeat [B, S, M], iatt [B, S, attfeat_dim]).
    Both are hop-invariant when dropout is off, so eval computes them once.
    """
    x = feats
    if train and cfg.mult_dropout > 0.0:
        x = dropout(x, cfg.mult_dropout, rng, train)
    ifeat = jnp.tanh(x @ mp["i_embed"]["w"] + mp["i_embed"]["b"])
    iatt = ifeat @ mp["att_i"]["w"] + mp["att_i"]["b"]
    return ifeat, iatt


def answering_unit(mp: Params, cfg: ModelConfig, q: jax.Array,
                   ifeat: jax.Array, iatt: jax.Array, c: jax.Array,
                   h: jax.Array, *, train: bool = False,
                   rng: Optional[jax.Array] = None,
                   q_proj_pre: Optional[jax.Array] = None):
    """One recurrent answering unit (the `multimodal` gModule, reference :291-307).

    q [B, rnnout_dim], ifeat [B, S, M], iatt [B, S, F], c/h [B, att_state_dim].
    Returns (score [B, A], do_pred [B], attprob [B, S], next_c, next_h).

    ``q_proj_pre``: optional precomputed ``q @ q_proj + b`` [B, M].  At eval
    there is no q-dropout, so the projection is hop-invariant and the
    caller hoists it out of the hop loop (same bits: addition order
    unchanged).
    """
    k_q = jax.random.fold_in(rng, 0) if rng is not None else None
    k_lstm = jax.random.fold_in(rng, 1) if rng is not None else None
    k_merge = jax.random.fold_in(rng, 2) if rng is not None else None

    # [q_embed]: tanh(Wq·dropout(q) + Wh·prev_h) (reference :231-236)
    if q_proj_pre is None:
        q_in = dropout(q, cfg.mult_dropout, k_q, train) if train else q
        q_proj_pre = q_in @ mp["q_proj"]["w"] + mp["q_proj"]["b"]
    qfeat = jnp.tanh(q_proj_pre
                     + h @ mp["h_proj"]["w"] + mp["h_proj"]["b"])

    # [attbycontent]: per-cell score from tanh(iatt + qatt) (reference :244-252)
    qatt = qfeat @ mp["att_q"]["w"] + mp["att_q"]["b"]          # [B, F]
    addfeat = jnp.tanh(iatt + qatt[:, None, :])                 # [B, S, F]
    attscore = (addfeat @ mp["att_score"]["w"])[..., 0] + mp["att_score"]["b"]

    # [attbymemory]: add the h-state score bias, then softmax (reference :285-290)
    attscore = attscore + h @ mp["att_mem"]["w"] + mp["att_mem"]["b"]
    attprob = jax.nn.softmax(attscore, axis=-1)                 # [B, S]

    # [attselect]: attention-weighted spatial pooling (reference :254-263)
    attfeat = jnp.einsum("bsm,bs->bm", ifeat, attprob)

    # [classifier] (reference :265-283)
    join = (qfeat + attfeat
            + attprob @ mp["attprob_proj"]["w"] + mp["attprob_proj"]["b"])
    next_c, next_h = att_lstm_cell(mp["attlstm"], join, c, h,
                                   rnn_size=cfg.att_rnn_size,
                                   dropout_rate=cfg.att_rnn_dropout,
                                   train=train, rng=k_lstm)
    lstmfeat = next_h
    if train and cfg.att_rnn_dropout > 0.0:
        lstmfeat = dropout(lstmfeat, cfg.att_rnn_dropout,
                           jax.random.fold_in(rng, 3), train)
    merge = join + lstmfeat @ mp["merge"]["w"] + mp["merge"]["b"]
    if train and cfg.mult_dropout > 0.0:
        merge = dropout(merge, cfg.mult_dropout, k_merge, train)
    score = merge @ mp["cls"]["w"] + mp["cls"]["b"]
    do_pred = jax.nn.sigmoid(merge @ mp["do_pred"]["w"] + mp["do_pred"]["b"])[:, 0]
    return score, do_pred, attprob, next_c, next_h


# ---------------------------------------------------------------------------
# Full forward — encoder + nHop answering units
# ---------------------------------------------------------------------------

def rau_forward(params: Params, cfg: ModelConfig, tokens: jax.Array,
                lengths: jax.Array, feats: jax.Array, *, train: bool = False,
                rng: Optional[jax.Array] = None) -> RAUOutput:
    """End-to-end forward pass for one batch.

    tokens [B, T] int32, lengths [B] int32, feats [B, S, Dc] float.
    The hop loop is unrolled (n_hops <= ~10): each hop shares the one `mult`
    parameter set, matching the reference's weight-shared clones (:343-347).
    """
    if train and rng is None and (cfg.embed_dropout > 0.0
                                  or cfg.rnn_dropout > 0.0
                                  or cfg.mult_dropout > 0.0):
        # only SOME dropout sites guard on rng (key derivation); the
        # answering-unit / embed_image applications would crash on a None
        # key deep inside the hop loop — fail here with the real contract
        raise ValueError(
            "rau_forward(train=True) with dropout enabled requires rng")
    with jax.default_matmul_precision(cfg.matmul_precision):
        return _rau_forward(params, cfg, tokens, lengths, feats,
                            train=train, rng=rng)


def _rau_forward(params: Params, cfg: ModelConfig, tokens: jax.Array,
                 lengths: jax.Array, feats: jax.Array, *, train: bool,
                 rng: Optional[jax.Array]) -> RAUOutput:
    B = tokens.shape[0]
    mp = params["mult"]
    if cfg.compute_dtype != cfg.param_dtype:
        cdt = jnp.dtype(cfg.compute_dtype)
        params = jax.tree.map(lambda x: x.astype(cdt), params)
        mp = params["mult"]
        feats = feats.astype(cdt)
    k_enc = jax.random.fold_in(rng, 0) if rng is not None else None
    k_hops = jax.random.fold_in(rng, 1) if rng is not None else None

    q = encode_question(params, cfg, tokens, lengths, train=train, rng=k_enc)

    if train and cfg.fused_train:
        # fused Pallas custom-VJP hop loop (pure-XLA reference path off-TPU);
        # do_pred/attprob are zero-gradient monitors in the reference
        # (d_do_pred:mul(0), :565-567) — the kernel's backward ignores their
        # cotangents, so stop_gradient makes that contract explicit here
        from rau_vqa_tpu.ops.rau_train_hops import (
            rau_train_hops,
            rau_train_hops_reference,
        )
        seed = (jax.random.randint(k_hops, (), 0,
                                   jnp.iinfo(jnp.int32).max,
                                   dtype=jnp.int32)
                if k_hops is not None else jnp.int32(0))
        on_tpu = (jax.devices()[0].platform == "tpu"
                  and cfg.fused_train_impl == "pallas")
        if on_tpu:
            scores, do_pred, attprob, fc, fh = rau_train_hops(
                mp, cfg, q, feats, seed, block_b=cfg.fused_train_block)
        else:
            scores, do_pred, attprob, fc, fh = rau_train_hops_reference(
                mp, cfg, q, feats, seed)
        return RAUOutput(
            scores=scores,
            do_pred=jax.lax.stop_gradient(do_pred),
            attprob=jax.lax.stop_gradient(attprob),
            final_c=jax.lax.stop_gradient(fc),
            final_h=jax.lax.stop_gradient(fh),
        )

    c = jnp.zeros((B, cfg.att_state_dim), q.dtype)
    h = jnp.zeros((B, cfg.att_state_dim), q.dtype)

    if not train:
        # hop-invariant at eval: hoist out of the loop (image embedding AND
        # the question projection — no dropout means both repeat verbatim)
        ifeat, iatt = embed_image(mp, cfg, feats, train=False)
        q_pre = q @ mp["q_proj"]["w"] + mp["q_proj"]["b"]

    def hop_step(mp_, q_, feats_or_embeds, c_, h_, k_hop):
        if train:
            k_img = jax.random.fold_in(k_hop, 97)
            # the reference's per-hop clones draw independent dropout masks
            ifeat_, iatt_ = embed_image(mp_, cfg, feats_or_embeds,
                                        train=True, rng=k_img)
            return answering_unit(mp_, cfg, q_, ifeat_, iatt_, c_, h_,
                                  train=True, rng=k_hop)
        ifeat_, iatt_ = feats_or_embeds
        return answering_unit(mp_, cfg, q_, ifeat_, iatt_, c_, h_,
                              train=False, rng=k_hop, q_proj_pre=q_pre)

    if train and cfg.remat_hops:
        # recompute the hop forward in the backward pass instead of saving
        # the per-hop [B, S, M]-sized ifeat/iatt/addfeat activations
        hop_step = jax.checkpoint(hop_step, static_argnums=())

    scores, do_preds, attprobs = [], [], []
    for hop in range(cfg.n_hops):
        k_hop = jax.random.fold_in(k_hops, hop) if k_hops is not None else None
        score, do_p, attp, c, h = hop_step(
            mp, q, feats if train else (ifeat, iatt), c, h, k_hop)
        scores.append(score)
        do_preds.append(do_p)
        attprobs.append(attp)

    return RAUOutput(
        scores=jnp.stack(scores),
        do_pred=jnp.stack(do_preds),
        attprob=jnp.stack(attprobs),
        final_c=c,
        final_h=h,
    )

"""Fused multi-hop answering-unit TRAINING step (Pallas TPU, custom VJP).

The training hot loop (reference feval,
Ours_SS/LstmAttCtrlGradNoiseDontSelect.lua:478-596) runs nHop answering
units per iteration; unlike eval, each hop re-embeds the image features
under an independent dropout mask (the reference's per-hop clones draw
independent masks, :343-347), so XLA's autodiff both re-reads ``feats
[B, S, Dc]`` from HBM per hop in the forward AND saves 8 hops' worth of
``[B, S, M]``-sized activations (ifeat/iatt/addfeat) for the backward —
several GB of HBM traffic per step at B=512.

This module fuses the whole hop loop into a custom-VJP pair of Pallas
kernels:

- ``forward``: one batch tile's ``feats`` plus ALL hop weights stay resident
  in VMEM for the entire hop loop; dropout masks are generated in-kernel
  (ops/maskgen.py counter hash — reproducible everywhere); residuals are
  only the per-hop LSTM carries ``[H+1, B, R]`` (~1000x smaller than the
  activations XLA would save).
- ``backward``: re-materializes each hop from (q, feats, carries, masks)
  inside the kernel — the remat runs entirely out of VMEM — and produces
  ALL weight gradients via in-VMEM f32 accumulators that persist across the
  sequential batch-tile grid, plus dq for the question encoder.

``rau_train_hops_reference`` is the numerically identical pure-XLA path
(same counter-derived masks), used as the CPU fallback and as the autodiff
oracle for grad-parity tests.

Monitors: ``do_pred`` and ``attprob`` carry no gradient in the reference
(d_do_pred:mul(0), :565-567; attention probs are never a loss) — the
backward here ignores their cotangents, matching train/losses.py which
stop-gradients them.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rau_vqa_tpu.config import ModelConfig
from rau_vqa_tpu.ops.maskgen import dropout_scale_mask, site_salt

f32 = jnp.float32

# weights the loss differentiates, in kernel argument order
_DIFF_WEIGHTS = [
    ("q_proj", "w"), ("q_proj", "b"), ("h_proj", "w"), ("h_proj", "b"),
    ("i_embed", "w"), ("i_embed", "b"),
    ("att_q", "w"), ("att_q", "b"), ("att_i", "w"), ("att_i", "b"),
    ("att_score", "w"), ("att_score", "b"),
    ("att_mem", "w"), ("att_mem", "b"),
    ("attprob_proj", "w"), ("attprob_proj", "b"),
    ("attlstm", "layers", 0, "wi"), ("attlstm", "layers", 0, "bi"),
    ("attlstm", "layers", 0, "wh"), ("attlstm", "layers", 0, "bh"),
    ("merge", "w"), ("merge", "b"), ("cls", "w"), ("cls", "b"),
]
# do_pred params are forward-only (zero gradient — the "DontSelect" rule)
_FWD_WEIGHTS = _DIFF_WEIGHTS + [("do_pred", "w"), ("do_pred", "b")]

_SITE_FEATS, _SITE_Q, _SITE_MERGE = 0, 1, 2


def _pluck(mp: Dict, path):
    node = mp
    for p in path:
        node = node[p]
    return node


def _rebuild(order, flat) -> Dict:
    mp: Dict = {}
    for path, leaf in zip(order, flat):
        node = mp
        for j, p in enumerate(path[:-1]):
            if isinstance(p, int):
                while len(node) <= p:
                    node.append({})
                node = node[p]
            else:
                if p not in node:
                    node[p] = [] if isinstance(path[j + 1], int) else {}
                node = node[p]
        node[path[-1]] = leaf
    return mp


def _masks(cfg: ModelConfig, shapes, row0, seed, hop):
    """The three per-hop dropout mask tensors (f32 scale factors), derived
    from the element's GLOBAL batch position so any batch tiling agrees."""
    rate = cfg.mult_dropout
    (B, S, Dc), (_, Q), (_, M) = shapes
    if rate <= 0.0:
        return None, None, None
    fm = dropout_scale_mask((B, S, Dc), row0, site_salt(seed, hop, _SITE_FEATS), rate)
    qm = dropout_scale_mask((B, Q), row0, site_salt(seed, hop, _SITE_Q), rate)
    mm = dropout_scale_mask((B, M), row0, site_salt(seed, hop, _SITE_MERGE), rate)
    return fm, qm, mm


def _hop_fwd_core(mp, q, feats, c, hprev, fm, qm, mm, dot_dtype):
    """One training hop on loaded values; pure jnp, shared verbatim by the
    forward kernel, the backward kernel's rematerialization, and the XLA
    reference path.  Mirrors models/rau.py embed_image + answering_unit
    (reference graph :229-307) with explicit masks."""

    def dot(x, w):
        return jax.lax.dot_general(
            x.astype(dot_dtype), w.astype(dot_dtype),
            (((x.ndim - 1,), (0,)), ((), ())), preferred_element_type=f32)

    B, S, Dc = feats.shape
    t: Dict = {}
    x = feats.astype(f32) * fm if fm is not None else feats.astype(f32)
    t["feats_d"] = x
    prei = (dot(x.reshape(B * S, Dc), mp["i_embed"]["w"]).reshape(B, S, -1)
            + mp["i_embed"]["b"].astype(f32))
    t["ifeat"] = jnp.tanh(prei)                                   # [B, S, M]
    M = t["ifeat"].shape[-1]
    t["iatt"] = (dot(t["ifeat"].reshape(B * S, M),
                     mp["att_i"]["w"]).reshape(B, S, -1)
                 + mp["att_i"]["b"].astype(f32))                  # [B, S, F]
    F = t["iatt"].shape[-1]
    t["q_d"] = q.astype(f32) * qm if qm is not None else q.astype(f32)
    t["qfeat"] = jnp.tanh(dot(t["q_d"], mp["q_proj"]["w"])
                          + mp["q_proj"]["b"].astype(f32)
                          + dot(hprev, mp["h_proj"]["w"])
                          + mp["h_proj"]["b"].astype(f32))        # [B, M]
    t["qatt"] = (dot(t["qfeat"], mp["att_q"]["w"])
                 + mp["att_q"]["b"].astype(f32))                  # [B, F]
    t["addfeat"] = jnp.tanh(t["iatt"] + t["qatt"][:, None, :])    # [B, S, F]
    score_c = dot(t["addfeat"].reshape(B * S, F),
                  mp["att_score"]["w"]).reshape(B, S)
    # 1-element bias as scalar (mosaic can't lower (1,)->(B,S) broadcast)
    attscore = (score_c + mp["att_score"]["b"].astype(f32)[0]
                + dot(hprev, mp["att_mem"]["w"])
                + mp["att_mem"]["b"].astype(f32))
    t["attprob"] = jax.nn.softmax(attscore, axis=-1)              # [B, S]
    t["attfeat"] = jnp.sum(t["ifeat"] * t["attprob"][:, :, None], axis=1)
    t["join"] = (t["qfeat"] + t["attfeat"]
                 + dot(t["attprob"], mp["attprob_proj"]["w"])
                 + mp["attprob_proj"]["b"].astype(f32))           # [B, M]
    lp = mp["attlstm"]["layers"][0]
    R = c.shape[-1]
    gates = (dot(t["join"], lp["wi"]) + lp["bi"].astype(f32)
             + dot(hprev, lp["wh"]) + lp["bh"].astype(f32))
    # ATTLSTM gate order [i, g, f, o] (ATTLSTM.lua:16-19)
    t["i_g"] = jax.nn.sigmoid(gates[:, :R])
    t["g_t"] = jnp.tanh(gates[:, R:2 * R])
    t["f_g"] = jax.nn.sigmoid(gates[:, 2 * R:3 * R])
    t["o_g"] = jax.nn.sigmoid(gates[:, 3 * R:])
    t["c_new"] = t["f_g"] * c + t["i_g"] * t["g_t"]
    t["tanh_c"] = jnp.tanh(t["c_new"])
    t["h_new"] = t["o_g"] * t["tanh_c"]
    t["merge_pre"] = (t["join"] + dot(t["h_new"], mp["merge"]["w"])
                      + mp["merge"]["b"].astype(f32))
    t["merge_d"] = t["merge_pre"] * mm if mm is not None else t["merge_pre"]
    t["score"] = (dot(t["merge_d"], mp["cls"]["w"])
                  + mp["cls"]["b"].astype(f32))                   # [B, A]
    t["dot"] = dot
    t["dot_dtype"] = dot_dtype
    return t


def _hop_bwd_core(mp, t, q, feats, c, hprev, g, dc_in, dh_in, fm, qm, mm):
    """VJP of one hop w.r.t. (weights, q, prev state), given the hop's
    forward values ``t`` and the score cotangent ``g`` [B, A].  Pure jnp;
    shared by the backward kernel and (for tests) usable under XLA.

    Bias gradients are returned 2-D ``(1, dim)``: Mosaic cannot lower a
    sublane-axis reduction to a 1-D vector ("unsupported output implicit
    dimension"); the caller reshapes them back to the weight's shape."""
    B, S, Dc = feats.shape
    M = t["join"].shape[-1]
    F = t["qatt"].shape[-1]
    dd = t["dot_dtype"]

    def dotT(x, w):
        # x @ w^T with f32 accumulation (contract on w's LAST dim)
        return jax.lax.dot_general(
            x.astype(dd), w.astype(dd), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    def gradw(a, b):
        # a^T @ b: weight gradient from [B, in] x [B, out]
        return jax.lax.dot_general(
            a.astype(dd), b.astype(dd), (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    def bsum(x):
        # bias grad: sum over rows as a ones-row matmul -> [1, dim].
        # Mosaic cannot lower a sublane reduction whose 1-D output length
        # is not a lane multiple (e.g. 196, 1000) — the matmul form stays
        # 2-D throughout and is exact (f32 accumulation).
        ones = jnp.ones((1, x.shape[0]), f32)
        return jax.lax.dot_general(ones, x.astype(f32),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    gw: Dict[Tuple, jax.Array] = {}

    # classifier (cls): score = merge_d @ Wc + bc
    gw[("cls", "w")] = gradw(t["merge_d"], g)
    gw[("cls", "b")] = bsum(g)
    dmerge_d = dotT(g, mp["cls"]["w"])                            # [B, M]
    dmerge_pre = dmerge_d * mm if mm is not None else dmerge_d
    # merge_pre = join + h_new @ Wm + bm
    djoin = dmerge_pre
    gw[("merge", "w")] = gradw(t["h_new"], dmerge_pre)
    gw[("merge", "b")] = bsum(dmerge_pre)
    dh_new = dotT(dmerge_pre, mp["merge"]["w"]) + dh_in
    # ATTLSTM cell
    do_g = dh_new * t["tanh_c"]
    dc_new = dh_new * t["o_g"] * (1.0 - t["tanh_c"] ** 2) + dc_in
    df_g = dc_new * c
    dc_prev = dc_new * t["f_g"]
    di_g = dc_new * t["g_t"]
    dg_t = dc_new * t["i_g"]
    dgates = jnp.concatenate([
        di_g * t["i_g"] * (1.0 - t["i_g"]),
        dg_t * (1.0 - t["g_t"] ** 2),
        df_g * t["f_g"] * (1.0 - t["f_g"]),
        do_g * t["o_g"] * (1.0 - t["o_g"]),
    ], axis=1)                                                    # [B, 4R]
    lp = mp["attlstm"]["layers"][0]
    djoin = djoin + dotT(dgates, lp["wi"])
    dh_prev = dotT(dgates, lp["wh"])
    gw[("attlstm", "layers", 0, "wi")] = gradw(t["join"], dgates)
    gw[("attlstm", "layers", 0, "bi")] = bsum(dgates)
    gw[("attlstm", "layers", 0, "wh")] = gradw(hprev, dgates)
    gw[("attlstm", "layers", 0, "bh")] = bsum(dgates)
    # join = qfeat + attfeat + attprob @ Wp + bp
    dqfeat = djoin
    dattfeat = djoin                                              # [B, M]
    dattprob = dotT(djoin, mp["attprob_proj"]["w"])               # [B, S]
    gw[("attprob_proj", "w")] = gradw(t["attprob"], djoin)
    gw[("attprob_proj", "b")] = bsum(djoin)
    # attfeat = sum_s ifeat * attprob
    dattprob = dattprob + jnp.sum(t["ifeat"] * dattfeat[:, None, :], axis=2)
    difeat = t["attprob"][:, :, None] * dattfeat[:, None, :]      # [B, S, M]
    # softmax
    dattscore = t["attprob"] * (
        dattprob - jnp.sum(dattprob * t["attprob"], axis=1, keepdims=True))
    # attscore = addfeat @ Ws + bs + hprev @ Wmem + bmem
    dh_prev = dh_prev + dotT(dattscore, mp["att_mem"]["w"])
    gw[("att_mem", "w")] = gradw(hprev, dattscore)
    gw[("att_mem", "b")] = bsum(dattscore)
    gw[("att_score", "w")] = jax.lax.dot_general(
        t["addfeat"].reshape(B * S, F).astype(dd),
        dattscore.reshape(B * S, 1).astype(dd),
        (((0,), (0,)), ((), ())), preferred_element_type=f32)     # [F, 1]
    gw[("att_score", "b")] = bsum(dattscore.reshape(B * S, 1))
    # [F, 1] -> [1, 1, F] via reshape (mixed newaxis+int indexing would
    # lower as an unsupported gather in Mosaic)
    daddfeat = (dattscore[:, :, None]
                * mp["att_score"]["w"].astype(f32).reshape(1, 1, F))
    # addfeat = tanh(iatt + qatt)
    dpre_add = daddfeat * (1.0 - t["addfeat"] ** 2)               # [B, S, F]
    dqatt = jnp.sum(dpre_add, axis=1)                             # [B, F]
    # qatt = qfeat @ Wattq + b
    dqfeat = dqfeat + dotT(dqatt, mp["att_q"]["w"])
    gw[("att_q", "w")] = gradw(t["qfeat"], dqatt)
    gw[("att_q", "b")] = bsum(dqatt)
    # qfeat = tanh(q_d @ Wq + bq + hprev @ Whp + bhp)
    dpre_q = dqfeat * (1.0 - t["qfeat"] ** 2)                     # [B, M]
    dq_d = dotT(dpre_q, mp["q_proj"]["w"])                        # [B, Q]
    dq = dq_d * qm if qm is not None else dq_d
    dh_prev = dh_prev + dotT(dpre_q, mp["h_proj"]["w"])
    gw[("q_proj", "w")] = gradw(t["q_d"], dpre_q)
    gw[("q_proj", "b")] = bsum(dpre_q)
    gw[("h_proj", "w")] = gradw(hprev, dpre_q)
    gw[("h_proj", "b")] = bsum(dpre_q)
    # iatt = ifeat @ Wa + ba
    difeat = difeat + dotT(dpre_add.reshape(B * S, F),
                           mp["att_i"]["w"]).reshape(B, S, M)
    gw[("att_i", "w")] = jax.lax.dot_general(
        t["ifeat"].reshape(B * S, M).astype(dd),
        dpre_add.reshape(B * S, F).astype(dd),
        (((0,), (0,)), ((), ())), preferred_element_type=f32)
    gw[("att_i", "b")] = bsum(dpre_add.reshape(B * S, F))
    # ifeat = tanh(feats_d @ Wi + bi)
    dpre_i = difeat * (1.0 - t["ifeat"] ** 2)                     # [B, S, M]
    gw[("i_embed", "w")] = jax.lax.dot_general(
        t["feats_d"].reshape(B * S, Dc).astype(dd),
        dpre_i.reshape(B * S, M).astype(dd),
        (((0,), (0,)), ((), ())), preferred_element_type=f32)
    gw[("i_embed", "b")] = bsum(dpre_i.reshape(B * S, M))
    # dfeats is never needed: image features are frozen inputs
    return gw, dq, dc_prev, dh_prev


# ---------------------------------------------------------------------------
# Pure-XLA reference (same masks) — CPU fallback and autodiff oracle
# ---------------------------------------------------------------------------

def rau_train_hops_reference(mp: Dict, cfg: ModelConfig, q, feats, seed):
    """Training hop loop with the fused path's exact dropout realization,
    in ordinary XLA.  Differentiable by autodiff; the grad-parity oracle."""
    B = q.shape[0]
    S, Dc = feats.shape[1], feats.shape[2]
    Q, M = q.shape[1], cfg.multfeat_dim
    dot_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else f32)
    c = jnp.zeros((B, cfg.att_state_dim), f32)
    h = jnp.zeros((B, cfg.att_state_dim), f32)
    scores, dopreds, attprobs = [], [], []
    for hop in range(cfg.n_hops):
        fm, qm, mm = _masks(cfg, ((B, S, Dc), (B, Q), (B, M)), 0, seed, hop)
        t = _hop_fwd_core(mp, q, feats, c, h, fm, qm, mm, dot_dtype)
        do_pred = jax.nn.sigmoid(
            t["dot"](t["merge_d"], mp["do_pred"]["w"])[:, 0]
            + mp["do_pred"]["b"].astype(f32)[0])
        scores.append(t["score"])
        dopreds.append(do_pred)
        attprobs.append(t["attprob"])
        c, h = t["c_new"], t["h_new"]
    return (jnp.stack(scores), jnp.stack(dopreds), jnp.stack(attprobs), c, h)


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(cfg: ModelConfig, block_b: int, dot_dtype, seed_ref, q_ref,
                feats_ref, *refs):
    w_refs = refs[:len(_FWD_WEIGHTS)]
    (scores_ref, dopred_ref, attprob_ref, c_all_ref, h_all_ref) = \
        refs[len(_FWD_WEIGHTS):]
    mp = _rebuild(_FWD_WEIGHTS, [r[:] for r in w_refs])
    q = q_ref[:]
    feats = feats_ref[:]
    seed = seed_ref[0, 0]
    B = block_b
    S, Dc = feats.shape[1], feats.shape[2]
    Q, M = q.shape[1], cfg.multfeat_dim
    R = cfg.att_state_dim
    row0 = pl.program_id(0) * block_b

    def body(hop, carry):
        c, h = carry
        fm, qm, mm = _masks(cfg, ((B, S, Dc), (B, Q), (B, M)),
                            row0, seed, hop)
        t = _hop_fwd_core(mp, q, feats, c, h, fm, qm, mm, dot_dtype)
        do_pred = jax.nn.sigmoid(
            t["dot"](t["merge_d"], mp["do_pred"]["w"])[:, 0]
            + mp["do_pred"]["b"].astype(f32)[0])
        scores_ref[pl.ds(hop, 1)] = t["score"][None]
        # lane-pad do_pred to 128 (TPU lane width); caller slices col 0
        dopred_ref[pl.ds(hop, 1)] = jnp.broadcast_to(
            do_pred[:, None], (B, 128))[None]
        attprob_ref[pl.ds(hop, 1)] = t["attprob"][None]
        c_all_ref[pl.ds(hop, 1)] = c[None]
        h_all_ref[pl.ds(hop, 1)] = h[None]
        return (t["c_new"], t["h_new"])

    c0 = jnp.zeros((B, R), f32)
    c, h = jax.lax.fori_loop(0, cfg.n_hops, body, (c0, c0))
    c_all_ref[pl.ds(cfg.n_hops, 1)] = c[None]
    h_all_ref[pl.ds(cfg.n_hops, 1)] = h[None]


def _run_fwd(cfg: ModelConfig, block_b: int, interpret: bool, mp, q, feats,
             seed):
    B, S, Dc = feats.shape
    H, A, R, Q = cfg.n_hops, cfg.answer_size, cfg.att_state_dim, q.shape[1]
    if B % block_b:
        raise ValueError(f"batch {B} not divisible by block_b {block_b}")
    dot_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else f32)
    weights = [_pluck(mp, p).astype(dot_dtype) for p in _FWD_WEIGHTS]

    in_specs = [
        pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((block_b, Q), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, S, Dc), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(w.shape, lambda i, _nd=w.ndim: (0,) * _nd,
                      memory_space=pltpu.VMEM) for w in weights]
    out_shape = (
        jax.ShapeDtypeStruct((H, B, A), f32),
        jax.ShapeDtypeStruct((H, B, 128), f32),
        jax.ShapeDtypeStruct((H, B, S), f32),
        jax.ShapeDtypeStruct((H + 1, B, R), f32),
        jax.ShapeDtypeStruct((H + 1, B, R), f32),
    )
    out_specs = (
        pl.BlockSpec((H, block_b, A), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, block_b, 128), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H, block_b, S), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H + 1, block_b, R), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((H + 1, block_b, R), lambda i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_fwd_kernel, cfg, block_b, dot_dtype)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    return pl.pallas_call(
        kernel,
        grid=(B // block_b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(seed_arr, q.astype(dot_dtype), feats.astype(dot_dtype), *weights)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(cfg: ModelConfig, block_b: int, dot_dtype, seed_ref, q_ref,
                feats_ref, c_ref, h_ref, g_ref, *refs):
    """One (batch-tile, hop) grid step of the backward pass.

    The hop loop is a GRID dimension, not an in-kernel fori_loop: a
    whole-loop body was a Mosaic compile pathology (>25 min, like the
    round-1 unrolled kernel — CLAUDE.md).  The grid runs hops innermost and
    the reverse-time (dc, dh) carry lives in VMEM scratch, which persists
    across sequential TPU grid steps; the index maps serve hop H-1-h at
    grid position h, so the kernel body itself is direction-agnostic."""
    w_refs = refs[:len(_DIFF_WEIGHTS)]
    dq_ref = refs[len(_DIFF_WEIGHTS)]
    grad_refs = refs[len(_DIFF_WEIGHTS) + 1:-2]
    dc_sc, dh_sc = refs[-2:]
    mp = _rebuild(_DIFF_WEIGHTS, [r[:] for r in w_refs])
    q = q_ref[:]
    feats = feats_ref[:]
    seed = seed_ref[0, 0]
    B = block_b
    S, Dc = feats.shape[1], feats.shape[2]
    Q, M = q.shape[1], cfg.multfeat_dim
    H = cfg.n_hops
    row0 = pl.program_id(0) * block_b
    hop = H - 1 - pl.program_id(1)

    # f32 weight-grad accumulators persist across the whole sequential grid
    # (their out BlockSpec index is constant): zero once, += every step
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _init_grads():
        for r in grad_refs:
            r[...] = jnp.zeros_like(r)

    # per-tile state: reset at the first (reverse) hop of each batch tile
    @pl.when(pl.program_id(1) == 0)
    def _init_tile():
        dc_sc[...] = jnp.zeros_like(dc_sc)
        dh_sc[...] = jnp.zeros_like(dh_sc)
        dq_ref[...] = jnp.zeros_like(dq_ref)

    fm, qm, mm = _masks(cfg, ((B, S, Dc), (B, Q), (B, M)), row0, seed, hop)
    c = c_ref[0]
    hprev = h_ref[0]
    t = _hop_fwd_core(mp, q, feats, c, hprev, fm, qm, mm, dot_dtype)
    g = g_ref[0]
    gw, dq, dc_prev, dh_prev = _hop_bwd_core(
        mp, t, q, feats, c, hprev, g, dc_sc[...], dh_sc[...], fm, qm, mm)
    for path, ref in zip(_DIFF_WEIGHTS, grad_refs):
        ref[...] += gw[path]
    dq_ref[...] += dq
    dc_sc[...] = dc_prev
    dh_sc[...] = dh_prev


def _run_bwd(cfg: ModelConfig, block_b: int, interpret: bool, mp, q, feats,
             seed, c_all, h_all, g_scores):
    B, S, Dc = feats.shape
    H, R, Q = cfg.n_hops, cfg.att_state_dim, q.shape[1]
    A = g_scores.shape[-1]
    dot_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else f32)
    weights = [_pluck(mp, p).astype(dot_dtype) for p in _DIFF_WEIGHTS]

    # grid: batch tiles outer, hops inner (innermost iterates fastest on
    # TPU); hop blocks are served in reverse time order by the index maps
    rev = lambda i, h, _H=H: (_H - 1 - h, i, 0)  # noqa: E731
    in_specs = [
        pl.BlockSpec((1, 1), lambda i, h: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((block_b, Q), lambda i, h: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_b, S, Dc), lambda i, h: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_b, R), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_b, R), rev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_b, A), rev, memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(w.shape, lambda i, h, _nd=w.ndim: (0,) * _nd,
                      memory_space=pltpu.VMEM) for w in weights]
    # bias grads are kernel-side 2-D (1, dim) — see _hop_bwd_core docstring
    gshapes = [w.shape if w.ndim > 1 else (1,) + w.shape for w in weights]
    out_shape = tuple(
        [jax.ShapeDtypeStruct((B, Q), f32)]
        + [jax.ShapeDtypeStruct(gs, f32) for gs in gshapes])
    out_specs = tuple(
        [pl.BlockSpec((block_b, Q), lambda i, h: (i, 0),
                      memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(gs, lambda i, h, _nd=len(gs): (0,) * _nd,
                        memory_space=pltpu.VMEM) for gs in gshapes])
    kernel = functools.partial(_bwd_kernel, cfg, block_b, dot_dtype)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1, 1)
    out = pl.pallas_call(
        kernel,
        grid=(B // block_b, H),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_b, R), f32),   # dc carry (reverse time)
            pltpu.VMEM((block_b, R), f32),   # dh carry
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(seed_arr, q.astype(dot_dtype), feats.astype(dot_dtype),
      c_all, h_all, g_scores.astype(f32), *weights)
    grads = [g.reshape(w.shape) for g, w in zip(out[1:], weights)]
    return out[0], grads


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _fused(cfg: ModelConfig, block_b: int, interpret: bool, mp, q, feats,
           seed):
    out = _run_fwd(cfg, block_b, interpret, mp, q, feats, seed)
    scores, dopred_pad, attprob, c_all, h_all = out
    return (scores, dopred_pad[:, :, 0], attprob,
            c_all[cfg.n_hops], h_all[cfg.n_hops])


def _fused_fwd(cfg, block_b, interpret, mp, q, feats, seed):
    out = _run_fwd(cfg, block_b, interpret, mp, q, feats, seed)
    scores, dopred_pad, attprob, c_all, h_all = out
    primal = (scores, dopred_pad[:, :, 0], attprob,
              c_all[cfg.n_hops], h_all[cfg.n_hops])
    return primal, (mp, q, feats, seed, c_all, h_all)


def _fused_bwd(cfg, block_b, interpret, res, cts):
    """Only the score cotangent propagates: do_pred/attprob/final-state are
    zero-gradient monitors (losses.py stop-gradients them; reference
    d_do_pred:mul(0) at :565-567)."""
    mp, q, feats, seed, c_all, h_all = res
    g_scores = cts[0]
    dq, gws = _run_bwd(cfg, block_b, interpret, mp, q, feats, seed,
                       c_all, h_all, g_scores)
    # cotangent tree must match mp's structure and dtypes; do_pred (and any
    # other non-diff leaf) stays at zero
    dmp = jax.tree.map(jnp.zeros_like, mp)
    for path, gw in zip(_DIFF_WEIGHTS, gws):
        node = dmp
        for p in path[:-1]:
            node = node[p]
        node[path[-1]] = gw.astype(_pluck(mp, path).dtype)
    dseed = np.zeros(np.shape(seed), jax.dtypes.float0)
    return (dmp, dq.astype(q.dtype), jnp.zeros_like(feats), dseed)


_fused.defvjp(_fused_fwd, _fused_bwd)


def rau_train_hops(mp: Dict, cfg: ModelConfig, q, feats, seed, *,
                   block_b: int = 16, interpret: bool | None = None):
    """Fused training hop loop: (scores [H,B,A], do_pred [H,B],
    attprob [H,B,S], final_c, final_h).  Differentiable w.r.t. ``mp`` and
    ``q`` (scores path only); ``feats`` receives zero gradient (frozen CNN
    features, reference provides no image-path backward).

    ``interpret=None`` auto-selects: compiled Pallas on TPU, interpreter
    elsewhere."""
    if cfg.att_rnn_layers != 1 or cfg.att_rnn_dropout > 0.0:
        raise NotImplementedError(
            "fused training kernel supports the reference configuration "
            "(1-layer ATTLSTM, no att_rnn_dropout) — use the XLA path")
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    return _fused(cfg, block_b, bool(interpret), mp, q, feats, seed)

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
# the backward kernel rematerializes the hop but not the classifier head
# (its cotangent arrives as a precomputed g @ Wc^T), so cls stays outside
_KERNEL_WEIGHTS = [p for p in _DIFF_WEIGHTS if p[0] != "cls"]
# gradients accumulated INSIDE the kernel: only the ones whose activation
# operand is [B, S, *]-sized (the feats path) — everything else is a
# batched [H*B, in]^T @ [H*B, out] GEMM in plain XLA over small emissions
_INKERNEL_GRADS = [("i_embed", "w"), ("i_embed", "b"),
                   ("att_i", "w"), ("att_i", "b"), ("att_score", "w")]
# per-hop small tensors the backward kernel emits for the outside GEMMs
# (name, width key, f32 cotangent or compute-dtype activation)
_EMITS = [("dpre_q", "M", True), ("dqatt", "F", True),
          ("dscore_att", "S", True), ("djoin", "M", True),
          ("dgates", "G", True), ("dmerge_pre", "M", True),
          ("qfeat", "M", False), ("join", "M", False),
          ("merge_d", "M", False)]

_SITE_FEATS, _SITE_Q, _SITE_MERGE = 0, 1, 2


from rau_vqa_tpu.ops.treeflat import (  # noqa: E402 — shared helpers
    pluck as _pluck,
    rebuild as _rebuild,
)


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
    t["c_prev"] = c
    t["c_new"] = t["f_g"] * c + t["i_g"] * t["g_t"]
    t["tanh_c"] = jnp.tanh(t["c_new"])
    t["h_new"] = t["o_g"] * t["tanh_c"]
    t["merge_pre"] = (t["join"] + dot(t["h_new"], mp["merge"]["w"])
                      + mp["merge"]["b"].astype(f32))
    t["merge_d"] = t["merge_pre"] * mm if mm is not None else t["merge_pre"]
    if "cls" in mp:   # the backward kernel omits the classifier head
        t["score"] = (dot(t["merge_d"], mp["cls"]["w"])
                      + mp["cls"]["b"].astype(f32))               # [B, A]
    t["dot"] = dot
    t["dot_dtype"] = dot_dtype
    return t


def _hop_bwd_core(mp, t, feats, dmerge_d, dc_in, dh_in, mm):
    """Backward of one hop, split for the hybrid scheme: runs the serial
    activation-cotangent chain and the feats-path weight grads (the parts
    that must live where ``feats``-sized tensors are resident), and EMITS
    the small per-hop cotangents/activations whose weight-grad GEMMs run
    outside in plain XLA (see _outside_grads).  ``dmerge_d`` is the
    precomputed ``g @ cls_w^T`` slice for this hop.

    Bias gradients computed here are 2-D ``(1, dim)``: Mosaic cannot lower
    a sublane-axis reduction to a 1-D vector; the caller reshapes."""
    B, S, Dc = feats.shape
    M = t["join"].shape[-1]
    F = t["qatt"].shape[-1]
    dd = t["dot_dtype"]

    def dotT(x, w):
        # x @ w^T with f32 accumulation (contract on w's LAST dim)
        return jax.lax.dot_general(
            x.astype(dd), w.astype(dd), (((1,), (1,)), ((), ())),
            preferred_element_type=f32)

    def gradw2(a, b):
        # a^T @ b over [N, in] x [N, out] (feats-path weight grads)
        return jax.lax.dot_general(
            a.astype(dd), b.astype(dd), (((0,), (0,)), ((), ())),
            preferred_element_type=f32)

    def bsum(x):
        # rows-sum as a ones-row matmul -> [1, dim] (Mosaic cannot lower a
        # sublane reduction with a non-lane-multiple 1-D output)
        ones = jnp.ones((1, x.shape[0]), f32)
        return jax.lax.dot_general(ones, x.astype(f32),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    em: Dict[str, jax.Array] = {}
    gw: Dict[Tuple, jax.Array] = {}

    dmerge_pre = dmerge_d * mm if mm is not None else dmerge_d
    em["dmerge_pre"] = dmerge_pre
    em["merge_d"] = t["merge_d"].astype(dd)
    djoin = dmerge_pre
    dh_new = dotT(dmerge_pre, mp["merge"]["w"]) + dh_in
    # ATTLSTM cell backward
    do_g = dh_new * t["tanh_c"]
    dc_new = dh_new * t["o_g"] * (1.0 - t["tanh_c"] ** 2) + dc_in
    c_prev = t["c_prev"]   # true previous cell state (saved residual)
    df_g = dc_new * c_prev
    dc_prev = dc_new * t["f_g"]
    di_g = dc_new * t["g_t"]
    dg_t = dc_new * t["i_g"]
    dgates = jnp.concatenate([
        di_g * t["i_g"] * (1.0 - t["i_g"]),
        dg_t * (1.0 - t["g_t"] ** 2),
        df_g * t["f_g"] * (1.0 - t["f_g"]),
        do_g * t["o_g"] * (1.0 - t["o_g"]),
    ], axis=1)                                                    # [B, 4R]
    em["dgates"] = dgates
    em["join"] = t["join"].astype(dd)
    lp = mp["attlstm"]["layers"][0]
    djoin = djoin + dotT(dgates, lp["wi"])
    dh_prev = dotT(dgates, lp["wh"])
    # join = qfeat + attfeat + attprob @ Wp + bp
    em["djoin"] = djoin
    dqfeat = djoin
    dattfeat = djoin                                              # [B, M]
    dattprob = dotT(djoin, mp["attprob_proj"]["w"])               # [B, S]
    # attfeat = sum_s ifeat * attprob
    dattprob = dattprob + jnp.sum(t["ifeat"] * dattfeat[:, None, :], axis=2)
    difeat = t["attprob"][:, :, None] * dattfeat[:, None, :]      # [B, S, M]
    # softmax
    dattscore = t["attprob"] * (
        dattprob - jnp.sum(dattprob * t["attprob"], axis=1, keepdims=True))
    em["dscore_att"] = dattscore
    dh_prev = dh_prev + dotT(dattscore, mp["att_mem"]["w"])
    gw[("att_score", "w")] = jax.lax.dot_general(
        t["addfeat"].reshape(B * S, F).astype(dd),
        dattscore.reshape(B * S, 1).astype(dd),
        (((0,), (0,)), ((), ())), preferred_element_type=f32)     # [F, 1]
    # [F, 1] -> [1, 1, F] via reshape (mixed newaxis+int indexing would
    # lower as an unsupported gather in Mosaic)
    daddfeat = (dattscore[:, :, None]
                * mp["att_score"]["w"].astype(f32).reshape(1, 1, F))
    # addfeat = tanh(iatt + qatt)
    dpre_add = daddfeat * (1.0 - t["addfeat"] ** 2)               # [B, S, F]
    dqatt = jnp.sum(dpre_add, axis=1)                             # [B, F]
    em["dqatt"] = dqatt
    em["qfeat"] = t["qfeat"].astype(dd)
    # qatt = qfeat @ Wattq + b
    dqfeat = dqfeat + dotT(dqatt, mp["att_q"]["w"])
    # qfeat = tanh(q_d @ Wq + bq + hprev @ Whp + bhp)
    dpre_q = dqfeat * (1.0 - t["qfeat"] ** 2)                     # [B, M]
    em["dpre_q"] = dpre_q
    dh_prev = dh_prev + dotT(dpre_q, mp["h_proj"]["w"])
    # iatt = ifeat @ Wa + ba
    difeat = difeat + dotT(dpre_add.reshape(B * S, F),
                           mp["att_i"]["w"]).reshape(B, S, M)
    gw[("att_i", "w")] = gradw2(t["ifeat"].reshape(B * S, M),
                                dpre_add.reshape(B * S, F))
    gw[("att_i", "b")] = bsum(dpre_add.reshape(B * S, F))
    # ifeat = tanh(feats_d @ Wi + bi)
    dpre_i = difeat * (1.0 - t["ifeat"] ** 2)                     # [B, S, M]
    gw[("i_embed", "w")] = gradw2(t["feats_d"].reshape(B * S, Dc),
                                  dpre_i.reshape(B * S, M))
    gw[("i_embed", "b")] = bsum(dpre_i.reshape(B * S, M))
    # dfeats is never needed: image features are frozen inputs
    return em, gw, dc_prev, dh_prev


# ---------------------------------------------------------------------------
# Pure-XLA reference (same masks) — CPU fallback and autodiff oracle
# ---------------------------------------------------------------------------

def check_fused_config(cfg: ModelConfig) -> None:
    """Both fused implementations (kernel AND XLA reference) support the
    reference configuration only: 1-layer ATTLSTM, no att_rnn_dropout."""
    if cfg.att_rnn_layers != 1 or cfg.att_rnn_dropout > 0.0:
        raise NotImplementedError(
            "fused training path supports the reference configuration "
            "(1-layer ATTLSTM, no att_rnn_dropout) — use the XLA path")


def rau_train_hops_reference(mp: Dict, cfg: ModelConfig, q, feats, seed):
    """Training hop loop with the fused path's exact dropout realization,
    in ordinary XLA.  Differentiable by autodiff; the grad-parity oracle."""
    check_fused_config(cfg)
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
                feats_ref, c_ref, h_ref, gm_ref, *refs):
    """One (batch-tile, hop) grid step of the hybrid backward.

    Hops are a GRID dimension iterated innermost (a whole-loop kernel body
    was a Mosaic compile pathology); the reverse-time (dc, dh) carry lives
    in VMEM scratch, which persists across sequential TPU grid steps, and
    the index maps serve hop H-1-h at grid position h.  The kernel only
    computes what must live where the [B, S, *] tensors are resident: the
    hop rematerialization, the serial cotangent chain, and the feats-path
    weight grads; everything else is emitted for outside GEMMs."""
    w_refs = refs[:len(_KERNEL_WEIGHTS)]
    rest = refs[len(_KERNEL_WEIGHTS):]
    em_refs = rest[:len(_EMITS)]
    grad_refs = rest[len(_EMITS):len(_EMITS) + len(_INKERNEL_GRADS)]
    dc_sc, dh_sc = rest[len(_EMITS) + len(_INKERNEL_GRADS):
                        len(_EMITS) + len(_INKERNEL_GRADS) + 2]
    gsc = rest[len(_EMITS) + len(_INKERNEL_GRADS) + 2:]
    mp = _rebuild(_KERNEL_WEIGHTS, [r[:] for r in w_refs])
    q = q_ref[:]
    feats = feats_ref[:]
    seed = seed_ref[0, 0]
    B = block_b
    S, Dc = feats.shape[1], feats.shape[2]
    Q, M = q.shape[1], cfg.multfeat_dim
    H = cfg.n_hops
    row0 = pl.program_id(0) * block_b
    hop = H - 1 - pl.program_id(1)

    # feats-path grads accumulate over this tile's hops in VMEM SCRATCH
    # (read-modify-write on grid-persistent OUTPUT buffers was a Mosaic
    # compile-memory pathology — docs/mosaic_notes.md #6); the per-tile
    # sums dump to [n_tiles, ...] outputs at the tile's last hop and are
    # reduced outside
    @pl.when(pl.program_id(1) == 0)
    def _init_tile():
        dc_sc[...] = jnp.zeros_like(dc_sc)
        dh_sc[...] = jnp.zeros_like(dh_sc)
        for r in gsc:
            r[...] = jnp.zeros_like(r)

    fm, qm, mm = _masks(cfg, ((B, S, Dc), (B, Q), (B, M)), row0, seed, hop)
    c = c_ref[0]
    hprev = h_ref[0]
    t = _hop_fwd_core(mp, q, feats, c, hprev, fm, qm, mm, dot_dtype)
    em, gw, dc_prev, dh_prev = _hop_bwd_core(
        mp, t, feats, gm_ref[0], dc_sc[...], dh_sc[...], mm)
    for (name, _, _), ref in zip(_EMITS, em_refs):
        ref[...] = em[name][None]
    for path, r in zip(_INKERNEL_GRADS, gsc):
        r[...] += gw[path]
    dc_sc[...] = dc_prev
    dh_sc[...] = dh_prev

    @pl.when(pl.program_id(1) == H - 1)
    def _dump_tile_grads():
        for r, out in zip(gsc, grad_refs):
            out[...] = r[...][None]


def _run_bwd(cfg: ModelConfig, block_b: int, interpret: bool, mp, q, feats,
             seed, c_all, h_all, g_scores):
    """Run the backward kernel; returns (emissions dict of [H, B, dim]
    arrays, in-kernel feats-path grads keyed by _INKERNEL_GRADS)."""
    B, S, Dc = feats.shape
    H, R, Q = cfg.n_hops, cfg.att_state_dim, q.shape[1]
    M, F = cfg.multfeat_dim, cfg.attfeat_dim
    dot_dtype = (jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else f32)
    weights = [_pluck(mp, p).astype(dot_dtype) for p in _KERNEL_WEIGHTS]
    # the classifier cotangent for every hop, as one full-MXU GEMM
    gmerge = jax.lax.dot_general(
        g_scores.reshape(H * B, -1).astype(dot_dtype),
        mp["cls"]["w"].astype(dot_dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=f32).reshape(H, B, M)

    widths = {"M": M, "F": F, "S": S, "G": 4 * R}
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
        pl.BlockSpec((1, block_b, M), rev, memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec(w.shape, lambda i, h, _nd=w.ndim: (0,) * _nd,
                      memory_space=pltpu.VMEM) for w in weights]
    em_shapes = [(name, (H, B, widths[wk]), f32 if cot else dot_dtype)
                 for name, wk, cot in _EMITS]
    gweights = [_pluck(mp, p) for p in _INKERNEL_GRADS]
    # bias grads are kernel-side 2-D (1, dim) — see _hop_bwd_core docstring
    gshapes = [w.shape if w.ndim > 1 else (1,) + w.shape for w in gweights]
    n_tiles = B // block_b
    out_shape = tuple(
        [jax.ShapeDtypeStruct(shp, dt) for _, shp, dt in em_shapes]
        + [jax.ShapeDtypeStruct((n_tiles,) + gs, f32) for gs in gshapes])
    out_specs = tuple(
        [pl.BlockSpec((1, block_b, shp[2]), rev, memory_space=pltpu.VMEM)
         for _, shp, _ in em_shapes]
        + [pl.BlockSpec((1,) + gs, lambda i, h, _nd=len(gs): (i,) + (0,) * _nd,
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
        ] + [pltpu.VMEM(gs, f32) for gs in gshapes],  # feats-path accums
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(seed_arr, q.astype(dot_dtype), feats.astype(dot_dtype),
      c_all, h_all, gmerge, *weights)
    em = {name: arr for (name, _, _), arr in zip(_EMITS, out)}
    # reduce the per-tile partial sums (outside: one cheap XLA reduction)
    gw_in = {path: arr.sum(axis=0).reshape(w.shape) for path, arr, w in
             zip(_INKERNEL_GRADS, out[len(_EMITS):], gweights)}
    return em, gw_in


def _outside_grads(cfg: ModelConfig, mp, q, seed, c_all, h_all, attprob,
                   g_scores, em):
    """Assemble the non-feats-path weight grads from the kernel's per-hop
    emissions as batched [H*B, in]^T @ [H*B, out] GEMMs — full 128-row MXU
    blocks in plain XLA, instead of bb-row dots inside the kernel."""
    H = cfg.n_hops
    B, Q = q.shape
    dd = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else f32
    rate = cfg.mult_dropout

    def gemm(act, cot):
        # act [H, B, in], cot [H, B, out] -> [in, out]
        a = act.reshape(-1, act.shape[-1]).astype(dd)
        b = cot.reshape(-1, cot.shape[-1]).astype(dd)
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    h_in = h_all[:H]                       # state entering each hop
    h_out = h_all[1:]                      # state leaving each hop
    # per-hop q dropout masks regenerate in plain XLA (same counter hash)
    if rate > 0.0:
        qmask = jnp.stack([
            dropout_scale_mask((B, Q), 0, site_salt(seed, h, _SITE_Q), rate)
            for h in range(H)])            # [H, B, Q]
        q_d = q[None].astype(f32) * qmask
    else:
        qmask = None
        q_d = jnp.broadcast_to(q.astype(f32)[None], (H, B, Q))

    gw = {}
    gw[("q_proj", "w")] = gemm(q_d, em["dpre_q"])
    gw[("q_proj", "b")] = jnp.sum(em["dpre_q"], axis=(0, 1))
    gw[("h_proj", "w")] = gemm(h_in, em["dpre_q"])
    gw[("h_proj", "b")] = gw[("q_proj", "b")]
    gw[("att_q", "w")] = gemm(em["qfeat"], em["dqatt"])
    gw[("att_q", "b")] = jnp.sum(em["dqatt"], axis=(0, 1))
    gw[("att_score", "b")] = jnp.sum(em["dscore_att"]).reshape(1)
    gw[("att_mem", "w")] = gemm(h_in, em["dscore_att"])
    gw[("att_mem", "b")] = jnp.sum(em["dscore_att"], axis=(0, 1))
    gw[("attprob_proj", "w")] = gemm(attprob, em["djoin"])
    gw[("attprob_proj", "b")] = jnp.sum(em["djoin"], axis=(0, 1))
    gw[("attlstm", "layers", 0, "wi")] = gemm(em["join"], em["dgates"])
    gw[("attlstm", "layers", 0, "bi")] = jnp.sum(em["dgates"], axis=(0, 1))
    gw[("attlstm", "layers", 0, "wh")] = gemm(h_in, em["dgates"])
    gw[("attlstm", "layers", 0, "bh")] = gw[("attlstm", "layers", 0, "bi")]
    gw[("merge", "w")] = gemm(h_out, em["dmerge_pre"])
    gw[("merge", "b")] = jnp.sum(em["dmerge_pre"], axis=(0, 1))
    gw[("cls", "w")] = gemm(em["merge_d"], g_scores)
    gw[("cls", "b")] = jnp.sum(g_scores, axis=(0, 1))
    # dq: (dpre_q @ Wq^T) masked per hop, summed over hops
    p = jax.lax.dot_general(
        em["dpre_q"].reshape(H * B, -1).astype(dd),
        mp["q_proj"]["w"].astype(dd), (((1,), (1,)), ((), ())),
        preferred_element_type=f32).reshape(H, B, Q)
    dq = jnp.sum(p * qmask, axis=0) if qmask is not None \
        else jnp.sum(p, axis=0)
    return gw, dq


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
    return primal, (mp, q, feats, seed, c_all, h_all, attprob)


def _bwd_xla(cfg, mp, q, feats, seed, g_scores):
    """XLA backward: rematerialize the hop loop through the SAME mask-exact
    core (the counter-hash masks regenerate bit-identically outside the
    kernel) and let autodiff produce (dmp, dq).  This is the default
    backward: the in-kernel backward is numerically verified under the
    interpreter but its Mosaic compile is pathological on this toolchain
    (>25 min / compile-helper OOM — docs/mosaic_notes.md #6)."""
    def scores_of(mp_, q_):
        s, *_ = rau_train_hops_reference(mp_, cfg, q_, feats, seed)
        return s
    _, vjp = jax.vjp(scores_of, mp, q)
    return vjp(g_scores)


def _fused_bwd(cfg, block_b, interpret, res, cts):
    """Only the score cotangent propagates: do_pred/attprob/final-state are
    zero-gradient monitors (losses.py stop-gradients them; reference
    d_do_pred:mul(0) at :565-567)."""
    mp, q, feats, seed, c_all, h_all, attprob = res
    g_scores = cts[0]
    if cfg.fused_train_bwd == "xla":
        dmp_x, dq = _bwd_xla(cfg, mp, q, feats, seed, g_scores)
        dseed = np.zeros(np.shape(seed), jax.dtypes.float0)
        # zero out the non-diff leaves (do_pred) to preserve the contract
        dmp = jax.tree.map(jnp.zeros_like, mp)
        for path in _DIFF_WEIGHTS:
            node, src = dmp, _pluck(dmp_x, path)
            for pth in path[:-1]:
                node = node[pth]
            node[path[-1]] = src.astype(_pluck(mp, path).dtype)
        return (dmp, dq.astype(q.dtype), jnp.zeros_like(feats), dseed)
    em, gw_in = _run_bwd(cfg, block_b, interpret, mp, q, feats, seed,
                         c_all, h_all, g_scores)
    gw_out, dq = _outside_grads(cfg, mp, q, seed, c_all, h_all, attprob,
                                g_scores, em)
    # cotangent tree must match mp's structure and dtypes; do_pred (and any
    # other non-diff leaf) stays at zero
    dmp = jax.tree.map(jnp.zeros_like, mp)
    for path in _DIFF_WEIGHTS:
        gw = gw_in[path] if path in gw_in else gw_out[path]
        node = dmp
        for pth in path[:-1]:
            node = node[pth]
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
    check_fused_config(cfg)
    if interpret is None:
        interpret = jax.devices()[0].platform == "cpu"
    return _fused(cfg, block_b, bool(interpret), mp, q, feats, seed)

"""Test-time prediction: the nHop+2 answer sets of the reference.

``predict_result`` in the reference (Ours_SS/LstmAttCtrlGradNoiseDontSelect.lua:633-705)
returns, per batch, nHop per-hop score tensors plus two aggregates:
hop nHop+1 = "uni" (scores averaged over hops, :699) and hop nHop+2 =
"select" (first-confident-hop gating with the final hop forced to fire,
:683-697) — and the matching attention maps.  Here that is one jitted
function over the stacked ``[H, B, ...]`` outputs.

Multiple-choice answering replicates the reference's mask-by-multiplication
(:884-895): candidate logits keep their value, non-candidates become exactly
0 — note 0 can exceed negative candidate logits; this quirk is preserved
deliberately for output parity.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from rau_vqa_tpu.config import ModelConfig
from rau_vqa_tpu.models.rau import rau_forward
from rau_vqa_tpu.models.aggregate import select_aggregate


def _aggregate(scores, do_pred, attprob) -> Tuple[jax.Array, jax.Array]:
    """Stack the nHop+2 prediction/attention sets from per-hop outputs."""
    select_pred, gates = select_aggregate(scores, do_pred, force_final=True)
    select_att = jnp.einsum("hbs,hb->bs", attprob, gates)
    uni_pred = jnp.mean(scores, axis=0)
    uni_att = jnp.mean(attprob, axis=0)
    tab_pred = jnp.concatenate([scores, uni_pred[None], select_pred[None]],
                               axis=0)
    tab_att = jnp.concatenate([attprob, uni_att[None], select_att[None]],
                              axis=0)
    return tab_pred, tab_att


def bucket_ladder(seq_len: int, buckets) -> list:
    """Sorted unique buckets < seq_len, with seq_len always appended —
    the ONE definition of the eval ladder (shared by live bucketed
    dispatch and the AOT export's per-bucket programs)."""
    ladder = sorted({int(b) for b in buckets if 0 < int(b) < seq_len})
    ladder.append(int(seq_len))
    return ladder


def pick_bucket(ladder, max_len: int) -> int:
    """Smallest ladder entry covering ``max_len`` (exact: truncation past
    the last real token is a no-op under the last-token gather).  Raises
    a clear error instead of silently truncating real tokens when the
    batch exceeds the ladder's top."""
    for t in ladder:
        if t >= max_len:
            return t
    raise ValueError(
        f"batch max length {max_len} exceeds the ladder top "
        f"{ladder[-1]} — lengths are inconsistent with this model's "
        f"seq_len (h5 contract, data/loader.py)")


def predict(params, cfg: ModelConfig, tokens, lengths, feats
            ) -> Tuple[jax.Array, jax.Array]:
    """Returns (tab_pred [H+2, B, A], tab_att [H+2, B, S])."""
    out = rau_forward(params, cfg, tokens, lengths, feats, train=False)
    return _aggregate(out.scores, out.do_pred, out.attprob)


def predict_fused(params, cfg: ModelConfig, tokens, lengths, feats, *,
                  block_b: int = 16, interpret: bool = False,
                  fuse_encoder: bool = False) -> Tuple[jax.Array, jax.Array]:
    """Like ``predict`` but the hop loop (and optionally the question-LSTM
    scan) run in fused Pallas kernels (ops/rau_hops.py,
    ops/lstm_encoder.py).  Measured verdict (BASELINE.md): XLA's own
    fusion is FASTER at these model shapes (4.8 vs 7.1 ms/batch-512), so
    this stays an optional tuned-path surface, not the default.  Batch
    pads to ``block_b``; bf16 numerics (>99.8% argmax agreement with the
    f32 path)."""
    from rau_vqa_tpu.models.rau import embed_image, encode_question
    from rau_vqa_tpu.ops.lstm_encoder import encode_question_fused
    from rau_vqa_tpu.ops.rau_hops import rau_hops_pallas

    B = tokens.shape[0]
    pad = (-B) % block_b
    if pad:
        # pad to the tile size (lengths=1 keeps the gather in range), then
        # slice the outputs back — makes the fused path usable with the
        # reference's odd test batch sizes (83/57, Ours_SS/...lua:85-95)
        tokens = jnp.concatenate(
            [tokens, jnp.zeros((pad,) + tokens.shape[1:], tokens.dtype)])
        lengths = jnp.concatenate([lengths, jnp.ones((pad,), lengths.dtype)])
        feats = jnp.concatenate(
            [feats, jnp.zeros((pad,) + feats.shape[1:], feats.dtype)])

    with jax.default_matmul_precision(cfg.matmul_precision):
        if fuse_encoder:
            q = encode_question_fused(params, cfg, tokens, lengths,
                                      block_b=block_b, interpret=interpret)
        else:
            q = encode_question(params, cfg, tokens, lengths, train=False)
        ifeat, iatt = embed_image(params["mult"], cfg, feats, train=False)
    scores, do_pred, attprob = rau_hops_pallas(
        params["mult"], cfg, q, ifeat, iatt, block_b=block_b,
        interpret=interpret)
    if pad:
        scores = scores[:, :B]
        do_pred = do_pred[:, :B]
        attprob = attprob[:, :B]
    return _aggregate(scores, do_pred, attprob)


def make_predict_step(cfg: ModelConfig, *, fused: bool = False,
                      interpret: bool | None = None,
                      buckets: Tuple[int, ...] = ()):
    """Jitted (params, tokens, lengths, feats) -> (tab_pred, tab_att).

    ``interpret=None`` auto-selects: compiled Pallas on TPU, interpreter
    elsewhere (Pallas TPU kernels don't lower on CPU).

    ``buckets``: optional sequence-length bucketing for the question
    encoder.  The 26-step LSTM scan is ~40% of serving FLOPs, but steps
    past each question's last token are discarded by the last-token gather
    (models/rau.py encode_question) — so running a batch at any T >= max
    length is EXACT, not an approximation.  With buckets (e.g. ``(8, 16)``)
    each call dispatches to the smallest compiled variant covering the
    batch's max length; one variant per bucket plus the full seq_len is
    compiled on first use.  Real VQA questions average ~7 tokens
    (seq_len 26 covers the tail; h5 contract), so the win is large with
    length-grouped batch orders (the reference's 'sort'/'randsort',
    vqa_prepro_loader.lua batch-order options)."""
    if fused and interpret is None:
        interpret = jax.devices()[0].platform == "cpu"

    def run(p, t, l, f):
        if fused:
            return predict_fused(p, cfg, t, l, f, interpret=interpret)
        return predict(p, cfg, t, l, f)

    jitted = jax.jit(run)   # re-specializes per token shape (one executable
                            # per bucket via jit's own cache)
    if not buckets:
        return jitted
    import numpy as np
    ladder = bucket_ladder(cfg.seq_len, buckets)

    def step(p, tokens, lengths, feats):
        max_len = int(np.max(np.asarray(lengths)))
        T = pick_bucket(ladder, max_len)
        return jitted(p, tokens[:, :T], lengths, feats)

    return step


def mc_mask(mc_answers: jax.Array, answer_size: int) -> jax.Array:
    """mc_answers [B, NMC] 0-based, -1 = absent -> 0/1 mask [B, A]
    (the reference builds this per batch element, :885-892)."""
    valid = (mc_answers >= 0)
    onehot = jax.nn.one_hot(jnp.where(valid, mc_answers, 0), answer_size,
                            dtype=jnp.float32)
    return jnp.clip(jnp.sum(onehot * valid[..., None], axis=1), 0.0, 1.0)


def compute_answers(tab_pred: jax.Array, mc_answers=None
                    ) -> Tuple[jax.Array, jax.Array]:
    """OE = argmax over all answers; MC = argmax over mask-multiplied scores
    (reference :893-899).  Returns ([H+2, B] oe, [H+2, B] mc or None)."""
    oe = jnp.argmax(tab_pred, axis=-1)
    if mc_answers is None:
        return oe, None
    mask = mc_mask(mc_answers, tab_pred.shape[-1])
    mc = jnp.argmax(tab_pred * mask[None], axis=-1)
    return oe, mc

"""Joint loss over all answering hops + monitored metrics.

Reproduces the loss semantics of the reference's ``feval``
(Ours_SS/LstmAttCtrlGradNoiseDontSelect.lua:428-631) exactly, including the
parts that look like losses but carry **no gradient**:

- differentiable loss = sum over hops of ``scale_h * CE(scores_h, y)``:
  the backward pass only ever feeds per-hop CE gradients (:568-577).
  ``scale_h`` is nHop for Ours_SS (dpred:mul(nHop), :569), 1 for Ours_MS,
  and a per-epoch 0/1 curriculum mask for Ours_Full/ResNet (:586-589).
- the "uni" CE over hop-averaged logits (:521-530) and the "select" CE over
  confidence-gated accumulated scores (:532-540) are computed forward-only.
- the do_pred BCE is computed and its gradient explicitly zeroed
  (d_do_pred:mul(0), :565-567 — the "DontSelect" in the algorithm name).

Everything is one fused XLA computation over the stacked ``[H, B, A]`` score
tensor — no per-hop host loop.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rau_vqa_tpu.models.aggregate import select_aggregate  # noqa: F401  (re-export)


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean softmax cross-entropy (torch CrossEntropyCriterion semantics:
    LogSoftmax + class-NLL averaged over the batch)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def bce(probs: jax.Array, targets: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Mean binary cross-entropy on probabilities (torch BCECriterion)."""
    p = jnp.clip(probs, eps, 1.0 - eps)
    return -jnp.mean(targets * jnp.log(p) + (1.0 - targets) * jnp.log1p(-p))


def hop_grad_scale(n_hops: int, *, scale_by_nhop: bool,
                   stop_timing: Optional[Tuple[int, ...]],
                   epoch: int) -> jnp.ndarray:
    """Per-hop gradient scale for the current (1-based) epoch.

    - Ours_SS: every hop scaled by nHop (:569).
    - Ours_Full/ResNet: hop h's gradient is zeroed starting the epoch AFTER
      ``stop_timing[h] <= epoch`` first holds — the reference flips the flag
      during the end-of-epoch test block (Ours_Full/...lua:1133-1136), so it
      takes effect from the next epoch on.
    """
    scale = float(n_hops) if scale_by_nhop else 1.0
    out = []
    for h in range(n_hops):
        if stop_timing is not None and h < len(stop_timing):
            stop = stop_timing[h]
        else:
            stop = 10 ** 9  # hops beyond the table never stop (reference
                            # tables carry sentinel 1000 entries)
        out.append(0.0 if epoch > stop else scale)
    return jnp.asarray(out, jnp.float32)


def joint_loss_and_metrics(scores: jax.Array, do_pred: jax.Array,
                           labels: jax.Array,
                           hop_scale: jax.Array) -> Tuple[jax.Array, Dict]:
    """scores [H, B, A], do_pred [H, B], labels [B] int, hop_scale [H].

    Returns (differentiable loss, metrics).  Metrics mirror the reference's
    per-iteration bookkeeping: per-hop/uni/select CE and accuracy counts,
    do_pred BCE and gated do_pred accuracy (:487-557)."""
    H, B, A = scores.shape
    ce_per_hop = jax.vmap(cross_entropy, in_axes=(0, None))(scores, labels)  # [H]
    loss = jnp.sum(hop_scale * ce_per_hop)

    # ---- monitored quantities (no gradient flows from these) ----
    m_scores = jax.lax.stop_gradient(scores)
    m_do_pred = jax.lax.stop_gradient(do_pred)

    ans = jnp.argmax(m_scores, axis=-1)                    # [H, B]
    is_correct = (ans == labels[None, :]).astype(jnp.float32)

    uni_pred = jnp.mean(m_scores, axis=0)                  # averaged logits (:521-524)
    uni_loss = cross_entropy(uni_pred, labels)
    uni_acc = jnp.mean(jnp.argmax(uni_pred, -1) == labels)

    select_pred, _ = select_aggregate(m_scores, m_do_pred, force_final=False)
    select_loss = cross_entropy(select_pred, labels)
    select_acc = jnp.mean(jnp.argmax(select_pred, -1) == labels)

    # do_pred ground truth is per-hop correctness (:497); BCE monitored only
    do_pred_loss = jax.vmap(bce)(m_do_pred, is_correct)    # [H]
    # gated do_pred accuracy: batch rows where NO hop was correct don't count
    # ("Dont care the case when no hop have correct answer", :551-553)
    did_correct = jnp.clip(jnp.sum(is_correct, axis=0), 0.0, 1.0)  # [B]
    fired = (m_do_pred > 0.5).astype(jnp.float32)
    do_pred_match = (fired == is_correct).astype(jnp.float32)
    do_pred_acc_num = jnp.sum(do_pred_match * did_correct[None, :], axis=1)  # [H]
    do_pred_acc_den = jnp.sum(did_correct)

    metrics = {
        "loss": loss,
        # share of examples where at least one hop answered correctly
        # (the reference's '[At least one answer ratio]' print, :543)
        "any_correct_ratio": jnp.mean(did_correct),
        "ce_per_hop": ce_per_hop,
        "uni_loss": uni_loss,
        "select_loss": select_loss,
        "acc_per_hop": jnp.mean(is_correct, axis=1),
        "uni_acc": uni_acc,
        "select_acc": select_acc,
        "do_pred_loss": do_pred_loss,
        "do_pred_acc_num": do_pred_acc_num,
        "do_pred_acc_den": do_pred_acc_den,
    }
    return loss, metrics

"""Hop-aggregation primitives shared by training metrics and inference."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def select_aggregate(scores: jax.Array, do_pred: jax.Array, *,
                     force_final: bool) -> Tuple[jax.Array, jax.Array]:
    """First-hop-that-fired selective aggregation (reference
    Ours_SS/LstmAttCtrlGradNoiseDontSelect.lua:504-515 train, :683-697 test).

    scores [H, B, A]; do_pred [H, B] sigmoid probabilities.
    Returns (select_pred [B, A], gates [H, B]) where ``gates[h]`` is the 0/1
    indicator that hop h is the first confident hop.  With ``force_final``
    the last hop always fires (test-time rule, :685)."""
    H = scores.shape[0]
    fired = (do_pred > 0.5).astype(scores.dtype)           # [H, B]
    if force_final:
        fired = fired.at[H - 1].set(1.0)
    did_pred = jnp.clip(jnp.cumsum(fired, axis=0), 0.0, 1.0)
    prev_did = jnp.concatenate([jnp.zeros_like(did_pred[:1]), did_pred[:-1]])
    gates = jnp.clip(fired - prev_did, 0.0, 1.0)           # [H, B]
    select_pred = jnp.einsum("hba,hb->ba", scores, gates)
    return select_pred, gates

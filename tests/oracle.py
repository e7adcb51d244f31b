"""NumPy oracle implementing the reference Lua model math, used to validate
the JAX implementation (SURVEY.md §4: "LSTM/ATTLSTM cell math vs a NumPy
oracle implementing DeepLSTM.lua:43-61; attention softmax vs
Ours_SS/...lua:285-290").

Everything here is written directly from the Lua sources' equations, with
dropout disabled (eval mode), in float64 for a tight tolerance.
"""

from __future__ import annotations

import numpy as np


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def deep_lstm_cell_oracle(layers, x, state, rnn_size):
    """model/DeepLSTM.lua:29-68. layers: list of dicts with wi/bi/wh/bh
    ([in, out] layout). state [B, 2*n*R] packed (c, h) per layer."""
    R = rnn_size
    inp = x
    outs = []
    for L, lp in enumerate(layers):
        c = state[:, 2 * L * R:(2 * L + 1) * R]
        h = state[:, (2 * L + 1) * R:(2 * L + 2) * R]
        gates = inp @ lp["wi"] + lp["bi"] + h @ lp["wh"] + lp["bh"]
        # DeepLSTM.lua:47-54: sigmoid over the first 3R (in, forget, out),
        # tanh over the last R (in_transform)
        i_g = sigmoid(gates[:, :R])
        f_g = sigmoid(gates[:, R:2 * R])
        o_g = sigmoid(gates[:, 2 * R:3 * R])
        g_t = np.tanh(gates[:, 3 * R:])
        next_c = f_g * c + i_g * g_t
        next_h = o_g * np.tanh(next_c)
        outs += [next_c, next_h]
        inp = next_h
    return np.concatenate(outs, axis=1)


def att_lstm_cell_oracle(layers, x, prev_c, prev_h, rnn_size):
    """model/ATTLSTM.lua:4-28. Gate order after (4, R) reshape:
    [in, in_transform, forget, out] (ATTLSTM.lua:16-19)."""
    R = rnn_size
    inp = x
    ncs, nhs = [], []
    for L, lp in enumerate(layers):
        c = prev_c[:, L * R:(L + 1) * R]
        h = prev_h[:, L * R:(L + 1) * R]
        gates = inp @ lp["wi"] + lp["bi"] + h @ lp["wh"] + lp["bh"]
        i_g = sigmoid(gates[:, :R])
        g_t = np.tanh(gates[:, R:2 * R])
        f_g = sigmoid(gates[:, 2 * R:3 * R])
        o_g = sigmoid(gates[:, 3 * R:])
        next_c = f_g * c + i_g * g_t
        next_h = o_g * np.tanh(next_c)
        ncs.append(next_c)
        nhs.append(next_h)
        inp = next_h
    return np.concatenate(ncs, axis=1), np.concatenate(nhs, axis=1)


def softmax(x, axis=-1):
    m = x.max(axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=axis, keepdims=True)


def answering_unit_oracle(mp, cfg, q, feats, c, h):
    """The full multimodal gModule, eval mode
    (Ours_SS/LstmAttCtrlGradNoiseDontSelect.lua:229-307).

    feats [B, S, Dc]; all weights [in, out]."""
    # q_embed (:231-236)
    qfeat = np.tanh(q @ mp["q_proj"]["w"] + mp["q_proj"]["b"]
                    + h @ mp["h_proj"]["w"] + mp["h_proj"]["b"])
    # i_embed (:238-242): 1x1 conv over channels == per-cell linear
    ifeat = np.tanh(feats @ mp["i_embed"]["w"] + mp["i_embed"]["b"])
    # attbycontent (:244-252)
    qatt = qfeat @ mp["att_q"]["w"] + mp["att_q"]["b"]
    iatt = ifeat @ mp["att_i"]["w"] + mp["att_i"]["b"]
    addfeat = np.tanh(iatt + qatt[:, None, :])
    attscore = (addfeat @ mp["att_score"]["w"])[..., 0] + mp["att_score"]["b"]
    # attbymemory (:285-290)
    attscore = attscore + h @ mp["att_mem"]["w"] + mp["att_mem"]["b"]
    attprob = softmax(attscore, axis=-1)
    # attselect (:254-263)
    attfeat = np.einsum("bsm,bs->bm", ifeat, attprob)
    # classifier (:265-283)
    join = (qfeat + attfeat
            + attprob @ mp["attprob_proj"]["w"] + mp["attprob_proj"]["b"])
    next_c, next_h = att_lstm_cell_oracle(mp["attlstm"]["layers"], join, c, h,
                                          cfg.att_rnn_size)
    merge = join + next_h @ mp["merge"]["w"] + mp["merge"]["b"]
    score = merge @ mp["cls"]["w"] + mp["cls"]["b"]
    do_pred = sigmoid(merge @ mp["do_pred"]["w"] + mp["do_pred"]["b"])[:, 0]
    return score, do_pred, attprob, next_c, next_h


def encode_question_oracle(params, cfg, tokens, lengths):
    """Word embed + unrolled DeepLSTM + per-example last-token gather,
    eval mode (reference :448-461)."""
    B, T = tokens.shape
    emb = np.tanh(params["embed"]["lookup"][tokens])  # [B, T, E]
    state = np.zeros((B, cfg.rnnout_dim))
    rnn_out = np.zeros((B, cfg.rnnout_dim))
    for t in range(T):
        state = deep_lstm_cell_oracle(params["rnn"]["layers"], emb[:, t],
                                      state, cfg.rnn_size)
        for k in range(B):
            if lengths[k] == t + 1:
                rnn_out[k] = state[k]
    return rnn_out


def rau_forward_oracle(params, cfg, tokens, lengths, feats):
    """Full eval-mode forward (reference :633-705 without thresholding)."""
    B = tokens.shape[0]
    q = encode_question_oracle(params, cfg, tokens, lengths)
    c = np.zeros((B, cfg.att_state_dim))
    h = np.zeros((B, cfg.att_state_dim))
    scores, do_preds, attprobs = [], [], []
    for _ in range(cfg.n_hops):
        s, d, a, c, h = answering_unit_oracle(params["mult"], cfg, q, feats, c, h)
        scores.append(s)
        do_preds.append(d)
        attprobs.append(a)
    return np.stack(scores), np.stack(do_preds), np.stack(attprobs)

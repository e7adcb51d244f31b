"""Fused RAU-hops Pallas kernel vs the XLA reference path (interpret mode on
CPU; the real-TPU run is exercised by bench.py and the driver)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rau_vqa_tpu.config import ModelConfig
from rau_vqa_tpu.models.rau import embed_image, init_params, rau_forward
from rau_vqa_tpu.ops.rau_hops import rau_hops_pallas, rau_hops_reference

CFG = ModelConfig(
    vocab_size=50, answer_size=16, seq_len=9, embed_dim=8, rnn_size=16,
    rnn_layers=2, cnn_dim=12, cnn_w=4, cnn_h=2, multfeat_dim=16,
    attfeat_dim=8, att_rnn_size=16, n_hops=3)


def setup(B=32):
    params = init_params(jax.random.PRNGKey(0), CFG)
    mp = params["mult"]
    rs = np.random.RandomState(0)
    q = jnp.asarray(rs.randn(B, CFG.rnnout_dim).astype(np.float32))
    feats = jnp.asarray(rs.randn(B, CFG.cnn_spat, CFG.cnn_dim)
                        .astype(np.float32))
    ifeat, iatt = embed_image(mp, CFG, feats, train=False)
    return params, mp, q, feats, ifeat, iatt


def test_reference_matches_rau_forward():
    """The hop-loop reference on precomputed embeddings must equal the full
    eval forward given the same encoder output."""
    params, mp, q, feats, ifeat, iatt = setup()
    s_ref, d_ref, a_ref = rau_hops_reference(mp, CFG, q, ifeat, iatt)

    # drive rau_forward with an identity-ish encoder by calling the pieces:
    from rau_vqa_tpu.models.rau import answering_unit
    B = q.shape[0]
    c = jnp.zeros((B, CFG.att_state_dim))
    h = jnp.zeros((B, CFG.att_state_dim))
    scores = []
    for _ in range(CFG.n_hops):
        s, d, a, c, h = answering_unit(mp, CFG, q, ifeat, iatt, c, h,
                                       train=False)
        scores.append(s)
    np.testing.assert_allclose(np.asarray(s_ref), np.asarray(jnp.stack(scores)),
                               rtol=1e-4, atol=1e-5)


def test_pallas_kernel_interpret_matches_reference():
    params, mp, q, feats, ifeat, iatt = setup()
    s_ref, d_ref, a_ref = rau_hops_reference(mp, CFG, q, ifeat, iatt)
    s_pl, d_pl, a_pl = rau_hops_pallas(mp, CFG, q, ifeat, iatt,
                                       block_b=16, interpret=True)
    assert s_pl.shape == (CFG.n_hops, 32, CFG.answer_size)
    # bf16 dots inside the kernel vs f32 reference: loose numeric tolerance,
    # but decisions must agree
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref),
                               rtol=0.05, atol=0.01)
    assert float((s_pl.argmax(-1) == s_ref.argmax(-1)).mean()) > 0.97
    np.testing.assert_allclose(np.asarray(a_pl), np.asarray(a_ref),
                               rtol=0.05, atol=5e-4)
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               rtol=0.05, atol=5e-3)


def test_pallas_kernel_batch_divisibility():
    params, mp, q, feats, ifeat, iatt = setup(B=24)
    try:
        rau_hops_pallas(mp, CFG, q, ifeat, iatt, block_b=16, interpret=True)
        raised = False
    except ValueError as e:
        raised = "divisible" in str(e)
    assert raised


@pytest.mark.slow   # fast-loop budget (VERDICT r4 #5); full suite runs it
def test_predict_fused_matches_predict():
    from rau_vqa_tpu.eval.predict import predict, predict_fused

    params, mp, q, feats, ifeat, iatt = setup(B=16)
    rs = np.random.RandomState(1)
    tokens = jnp.asarray(rs.randint(1, CFG.vocab_size, (16, CFG.seq_len)),
                         jnp.int32)
    lengths = jnp.asarray(rs.randint(1, CFG.seq_len + 1, 16), jnp.int32)
    tab_ref, att_ref = predict(params, CFG, tokens, lengths, feats)
    tab_pl, att_pl = predict_fused(params, CFG, tokens, lengths, feats,
                                   interpret=True)
    assert tab_pl.shape == tab_ref.shape
    np.testing.assert_allclose(np.asarray(tab_pl), np.asarray(tab_ref),
                               rtol=0.05, atol=0.02)
    agree = float((tab_ref.argmax(-1) == tab_pl.argmax(-1)).mean())
    assert agree > 0.95


def test_lstm_encoder_fused_matches_scan():
    from rau_vqa_tpu.models.rau import encode_question
    from rau_vqa_tpu.ops.lstm_encoder import encode_question_fused

    params, mp, q, feats, ifeat, iatt = setup(B=16)
    rs = np.random.RandomState(2)
    lengths = rs.randint(1, CFG.seq_len + 1, 16).astype(np.int32)
    tokens = np.zeros((16, CFG.seq_len), np.int32)
    for k in range(16):
        tokens[k, :lengths[k]] = rs.randint(1, CFG.vocab_size, lengths[k])
    ref = encode_question(params, CFG, jnp.asarray(tokens),
                          jnp.asarray(lengths))
    got = encode_question_fused(params, CFG, jnp.asarray(tokens),
                                jnp.asarray(lengths), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=5e-3)


@pytest.mark.slow
def test_predict_fused_pads_odd_batches():
    """Fused path must handle batch sizes not divisible by the tile
    (the reference's test batches are 83/57/96)."""
    from rau_vqa_tpu.eval.predict import predict, predict_fused

    params, mp, q, feats, ifeat, iatt = setup(B=32)
    B = 19
    rs = np.random.RandomState(3)
    tokens = jnp.asarray(rs.randint(1, CFG.vocab_size, (B, CFG.seq_len)),
                         jnp.int32)
    lengths = jnp.asarray(rs.randint(1, CFG.seq_len + 1, B), jnp.int32)
    fts = feats[:B]
    tab_ref, att_ref = predict(params, CFG, tokens, lengths, fts)
    tab_pl, att_pl = predict_fused(params, CFG, tokens, lengths, fts,
                                   interpret=True)
    assert tab_pl.shape == (CFG.n_hops + 2, B, CFG.answer_size)
    assert att_pl.shape == (CFG.n_hops + 2, B, CFG.cnn_spat)
    agree = float((tab_ref.argmax(-1) == tab_pl.argmax(-1)).mean())
    assert agree > 0.95

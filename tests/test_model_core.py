"""Model-core correctness: JAX cells and forward vs the NumPy oracle
implementing the Lua reference math (see tests/oracle.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rau_vqa_tpu.config import ModelConfig
from rau_vqa_tpu.models import (
    att_lstm_cell,
    deep_lstm_cell,
    encode_question,
    init_params,
    rau_forward,
)
from tests import oracle

TINY = ModelConfig(
    vocab_size=50, answer_size=17, seq_len=9, embed_dim=8, rnn_size=16,
    rnn_layers=2, cnn_dim=12, cnn_w=3, cnn_h=2, multfeat_dim=16,
    attfeat_dim=8, att_rnn_size=16, att_rnn_layers=1, n_hops=3,
)


def to_np(tree):
    return jax.tree.map(lambda x: np.asarray(x, dtype=np.float64), tree)


@pytest.fixture(scope="module")
def params():
    return init_params(jax.random.PRNGKey(0), TINY)


@pytest.fixture(scope="module")
def params_np(params):
    return to_np(params)


def test_init_shapes(params):
    cfg = TINY
    assert params["embed"]["lookup"].shape == (cfg.vocab_size, cfg.embed_dim)
    assert params["rnn"]["layers"][0]["wi"].shape == (cfg.embed_dim, 4 * cfg.rnn_size)
    assert params["rnn"]["layers"][1]["wi"].shape == (cfg.rnn_size, 4 * cfg.rnn_size)
    mp = params["mult"]
    assert mp["q_proj"]["w"].shape == (cfg.rnnout_dim, cfg.multfeat_dim)
    assert mp["att_mem"]["w"].shape == (cfg.att_state_dim, cfg.cnn_spat)
    assert mp["cls"]["w"].shape == (cfg.multfeat_dim, cfg.answer_size)
    # init range: uniform(-0.08, 0.08) (reference :349-355)
    leaves = jax.tree.leaves(params)
    assert all(float(jnp.max(jnp.abs(l))) <= 0.08 for l in leaves)


def test_deep_lstm_cell_vs_oracle(params, params_np, rng_np):
    cfg = TINY
    B = 5
    x = rng_np.randn(B, cfg.embed_dim).astype(np.float32)
    state = rng_np.randn(B, cfg.rnnout_dim).astype(np.float32)
    got = deep_lstm_cell(params["rnn"], jnp.asarray(x), jnp.asarray(state),
                         rnn_size=cfg.rnn_size)
    want = oracle.deep_lstm_cell_oracle(params_np["rnn"]["layers"],
                                        x.astype(np.float64),
                                        state.astype(np.float64), cfg.rnn_size)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_att_lstm_cell_vs_oracle(params, params_np, rng_np):
    cfg = TINY
    B = 4
    x = rng_np.randn(B, cfg.multfeat_dim).astype(np.float32)
    c = rng_np.randn(B, cfg.att_state_dim).astype(np.float32)
    h = rng_np.randn(B, cfg.att_state_dim).astype(np.float32)
    nc, nh = att_lstm_cell(params["mult"]["attlstm"], jnp.asarray(x),
                           jnp.asarray(c), jnp.asarray(h),
                           rnn_size=cfg.att_rnn_size)
    wc, wh = oracle.att_lstm_cell_oracle(
        params_np["mult"]["attlstm"]["layers"], x.astype(np.float64),
        c.astype(np.float64), h.astype(np.float64), cfg.att_rnn_size)
    np.testing.assert_allclose(np.asarray(nc), wc, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(nh), wh, rtol=1e-5, atol=1e-5)


def test_gate_orders_differ(params, rng_np):
    """DeepLSTM uses [i,f,o|g]; ATTLSTM uses [i,g,f,o] — with identical
    weights on identical inputs the two cells must NOT agree (guards against
    accidentally unifying the gate layouts)."""
    cfg = TINY
    B = 3
    lp = params["mult"]["attlstm"]  # square: in == rnn_size == 16
    x = jnp.asarray(rng_np.randn(B, cfg.att_rnn_size).astype(np.float32))
    c = jnp.asarray(rng_np.randn(B, cfg.att_rnn_size).astype(np.float32))
    h = jnp.asarray(rng_np.randn(B, cfg.att_rnn_size).astype(np.float32))
    nc_att, _ = att_lstm_cell(lp, x, c, h, rnn_size=cfg.att_rnn_size)
    packed = jnp.concatenate([c, h], axis=1)
    out_deep = deep_lstm_cell({"layers": lp["layers"]}, x, packed,
                              rnn_size=cfg.att_rnn_size)
    nc_deep = out_deep[:, :cfg.att_rnn_size]
    assert not np.allclose(np.asarray(nc_att), np.asarray(nc_deep), atol=1e-3)


def test_encode_question_vs_oracle(params, params_np, rng_np):
    cfg = TINY
    B = 6
    lengths = rng_np.randint(1, cfg.seq_len + 1, size=B).astype(np.int32)
    tokens = np.zeros((B, cfg.seq_len), np.int32)
    for k in range(B):
        tokens[k, :lengths[k]] = rng_np.randint(1, cfg.vocab_size, lengths[k])
    got = encode_question(params, cfg, jnp.asarray(tokens), jnp.asarray(lengths))
    want = oracle.encode_question_oracle(params_np, cfg, tokens, lengths)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_rau_forward_vs_oracle(params, params_np, rng_np):
    cfg = TINY
    B = 4
    lengths = rng_np.randint(1, cfg.seq_len + 1, size=B).astype(np.int32)
    tokens = np.zeros((B, cfg.seq_len), np.int32)
    for k in range(B):
        tokens[k, :lengths[k]] = rng_np.randint(1, cfg.vocab_size, lengths[k])
    feats = rng_np.randn(B, cfg.cnn_spat, cfg.cnn_dim).astype(np.float32)

    out = rau_forward(params, cfg, jnp.asarray(tokens), jnp.asarray(lengths),
                      jnp.asarray(feats))
    w_scores, w_do, w_att = oracle.rau_forward_oracle(
        params_np, cfg, tokens, lengths, feats.astype(np.float64))
    assert out.scores.shape == (cfg.n_hops, B, cfg.answer_size)
    assert out.do_pred.shape == (cfg.n_hops, B)
    assert out.attprob.shape == (cfg.n_hops, B, cfg.cnn_spat)
    np.testing.assert_allclose(np.asarray(out.scores), w_scores, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.do_pred), w_do, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out.attprob), w_att, rtol=1e-5, atol=1e-5)
    # attention rows are distributions
    np.testing.assert_allclose(np.asarray(out.attprob).sum(-1),
                               np.ones((cfg.n_hops, B)), rtol=1e-5)


def test_rau_forward_jit_and_train_mode(params, rng_np):
    cfg = TINY
    B = 4
    tokens = jnp.asarray(rng_np.randint(1, cfg.vocab_size, (B, cfg.seq_len)),
                         dtype=jnp.int32)
    lengths = jnp.full((B,), cfg.seq_len, jnp.int32)
    feats = jnp.asarray(rng_np.randn(B, cfg.cnn_spat, cfg.cnn_dim)
                        .astype(np.float32))

    fwd = jax.jit(lambda p, t, l, f, key: rau_forward(p, cfg, t, l, f,
                                                      train=True, rng=key))
    key = jax.random.PRNGKey(7)
    out1 = fwd(params, tokens, lengths, feats, key)
    out2 = fwd(params, tokens, lengths, feats, key)
    # deterministic given the same key
    np.testing.assert_array_equal(np.asarray(out1.scores), np.asarray(out2.scores))
    out3 = fwd(params, tokens, lengths, feats, jax.random.PRNGKey(8))
    # different dropout masks with a different key
    assert not np.allclose(np.asarray(out1.scores), np.asarray(out3.scores))
    assert np.all(np.isfinite(np.asarray(out1.scores)))


def test_single_hop_matches_multi_hop_first_step(params, rng_np):
    """Hop 1 of an n-hop model must equal the 1-hop model's output (weights
    are shared across hops; state starts at zero)."""
    cfg1 = dataclasses.replace(TINY, n_hops=1)
    B = 3
    tokens = jnp.asarray(rng_np.randint(1, TINY.vocab_size, (B, TINY.seq_len)),
                         dtype=jnp.int32)
    lengths = jnp.full((B,), 4, jnp.int32)
    feats = jnp.asarray(rng_np.randn(B, TINY.cnn_spat, TINY.cnn_dim)
                        .astype(np.float32))
    out_multi = rau_forward(params, TINY, tokens, lengths, feats)
    out_one = rau_forward(params, cfg1, tokens, lengths, feats)
    np.testing.assert_allclose(np.asarray(out_multi.scores[0]),
                               np.asarray(out_one.scores[0]), rtol=1e-6)


def test_preset_shapes_compile():
    """Every preset's model builds and its forward shape-checks at full size
    (eval_shape only — no FLOPs)."""
    from rau_vqa_tpu.config import PRESETS

    for name, make in PRESETS.items():
        cfg = make().model
        params_shape = jax.eval_shape(
            lambda key: init_params(key, cfg), jax.random.PRNGKey(0))
        out = jax.eval_shape(
            lambda p: rau_forward(
                p, cfg,
                jnp.zeros((4, cfg.seq_len), jnp.int32),
                jnp.ones((4,), jnp.int32),
                jnp.zeros((4, cfg.cnn_spat, cfg.cnn_dim), jnp.float32)),
            params_shape)
        assert out.scores.shape == (cfg.n_hops, 4, cfg.answer_size), name
        assert out.attprob.shape == (cfg.n_hops, 4, cfg.cnn_spat), name


@pytest.mark.slow
def test_remat_hops_matches_plain_grads(params):
    """cfg.remat_hops must change memory behavior only: identical forward
    outputs and identical gradients to the plain unrolled hop loop."""
    cfg = TINY
    cfg_r = dataclasses.replace(cfg, remat_hops=True)
    rs = np.random.RandomState(3)
    B = 4
    tokens = jnp.asarray(rs.randint(1, cfg.vocab_size, (B, cfg.seq_len)),
                         jnp.int32)
    lengths = jnp.asarray(rs.randint(1, cfg.seq_len + 1, B), jnp.int32)
    feats = jnp.asarray(rs.randn(B, cfg.cnn_spat, cfg.cnn_dim),
                        jnp.float32)
    labels = jnp.asarray(rs.randint(0, cfg.answer_size, B), jnp.int32)
    rng = jax.random.PRNGKey(11)

    def loss(p, c):
        out = rau_forward(p, c, tokens, lengths, feats, train=True, rng=rng)
        logp = jax.nn.log_softmax(out.scores, axis=-1)
        per_hop = -jnp.take_along_axis(
            logp, labels[None, :, None], axis=-1).mean(axis=(1, 2))
        return jnp.sum(per_hop), out

    (l0, out0), g0 = jax.value_and_grad(
        loss, has_aux=True)(params, cfg)
    (l1, out1), g1 = jax.value_and_grad(
        loss, has_aux=True)(params, cfg_r)
    np.testing.assert_allclose(np.asarray(out0.scores),
                               np.asarray(out1.scores), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        assert p0 == p1
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=jax.tree_util.keystr(p0))

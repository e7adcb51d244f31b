"""Fused training hop kernel (ops/rau_train_hops.py): mask reproducibility,
forward parity, and full grad parity vs the autodiff oracle — all on the
interpreter (CPU), same kernel code the TPU compiles."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rau_vqa_tpu.config import ModelConfig
from rau_vqa_tpu.models.rau import init_params, rau_forward
from rau_vqa_tpu.ops.maskgen import dropout_scale_mask, mix32, site_salt
from rau_vqa_tpu.ops.rau_train_hops import (
    rau_train_hops,
    rau_train_hops_reference,
)

CFG = ModelConfig(
    vocab_size=50, answer_size=17, seq_len=9, embed_dim=8, rnn_size=16,
    rnn_layers=2, cnn_dim=12, cnn_w=3, cnn_h=2, multfeat_dim=16,
    attfeat_dim=8, att_rnn_size=16, att_rnn_layers=1, n_hops=3,
)
B = 8


@pytest.fixture(scope="module")
def data():
    rs = np.random.RandomState(7)
    mp = init_params(jax.random.PRNGKey(0), CFG)["mult"]
    q = jnp.asarray(rs.randn(B, CFG.rnnout_dim), jnp.float32)
    feats = jnp.asarray(rs.randn(B, CFG.cnn_spat, CFG.cnn_dim), jnp.float32)
    labels = jnp.asarray(rs.randint(0, CFG.answer_size, B), jnp.int32)
    seed = jnp.int32(12345)
    return mp, q, feats, labels, seed


# ---------------------------------------------------------------------------
# mask generator
# ---------------------------------------------------------------------------

def test_mask_deterministic_and_seeded():
    salt = site_salt(jnp.int32(3), 1, 0)
    m1 = dropout_scale_mask((4, 6, 12), 0, salt, 0.5)
    m2 = dropout_scale_mask((4, 6, 12), 0, salt, 0.5)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))
    m3 = dropout_scale_mask((4, 6, 12), 0, site_salt(jnp.int32(4), 1, 0), 0.5)
    assert (np.asarray(m1) != np.asarray(m3)).any()
    # distinct sites / hops give distinct streams
    m4 = dropout_scale_mask((4, 6, 12), 0, site_salt(jnp.int32(3), 1, 1), 0.5)
    m5 = dropout_scale_mask((4, 6, 12), 0, site_salt(jnp.int32(3), 2, 0), 0.5)
    assert (np.asarray(m1) != np.asarray(m4)).any()
    assert (np.asarray(m1) != np.asarray(m5)).any()


def test_mask_tile_invariance():
    """Masks depend on the GLOBAL row index: any batch tiling agrees."""
    salt = site_salt(jnp.int32(99), 0, 0)
    full = np.asarray(dropout_scale_mask((8, 5, 7), 0, salt, 0.5))
    lo = np.asarray(dropout_scale_mask((4, 5, 7), 0, salt, 0.5))
    hi = np.asarray(dropout_scale_mask((4, 5, 7), 4, salt, 0.5))
    np.testing.assert_array_equal(full, np.concatenate([lo, hi], axis=0))


def test_mask_keep_rate_and_scale():
    for rate in (0.25, 0.5, 0.75):
        m = np.asarray(dropout_scale_mask(
            (64, 1024), 0, site_salt(jnp.int32(1), 0, 0), rate))
        keep = m > 0
        assert abs(keep.mean() - (1 - rate)) < 0.02
        np.testing.assert_allclose(m[keep], 1.0 / (1 - rate), rtol=1e-6)
        # mean of the scale mask is ~1 (inverted dropout preserves E[x])
        assert abs(m.mean() - 1.0) < 0.05


def test_mix32_avalanche():
    x = np.asarray(mix32(jnp.arange(1024, dtype=jnp.uint32)))
    assert len(np.unique(x)) == 1024  # bijective on this range
    bits = np.unpackbits(x.view(np.uint8)).mean()
    assert abs(bits - 0.5) < 0.05


# ---------------------------------------------------------------------------
# forward parity: kernel (interpret) == XLA reference, tile-count invariant
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("block_b", [
    4, pytest.param(8, marks=pytest.mark.slow)])
@pytest.mark.slow   # fast-loop budget (VERDICT r4 #5); full suite runs it
def test_fused_forward_matches_reference(data, block_b):
    mp, q, feats, labels, seed = data
    s_k, d_k, a_k, c_k, h_k = rau_train_hops(
        mp, CFG, q, feats, seed, block_b=block_b)
    s_r, d_r, a_r, c_r, h_r = rau_train_hops_reference(
        mp, CFG, q, feats, seed)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(d_k), np.asarray(d_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(a_k), np.asarray(a_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_k), np.asarray(c_r),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_k), np.asarray(h_r),
                               rtol=1e-5, atol=1e-6)


def test_fused_forward_dropout_actually_active(data):
    """Different seeds give different scores (masks are live), and hops see
    independent masks (scores differ hop-to-hop beyond the state chain)."""
    mp, q, feats, labels, _ = data
    s1, *_ = rau_train_hops(mp, CFG, q, feats, jnp.int32(1), block_b=4)
    s2, *_ = rau_train_hops(mp, CFG, q, feats, jnp.int32(2), block_b=4)
    assert (np.asarray(s1) != np.asarray(s2)).any()


# ---------------------------------------------------------------------------
# grad parity: custom-VJP Pallas backward == jax.grad of the reference
# ---------------------------------------------------------------------------

def _loss(scores, labels, n_hops):
    # distinct per-hop weights catch hop-mixing bugs in the reverse scan
    hop_w = jnp.asarray([1.0 + 0.5 * h for h in range(n_hops)])
    logp = jax.nn.log_softmax(scores, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[None, :, None], axis=-1)[..., 0]
    return jnp.sum(hop_w * jnp.mean(nll, axis=1))


@pytest.mark.parametrize("block_b,bwd", [
    pytest.param(4, "kernel", marks=pytest.mark.slow),
    pytest.param(8, "kernel", marks=pytest.mark.slow),
    pytest.param(4, "xla", marks=pytest.mark.slow)])
def test_fused_grads_match_reference(data, block_b, bwd):
    mp, q, feats, labels, seed = data
    cfg = dataclasses.replace(CFG, fused_train_bwd=bwd)

    def loss_fused(mp_, q_):
        s, *_ = rau_train_hops(mp_, cfg, q_, feats, seed, block_b=block_b)
        return _loss(s, labels, CFG.n_hops)

    def loss_ref(mp_, q_):
        s, *_ = rau_train_hops_reference(mp_, CFG, q_, feats, seed)
        return _loss(s, labels, CFG.n_hops)

    lk, gk = jax.value_and_grad(loss_fused, argnums=(0, 1))(mp, q)
    lr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1))(mp, q)
    np.testing.assert_allclose(float(lk), float(lr), rtol=1e-5)
    for (pk, a), (pr, b) in zip(
            jax.tree_util.tree_leaves_with_path(gk),
            jax.tree_util.tree_leaves_with_path(gr)):
        assert pk == pr
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(pk))


@pytest.mark.slow   # fast-loop budget (VERDICT r4 #5); full suite runs it
def test_fused_do_pred_grad_is_zero(data):
    """The DontSelect rule: do_pred params receive exactly zero gradient."""
    mp, q, feats, labels, seed = data

    cfg_k = dataclasses.replace(CFG, fused_train_bwd="kernel")

    def loss_fused(mp_):
        s, *_ = rau_train_hops(mp_, cfg_k, q, feats, seed, block_b=4)
        return _loss(s, labels, cfg_k.n_hops)

    g = jax.grad(loss_fused)(mp)
    assert float(jnp.abs(g["do_pred"]["w"]).max()) == 0.0
    assert float(jnp.abs(g["do_pred"]["b"]).max()) == 0.0
    # but the classifier does learn
    assert float(jnp.abs(g["cls"]["w"]).max()) > 0.0


# ---------------------------------------------------------------------------
# model integration: cfg.fused_train routes rau_forward through the fused
# semantics (reference path on CPU) and trains end-to-end
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_rau_forward_fused_train_path(data):
    mp, q, feats, labels, seed = data
    cfg = dataclasses.replace(CFG, fused_train=True)
    params = init_params(jax.random.PRNGKey(0), cfg)
    rs = np.random.RandomState(0)
    tokens = jnp.asarray(rs.randint(1, cfg.vocab_size, (B, cfg.seq_len)),
                         jnp.int32)
    lengths = jnp.asarray(rs.randint(1, cfg.seq_len + 1, B), jnp.int32)

    def loss(p):
        out = rau_forward(p, cfg, tokens, lengths, feats, train=True,
                          rng=jax.random.PRNGKey(3))
        return _loss(out.scores, labels, cfg.n_hops)

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    gmax = max(float(jnp.abs(x).max()) for x in jax.tree.leaves(grads))
    assert np.isfinite(gmax) and gmax > 0
    # question-encoder weights receive gradient THROUGH the fused hop loop
    assert float(jnp.abs(grads["rnn"]["layers"][0]["wi"]).max()) > 0
    assert float(jnp.abs(grads["embed"]["lookup"]).max()) > 0


def test_fused_rejects_unsupported_config(data):
    mp, q, feats, labels, seed = data
    bad = dataclasses.replace(CFG, att_rnn_dropout=0.3)
    with pytest.raises(NotImplementedError):
        rau_train_hops(mp, bad, q, feats, seed, block_b=4)


def test_fused_no_dropout_matches_eval_semantics(data):
    """mult_dropout=0: masks compile away; fused == reference still."""
    mp, q, feats, labels, seed = data
    cfg0 = dataclasses.replace(CFG, mult_dropout=0.0)
    s_k, *_ = rau_train_hops(mp, cfg0, q, feats, seed, block_b=4)
    s_r, *_ = rau_train_hops_reference(mp, cfg0, q, feats, seed)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_r),
                               rtol=1e-5, atol=1e-5)
    # and the seed is irrelevant without dropout
    s_k2, *_ = rau_train_hops(mp, cfg0, q, feats, jnp.int32(999), block_b=4)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_k2),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_fused_bf16_compute_runs(data):
    """bfloat16 compute dtype: kernel + grads run and stay finite, and track
    the f32 path loosely (bf16 mantissa)."""
    mp, q, feats, labels, seed = data
    cfg_bf = dataclasses.replace(CFG, compute_dtype="bfloat16",
                                 matmul_precision="default")

    def loss(mp_, c):
        s, *_ = rau_train_hops(mp_, c, q, feats, seed, block_b=4)
        return _loss(s, labels, c.n_hops)

    l_bf, g_bf = jax.value_and_grad(loss)(mp, cfg_bf)
    l_f32, _ = jax.value_and_grad(loss)(mp, CFG)
    assert np.isfinite(float(l_bf))
    assert abs(float(l_bf) - float(l_f32)) / abs(float(l_f32)) < 0.05
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(g_bf))

